# Shared helpers for the round-4 evidence queue runners. Source from a
# runner script AFTER defining STATUS_TAG. One implementation of the
# probe/yield/stuck/retry protocol — the r3 generation had three divergent
# copies and fixes kept missing one.
#
# NOTE for operators: never edit a runner .sh in place while it is running
# (bash reads scripts lazily by byte offset). Replace via `mv tmp script.sh`
# — the live shell keeps its old inode; new launches get the new content.

probe() { timeout 60 python -c "import jax, jax.numpy as jnp; jnp.ones((4,4)).block_until_ready()" 2>/dev/null; }

# All /tmp artifact names share this prefix so successive rounds' runners
# don't clobber each other's logs (was hardcoded r4_).
QUEUE_PREFIX=${QUEUE_PREFIX:-${STATUS_TAG:-queue}}

status() { echo "$(date '+%F %T') [${STATUS_TAG:-queue}] $*" >> "/tmp/${QUEUE_PREFIX}_queue_status"; }

wait_tunnel() {
  local tries=${1:-180}
  for _ in $(seq 1 "$tries"); do
    probe && return 0
    sleep 120
  done
  return 1
}

wait_for_pidfile_exit() {
  # Block while the process recorded in $1 is alive. A stale pidfile whose
  # PID was reused blocks forever by design-tradeoff; runners write their
  # own pidfile at startup so staleness only survives a crashed host.
  local f=$1
  [ -f "$f" ] || return 0
  local p
  p=$(cat "$f")
  while kill -0 "$p" 2>/dev/null; do sleep 120; done
}

# run_tpu_job name timeout_s cmd...
# One TPU queue job: re-probe the tunnel, run under timeout, and RETRY (up
# to 3 extra attempts) when the job exits 86 (in-process stall watchdog,
# util/heartbeat.py) or 124 (external timeout) — campaigns are resume-safe,
# so a retry continues from the evidence dir instead of losing the
# remaining iterations for the round.
run_tpu_job() {
  local name=$1 tmo=$2; shift 2
  local attempt rc
  for attempt in 1 2 3 4; do
    wait_tunnel 15 || { status "$name SKIPPED (tunnel down)"; return 1; }
    status "$name start (attempt $attempt)"
    timeout "$tmo" "$@" >> "/tmp/${QUEUE_PREFIX}_${name}.log" 2>&1
    rc=$?
    status "$name rc=$rc (attempt $attempt)"
    case "$rc" in
      86|124) continue ;;
      *) return "$rc" ;;
    esac
  done
  return "$rc"
}

# run_chunked name script dir target chunk tmo extra_args...
# CPU campaign in chunks of `chunk` BO iterations per process (forced-CPU via
# jax.config — the JAX_PLATFORMS env var is ignored in this image). Yields to
# the TPU queue on probe success; two consecutive zero-progress chunks skip
# the job instead of burning the core forever.
run_chunked() {
  local name=$1 script=$2 dir=$3 target=$4 chunk=$5 tmo=$6; shift 6
  local extra="$*"
  local stuck=0 prev=-1
  while :; do
    local done_iters
    done_iters=$(wc -l < "$dir/iteration_seconds.txt" 2>/dev/null || echo 0)
    if [ "$done_iters" -ge "$target" ]; then status "$name done ($done_iters iters)"; return 0; fi
    if probe; then status "tunnel up; yielding $name after $done_iters iters"; return 1; fi
    if [ "$done_iters" -eq "$prev" ]; then stuck=$((stuck + 1)); else stuck=0; fi
    if [ "$stuck" -ge 2 ]; then status "$name STUCK at $done_iters iters; skipping"; return 0; fi
    prev=$done_iters
    local next=$((done_iters + chunk)); [ "$next" -gt "$target" ] && next=$target
    timeout "$tmo" python -u -c "
import jax; jax.config.update('jax_platforms','cpu')
import runpy, sys
sys.argv=['$script','--iters','$next','--track-recommendation','--log-dir','$dir'] + '$extra'.split()
runpy.run_path('examples/$script', run_name='__main__')
" >> "/tmp/${QUEUE_PREFIX}_${name}_cpu.log" 2>&1
    status "$name chunk rc=$? (target $next)"
  done
}
