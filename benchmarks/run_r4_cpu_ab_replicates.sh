#!/bin/bash
# Round-4 CPU A/B replicates (chained after run_r4_cpu_insurance.sh): the
# whitened-vs-unwhitened same-seed comparison at two additional seeds, so the
# BASELINE.md parameterization decision rests on 3 independent problem draws
# instead of one. Fast mode; quality metric is recommendation HV (timings on
# the contended 1-core host are garbage). Yields to the TPU queue on probe
# success; zero-progress stuck detection as in the main r4 CPU queue.
set -u
cd "$(dirname "$0")/.."

probe() { timeout 60 python -c "import jax, jax.numpy as jnp; jnp.ones((4,4)).block_until_ready()" 2>/dev/null; }
status() { echo "$(date '+%F %T') [cpu-r4-ab] $*" >> /tmp/r4_queue_status; }

# wait for the main CPU insurance runner
if [ -f /tmp/r4_cpu_runner.pid ]; then
  P=$(cat /tmp/r4_cpu_runner.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 120; done
fi
status "A/B replicate stage start"

run_chunked () {
  local name=$1 dir=$2 target=$3 seed=$4; shift 4
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
    local next=$((done_iters + 4)); [ "$next" -gt "$target" ] && next=$target
    timeout 1800 python -u -c "
import jax; jax.config.update('jax_platforms','cpu')
import runpy, sys
sys.argv=['toy_synthetic_2D_JESMOCMF.py','--iters','$next','--fast','--track-recommendation','--seed','$seed','--log-dir','$dir'] + '$extra'.split()
runpy.run_path('examples/toy_synthetic_2D_JESMOCMF.py', run_name='__main__')
" >> "/tmp/r4_${name}_cpu.log" 2>&1
    status "$name chunk rc=$? (target $next)"
  done
}

for seed in 11 23; do
  run_chunked "toyw_s${seed}" \
    "benchmarks/evidence/toy2d_whitened_s${seed}_cpu_r4" 20 "$seed" --whitened || exit 0
  run_chunked "toyu_s${seed}" \
    "benchmarks/evidence/toy2d_unwhitened_s${seed}_cpu_r4" 20 "$seed" || exit 0
done
status "A/B replicate stage all done"
