#!/bin/bash
# Round-4 CPU insurance queue (tunnel still down after ~30h): fast-mode CPU
# campaigns whose metric is recommendation-HV movement (timings on the
# contended 1-core host are garbage and documented as such). Consolidates the
# three chained r3 insurance stages into ONE script, reordered by value:
#   1. toyw/toyu   same-seed whitened-vs-unwhitened A/B, 20 iters each
#                  (VERDICT item 3 — quality comparison is CPU-valid)
#   2. bc512f      Branin-Currin@512 fast, 5 iters, rec-HV (VERDICT item 2)
#   3. q16         resume batch10d_q16_cpu_r3 10 -> 12 (closes the r3
#                  "stopped at 10/12" weak point); 3h chunks because late
#                  iterations now exceed the old 1h chunk budget
#   4. dtlz2f      DTLZ2@2048 fast, 2 iters
# Every chunk re-probes the tunnel and yields to the TPU queue on success.
# NEW vs r3: stuck detection — two consecutive chunks with zero iteration
# progress skip the job instead of burning the core forever (the r3 q16 job
# wedged overnight exactly this way).
set -u
cd "$(dirname "$0")/.."

probe() { timeout 60 python -c "import jax, jax.numpy as jnp; jnp.ones((4,4)).block_until_ready()" 2>/dev/null; }
status() { echo "$(date '+%F %T') [cpu-r4] $*" >> /tmp/r4_queue_status; }

# run_chunked name script dir target chunk tmo extra_args...
run_chunked () {
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
" >> "/tmp/r4_${name}_cpu.log" 2>&1
    status "$name chunk rc=$? (target $next)"
  done
}

status "cpu insurance start"
run_chunked toyw toy_synthetic_2D_JESMOCMF.py \
  benchmarks/evidence/toy2d_whitened_cpu_r4 20 4 1800 --fast --whitened || exit 0
run_chunked toyu toy_synthetic_2D_JESMOCMF.py \
  benchmarks/evidence/toy2d_unwhitened_cpu_r4 20 4 1800 --fast || exit 0
run_chunked bc512f example_branin_currin_512.py \
  benchmarks/evidence/branin_currin_512_cpu_r4 5 1 5400 --fast || exit 0
run_chunked q16 example_batch_bo_10d.py \
  benchmarks/evidence/batch10d_q16_cpu_r3 12 1 10800 --fast || exit 0
run_chunked dtlz2f example_dtlz2_2048.py \
  benchmarks/evidence/dtlz2_2048_cpu_r4 2 1 7200 --fast || exit 0
status "cpu insurance all done"
