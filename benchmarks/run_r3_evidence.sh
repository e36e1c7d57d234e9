#!/bin/bash
# Round-3 evidence queue. Waits for the TPU tunnel, then runs the remaining
# campaigns sequentially (each bounded). Logs to /tmp/r3_*.log; status lines
# append to /tmp/r3_queue_status. Campaigns write their artifact dirs under
# benchmarks/evidence/ directly (resume-safe: reruns replay evaluated points).
set -u
cd "$(dirname "$0")/.."

probe() { timeout 60 python -c "import jax, jax.numpy as jnp; jnp.ones((4,4)).block_until_ready()" 2>/dev/null; }

wait_tunnel() {
  local tries=${1:-180}
  for _ in $(seq 1 "$tries"); do
    probe && return 0
    sleep 120
  done
  return 1
}

status() { echo "$(date '+%F %T') $*" >> /tmp/r3_queue_status; }

status "queue start; waiting for tunnel"
wait_tunnel 400 || { status "tunnel never came back"; exit 1; }
status "tunnel up"

run() {
  local name=$1 tmo=$2; shift 2
  wait_tunnel 15 || { status "$name SKIPPED (tunnel down)"; return 1; }
  status "$name start"
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  status "$name rc=$?"
}

# Ordered by evidence value per hour in case the tunnel returns late in the
# round: (1) the unwhitened comparison campaign (VERDICT item 1's other half,
# resumes its pre-outage run), (2) the post-step-time-fix whitened re-run
# (same settings as toy2d_whitened_r3, isolates the safe_cholesky
# custom_vmap + state-hoisting + full-batch speedup), (3) the headline bench,
# then the remaining scale/MESMOC campaigns.
run unwhitened 5400 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_unwhitened_r3

run whitened_fastchol 5400 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --whitened --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_whitened_r3_fastchol

run bench 7200 python -u bench.py

run mesmoc 1800 python -u examples/example_mesmoc_mfgp.py \
  --iters 12 --log-dir benchmarks/evidence/mesmoc_mfgp_r3

run bc512 10800 python -u examples/example_branin_currin_512.py \
  --iters 15 --track-recommendation \
  --log-dir benchmarks/evidence/branin_currin_512_r3

run q16 10800 python -u examples/example_batch_bo_10d.py \
  --iters 25 --track-recommendation \
  --log-dir benchmarks/evidence/batch10d_q16_r3

run dtlz2 12000 python -u examples/example_dtlz2_2048.py \
  --iters 3 --track-recommendation \
  --log-dir benchmarks/evidence/dtlz2_2048_r3

status "queue done"
