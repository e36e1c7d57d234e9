#!/bin/bash
# Round-3 follow-up evidence queue. Waits for the MAIN queue
# (run_r3_evidence.sh, PID in /tmp/r3_runner.pid) to finish, then runs
# lower-priority jobs: the r3 scale-bench refresh (captures the round-3
# step-time work: safe_cholesky custom_vmap, state hoisting) and a
# device-polish whitened campaign (the TPU-native polish path's quality/perf
# evidence vs the host-SLSQP parity default).
set -u
cd "$(dirname "$0")/.."

status() { echo "$(date '+%F %T') [extra] $*" >> /tmp/r3_queue_status; }

probe() { timeout 60 python -c "import jax, jax.numpy as jnp; jnp.ones((4,4)).block_until_ready()" 2>/dev/null; }

wait_tunnel() {
  local tries=${1:-15}
  for _ in $(seq 1 "$tries"); do
    probe && return 0
    sleep 120
  done
  return 1
}

# wait for the main runner to exit (it owns the box while alive)
if [ -f /tmp/r3_runner.pid ]; then
  MAIN=$(cat /tmp/r3_runner.pid)
  while kill -0 "$MAIN" 2>/dev/null; do sleep 120; done
fi
status "main queue finished; starting extra jobs"

run() {
  local name=$1 tmo=$2; shift 2
  wait_tunnel 15 || { status "$name SKIPPED (tunnel down)"; return 1; }
  status "$name start"
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  status "$name rc=$?"
}

run scale_bench 5400 python -u benchmarks/scale_bench.py \
  --out benchmarks/scale_bench_results_r3.json

run toy_device_polish 5400 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --whitened --polish device --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_whitened_devpolish_r3

status "extra queue done"
