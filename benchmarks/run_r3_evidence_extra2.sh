#!/bin/bash
# Round-3 third evidence stage. Waits for the extra queue
# (run_r3_evidence_extra.sh, PID in /tmp/r3_extra_runner.pid) to finish,
# then runs the explicit-inverse acquisition A/B (both arms; the flag is
# read at import so each arm is its own process). Logs to /tmp/r3_*.log.
set -u
cd "$(dirname "$0")/.."

status() { echo "$(date '+%F %T') [extra2] $*" >> /tmp/r3_queue_status; }

probe() { timeout 60 python -c "import jax, jax.numpy as jnp; jnp.ones((4,4)).block_until_ready()" 2>/dev/null; }

wait_tunnel() {
  local tries=${1:-15}
  for _ in $(seq 1 "$tries"); do
    probe && return 0
    sleep 120
  done
  return 1
}

if [ -f /tmp/r3_extra_runner.pid ]; then
  PREV=$(cat /tmp/r3_extra_runner.pid)
  while kill -0 "$PREV" 2>/dev/null; do sleep 120; done
fi
status "extra queue finished; starting extra2 jobs"

run() {
  local name=$1 tmo=$2; shift 2
  wait_tunnel 15 || { status "$name SKIPPED (tunnel down)"; return 1; }
  status "$name start"
  timeout "$tmo" "$@" > "/tmp/r3_${name}.log" 2>&1
  status "$name rc=$?"
}

run ab_acq_solves 1800 python -u benchmarks/ab_acq_inv.py
run ab_acq_inv 1800 env MOBOCMF_ACQ_INV=1 python -u benchmarks/ab_acq_inv.py

status "extra2 queue done"
