#!/bin/bash
# Round-5 TPU queue, v7 — relaunch of the v6 long-horizon arms after the
# 21:37 VM reboot killed v6 mid-run (bc512_wprior_ext reached 24/30; the
# 24-iter MESMOC never started). Deadline-capped: every job timeout is
# clamped to a hard wall-clock stop so the box is IDLE when the driver
# runs the end-of-round bench (a queue job contending with bench.py on
# the 1-core host would corrupt BENCH_r05.json).
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=r5v7
. benchmarks/queue_lib.sh
echo $$ > /tmp/r5_tpu_runner_v7.pid
export MOBOCMF_STALL_TIMEOUT_S=${MOBOCMF_STALL_TIMEOUT_S:-1800}

# Hard stop: 23:08 UTC today (round end ~23:15; bench needs an idle box).
DEADLINE=$(date -d '23:08' +%s)
remaining() { echo $(( DEADLINE - $(date +%s) )); }

# Deadline-aware job: like run_tpu_job but every (re)attempt's timeout is
# clamped to the time left, so a rc=124 retry can't blow past the deadline.
run_deadline_job() {
  local name=$1 minfloor=$2; shift 2
  local attempt rc r
  for attempt in 1 2 3; do
    r=$(remaining)
    [ "$r" -gt "$minfloor" ] || { status "$name skipped (only ${r}s left)"; return 77; }
    wait_tunnel 2 || { status "$name SKIPPED (tunnel down)"; return 1; }
    status "$name start (attempt $attempt, ${r}s budget)"
    timeout "$r" "$@" >> "/tmp/${QUEUE_PREFIX}_${name}.log" 2>&1
    rc=$?
    status "$name rc=$rc (attempt $attempt)"
    case "$rc" in
      86|124) continue ;;
      *) return "$rc" ;;
    esac
  done
  return "$rc"
}

status "v7 queue start; $(remaining)s to deadline"
wait_tunnel 5 || { status "tunnel down at launch"; exit 1; }

run_deadline_job bc512_wprior_ext 300 python -u examples/example_branin_currin_512.py \
  --iters 30 --whitened --whitened-init prior --track-recommendation \
  --log-dir benchmarks/evidence/branin_currin_512_wprior_r5

run_deadline_job mesmoc24 900 python -u examples/example_mesmoc_mfgp.py \
  --iters 24 --log-dir benchmarks/evidence/mesmoc_mfgp_24_r5

status "r5 v7 queue done; $(remaining)s spare"
