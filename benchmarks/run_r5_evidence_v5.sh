#!/bin/bash
# Round-5 TPU queue, v5 — validates the new at-scale recommendation
# (--whitened --whitened-init prior, measured best on bc512) at the two
# remaining scale configs:
#   dtlz2_wprior  m=2048, 4 objectives, 3 fidelities — the harshest config
#   q16_wprior    10-D q=16 batch — the beyond-reference config
# Both same-seed with their landed unwhitened r5 arms, so the comparison is
# like-for-like. Runs after the v4 runner exits (it already has).
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=r5
. benchmarks/queue_lib.sh
echo $$ > /tmp/r5_tpu_runner_v5.pid
export MOBOCMF_STALL_TIMEOUT_S=${MOBOCMF_STALL_TIMEOUT_S:-3600}

status "v5 queue waiting for v4 runner to exit"
wait_for_pidfile_exit /tmp/r5_tpu_runner_v4.pid
status "v5 queue start (wprior validation at dtlz2/q16)"
wait_tunnel 400 || { status "tunnel never came back"; exit 1; }

run_tpu_job dtlz2_wprior 14400 python -u examples/example_dtlz2_2048.py \
  --iters 3 --whitened --whitened-init prior --track-recommendation \
  --log-dir benchmarks/evidence/dtlz2_2048_wprior_r5

run_tpu_job q16_wprior 14400 python -u examples/example_batch_bo_10d.py \
  --iters 12 --whitened --whitened-init prior --track-recommendation \
  --log-dir benchmarks/evidence/batch10d_q16_wprior_r5

status "r5 v5 queue done"
