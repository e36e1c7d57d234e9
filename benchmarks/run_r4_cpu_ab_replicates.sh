#!/bin/bash
# Round-4 CPU A/B replicates (chained after run_r4_cpu_insurance.sh): the
# whitened-vs-unwhitened same-seed comparison at two additional seeds, so the
# BASELINE.md parameterization decision rests on 3 independent problem draws
# instead of one. Fast mode; quality metric is recommendation HV (timings on
# the contended 1-core host are garbage). Yields to the TPU queue on probe
# success; stuck detection and the chunk protocol come from queue_lib.sh.
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=cpu-r4-ab
. benchmarks/queue_lib.sh
echo $$ > /tmp/r4_ab_runner.pid

wait_for_pidfile_exit /tmp/r4_cpu_runner.pid
status "A/B replicate stage start"

for seed in 11 23; do
  run_chunked "toyw_s${seed}" toy_synthetic_2D_JESMOCMF.py \
    "benchmarks/evidence/toy2d_whitened_s${seed}_cpu_r4" 20 4 1800 \
    --fast --whitened --seed "$seed" || exit 0
  run_chunked "toyu_s${seed}" toy_synthetic_2D_JESMOCMF.py \
    "benchmarks/evidence/toy2d_unwhitened_s${seed}_cpu_r4" 20 4 1800 \
    --fast --seed "$seed" || exit 0
done
status "A/B replicate stage all done"
