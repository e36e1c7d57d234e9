#!/bin/bash
# Round-5 TPU queue, v2. v1's bc512 campaign NaN'd at iteration 5: Branin-
# scale outputs push trained outputscales to ~1e3-1e4, where the ABSOLUTE
# safe_cholesky escalation ladder is below f32 Gram rounding once near-
# duplicate inducing rows appear (fixed: scale-relative jitter floors,
# linalg/ops.py; fail-fast on non-finite trained params, fit/fitter.py).
# v1 was killed and this runner resumes everything on the fixed code:
#   1. bc512        resume 5 -> 15 iters (the NaN'd campaign, top judge value)
#   2. q16          resume -> 25 iters (was mid-run on old code when killed)
#   3. dtlz2        3 iters @ m=2048
#   4. whitened_r5  60 iters full settings (A/B decider + pareto-phase dist)
#   5. unwhitened   resume r3 arm 10 -> 60 (same-seed A/B other arm)
#   6. mesmoc       12 iters
#   7. ab_acq_solves/ab_acq_inv  acquisition explicit-inverse A/B
#   8. ab_step_time train+cond step-time levers (flat Adam / fused cond)
#   9. scale_bench  m=512/1024/2048 refresh on the fixed linalg
#  10. dtlz2_ext    extend dtlz2 3 -> 5 iters if time remains
#  11. bench        headline warm refresh
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=r5
. benchmarks/queue_lib.sh
echo $$ > /tmp/r5_tpu_runner.pid
export MOBOCMF_STALL_TIMEOUT_S=${MOBOCMF_STALL_TIMEOUT_S:-3600}

status "v2 queue start (post safe_cholesky fix)"
wait_tunnel 400 || { status "tunnel never came back"; exit 1; }
status "tunnel up"

run_tpu_job bc512 14400 python -u examples/example_branin_currin_512.py \
  --iters 15 --track-recommendation \
  --log-dir benchmarks/evidence/branin_currin_512_r5

run_tpu_job q16 10800 python -u examples/example_batch_bo_10d.py \
  --iters 25 --track-recommendation \
  --log-dir benchmarks/evidence/batch10d_q16_r5

run_tpu_job dtlz2 10800 python -u examples/example_dtlz2_2048.py \
  --iters 3 --track-recommendation \
  --log-dir benchmarks/evidence/dtlz2_2048_r5

run_tpu_job whitened_r5 7200 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --whitened --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_whitened_r5

run_tpu_job unwhitened 7200 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_unwhitened_r3

run_tpu_job mesmoc 1800 python -u examples/example_mesmoc_mfgp.py \
  --iters 12 --log-dir benchmarks/evidence/mesmoc_mfgp_r5

run_tpu_job ab_acq_solves 1800 python -u benchmarks/ab_acq_inv.py
run_tpu_job ab_acq_inv 1800 env MOBOCMF_ACQ_INV=1 python -u benchmarks/ab_acq_inv.py

run_tpu_job ab_step_time 3600 python -u benchmarks/ab_step_time.py

run_tpu_job scale_bench 5400 python -u benchmarks/scale_bench.py \
  --out benchmarks/scale_bench_results_r5.json

run_tpu_job dtlz2_ext 10800 python -u examples/example_dtlz2_2048.py \
  --iters 5 --track-recommendation \
  --log-dir benchmarks/evidence/dtlz2_2048_r5

run_tpu_job bench 7200 python -u bench.py

status "r5 v2 queue done"
