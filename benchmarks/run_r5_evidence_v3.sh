#!/bin/bash
# Round-5 TPU queue, v3 — takes over after the v2 runner's bc512 job landed
# all 15 unwhitened iterations. Adds the bc512 WHITENED arm: the m=512
# divergence diagnosis (benchmarks/diag_bc512_divergence.py) showed the
# unwhitened phase-2 instability is an optimization property of the KL's
# m^T K^-1 m at a numerically singular Kzz (inducing = 490 near-uniform
# points; min eig ~ -4e-14 from iteration 0) — the whitened parameterization
# moves that stiffness into the init (|m_w| ~ 285) instead; which geometry
# wins AT SCALE is exactly what the same-seed whitened arm measures.
#   1. q16           resume -> 25 iters (scale config #5)
#   2. dtlz2         3 iters @ m=2048 (scale config #4)
#   3. bc512_whitened 15 iters, same seed as the landed unwhitened arm
#   4. whitened_r5   60 toy iters full settings (A/B decider arm)
#   5. unwhitened    resume toy r3 arm 10 -> 60 (A/B other arm)
#   6. mesmoc        12 iters
#   7. ab_step_time  train+cond lever A/B (flat adam / fused cond)
#   8. ab_acq_solves/ab_acq_inv  acquisition explicit-inverse A/B
#   9. bench         headline warm refresh
#  10. scale_bench   m=512/1024/2048 refresh
#  11. dtlz2_ext     extend dtlz2 3 -> 5 iters if time remains
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=r5
. benchmarks/queue_lib.sh
echo $$ > /tmp/r5_tpu_runner.pid
export MOBOCMF_STALL_TIMEOUT_S=${MOBOCMF_STALL_TIMEOUT_S:-3600}

status "v3 queue start (bc512 unwhitened landed; whitened arm added)"
wait_tunnel 400 || { status "tunnel never came back"; exit 1; }
status "tunnel up"

run_tpu_job q16 10800 python -u examples/example_batch_bo_10d.py \
  --iters 25 --track-recommendation \
  --log-dir benchmarks/evidence/batch10d_q16_r5

run_tpu_job dtlz2 10800 python -u examples/example_dtlz2_2048.py \
  --iters 3 --track-recommendation \
  --log-dir benchmarks/evidence/dtlz2_2048_r5

run_tpu_job bc512_whitened 14400 python -u examples/example_branin_currin_512.py \
  --iters 15 --whitened --track-recommendation \
  --log-dir benchmarks/evidence/branin_currin_512_whitened_r5

run_tpu_job whitened_r5 7200 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --whitened --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_whitened_r5

run_tpu_job unwhitened 7200 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_unwhitened_r3

run_tpu_job mesmoc 1800 python -u examples/example_mesmoc_mfgp.py \
  --iters 12 --log-dir benchmarks/evidence/mesmoc_mfgp_r5

run_tpu_job ab_step_time 3600 python -u benchmarks/ab_step_time.py

run_tpu_job ab_acq_solves 1800 python -u benchmarks/ab_acq_inv.py
run_tpu_job ab_acq_inv 1800 env MOBOCMF_ACQ_INV=1 python -u benchmarks/ab_acq_inv.py

run_tpu_job bench 7200 python -u bench.py

run_tpu_job scale_bench 5400 python -u benchmarks/scale_bench.py \
  --out benchmarks/scale_bench_results_r5.json

run_tpu_job dtlz2_ext 10800 python -u examples/example_dtlz2_2048.py \
  --iters 5 --track-recommendation \
  --log-dir benchmarks/evidence/dtlz2_2048_r5

status "r5 v3 queue done"
