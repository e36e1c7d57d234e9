#!/bin/bash
# Round-4 TPU evidence queue. Successor of run_r3_evidence_v2.sh, which spent
# all of round 3 waiting out the ~30h+ tunnel outage and never ran a job.
# Jobs ordered by judge value per hour (VERDICT round-3 "Next round" items).
# REORDERED for round-4 session 2: the tunnel came back with ~10 h of round
# left against an ~18 h nominal queue, and round 3's single worst gap was the
# null BENCH record — so the headline bench and the round-3b step-time
# measurement run FIRST, guaranteed to land even if the round is cut short:
#   1. bench         (2 h)    VERDICT item 1: headline refresh; ALSO warms the
#                             compilation cache for the driver's end-of-round run
#   2. whitened_r4   (1.5 h)  VERDICT items 1+5: TPU wall-clock of the round-3b
#                             step-time work (custom_vmap safe_cholesky 3->1,
#                             29->18 solve hoisting, full-batch perm skip) vs
#                             the pre-fix toy2d_whitened_r3 arm
#   3. mesmoc        (0.5 h)  VERDICT item 4: TPU campaign with moving HV
#   4. bc512         (3 h)    VERDICT item 2: Branin-Currin@512, 15 iters, rec-HV
#   5. unwhitened    (1.5 h)  VERDICT item 3: resume the frozen arm 10 -> 60
#   6. ab_acq_solves/ab_acq_inv (0.5 h each) VERDICT item 5: explicit-inverse A/B
#   7. q16           (3 h)    VERDICT item 2: 10-D q=16, 25 iters
#   8. dtlz2         (3 h)    VERDICT item 2: DTLZ2@2048, >=3 iters
#   9. scale_bench   (1.5 h)  refresh ELBO steps/s + Cholesky GFLOP/s
#  10. toy_device_polish (1.5 h) device-polish quality/perf arm
# Campaigns are resume-safe (reruns replay evaluated points). Every job runs
# with the in-process stall watchdog armed (exit 86 on a hung device RPC —
# the round-3 outage failure mode) and is retried on 86/124 (queue_lib.sh).
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=r4
. benchmarks/queue_lib.sh
echo $$ > /tmp/r4_tpu_runner.pid
export MOBOCMF_STALL_TIMEOUT_S=${MOBOCMF_STALL_TIMEOUT_S:-3600}

status "queue start; waiting for tunnel (watchdog ${MOBOCMF_STALL_TIMEOUT_S}s)"
wait_tunnel 400 || { status "tunnel never came back"; exit 1; }
status "tunnel up"
touch /tmp/r4_tunnel_up

run_tpu_job bench 7200 python -u bench.py

run_tpu_job whitened_r4 5400 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --whitened --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_whitened_r4

run_tpu_job mesmoc 1800 python -u examples/example_mesmoc_mfgp.py \
  --iters 12 --log-dir benchmarks/evidence/mesmoc_mfgp_r4

run_tpu_job bc512 10800 python -u examples/example_branin_currin_512.py \
  --iters 15 --track-recommendation \
  --log-dir benchmarks/evidence/branin_currin_512_r4

run_tpu_job unwhitened 5400 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_unwhitened_r3

run_tpu_job ab_acq_solves 1800 python -u benchmarks/ab_acq_inv.py
run_tpu_job ab_acq_inv 1800 env MOBOCMF_ACQ_INV=1 python -u benchmarks/ab_acq_inv.py

run_tpu_job q16 10800 python -u examples/example_batch_bo_10d.py \
  --iters 25 --track-recommendation \
  --log-dir benchmarks/evidence/batch10d_q16_r4

run_tpu_job dtlz2 10800 python -u examples/example_dtlz2_2048.py \
  --iters 3 --track-recommendation \
  --log-dir benchmarks/evidence/dtlz2_2048_r4

run_tpu_job scale_bench 5400 python -u benchmarks/scale_bench.py \
  --out benchmarks/scale_bench_results_r4.json

run_tpu_job toy_device_polish 5400 python -u examples/toy_synthetic_2D_JESMOCMF.py \
  --iters 60 --whitened --polish device --track-recommendation \
  --log-dir benchmarks/evidence/toy2d_whitened_devpolish_r4

status "r4 queue done"
