#!/bin/bash
# Round-5 TPU evidence queue. VERDICT r4 is unambiguous: "round 5 gets no
# such tension: campaigns lead." The scale-config matched-regret campaigns
# (BASELINE configs #3-#5, VERDICT item 1 for the third consecutive round)
# run FIRST, before any microbenchmark; the cache is already warm for the
# toy-config programs from round 4's bench run, so the driver's end-of-round
# bench.py stays warm regardless.
#   1. bc512        (<=4 h)  VERDICT item 1: Branin-Currin@512, 15 iters, rec-HV
#   2. q16          (<=3 h)  VERDICT item 1: 10-D q=16, 25 iters — the config
#                            that has "never run at full settings anywhere"
#   3. dtlz2        (<=3 h)  VERDICT item 1: DTLZ2@2048 4-obj/3-fid, 3 iters
#   4. whitened_r5  (<=1.5h) VERDICT items 2+3: full-settings whitened arm,
#                            60 iters — the A/B decider + the pareto-phase
#                            9.0s-vs-3.4s distributional evidence
#   5. unwhitened   (<=1.5h) VERDICT item 2: resume the frozen r3 arm 10->60
#   6. mesmoc       (<=0.5h) VERDICT item 4: MESMOC_MFGP TPU campaign, 12 iters
#   7. ab_acq_solves/ab_acq_inv (0.5 h each) VERDICT item 5
#   8. scale_bench  (<=1.5h) VERDICT missing-item 5: m=512/1024/2048 refresh
#                            after the round-3b step-time work
#   9. dtlz2_ext    extend DTLZ2 3->5 iters (resume-safe) if time remains
#  10. bench        headline warm refresh (driver re-runs it at round end)
# Campaigns are resume-safe (reruns replay evaluated points). Every job runs
# with the in-process stall watchdog armed (exit 86 on a hung device RPC)
# and is retried on 86/124 (queue_lib.sh).
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=r5
. benchmarks/queue_lib.sh
echo $$ > /tmp/r5_tpu_runner.pid
export MOBOCMF_STALL_TIMEOUT_S=${MOBOCMF_STALL_TIMEOUT_S:-3600}

status "queue start; waiting for tunnel (watchdog ${MOBOCMF_STALL_TIMEOUT_S}s)"
wait_tunnel 400 || { status "tunnel never came back"; exit 1; }
status "tunnel up"
touch /tmp/r5_tunnel_up

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

run_tpu_job scale_bench 5400 python -u benchmarks/scale_bench.py \
  --out benchmarks/scale_bench_results_r5.json

run_tpu_job dtlz2_ext 10800 python -u examples/example_dtlz2_2048.py \
  --iters 5 --track-recommendation \
  --log-dir benchmarks/evidence/dtlz2_2048_r5

run_tpu_job bench 7200 python -u bench.py

status "r5 queue done"
