#!/bin/bash
# Round-4 CPU insurance queue (tunnel still down after ~30h): fast-mode CPU
# campaigns whose metric is recommendation-HV movement (timings on the
# contended 1-core host are garbage and documented as such). Consolidates the
# three chained r3 insurance stages into ONE script, reordered by value:
#   1. toyw/toyu   same-seed whitened-vs-unwhitened A/B, 20 iters each
#                  (VERDICT item 3 — quality comparison is CPU-valid)
#   2. bc512f      Branin-Currin@512 fast, 5 iters, rec-HV (VERDICT item 2)
#   3. q16         resume batch10d_q16_cpu_r3 10 -> 12 (closes the r3
#                  "stopped at 10/12" weak point); 3h chunks because late
#                  iterations now exceed the old 1h chunk budget
#   4. dtlz2f      DTLZ2@2048 fast, 2 iters
# Every chunk re-probes the tunnel and yields to the TPU queue on success.
# Zero-progress stuck detection and the shared chunk protocol live in
# queue_lib.sh (the r3 q16 job wedged overnight on exactly the
# no-stuck-detection failure mode).
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=cpu-r4
. benchmarks/queue_lib.sh
echo $$ > /tmp/r4_cpu_runner.pid

status "cpu insurance start"
run_chunked toyw toy_synthetic_2D_JESMOCMF.py \
  benchmarks/evidence/toy2d_whitened_cpu_r4 20 4 1800 --fast --whitened || exit 0
run_chunked toyu toy_synthetic_2D_JESMOCMF.py \
  benchmarks/evidence/toy2d_unwhitened_cpu_r4 20 4 1800 --fast || exit 0
run_chunked bc512f example_branin_currin_512.py \
  benchmarks/evidence/branin_currin_512_cpu_r4 5 1 5400 --fast || exit 0
run_chunked q16 example_batch_bo_10d.py \
  benchmarks/evidence/batch10d_q16_cpu_r3 12 1 10800 --fast || exit 0
run_chunked dtlz2f example_dtlz2_2048.py \
  benchmarks/evidence/dtlz2_2048_cpu_r4 2 1 7200 --fast || exit 0
status "cpu insurance all done"
