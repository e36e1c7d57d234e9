#!/bin/bash
# Round-5 TPU queue, v6 — long-horizon arms on the now-idle chip:
#   bc512_wprior_ext  resume the recommended-geometry bc512 arm 15 -> 30
#                     iterations (long-horizon stability of the at-scale
#                     recommendation; also exercises resume +
#                     process_starts.txt on TPU)
#   mesmoc24          fresh 24-iteration MESMOC/MFGP campaign (the r5
#                     12-iter run peaked at 0.003% gap but ended at 0.51%;
#                     a longer horizon shows whether the recommendation
#                     re-tightens)
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=r5
. benchmarks/queue_lib.sh
echo $$ > /tmp/r5_tpu_runner_v6.pid
export MOBOCMF_STALL_TIMEOUT_S=${MOBOCMF_STALL_TIMEOUT_S:-3600}

status "v6 queue waiting for v5 runner to exit"
wait_for_pidfile_exit /tmp/r5_tpu_runner_v5.pid
status "v6 queue start (long-horizon arms)"
wait_tunnel 400 || { status "tunnel never came back"; exit 1; }

run_tpu_job bc512_wprior_ext 14400 python -u examples/example_branin_currin_512.py \
  --iters 30 --whitened --whitened-init prior --track-recommendation \
  --log-dir benchmarks/evidence/branin_currin_512_wprior_r5

run_tpu_job mesmoc24 7200 python -u examples/example_mesmoc_mfgp.py \
  --iters 24 --log-dir benchmarks/evidence/mesmoc_mfgp_24_r5

status "r5 v6 queue done"
