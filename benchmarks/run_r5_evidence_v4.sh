#!/bin/bash
# Round-5 TPU queue, v4 — runs AFTER the v3 runner exits (waits on its
# pidfile). Adds the third-geometry scale arm the bc512 A/B made necessary:
#   unwhitened          landed: best fits (neg-ELBO to -4e3) but diverged at
#                       iters 5/13 (KL stiff at the numerically singular Kzz)
#   whitened (match)    landed: monotone descent every iteration but the init
#                       conversion manufactures |m_w|~285, plateaus at 2.2e6
#                       neg-ELBO -> looser rec-HV (0.106% vs 0.048% last-5)
#   whitened (prior)    THIS ARM: standard whitened-SVGP init (m_w=0,
#                       L_w=I·1e-1-ish) — the SCALING.md diagnostic showed it
#                       descends monotonically to 1.5e5, overtaking match-init;
#                       whether that converts to tighter campaign rec-HV at the
#                       same seed is exactly what this measures.
set -u
cd "$(dirname "$0")/.."
STATUS_TAG=r5
. benchmarks/queue_lib.sh
echo $$ > /tmp/r5_tpu_runner_v4.pid
export MOBOCMF_STALL_TIMEOUT_S=${MOBOCMF_STALL_TIMEOUT_S:-3600}

status "v4 queue waiting for v3 runner to exit"
wait_for_pidfile_exit /tmp/r5_tpu_runner.pid
status "v4 queue start (three-geometry bc512 arm)"
wait_tunnel 400 || { status "tunnel never came back"; exit 1; }

run_tpu_job bc512_wprior 14400 python -u examples/example_branin_currin_512.py \
  --iters 15 --whitened --whitened-init prior --track-recommendation \
  --log-dir benchmarks/evidence/branin_currin_512_wprior_r5

status "r5 v4 queue done"

# Appended 15:45 (append-at-EOF is safe for a running bash script): the v3
# ab_step_time run failed on a child sys.path bug (fixed in ab_step_time.py
# — children now get the repo root on PYTHONPATH); re-measure on the TPU
# after the wprior arm.
run_tpu_job ab_step_time2 3600 python -u benchmarks/ab_step_time.py
status "r5 v4 queue done (incl. ab_step_time rerun)"

# Appended 16:55 (append-at-EOF safe): endgame bench reruns. The acq
# explicit-inverse A/B landed 8.7x on TPU (evidence/ab_acq_inv_r5.txt) and
# the default flips ON once the wprior solve-path arm above has finished;
# these two runs measure the end-to-end iteration with the winning flags so
# the headline row and the flat-Adam decision rest on full-iteration data,
# not just the microbench.
run_tpu_job bench_acqinv 7200 env MOBOCMF_ACQ_INV=1 python -u bench.py
run_tpu_job bench_final 7200 env MOBOCMF_ACQ_INV=1 MOBOCMF_FLAT_ADAM=1 python -u bench.py
status "r5 v4 queue done (incl. endgame bench reruns)"
