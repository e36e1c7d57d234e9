"""Constrained Branin-Currin, 2 fidelities, 512 inducing points
(BASELINE scale config #3 — no reference precedent; the reference tops out
at tens of points on CPU).

Objectives: Branin (scaled to [0,1]^2, Perdikaris low-fidelity pairing) and
Currin exponential (Xiong smoothing as low fidelity). Constraint: the disk
c(x) = 0.25 - ||x-0.5||^2 >= 0 at both fidelities. 512 initial points =
512 inducing points per layer (inducing = training inputs, reference
mfdgp.py:290-317).

Run: python examples/example_branin_currin_512.py [--iters 3] [--fast]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEED = 7


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=15)
    # 490 initial points pad to the 512 bucket (fit/bucketing.py), so a
    # 15-22 iteration campaign trains m = 512 inducing THROUGHOUT with zero
    # bucket-boundary recompiles (round 2 started at 512 exactly: iteration 1
    # crossed into the 768 bucket, recompiling + inflating that iteration to
    # 824 s — the outlier VERDICT r2 flagged)
    parser.add_argument("--n-init", type=int, default=490)
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--whitened", action="store_true",
                        help="whitened parameterization — at m=512 the "
                        "unwhitened KL's m^T K^-1 m is stiff along near-"
                        "duplicate inducing directions (phase-2 divergence, "
                        "benchmarks/diag_bc512_divergence.py); whitening "
                        "removes K^-1 from the KL")
    parser.add_argument("--whitened-init", default="match",
                        choices=("match", "prior"),
                        help="'prior' = standard whitened-SVGP init "
                        "q(u)=N(0,Kzz), scale-independent (docs/SCALING.md)")
    parser.add_argument("--log-dir", default="bc512_logs")
    parser.add_argument(
        "--track-recommendation", action="store_true",
        help="per-iteration model recommendation scored on the true "
        "functions (6-tuple hypervolumes.txt) — the optimization-progress "
        "metric",
    )
    args = parser.parse_args()

    from mobocmf_tpu.util.cache import enable_compilation_cache
    enable_compilation_cache()
    from mobocmf_tpu.bo.loop import Blackbox, BOConfig, run_bo_loop
    from mobocmf_tpu.test_functions import synthetic as S
    from mobocmf_tpu.util.util import reset_random_state

    reset_random_state(SEED)

    blackboxes = [
        Blackbox("branin", [S.branin_scaled_low, S.branin_scaled]),
        Blackbox("currin", [S.currin_low, S.currin]),
        Blackbox(
            "disk",
            [S.disk_constraint, S.disk_constraint],
            is_constraint=True,
            threshold=0.0,
        ),
    ]

    n_high = args.n_init // 4
    n_low = args.n_init - n_high
    x_init = np.random.default_rng(SEED).uniform(size=(args.n_init, 2))
    fid_init = np.concatenate([np.zeros(n_low), np.ones(n_high)]).astype(int)

    common = dict(num_bo_iterations=args.iters, seed=SEED, log_dir=args.log_dir,
                  track_recommendation=args.track_recommendation,
                  whitened=args.whitened, whitened_init=args.whitened_init)
    if args.fast:
        config = BOConfig(
            num_epochs_1=10, num_epochs_2=20, opt_grid_size=50,
            pareto_set_size=10, **common,
        )
    else:
        config = BOConfig(**common)

    state = run_bo_loop(blackboxes, x_init, fid_init, config)
    print(f"final: {state.x.shape[0]} points, observed HV trajectory "
          f"{[round(h, 4) for h in state.hypervolumes]}")


if __name__ == "__main__":
    main()
