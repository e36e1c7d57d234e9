"""DTLZ2 4-objective, 3-fidelity, 2048 inducing points (BASELINE scale
config #4 — no reference precedent; far beyond the reference's CPU reach).

Objectives: the four DTLZ2 objectives on [0,1]^6. Fidelities: the exact
functions at the top fidelity, with smooth sinusoidal distortion + bias at
the two lower fidelities (a standard multi-fidelity benchmark construction).
2048 initial points = 2048 inducing rows per layer (inducing = training
inputs, reference mfdgp.py:290-317); Pareto sampling is vmapped over the 4
objectives' function samples.

Default epochs are REDUCED (1000/2000 + 2000 conditioned) so one iteration
fits in tens of minutes at this scale; pass --full-epochs for the
reference schedule (5000/15000/15000).

Run: python examples/example_dtlz2_2048.py [--iters 1] [--n-init 2048]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEED = 13
D = 6
NUM_OBJ = 4


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=3)
    # 2040 initial points pad to the 2048 bucket (fit/bucketing.py), leaving
    # headroom so a multi-iteration campaign trains m = 2048 inducing
    # throughout with zero bucket-boundary recompiles (starting at exactly
    # 2048 crosses into the next bucket on iteration 1)
    parser.add_argument("--n-init", type=int, default=2040)
    parser.add_argument("--full-epochs", action="store_true")
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--whitened", action="store_true",
                        help="whitened parameterization (recommended at "
                        "large m; see example_branin_currin_512.py)")
    parser.add_argument("--whitened-init", default="match",
                        choices=("match", "prior"),
                        help="'prior' = standard whitened-SVGP init "
                        "q(v)=N(0,I) — the measured at-scale "
                        "recommendation (docs/SCALING.md, bc512 A/B)")
    parser.add_argument("--log-dir", default="dtlz2_2048_logs")
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
    from mobocmf_tpu.test_functions.synthetic import dtlz2
    from mobocmf_tpu.util.util import reset_random_state

    reset_random_state(SEED)

    def mf_obj(i):
        def distort(xs, level):
            xs = np.atleast_2d(np.asarray(xs, dtype=float))
            base = dtlz2(xs, NUM_OBJ)[:, i]
            if level == 2:
                return base
            amp = 0.1 * (2 - level)
            return (
                base
                + amp * np.mean(np.sin(6.0 * np.pi * xs), axis=1)
                + 0.05 * (2 - level)
            )

        return [lambda xs, l=level: distort(xs, l) for level in range(3)]

    blackboxes = [
        Blackbox(
            f"obj{i + 1}", mf_obj(i), costs=(1.0, 5.0, 25.0)
        )
        for i in range(NUM_OBJ)
    ]

    n = args.n_init
    n0, n1 = n // 2, n // 4
    n2 = n - n0 - n1
    x_init = np.random.default_rng(SEED).uniform(size=(n, D))
    fid_init = np.concatenate(
        [np.zeros(n0), np.ones(n1), np.full(n2, 2)]
    ).astype(int)

    common = dict(
        num_fidelities=3, num_bo_iterations=args.iters, seed=SEED,
        log_dir=args.log_dir,
        track_recommendation=args.track_recommendation,
        whitened=args.whitened, whitened_init=args.whitened_init,
        # full batch (batch_size=None): the m=2048 inducing Cholesky is paid
        # once per optimizer step either way, so minibatching only multiplies
        # factorizations per epoch
    )
    if args.fast:
        config = BOConfig(
            num_epochs_1=10, num_epochs_2=20, opt_grid_size=50,
            pareto_set_size=10, **common,
        )
    elif args.full_epochs:
        config = BOConfig(acq_maxiter=15, acq_raw_samples=64, **common)
    else:
        config = BOConfig(
            num_epochs_1=1000, num_epochs_2=2000, acq_maxiter=15, acq_raw_samples=64, **common
        )

    state = run_bo_loop(blackboxes, x_init, fid_init, config)
    print(f"final: {state.x.shape[0]} points, observed HV trajectory "
          f"{[round(h, 4) for h in state.hypervolumes]}")


if __name__ == "__main__":
    main()
