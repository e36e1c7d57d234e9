"""10-D q=16 batch JESMOCMF campaign (BASELINE scale config #5).

New capability beyond the reference (which is q=1 only,
JESMOC_MFDGP.py:159): each BO iteration selects a fidelity with the
cost-normalized coupled-JES maximizer, then fills a q-point batch by greedy
local-penalization maximization — all candidate optimization on device.

Problem: 2 objectives + 1 constraint sampled from the MFDGP prior with
feasibility calibration (test_functions/prior_problem.py), d=10, 2
fidelities with costs 1:10.

Run: python examples/example_batch_bo_10d.py [--iters 6] [--q 16] [--fast]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEED = 11
D = 10


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=6)
    parser.add_argument("--q", type=int, default=16)
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--whitened", action="store_true",
                        help="whitened parameterization (recommended at "
                        "large m; see example_branin_currin_512.py)")
    parser.add_argument("--whitened-init", default="match",
                        choices=("match", "prior"),
                        help="'prior' = standard whitened-SVGP init "
                        "q(v)=N(0,I) — the measured at-scale "
                        "recommendation (docs/SCALING.md, bc512 A/B)")
    parser.add_argument("--log-dir", default="batch10d_logs")
    parser.add_argument(
        "--eval-highest-fidelity", action="store_true",
        help="always evaluate the selected batch at the top fidelity "
        "(reference eval_highest_fidelity) — makes the observed-HV "
        "trajectory move every iteration",
    )
    parser.add_argument(
        "--track-recommendation", action="store_true",
        help="per-iteration model recommendation scored on the true "
        "functions (6-tuple hypervolumes.txt, reference toy:533-618) — the "
        "optimization-progress metric; observed HV only moves on feasible "
        "top-fidelity evaluations, which the cost-normalized fidelity choice "
        "may legitimately defer for many iterations",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.util.cache import enable_compilation_cache
    enable_compilation_cache()
    from mobocmf_tpu.bo.loop import Blackbox, BOConfig, run_bo_loop
    from mobocmf_tpu.sampling import rff
    from mobocmf_tpu.test_functions.prior_problem import sample_problem
    from mobocmf_tpu.util.util import reset_random_state

    reset_random_state(SEED)
    objs, cons = sample_problem(jax.random.key(SEED), d=D, num_constraints=1)

    def make_fns(sample):
        return [
            lambda xs, s=sample, l=level: np.asarray(
                rff.eval_sample(s, jnp.asarray(np.atleast_2d(xs)), layer=l)
            )
            for level in range(2)
        ]

    blackboxes = [
        Blackbox("obj1", make_fns(objs[0])),
        Blackbox("obj2", make_fns(objs[1])),
        Blackbox("con1", make_fns(cons[0]), is_constraint=True, threshold=0.0),
    ]

    n_low, n_high = 30, 10
    x_init = np.random.default_rng(SEED).uniform(size=(n_low + n_high, D))
    fid_init = np.concatenate([np.zeros(n_low), np.ones(n_high)]).astype(int)

    common = dict(
        num_bo_iterations=args.iters, seed=SEED, log_dir=args.log_dir,
        q=args.q, pad_data=True,
        track_recommendation=args.track_recommendation,
        eval_highest_fidelity=args.eval_highest_fidelity,
        whitened=args.whitened, whitened_init=args.whitened_init,
    )
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
