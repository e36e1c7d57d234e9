"""Full JESMOCMF BO loop on a model-generated 2-D synthetic problem.

Mirror of /root/reference/examples/toy_synthetic_2D_JESMOCMF/
toy_synthetic_2D_JESMOCMF.py: the ground-truth objectives/constraints are
sampled from the MFDGP prior via RFF (constraints rejection-sampled to a
10-90% feasibility ratio, toy:60-76), initial data is 10 low + 5 high fidelity
points, and each BO iteration retrains from scratch, samples a Pareto
solution, trains the conditioned models, and maximizes the cost-normalized
coupled JES acquisition (costs 1.0 / 10.0). Hypervolume of the feasible
high-fidelity observations is logged each iteration with file-based resume.

Run: python examples/toy_synthetic_2D_JESMOCMF.py [--iters N] [--fast]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

SEED = 4


def sample_problem(key, d=2, num_constraints=2, max_tries=30):
    """Prior-sampled objectives + feasibility-calibrated constraints
    (reference toy:50-96; shared generator in test_functions/prior_problem)."""
    from mobocmf_tpu.test_functions.prior_problem import sample_problem as _sp

    return _sp(key, d=d, num_constraints=num_constraints, max_tries=max_tries)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=60)
    parser.add_argument("--fast", action="store_true")
    parser.add_argument("--eval-highest-fidelity", action="store_true")
    parser.add_argument("--log-dir", default="toy2d_logs")
    parser.add_argument(
        "--track-recommendation", action="store_true",
        help="per-iteration model recommendation + 6-tuple hypervolumes.txt "
        "(reference toy:533-618)",
    )
    parser.add_argument(
        "--dump-params", action="store_true",
        help="kernel hyperparameter dumps to <log-dir>/params/ (toy:230-257)",
    )
    parser.add_argument(
        "--plots", action="store_true",
        help="predictive/acquisition contour PDFs to <log-dir>/plots/ "
        "(toy:139-226,484-493)",
    )
    parser.add_argument("--store-models", action="store_true",
                        help="orbax-checkpoint trained models per iteration")
    parser.add_argument("--load-models", action="store_true",
                        help="restore per-iteration models instead of retraining")
    parser.add_argument("--no-pad-data", action="store_true",
                        help="exact reference shapes (recompiles as N grows)")
    parser.add_argument("--polish", choices=("slsqp", "device", "none"),
                        default="slsqp",
                        help="Pareto-sampling polish backend: slsqp = host "
                        "scipy (reference semantics), device = multi-start "
                        "penalty L-BFGS fully on device")
    parser.add_argument("--warm-start", action="store_true",
                        help="warm-start each iteration's models from the "
                        "previous iteration (the reference ships this "
                        "commented out, toy:333-357; default off = reference "
                        "behavior)")
    parser.add_argument("--acquisition", choices=("jesmoc", "random"),
                        default="jesmoc",
                        help="candidate selection: the full JES pipeline or "
                        "the reference's Random_choice baseline")
    parser.add_argument("--whitened", action="store_true",
                        help="whitened inducing-point parameterization (the "
                        "BASELINE north-star redesign of the reference's "
                        "unwhitened strategy, mfdgp_hidden_layer.py:141-146)")
    parser.add_argument("--seed", type=int, default=SEED,
                        help="campaign seed: problem draw (calibrated prior "
                        "sample), initial design, and BO loop. Default is "
                        "the reference's SEED=4 (toy:22); other values give "
                        "replicate campaigns for A/B statistics")
    args = parser.parse_args()
    seed = args.seed

    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.util.cache import enable_compilation_cache
    enable_compilation_cache()
    from mobocmf_tpu.bo.loop import Blackbox, BOConfig, run_bo_loop
    from mobocmf_tpu.sampling import rff
    from mobocmf_tpu.util.util import reset_random_state

    # one seeded stream: the problem (incl. its calibration probe) is a pure
    # function of jax.random.key(SEED), and the initial design comes from an
    # explicitly-seeded numpy Generator — identical campaigns from identical
    # SEED with no global-RNG coupling (reference splits this across torch
    # and numpy globals, toy:22-23)
    reset_random_state(seed)  # reference-parity global seeding (util.py:70-72)
    objs, cons = sample_problem(jax.random.key(seed))

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
        Blackbox("con2", make_fns(cons[1]), is_constraint=True, threshold=0.0),
    ]

    n_low, n_high = 10, 5
    x_init = np.random.default_rng(seed).uniform(size=(n_low + n_high, 2))
    fid_init = np.concatenate([np.zeros(n_low), np.ones(n_high)]).astype(int)

    common = dict(
        num_bo_iterations=args.iters, seed=seed, log_dir=args.log_dir,
        eval_highest_fidelity=args.eval_highest_fidelity,
        track_recommendation=args.track_recommendation,
        dump_params=args.dump_params, plot_surfaces=args.plots,
        store_models_in_disk=args.store_models,
        load_models_from_disk=args.load_models,
        pad_data=not args.no_pad_data,
        polish=args.polish,
        warm_start=args.warm_start,
        whitened=args.whitened,
        acquisition=args.acquisition,
    )
    if args.fast:
        config = BOConfig(
            num_epochs_1=10, num_epochs_2=20, opt_grid_size=50,
            pareto_set_size=10, **common,
        )
    else:
        config = BOConfig(**common)
    state = run_bo_loop(blackboxes, x_init, fid_init, config)
    print("hypervolume trajectory:", state.hypervolumes)


if __name__ == "__main__":
    main()
