"""MESMOC over MFGP models: constrained multi-fidelity BO with exact GPs.

The reference ships MESMOC_MFGP (acquisition_functions/MESMOC_MFGP.py) but no
example script for it; this demo exercises the full MFGP + MESMOC path on the
Branin-Currin pair with a feasibility constraint, logging the observed
hypervolume of feasible high-fidelity evaluations per iteration
(observed_hypervolumes.txt, same convention as the JESMOC loop).

Run: python examples/example_mesmoc_mfgp.py [--iters N] [--log-dir DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--log-dir", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.acquisition.mesmoc import MESMOC_MFGP
    from mobocmf_tpu.models import mfgp as G
    from mobocmf_tpu.test_functions.synthetic import (
        branin_scaled, currin, currin_low,
    )
    from mobocmf_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    def obj1(x, fid):  # branin (standardized-ish)
        v = branin_scaled(x) / 50.0
        return v + (0.3 * np.sin(6 * x[:, 0]) if fid == 0 else 0.0)

    def obj2(x, fid):
        return (currin_low(x) if fid == 0 else currin(x)) / 10.0

    def con1(x, fid):  # feasible iff >= 0
        return 0.7 - x[:, 0] - 0.2 * x[:, 1]

    fns = {"obj1": obj1, "obj2": obj2, "con1": con1}

    from mobocmf_tpu.util.hypervolume import hypervolume

    n0, n1 = 16, 8
    x = np.vstack([rng.uniform(size=(n0, 2)), rng.uniform(size=(n1, 2))])
    fid = np.concatenate([np.zeros(n0), np.ones(n1)]).astype(int)

    log_files = (
        "observed_hypervolumes.txt", "recommendation_hv.txt",
        "points_evaluated.txt", "fidelities_evaluated.txt",
    )
    if args.log_dir:
        os.makedirs(args.log_dir, exist_ok=True)
        # this demo has no resume/replay logic (unlike run_bo_loop): start
        # every invocation with clean logs so a rerun after a timeout never
        # appends a second campaign onto a partial one
        for name in log_files:
            open(os.path.join(args.log_dir, name), "w").close()

    def observed_hv(x, fid):
        """HV of feasible highest-fidelity observations (same convention as
        bo/loop._observed_hypervolume)."""
        top = fid == 1
        if not top.any():
            return 0.0
        xs = x[top]
        feas = fns["con1"](xs, 1) >= 0.0
        if not feas.any():
            return 0.0
        vals = np.stack([obj1(xs[feas], 1), obj2(xs[feas], 1)], axis=1)
        ref = np.array([10.0, 10.0])
        return hypervolume(vals, ref)

    # Recommendation metric (same RECOMMENDATION convention as the JESMOC
    # loop, toy reference :533-614, but logged as a 2-column
    # recommendation_hv.txt [rec_hv optimal_hv] — NOT the loop's 6-tuple
    # hypervolumes.txt format): model-feasible
    # (P(c>=0) > 0.999) grid points, Pareto-culled by predicted high-fidelity
    # means, evaluated on the TRUE functions; optimal HV from the true
    # functions on the same fixed grid. Observed HV alone can stay flat when
    # the cost-normalized acquisition prefers cheap low-fidelity evaluations,
    # but the recommendation moves as the models learn from ANY fidelity.
    grid = np.asarray(
        np.random.default_rng(1234).uniform(size=(1024, 2)), dtype=np.float64
    )
    ref_pt = np.array([10.0, 10.0])

    from mobocmf_tpu.moop.moop import MOOP

    def _pareto_idx(v):
        """Indices of non-dominated rows (minimization) — delegates to the
        canonical cull (moop.pareto_front_mask) so this metric and the JESMOC
        loop's recommendation use the same dominance code."""
        return np.where(MOOP.compute_pareto_front(np.asarray(v)))[0]

    true_feas = fns["con1"](grid, 1) >= 0.0
    true_objs = np.stack([obj1(grid, 1), obj2(grid, 1)], axis=1)
    _tf = true_objs[true_feas]
    optimal_hv = float(hypervolume(_tf[_pareto_idx(_tf)], ref_pt))

    def recommendation_hv(models, con_model):
        from scipy.stats import norm

        gj = jnp.asarray(grid)
        mu1 = np.asarray(G.predict(models["obj1"], gj, 1)[0])
        mu2 = np.asarray(G.predict(models["obj2"], gj, 1)[0])
        muc, varc = G.predict(con_model, gj, 1)
        p_feas = 1.0 - norm.cdf((0.0 - np.asarray(muc)) / np.sqrt(np.asarray(varc)))
        feas = p_feas > 0.999
        if not feas.any():
            feas = p_feas >= p_feas.max()  # least-infeasible fallback
        cand = np.where(feas)[0]
        front = cand[_pareto_idx(np.stack([mu1[cand], mu2[cand]], axis=1))]
        rec_x = grid[front]
        ok = fns["con1"](rec_x, 1) >= 0.0
        if not ok.any():
            return 0.0
        vals = np.stack([obj1(rec_x[ok], 1), obj2(rec_x[ok], 1)], axis=1)
        return float(hypervolume(vals[_pareto_idx(vals)], ref_pt))

    # pad every iteration's data to ONE fixed shape for the whole campaign
    # (mfgp.PAD_PENALTY rows): every jitted program (fit scan, posterior
    # state, acquisition L-BFGS) compiles exactly once instead of once per
    # iteration's data size
    target = int(8 * np.ceil((n0 + n1 + args.iters) / 8))

    def padded(x, fid, y=None):
        n = len(x)
        x_p = np.vstack([x, np.full((target - n, x.shape[1]), 0.5)])
        fid_p = np.concatenate([fid, np.zeros(target - n, dtype=int)])
        valid = np.arange(target) < n
        xf = jnp.asarray(np.concatenate([x_p, fid_p[:, None].astype(float)], axis=1))
        if y is None:
            return xf, valid
        return xf, valid, jnp.asarray(np.concatenate([y, np.zeros(target - n)]))

    hvs, rec_hvs = [], []
    for it in range(args.iters):
        models, best = {}, {}
        for name in ("obj1", "obj2"):
            y = np.array([fns[name](x[i : i + 1], fid[i])[0] for i in range(len(x))])
            xf, valid, y_p = padded(x, fid, y)
            models[name] = G.fit_mfgp(
                G.init_mfgp(xf, y_p, 2, row_valid=valid), num_iters=150
            )
            top = fid == 1
            best[name] = float(y[top].min()) if top.any() else float(y.min())
        y_c = np.array([fns["con1"](x[i : i + 1], fid[i])[0] for i in range(len(x))])
        xf, valid, y_cp = padded(x, fid, y_c)
        con_model = G.fit_mfgp(
            G.init_mfgp(xf, y_cp, 2, row_valid=valid), num_iters=150
        )

        mes = MESMOC_MFGP(
            objectives={k: models[k] for k in ("obj1", "obj2")},
            constraints={"con1": con_model},
            input_dim=2, num_fidelities=2,
            best_objective_values=best,
            constraint_thresholds={"con1": 0.0},
            seed=it,
        )
        for f in range(2):
            mes.add_blackbox(f, "obj1", cost_evaluation=1.0 if f == 0 else 5.0)
            mes.add_blackbox(f, "obj2", cost_evaluation=1.0 if f == 0 else 5.0)
            mes.add_blackbox(f, "con1", is_constraint=True)
        x_next, f_next = mes.get_nextpoint_coupled(iteration=it, verbose=True)
        x = np.vstack([x, np.asarray(x_next)[None]])
        fid = np.concatenate([fid, [f_next]])

        hv = observed_hv(x, fid)
        hvs.append(hv)
        rec_hv = recommendation_hv(models, con_model)
        rec_hvs.append(rec_hv)
        if args.log_dir:
            with open(os.path.join(args.log_dir, "observed_hypervolumes.txt"), "a") as fh:
                fh.write(f"{hv}\n")
            with open(os.path.join(args.log_dir, "recommendation_hv.txt"), "a") as fh:
                fh.write(f"{rec_hv} {optimal_hv}\n")
            with open(os.path.join(args.log_dir, "points_evaluated.txt"), "a") as fh:
                fh.write(" ".join(str(v) for v in np.asarray(x_next)) + "\n")
            with open(os.path.join(args.log_dir, "fidelities_evaluated.txt"), "a") as fh:
                fh.write(f"{f_next}\n")

    top = fid == 1
    feas = np.array([fns["con1"](x[i : i + 1], 1)[0] for i in range(len(x))]) >= 0
    print(f"final: {len(x)} evaluations, {int((top & feas).sum())} feasible high-fidelity")
    print(f"observed HV trajectory: {[round(h, 4) for h in hvs]}")
    print(f"recommendation HV trajectory (optimal {optimal_hv:.4f}): "
          f"{[round(h, 4) for h in rec_hvs]}")


if __name__ == "__main__":
    main()
