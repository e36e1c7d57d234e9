"""Cost-aware JESMOCMF outer BO loop.

The reference keeps its BO loop inside example scripts
(/root/reference/examples/toy_synthetic_2D_JESMOCMF/toy_synthetic_2D_JESMOCMF.py:305-462);
here it is a library component: per iteration, (re)build and train the
fitter from scratch (the reference retrains every iteration, warm start
commented out, toy:333-357), sample a Pareto solution, train the conditioned
models, maximize the cost-normalized coupled JES acquisition, evaluate the
chosen blackbox fidelity, and append to the evaluation history.

Crash recovery mirrors the reference's file-based resume (toy:277-301):
points/fidelities are appended to text files each iteration and replayed on
restart.
"""

from __future__ import annotations

import dataclasses
import os
import sys
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.acquisition.jesmoc import JESMOC_MFDGP
from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
from mobocmf_tpu.models.mfdgp import TL
from mobocmf_tpu.util.hypervolume import hypervolume


@dataclasses.dataclass
class Blackbox:
    """One blackbox: `fns[f]` evaluates fidelity f on (n, d) numpy arrays."""

    name: str
    fns: Sequence[Callable[[np.ndarray], np.ndarray]]
    is_constraint: bool = False
    threshold: float = 0.0
    costs: Sequence[float] = (1.0, 10.0)


@dataclasses.dataclass
class BOConfig:
    num_fidelities: int = 2
    num_bo_iterations: int = 60
    num_epochs_1: int = 5000
    num_epochs_2: int = 15000
    lr_1: float = 0.003
    lr_2: float = 0.001
    pareto_set_size: int = 50
    opt_grid_size: int = 1000
    batch_size: Optional[int] = None  # default: full batch
    type_lengthscale: TL = TL.MEDIAN
    eval_highest_fidelity: bool = False
    seed: int = 4
    log_dir: Optional[str] = None
    hv_reference: Optional[np.ndarray] = None  # reference point for HV logging
    # model-based recommendation + HV-vs-optimal scoring per iteration
    # (reference toy:533-614; needs true-function access, so optional)
    track_recommendation: bool = False
    recommendation_grid_size: int = 1000
    # warm start each iteration from the previous iteration's trained models
    # (the reference ships this machinery commented out, toy:333-357; same
    # default: off)
    warm_start: bool = False
    # bucket the growing training set to geometric sizes with masked padding
    # (fit/bucketing.py) so the campaign compiles O(log N) times, not once per
    # iteration. On by default — this is the TPU-first execution path; set
    # False for exact reference shapes.
    pad_data: bool = True


@dataclasses.dataclass
class BOState:
    x: np.ndarray  # (N, d)
    fidelities: np.ndarray  # (N,)
    ys: Dict[str, np.ndarray]  # per blackbox, (N,)
    hypervolumes: List[float]


def _standardize(y: np.ndarray) -> Tuple[np.ndarray, float, float]:
    """Shared mean/std across fidelities (example_synthetic_2D.py:75-88)."""
    mean, std = float(y.mean()), float(y.std())
    std = std if std > 0 else 1.0
    return (y - mean) / std, mean, std


def run_bo_loop(
    blackboxes: Sequence[Blackbox],
    x_init: np.ndarray,
    fidelities_init: np.ndarray,
    config: BOConfig,
    callback: Optional[Callable[[int, BOState], None]] = None,
) -> BOState:
    d = x_init.shape[1]
    log_dir = config.log_dir
    x = np.asarray(x_init, dtype=float)
    fid = np.asarray(fidelities_init, dtype=int).reshape(-1)

    # resume from logs if present (reference toy:277-301)
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        pts_file = os.path.join(log_dir, "points_evaluated.txt")
        fid_file = os.path.join(log_dir, "fidelities_evaluated.txt")
        if os.path.exists(pts_file) and os.path.getsize(pts_file) > 0:
            x_extra = np.loadtxt(pts_file).reshape(-1, d)
            fid_extra = np.loadtxt(fid_file).reshape(-1).astype(int)
            x = np.vstack([x, x_extra])
            fid = np.concatenate([fid, fid_extra])
            print(f"[resume] replayed {x_extra.shape[0]} evaluated points")

    def eval_all(x_pts: np.ndarray, f: np.ndarray) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for bb in blackboxes:
            y = np.empty(x_pts.shape[0])
            for level in range(config.num_fidelities):
                sel = f == level
                if sel.any():
                    y[sel] = np.asarray(bb.fns[level](x_pts[sel])).reshape(-1)
            out[bb.name] = y
        return out

    ys = eval_all(x, fid)
    state = BOState(x=x, fidelities=fid, ys=ys, hypervolumes=[])
    start_iter = 0
    if log_dir is not None:
        hv_file = os.path.join(log_dir, "hypervolumes.txt")
        if os.path.exists(hv_file) and os.path.getsize(hv_file) > 0:
            state.hypervolumes = list(np.atleast_1d(np.loadtxt(hv_file)))
            start_iter = len(state.hypervolumes)

    prev_fitter = None
    for it in range(start_iter, config.num_bo_iterations):
        n = state.x.shape[0]
        batch_size = config.batch_size or n
        fitter = BlackBoxMFDGPFitter(
            config.num_fidelities, batch_size,
            lr_1=config.lr_1, lr_2=config.lr_2,
            num_epochs_1=config.num_epochs_1, num_epochs_2=config.num_epochs_2,
            pareto_set_size=config.pareto_set_size, opt_grid_size=config.opt_grid_size,
            type_lengthscale=config.type_lengthscale, seed=config.seed + it,
            pad_data=config.pad_data,
        )
        stats = {}
        for bb in blackboxes:
            y_std, mean, std = _standardize(state.ys[bb.name])
            stats[bb.name] = (mean, std)
            thr = (bb.threshold - mean) / std if bb.is_constraint else 0.0
            prev_model = (
                prev_fitter.get_model(bb.name, is_constraint=bb.is_constraint)
                if (config.warm_start and prev_fitter is not None)
                else None
            )
            fitter.initialize_mfdgp(
                jnp.asarray(state.x), jnp.asarray(y_std[:, None]),
                jnp.asarray(state.fidelities), bb.name,
                threshold_constraint=thr, is_constraint=bb.is_constraint,
                previously_trained_model=prev_model,
            )

        fitter.train_mfdgps()
        prev_fitter = fitter
        cond = fitter.copy_uncond()
        cond.sample_and_store_pareto_solution()
        cond.train_conditioned_mfdgps()

        jes = JESMOC_MFDGP(
            model=fitter, num_fidelities=config.num_fidelities, model_cond=cond,
            eval_highest_fidelity=config.eval_highest_fidelity, seed=config.seed + it,
        )
        for bb in blackboxes:
            for level in range(config.num_fidelities):
                jes.add_blackbox(
                    level, bb.name, cost_evaluation=bb.costs[level],
                    is_constraint=bb.is_constraint,
                )
        x_next, fid_next = jes.get_nextpoint_coupled(iteration=it, verbose=True)
        x_next = np.asarray(x_next, dtype=float).reshape(1, d)

        y_next = eval_all(x_next, np.asarray([fid_next]))
        state.x = np.vstack([state.x, x_next])
        state.fidelities = np.concatenate([state.fidelities, [fid_next]])
        for bb in blackboxes:
            state.ys[bb.name] = np.concatenate([state.ys[bb.name], y_next[bb.name]])

        # hypervolume of feasible high-fidelity observations
        hv = _observed_hypervolume(blackboxes, state, config)
        state.hypervolumes.append(hv)
        print(f"[BO iter {it}] fidelity={fid_next} x={x_next.ravel()} HV={hv:.6f}")
        sys.stdout.flush()

        if config.track_recommendation:
            rec_set, hv_rec, hv_opt = recommend_and_score(
                fitter, blackboxes, stats, config,
                grid_size=config.recommendation_grid_size, seed=config.seed + it,
            )
            print(
                f"[BO iter {it}] recommended {rec_set.shape[0]} points, "
                f"HV={hv_rec:.6f} / optimal {hv_opt:.6f}"
            )
            if log_dir is not None:
                with open(os.path.join(log_dir, "hypervolume_solution.txt"), "a") as fh:
                    fh.write(f"{hv_rec} {hv_opt}\n")

        if log_dir is not None:
            with open(os.path.join(log_dir, "points_evaluated.txt"), "a") as fh:
                np.savetxt(fh, x_next)
            with open(os.path.join(log_dir, "fidelities_evaluated.txt"), "a") as fh:
                fh.write(f"{fid_next}\n")
            with open(os.path.join(log_dir, "hypervolumes.txt"), "a") as fh:
                fh.write(f"{hv}\n")
        if callback is not None:
            callback(it, state)
    return state


def recommend_and_score(
    fitter,
    blackboxes: Sequence[Blackbox],
    stats: Dict[str, Tuple[float, float]],
    config: BOConfig,
    grid_size: int = 1000,
    feasibility_prob: float = 0.999,
    seed: int = 0,
) -> Tuple[np.ndarray, float, float]:
    """Model-based recommendation + true-function hypervolume scoring.

    Reference toy_synthetic_2D_JESMOCMF.py:533-614: take a shared grid, keep
    points the MODEL deems feasible with P > 0.999 (via the top-fidelity
    predictive), Pareto-cull the model means, then score the TRUE functions'
    HV at the recommended set against the optimal HV on the same grid.

    Returns (recommended_set, hv_recommended, hv_optimal)."""
    import jax as _jax

    from mobocmf_tpu.models import mfdgp as M
    from mobocmf_tpu.moop.moop import pareto_front_mask
    from scipy.stats import norm as _norm

    d = fitter.x_train.shape[1]
    rng = np.random.default_rng(seed)
    grid = rng.uniform(size=(grid_size, d))
    grid_j = jnp.asarray(grid, dtype=fitter.x_train.dtype)
    top = config.num_fidelities - 1

    objs = [bb for bb in blackboxes if not bb.is_constraint]
    cons = [bb for bb in blackboxes if bb.is_constraint]

    # model feasibility: P(c(x) >= thr) > feasibility_prob per constraint,
    # with the likelihood noise subtracted from the predictive variance
    # (reference toy:545-546 — the feasibility test is on the LATENT process)
    feasible = np.ones(grid_size, dtype=bool)
    for bb in cons:
        model = fitter.get_model(bb.name, is_constraint=True)
        mu, var = M.predict_for_acquisition(
            model.params, model.consts, model.config, grid_j, top
        )
        noise = float(M.likelihood_noise(model.params, model.consts, top))
        var_latent = np.maximum(np.asarray(var) - noise, 1e-12)
        mean_s, std_s = stats[bb.name]
        thr_std = (bb.threshold - mean_s) / std_s
        p_feas = 1.0 - _norm.cdf((thr_std - np.asarray(mu)) / np.sqrt(var_latent))
        feasible &= p_feas > feasibility_prob
    if not feasible.any():
        return np.zeros((0, d)), 0.0, 0.0

    # model-mean Pareto cull
    means = []
    for bb in objs:
        model = fitter.get_model(bb.name)
        mu, _ = M.predict_for_acquisition(
            model.params, model.consts, model.config, grid_j, top
        )
        mean_s, std_s = stats[bb.name]
        means.append(np.asarray(mu) * std_s + mean_s)
    means = np.stack(means, axis=1)
    mask = np.asarray(
        pareto_front_mask(jnp.asarray(means), jnp.asarray(feasible))
    )
    rec_set = grid[mask]

    # score with the TRUE functions
    def true_front(pts):
        vals = np.stack(
            [np.asarray(bb.fns[top](pts)).reshape(-1) for bb in objs], axis=1
        )
        feas = np.ones(pts.shape[0], dtype=bool)
        for bb in cons:
            feas &= np.asarray(bb.fns[top](pts)).reshape(-1) >= bb.threshold
        return vals[feas]

    ref = (
        np.asarray(config.hv_reference, dtype=float)
        if config.hv_reference is not None
        else np.array([1000.0] * len(objs))  # reference point (1000,1000), toy:592
    )
    hv_rec = hypervolume(true_front(rec_set), ref) if rec_set.shape[0] else 0.0

    # optimal HV on the same grid (true-feasible true-Pareto points)
    tf = true_front(grid)
    hv_opt = hypervolume(tf, ref) if tf.shape[0] else 0.0
    return rec_set, hv_rec, hv_opt


def _observed_hypervolume(blackboxes, state: BOState, config: BOConfig) -> float:
    objs = [bb for bb in blackboxes if not bb.is_constraint]
    cons = [bb for bb in blackboxes if bb.is_constraint]
    top = config.num_fidelities - 1
    sel = state.fidelities == top
    if not sel.any():
        return 0.0
    feas = np.ones(sel.sum(), dtype=bool)
    for bb in cons:
        feas &= state.ys[bb.name][sel] >= bb.threshold
    if not feas.any():
        return 0.0
    front = np.stack([state.ys[bb.name][sel][feas] for bb in objs], axis=1)
    ref = (
        np.asarray(config.hv_reference, dtype=float)
        if config.hv_reference is not None
        else front.max(axis=0) + 1.0
    )
    return hypervolume(front, ref)
