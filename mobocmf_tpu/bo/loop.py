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
from mobocmf_tpu.util import heartbeat
from mobocmf_tpu.util.hypervolume import hypervolume, hypervolume_pair


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
    # Pareto-sampling polish backend: "slsqp" (host scipy, reference
    # moop.py:72-139 semantics, fused single-dispatch device evals) |
    # "device" (multi-start penalty L-BFGS fully on device, SURVEY §7.1's TPU
    # path) | "none". Same accept rule either way: a polished point joins the
    # grid only if it improves the best feasible value and stays feasible.
    polish: str = "slsqp"
    # candidates evaluated per BO iteration (new capability, BASELINE config
    # #5; the reference only supports q=1, JESMOC_MFDGP.py:159). For q > 1
    # the fidelity is selected with the standard cost-normalized q=1
    # optimization, then the batch is filled by sequential greedy
    # local-penalization maximization (acquisition/batch.py) at that fidelity.
    q: int = 1
    # cap on the candidate L-BFGS iterations (reference parity: 200). Large-m
    # scale configs lower it so the acquisition device program stays under
    # the TPU worker's ~2-minute execution limit.
    acq_maxiter: int = 200
    acq_raw_samples: int = 200
    # per-iteration kernel-hyperparameter dumps to <log_dir>/params/*.txt
    # (reference toy:230-257 via print_lengthscales_and_outputscale)
    dump_params: bool = False
    # per-iteration contour plots (2-D problems) of predictive mean/std and
    # acquisition surfaces to <log_dir>/plots/ (reference toy:139-226,484-493)
    plot_surfaces: bool = False
    # whitened inducing-point parameterization (q(v) with u = chol(Kzz) v) —
    # the BASELINE.json north-star redesign of the reference's
    # MFDGUnwhitenedVariationalStrategy (mfdgp_hidden_layer.py:141-146,
    # 520-559). Initialization converts the reference's unwhitened init into
    # whitened coordinates exactly (models/mfdgp.py:304-341), so campaigns
    # start from the identical posterior either way.
    whitened: bool = False
    # whitened init: "match" = exact conversion of the reference's unwhitened
    # init (parity default); "prior" = standard whitened-SVGP init q(u) =
    # N(0, Kzz) — scale-independent, recommended at large m where the exact
    # conversion manufactures huge whitened coordinates (docs/SCALING.md §3)
    whitened_init: str = "match"
    # optional jax.sharding.Mesh: shards the Pareto-sampling MOOP grid
    # evaluation (the 1000*d^2-point hot axis, reference moop.py:232) over
    # the mesh's 'dp' axis (parallel/sharding.sharded_grid_eval)
    mesh: Optional[object] = None
    # orbax checkpoints of the trained (uncond, cond) fitters per iteration
    # (reference store_models_in_disk / load_models_from_disk, toy:38-45,
    # 366-425): store writes <log_dir>/models/iter{it}/{uncond,cond}; load
    # restores them instead of retraining when present
    store_models_in_disk: bool = False
    load_models_from_disk: bool = False
    # candidate selection: "jesmoc" (the full JES pipeline) or "random" (the
    # reference's Random_choice baseline, acquisition_functions/
    # Random_choice.py:44-56 — uniform x, fidelity ~ 1 - cost/total; models
    # are still trained so recommendation scoring works, but the Pareto
    # sampling + conditioned training phases are skipped)
    acquisition: str = "jesmoc"
    # in-process stall watchdog (util/heartbeat.py): if no host-side progress
    # beat lands for this many seconds, print the hung phase and os._exit(86)
    # so the queue runner can retry from the resume-safe log dir. Defends
    # against the axon-tunnel failure mode where an in-flight device RPC
    # never returns (round-3 outage froze a campaign mid-Pareto-phase
    # forever). None (default) = disarmed; the MOBOCMF_STALL_TIMEOUT_S env
    # var supplies a value when the config leaves it unset.
    stall_timeout_s: Optional[float] = None

    def __post_init__(self):
        # fail loudly on typos ('Random', 'random_choice', 'slsqp ') — a
        # silently-ignored value would run the WRONG pipeline (e.g. a random
        # baseline arm silently running full JESMOC invalidates an A/B)
        if self.acquisition not in ("jesmoc", "random"):
            raise ValueError(
                f"BOConfig.acquisition must be 'jesmoc' or 'random', "
                f"got {self.acquisition!r}"
            )
        if self.polish not in ("slsqp", "device", "none"):
            raise ValueError(
                f"BOConfig.polish must be 'slsqp', 'device' or 'none', "
                f"got {self.polish!r}"
            )


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

    # stall watchdog (tunnel-outage defense): BOConfig value, else env var
    stall_s = config.stall_timeout_s
    if stall_s is None:
        env_stall = os.environ.get("MOBOCMF_STALL_TIMEOUT_S", "")
        stall_s = float(env_stall) if env_stall else None
    if stall_s:
        heartbeat.start(float(stall_s))
        print(f"[watchdog] armed: stall timeout {stall_s:.0f}s")

    # resume from logs if present (reference toy:277-301)
    start_iter = 0
    if log_dir is not None:
        os.makedirs(log_dir, exist_ok=True)
        pts_file = os.path.join(log_dir, "points_evaluated.txt")
        fid_file = os.path.join(log_dir, "fidelities_evaluated.txt")
        if os.path.exists(pts_file) and os.path.getsize(pts_file) > 0:
            x_extra = np.loadtxt(pts_file).reshape(-1, d)
            fid_extra = np.loadtxt(fid_file).reshape(-1).astype(int)
            x = np.vstack([x, x_extra])
            fid = np.concatenate([fid, fid_extra])
            # q points are appended per iteration
            if x_extra.shape[0] % config.q != 0:
                raise ValueError(
                    f"resume mismatch: {log_dir} holds {x_extra.shape[0]} "
                    f"evaluated points, not a multiple of q={config.q} — the "
                    "log dir was written under a different q; restart with "
                    "the original q or a fresh log_dir"
                )
            start_iter = x_extra.shape[0] // config.q
            print(
                f"[resume] replayed {x_extra.shape[0]} evaluated points "
                f"({start_iter} iterations)"
            )
        # record which iteration THIS process starts at: its first iteration
        # pays fresh-process compiles, and a resume at exactly prev+1 is
        # indistinguishable from a warm row in phase_seconds.txt alone
        # (benchmarks/compare_arms.py drops the recorded rows from warm
        # medians)
        with open(os.path.join(log_dir, "process_starts.txt"), "a") as fh:
            fh.write(f"{start_iter}\n")

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
    if log_dir is not None:
        obs_file = os.path.join(log_dir, "observed_hypervolumes.txt")
        if os.path.exists(obs_file) and os.path.getsize(obs_file) > 0:
            state.hypervolumes = list(np.atleast_1d(np.loadtxt(obs_file)))
        if len(state.hypervolumes) < start_iter:
            # resuming a log dir with missing/short observed-HV history (a
            # crash between the points append and the HV append loses the
            # TAIL entry): pad with NaN at the END so the recorded entries
            # keep their original iteration indices. NOTE: this alignment
            # assumes the log was written by this code (HV appended every
            # iteration from iteration 0). A dir whose recorded entries do
            # NOT start at iteration 0 would need head-padding instead —
            # say so in the resume message so a misaligned trajectory is
            # diagnosable from the log.
            missing = start_iter - len(state.hypervolumes)
            print(
                f"[resume] observed-HV history is {missing} entries short; "
                "NaN-padding the tail (recorded entries are assumed to "
                "start at iteration 0)"
            )
            state.hypervolumes = state.hypervolumes + [float("nan")] * missing

    prev_fitter = None
    # the random baseline needs no trained models unless something consumes
    # them (recommendation scoring, param dumps, plots, warm start or
    # checkpoints) — skipping the dominant train phase keeps the baseline
    # arm's wall-clock proportional to what it actually computes
    needs_models = (
        config.acquisition != "random"
        or config.track_recommendation
        or config.dump_params
        or config.plot_surfaces
        or config.warm_start
        or config.store_models_in_disk
    )

    for it in range(start_iter, config.num_bo_iterations):
        import time as _time

        t_iter = _time.time()
        n = state.x.shape[0]
        batch_size = config.batch_size or n
        stats = {}
        std_ys = {}
        for bb in blackboxes:
            y_std, mean, std = _standardize(state.ys[bb.name])
            stats[bb.name] = (mean, std)
            std_ys[bb.name] = y_std

        models_dir = (
            os.path.join(log_dir, "models", f"iter{it}") if log_dir is not None else None
        )
        phase_t: Dict[str, float] = {}
        # try the checkpoint restore FIRST (both fitters or neither), before
        # paying for fitter construction + per-blackbox init it would discard
        loaded = False
        if config.load_models_from_disk and models_dir is not None and needs_models:
            try:
                from mobocmf_tpu.util.checkpoint import restore_fitter

                # the checkpoint meta carries the fitter's full hyperparameter
                # schedule (util/checkpoint.py save_fitter meta["hyper"]), so
                # the restored objects train/sample with the campaign's
                # settings without manual re-application
                f_u = restore_fitter(os.path.join(models_dir, "uncond"))
                # random-mode checkpoints have no conditioned fitter to
                # restore (store writes only 'uncond' when cond is None)
                f_c = (
                    restore_fitter(os.path.join(models_dir, "cond"))
                    if config.acquisition != "random"
                    else None
                )
                fitter, cond, loaded = f_u, f_c, True
                print(f"[BO iter {it}] restored models from {models_dir}")
            except Exception as e:
                print(f"[BO iter {it}] model restore failed ({e!r}); retraining")
                loaded = False
        if not needs_models:
            fitter, cond = None, None
        elif not loaded:
            from mobocmf_tpu.models import mfdgp as _mfdgp_mod

            _mfdgp_mod.INIT_TIMINGS.clear()
            fitter = BlackBoxMFDGPFitter(
                config.num_fidelities, batch_size,
                lr_1=config.lr_1, lr_2=config.lr_2,
                num_epochs_1=config.num_epochs_1, num_epochs_2=config.num_epochs_2,
                pareto_set_size=config.pareto_set_size,
                opt_grid_size=config.opt_grid_size,
                type_lengthscale=config.type_lengthscale, seed=config.seed + it,
                pad_data=config.pad_data, polish=config.polish,
                whitened=config.whitened, whitened_init=config.whitened_init,
                mesh=config.mesh,
            )
            for bb in blackboxes:
                mean, std = stats[bb.name]
                thr = (bb.threshold - mean) / std if bb.is_constraint else 0.0
                prev_model = (
                    prev_fitter.get_model(bb.name, is_constraint=bb.is_constraint)
                    if (config.warm_start and prev_fitter is not None)
                    else None
                )
                fitter.initialize_mfdgp(
                    jnp.asarray(state.x), jnp.asarray(std_ys[bb.name][:, None]),
                    jnp.asarray(state.fidelities), bb.name,
                    threshold_constraint=thr, is_constraint=bb.is_constraint,
                    previously_trained_model=prev_model,
                )
            # setup = fitter construction + per-blackbox model init
            phase_t["setup"] = _time.time() - t_iter
            heartbeat.beat(f"iter{it}:setup")
            if log_dir is not None:
                # attribute setup time: warm-start fetch (device->host tunnel
                # read), host-CPU init math, ship-out transfer, and the
                # non-init remainder (standardize/ctor/bookkeeping)
                ti = dict(_mfdgp_mod.INIT_TIMINGS)
                other = phase_t["setup"] - sum(ti.values())
                with open(
                    os.path.join(log_dir, "setup_breakdown.txt"), "a"
                ) as fh:
                    fh.write(
                        f"{it} {n} {ti.get('fetch', 0.0):.3f} "
                        f"{ti.get('host', 0.0):.3f} {ti.get('ship', 0.0):.3f} "
                        f"{other:.3f}\n"
                    )
            t0 = _time.time()
            fitter.train_mfdgps()
            phase_t["train"] = _time.time() - t0
            heartbeat.beat(f"iter{it}:train")
            if config.acquisition == "random":
                # the random baseline needs no conditioning — models are kept
                # for recommendation scoring only
                cond = None
            else:
                t0 = _time.time()
                cond = fitter.copy_uncond()
                cond.sample_and_store_pareto_solution()
                phase_t["pareto"] = _time.time() - t0
                heartbeat.beat(f"iter{it}:pareto")
                if log_dir is not None:
                    # MOOP attempts consumed (1 = first draw feasible):
                    # attributes pareto-phase time variance from committed
                    # artifacts instead of run logs
                    with open(
                        os.path.join(log_dir, "pareto_resamples.txt"), "a"
                    ) as fh:
                        fh.write(
                            f"{it} {n} {getattr(cond, 'pareto_tries', 0)}\n"
                        )
                t0 = _time.time()
                cond.train_conditioned_mfdgps()
                phase_t["cond"] = _time.time() - t0
                heartbeat.beat(f"iter{it}:cond")
            if config.store_models_in_disk and models_dir is not None:
                from mobocmf_tpu.util.checkpoint import save_fitter

                save_fitter(os.path.join(models_dir, "uncond"), fitter)
                if cond is not None:
                    save_fitter(os.path.join(models_dir, "cond"), cond)
        prev_fitter = fitter

        if config.dump_params and log_dir is not None:
            from mobocmf_tpu.util.describe import describe_hyperparams

            params_dir = os.path.join(log_dir, "params")
            os.makedirs(params_dir, exist_ok=True)
            for bb in blackboxes:
                model = fitter.get_model(bb.name, is_constraint=bb.is_constraint)
                with open(
                    os.path.join(params_dir, f"{bb.name}_iter{it}.txt"), "w"
                ) as fh:
                    for layer, vals in describe_hyperparams(model).items():
                        fh.write(f"{layer}: {vals}\n")

        t0 = _time.time()
        if config.acquisition == "random":
            from mobocmf_tpu.acquisition.random_choice import Random_choice

            rc = Random_choice(
                input_size=d, num_fidelities=config.num_fidelities,
                seed=config.seed + it,
            )
            for bb in blackboxes:
                for level in range(config.num_fidelities):
                    rc.add_blackbox(level, bb.name, cost_evaluation=bb.costs[level])
            x_next, fid_next = rc.get_batch_coupled(config.q, iteration=it, verbose=True)
            x_next = np.asarray(x_next, dtype=float).reshape(config.q, d)
        else:
            jes = JESMOC_MFDGP(
                model=fitter, num_fidelities=config.num_fidelities, model_cond=cond,
                eval_highest_fidelity=config.eval_highest_fidelity, seed=config.seed + it,
                acq_maxiter=config.acq_maxiter,
                acq_raw_samples=config.acq_raw_samples,
            )
            for bb in blackboxes:
                for level in range(config.num_fidelities):
                    jes.add_blackbox(
                        level, bb.name, cost_evaluation=bb.costs[level],
                        is_constraint=bb.is_constraint,
                    )
            x_next, fid_next = jes.get_nextpoint_coupled(iteration=it, verbose=True)
            x_next = np.asarray(x_next, dtype=float).reshape(1, d)
            if config.q > 1:
                # fill the batch at the selected fidelity by sequential greedy
                # local-penalization maximization; the q=1 maximizer above seeds
                # the batch as its first point
                xs_batch = jes.get_batch_coupled(fid_next, config.q - 1, x0=x_next)
                x_next = np.vstack([x_next, np.asarray(xs_batch, dtype=float)])
        phase_t["acq"] = _time.time() - t0
        heartbeat.beat(f"iter{it}:acq")
        fid_batch = np.full(x_next.shape[0], fid_next, dtype=int)

        y_next = eval_all(x_next, fid_batch)
        state.x = np.vstack([state.x, x_next])
        state.fidelities = np.concatenate([state.fidelities, fid_batch])
        for bb in blackboxes:
            state.ys[bb.name] = np.concatenate([state.ys[bb.name], y_next[bb.name]])

        # hypervolume of feasible high-fidelity observations
        hv = _observed_hypervolume(blackboxes, state, config)
        state.hypervolumes.append(hv)
        print(
            f"[BO iter {it}] fidelity={fid_next} x={x_next.ravel()} HV={hv:.6f} "
            f"n={n} wallclock={_time.time() - t_iter:.2f}s"
        )
        sys.stdout.flush()
        if log_dir is not None:
            with open(os.path.join(log_dir, "iteration_seconds.txt"), "a") as fh:
                fh.write(f"{it} {n} {_time.time() - t_iter:.3f}\n")

        rec = None
        if config.track_recommendation:
            t0 = _time.time()
            rec = recommend_and_score(
                fitter, blackboxes, stats, config,
                grid_size=config.recommendation_grid_size, seed=config.seed + it,
            )
            phase_t["recommend"] = _time.time() - t0
            heartbeat.beat(f"iter{it}:recommend")
            print(
                f"[BO iter {it}] recommended {rec.num_points_final} points, "
                f"HV={rec.hv:.6f} / optimal {rec.hv_optimal:.6f} "
                f"(feasible={rec.feasible}, dropped={rec.num_infeasible})"
            )

        if config.plot_surfaces and log_dir is not None and fitter is not None:
            try:
                plot_iteration_surfaces(
                    os.path.join(log_dir, "plots"), it, fitter, cond, blackboxes,
                    stats, config,
                )
            except Exception as e:  # plotting must never kill a campaign
                print(f"[BO iter {it}] plotting failed: {e}")

        if phase_t:
            breakdown = " ".join(f"{k}={v:.2f}s" for k, v in phase_t.items())
            print(f"[BO iter {it}] phases: {breakdown}")
            if log_dir is not None:
                with open(os.path.join(log_dir, "phase_seconds.txt"), "a") as fh:
                    fh.write(
                        f"{it} {n} "
                        + " ".join(
                            f"{phase_t.get(k, 0.0):.3f}"
                            for k in ("setup", "train", "pareto", "cond", "acq", "recommend")
                        )
                        + "\n"
                    )
        if log_dir is not None:
            with open(os.path.join(log_dir, "points_evaluated.txt"), "a") as fh:
                np.savetxt(fh, x_next)
            with open(os.path.join(log_dir, "fidelities_evaluated.txt"), "a") as fh:
                # one line per evaluated point (q lines when q > 1) so resume
                # replay stays row-aligned with points_evaluated.txt
                for fv in fid_batch:
                    fh.write(f"{float(fv)}\n")
            with open(os.path.join(log_dir, "observed_hypervolumes.txt"), "a") as fh:
                fh.write(f"{hv}\n")
            if rec is not None:
                # the reference's 6-tuple row (toy:616-618)
                with open(os.path.join(log_dir, "hypervolumes.txt"), "a") as fh:
                    fh.write(
                        f"{rec.hv:f} {rec.hv_optimal:f} {float(rec.feasible):f} "
                        f"{float(rec.num_infeasible):f} {float(rec.num_points_final):f} "
                        f"{float(rec.num_points_initial):f}\n"
                    )
                with open(os.path.join(log_dir, "hypervolume_solution.txt"), "a") as fh:
                    fh.write(f"{rec.hv_optimal:f}\n")
        if callback is not None:
            callback(it, state)
    return state


def plot_iteration_surfaces(
    plot_dir: str,
    it: int,
    fitter,
    cond,
    blackboxes: Sequence[Blackbox],
    stats: Dict[str, Tuple[float, float]],
    config: BOConfig,
    grid_res: int = 40,
) -> None:
    """Per-iteration contour plots: predictive mean/std of every blackbox at
    every fidelity, plus the coupled JES acquisition surface per fidelity
    (reference toy:139-226, 484-493). 2-D problems only."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mobocmf_tpu.acquisition.jesmoc import JESMOC_MFDGP
    from mobocmf_tpu.models import mfdgp as M

    d = fitter.x_train.shape[1]
    if d != 2:
        return
    os.makedirs(plot_dir, exist_ok=True)
    g = np.linspace(0.0, 1.0, grid_res)
    xx, yy = np.meshgrid(g, g)
    grid = jnp.asarray(
        np.vstack([xx.ravel(), yy.ravel()]).T, dtype=fitter.x_train.dtype
    )

    nbb, nf = len(blackboxes), config.num_fidelities
    fig, axes = plt.subplots(nbb, 2 * nf, figsize=(4 * 2 * nf, 3.2 * nbb), squeeze=False)
    for i, bb in enumerate(blackboxes):
        model = fitter.get_model(bb.name, is_constraint=bb.is_constraint)
        mean_s, std_s = stats[bb.name]
        for f in range(nf):
            mu, var = M.predict_for_acquisition_jit(
                model.params, model.consts, model.config, grid, f
            )
            mu = np.asarray(mu) * std_s + mean_s
            sd = np.sqrt(np.asarray(var)) * std_s
            for j, (vals, label) in enumerate([(mu, "mean"), (sd, "std")]):
                ax = axes[i][2 * f + j]
                c = ax.contourf(xx, yy, vals.reshape(grid_res, grid_res), levels=20)
                fig.colorbar(c, ax=ax)
                ax.set_title(f"{bb.name} f={f} {label}")
    fig.suptitle(f"iteration {it}: predictive surfaces")
    fig.tight_layout()
    fig.savefig(os.path.join(plot_dir, f"predictive_iter{it}.pdf"))
    plt.close(fig)

    if cond is None:
        # no conditioned model (acquisition='random') — the predictive
        # surfaces above are still produced; only the JES acquisition
        # figure needs cond
        return

    jes = JESMOC_MFDGP(
        model=fitter, num_fidelities=nf, model_cond=cond, seed=config.seed + it
    )
    for bb in blackboxes:
        for f in range(nf):
            jes.add_blackbox(f, bb.name, cost_evaluation=bb.costs[f],
                             is_constraint=bb.is_constraint)
    fig, axes = plt.subplots(1, nf, figsize=(5 * nf, 4), squeeze=False)
    for f in range(nf):
        acq = np.asarray(jes.coupled_acq(grid, f))
        ax = axes[0][f]
        c = ax.contourf(xx, yy, acq.reshape(grid_res, grid_res), levels=20)
        fig.colorbar(c, ax=ax)
        ax.set_title(f"coupled JES acquisition f={f}")
    fig.suptitle(f"iteration {it}: acquisition surfaces")
    fig.tight_layout()
    fig.savefig(os.path.join(plot_dir, f"acquisition_iter{it}.pdf"))
    plt.close(fig)


@dataclasses.dataclass
class RecommendationScore:
    """Per-iteration recommendation metrics — the reference's 6-tuple
    hypervolumes.txt row (toy:616-618) plus the recommended set."""

    rec_set: np.ndarray  # truly-feasible recommended points
    hv: float  # HV of TRUE objective values at rec_set (toy:591-593)
    hv_optimal: float  # optimal HV on the same grid (toy:600-614)
    feasible: bool  # no recommended point violates a true constraint (toy:581)
    num_infeasible: int  # recommended points dropped as truly infeasible
    num_points_final: int  # rec points after dropping infeasible ones
    num_points_initial: int  # rec points after the model-mean Pareto cull


def _recommendation_model_pass(
    obj_p, obj_c, con_p, con_c, config, fidelity: int, grid,
    thr_std, obj_scale, feasibility_prob: float,
):
    """Model side of the recommendation in ONE program: per-constraint
    latent feasibility probabilities (noise subtracted, toy:545-546),
    per-objective unstandardized predictive means, and the feasible Pareto
    cull. Raw eager predict_for_acquisition calls dispatch hundreds of tiny
    device programs per iteration; the aggregate python+dispatch overhead
    (not per-op tunnel latency, which is ~0.1 ms — benchmarks/probe_setup.py)
    dominated on the 1-core host."""
    import jax.numpy as jnp
    from jax.scipy.stats import norm as jnorm

    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.models import mfdgp as M
    from mobocmf_tpu.moop.moop import pareto_front_mask

    num_con = thr_std.shape[0]

    def obj_one(p, c):
        mu, _ = M.predict_for_acquisition(p, c, config, grid, fidelity)
        return mu

    mus = jax.vmap(obj_one, in_axes=(0, trainer.CONSTS_AXES))(obj_p, obj_c)
    means = mus * obj_scale[:, 1:2] + obj_scale[:, 0:1]  # (O, G)

    if num_con > 0:
        def con_one(p, c, t):
            mu, var = M.predict_for_acquisition(p, c, config, grid, fidelity)
            noise = M.likelihood_noise(p, c, fidelity)
            var_latent = jnp.maximum(var - noise, 1e-12)
            return 1.0 - jnorm.cdf((t - mu) / jnp.sqrt(var_latent))

        p_feas = jax.vmap(con_one, in_axes=(0, trainer.CONSTS_AXES, 0))(
            con_p, con_c, thr_std
        )
        feasible = jnp.all(p_feas > feasibility_prob, axis=0)
    else:
        feasible = jnp.ones(grid.shape[0], dtype=bool)

    mask = pareto_front_mask(means.T, feasible)
    return means, feasible, mask


_recommendation_model_pass_jit = jax.jit(
    _recommendation_model_pass,
    static_argnames=("config", "fidelity", "feasibility_prob"),
)


def recommend_and_score(
    fitter,
    blackboxes: Sequence[Blackbox],
    stats: Dict[str, Tuple[float, float]],
    config: BOConfig,
    grid_size: int = 1000,
    feasibility_prob: float = 0.999,
    seed: int = 0,
) -> RecommendationScore:
    """Model-based recommendation + true-function hypervolume scoring.

    Reference toy_synthetic_2D_JESMOCMF.py:533-614: take a shared grid, keep
    points the MODEL deems feasible with P > 0.999 (top-fidelity predictive,
    likelihood noise subtracted — the test is on the latent process,
    toy:545-546), Pareto-cull the model means, drop recommended points that
    are TRULY infeasible (toy:583-589), then score the TRUE functions' HV at
    the surviving set against the optimal HV on the same grid."""
    d = fitter.x_train.shape[1]
    rng = np.random.default_rng(seed)
    grid = rng.uniform(size=(grid_size, d))
    grid_j = jnp.asarray(grid, dtype=fitter.x_train.dtype)
    top = config.num_fidelities - 1

    objs = [bb for bb in blackboxes if not bb.is_constraint]
    cons = [bb for bb in blackboxes if bb.is_constraint]

    ref = (
        np.asarray(config.hv_reference, dtype=float)
        if config.hv_reference is not None
        else np.array([1000.0] * len(objs))  # reference point (1000,1000), toy:592
    )

    def true_values(pts):
        vals = np.stack(
            [np.asarray(bb.fns[top](pts)).reshape(-1) for bb in objs], axis=1
        )
        feas = np.ones(pts.shape[0], dtype=bool)
        for bb in cons:
            feas &= np.asarray(bb.fns[top](pts)).reshape(-1) >= bb.threshold
        return vals, feas

    # optimal HV on the grid (true-feasible true-Pareto points, toy:600-614).
    # Scored TOGETHER with the rec HV via hypervolume_pair so the
    # HV_FRONT_CAP summarization can never apply asymmetrically (an
    # independently-capped optimal side is a lower bound that can fall below
    # the exact rec HV → negative gap); opt_pts is held here and both values
    # are computed at the end.
    tv, tfeas = true_values(grid)
    opt_pts = tv[tfeas] if tfeas.any() else np.zeros((0, len(objs)))

    # model feasibility (P > feasibility_prob per constraint, latent noise
    # subtracted) + model-mean Pareto cull, all in one jitted device pass
    from mobocmf_tpu.fit import trainer

    dtype = fitter.x_train.dtype
    obj_models = [fitter.get_model(bb.name) for bb in objs]
    obj_p, obj_c, mcfg = trainer.stack_models(obj_models)
    if cons:
        con_models = [fitter.get_model(bb.name, is_constraint=True) for bb in cons]
        con_p, con_c, _ = trainer.stack_models(con_models)
        thr_std = jnp.asarray(
            [(bb.threshold - stats[bb.name][0]) / stats[bb.name][1] for bb in cons],
            dtype=dtype,
        )
    else:
        # explicit EMPTY stacked pytrees (leading axis 0) — same convention as
        # fit/fitter.py's zero-constraint conditioned training; never aliased
        # objective params
        con_p = jax.tree.map(lambda a: a[:0], obj_p)
        con_c = obj_c._replace(
            acq_eps=obj_c.acq_eps[:0],
            noise_lower=obj_c.noise_lower[:0],
            noise_upper=obj_c.noise_upper[:0],
        )
        thr_std = jnp.zeros((0,), dtype=dtype)
    obj_scale = jnp.asarray(
        [[stats[bb.name][0], stats[bb.name][1]] for bb in objs], dtype=dtype
    )
    means_j, feasible_j, mask_j = _recommendation_model_pass_jit(
        obj_p, obj_c, con_p, con_c, mcfg, top, grid_j,
        thr_std, obj_scale, feasibility_prob,
    )
    feasible = np.asarray(feasible_j)
    if not feasible.any():
        hv_opt, _ = hypervolume_pair(opt_pts, np.zeros((0, len(objs))), ref)
        return RecommendationScore(np.zeros((0, d)), 0.0, hv_opt, False, 0, 0, 0)
    mask = np.asarray(mask_j)
    rec_set = grid[mask]
    num_ini = int(rec_set.shape[0])

    # drop recommended points that are TRULY infeasible (toy:583-589)
    rec_vals, rec_feas = true_values(rec_set)
    feasible_flag = bool(rec_feas.all())
    rec_set = rec_set[rec_feas]
    rec_vals = rec_vals[rec_feas]
    num_fini = int(rec_set.shape[0])

    hv_opt, hv_rec = hypervolume_pair(
        opt_pts, rec_vals if num_fini else np.zeros((0, len(objs))), ref
    )
    return RecommendationScore(
        rec_set=rec_set, hv=hv_rec, hv_optimal=hv_opt, feasible=feasible_flag,
        num_infeasible=num_ini - num_fini, num_points_final=num_fini,
        num_points_initial=num_ini,
    )


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
