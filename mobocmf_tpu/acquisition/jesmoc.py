"""JESMOC acquisition over MFDGP models.

Re-implements /root/reference/mobocmf/acquisition_functions/JESMOC_MFDGP.py:
per-(blackbox, fidelity) information gain

    a(x) = 0.5 * clamp( log var_uncond(x) - log var_cond(x), 0 )

where both variances come from predict_for_acquisition (25x fixed-eps tiling +
moment matching). Coupled acquisition sums over the registered blackboxes at a
fidelity; the next point maximizes the coupled acquisition per fidelity and
picks the fidelity with the best cost-normalized value (:151-176), with an
eval_highest_fidelity variant that always evaluates the top fidelity
(:137-149).

Construction mirrors the reference's (slightly surprising) contract: the
passed fitter is snapshotted as the UNCONDITIONED model, then — when
model_cond is not supplied — Pareto sampling + conditioned training are driven
here, mutating the passed fitter into the conditioned model (:70-86).

Compilation model (TPU-first): every jitted program here is MODULE-LEVEL and
takes the model parameters as runtime arguments, never as baked-in constants.
A BO campaign constructs a fresh JESMOC_MFDGP each iteration with freshly
trained parameters; because the programs only depend on shapes + static
config, iteration 2+ hits the jit cache and triggers zero acquisition
recompiles (tested in tests/test_recompilation.py). The coupled hot path
additionally stacks all registered blackboxes into one pytree and vmaps the
information gain over them, so one program serves any number of blackboxes.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.acquisition.optimize import (
    optimize_acqf_box,
    optimize_acqf_box_multi,
)
from mobocmf_tpu.fit import trainer
from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
from mobocmf_tpu.models import mfdgp as M

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Module-level jitted programs (params are runtime args — no per-iteration
# recompiles; pattern: moop.SampledFunction)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("config", "fidelity"))
def info_gain(
    params_u: M.MFDGPParams,
    consts_u: M.MFDGPConsts,
    params_c: M.MFDGPParams,
    consts_c: M.MFDGPConsts,
    config: M.MFDGPConfig,
    fidelity: int,
    x: Array,
) -> Array:
    """Single-blackbox JES information gain (reference :38-52)."""
    _, var_u = M.predict_for_acquisition(params_u, consts_u, config, x, fidelity)
    _, var_c = M.predict_for_acquisition(params_c, consts_c, config, x, fidelity)
    return 0.5 * jnp.clip(jnp.log(var_u) - jnp.log(var_c), min=0.0)


# per-model layer states, shared helper with fit/conditioned.py
_stacked_states = trainer.states_stacked

# Switch (read at import): carry explicit L^{-1} in the acquisition states
# so every L-BFGS-loop predictive solve becomes an MXU matmul
# (models/svgp.predict_diag_state). ON by default since the round-5 TPU A/B:
# fused coupled-JES warm median 881 ms vs 7699 ms with triangular solves —
# 8.7x (benchmarks/evidence/ab_acq_inv_r5.txt). Numerically it perturbs acq
# values by ~cond(L)*eps (f32 ~1e-4), which the argmax is insensitive to
# (tests/test_fused_acq.py tolerance); the full acquisition test set incl.
# f64 torch-mirror parity passes either way. MOBOCMF_ACQ_INV=0 restores the
# solve path.
ACQ_INV_SOLVES = os.environ.get("MOBOCMF_ACQ_INV", "1") == "1"


def _coupled_gain_stacked(su_p, su_c, sc_p, sc_c, config, fidelity, x,
                          states_u=None, states_c=None):
    """Sum of info gains over blackboxes stacked along a leading axis."""

    def one(pu, cu, pc, cc, st_u, st_c):
        _, var_u = M.predict_for_acquisition(pu, cu, config, x, fidelity, states=st_u)
        _, var_c = M.predict_for_acquisition(pc, cc, config, x, fidelity, states=st_c)
        return 0.5 * jnp.clip(jnp.log(var_u) - jnp.log(var_c), min=0.0)

    st_axes = None if states_u is None else 0
    gains = jax.vmap(
        one,
        in_axes=(0, trainer.CONSTS_AXES, 0, trainer.CONSTS_AXES, st_axes, st_axes),
    )(su_p, su_c, sc_p, sc_c, states_u, states_c)
    return jnp.sum(gains, axis=0)


@partial(jax.jit, static_argnames=("config", "fidelity"))
def coupled_acq_stacked(
    su_p, su_c, sc_p, sc_c, config: M.MFDGPConfig, fidelity: int, x: Array
) -> Array:
    return _coupled_gain_stacked(
        su_p, su_c, sc_p, sc_c, config, fidelity, x,
        states_u=_stacked_states(su_p, su_c, config),
        states_c=_stacked_states(sc_p, sc_c, config),
    )


@partial(
    jax.jit,
    static_argnames=(
        "config", "fidelity", "input_dim", "num_restarts", "raw_samples", "maxiter",
    ),
)
def optimize_coupled_jes(
    su_p,
    su_c,
    sc_p,
    sc_c,
    config: M.MFDGPConfig,
    fidelity: int,
    key: jax.Array,
    input_dim: int,
    num_restarts: int = 5,
    raw_samples: int = 200,
    maxiter: int = 200,
):
    """Maximize the coupled JES acquisition at one fidelity over [0,1]^d."""
    dtype = su_c.z_x[0].dtype
    # factor every model's inducing chain once; the L-BFGS loop reuses it
    states_u = _stacked_states(su_p, su_c, config, with_inv=ACQ_INV_SOLVES)
    states_c = _stacked_states(sc_p, sc_c, config, with_inv=ACQ_INV_SOLVES)

    def acq(xx):
        return _coupled_gain_stacked(
            su_p, su_c, sc_p, sc_c, config, fidelity, xx, states_u, states_c
        )

    return optimize_acqf_box(
        acq, input_dim, key,
        num_restarts=num_restarts, raw_samples=raw_samples, maxiter=maxiter,
        dtype=dtype,
    )


def _coupled_gain_all_stacked(su_p, su_c, sc_p, sc_c, config, x,
                              states_u, states_c):
    """(F, N) coupled JES gains at every fidelity from one all-layer forward
    per blackbox (M.predict_for_acquisition_all), summed over blackboxes."""

    def one(pu, cu, pc, cc, st_u, st_c):
        _, var_u = M.predict_for_acquisition_all(pu, cu, config, x, states=st_u)
        _, var_c = M.predict_for_acquisition_all(pc, cc, config, x, states=st_c)
        return 0.5 * jnp.clip(jnp.log(var_u) - jnp.log(var_c), min=0.0)

    gains = jax.vmap(
        one, in_axes=(0, trainer.CONSTS_AXES, 0, trainer.CONSTS_AXES, 0, 0)
    )(su_p, su_c, sc_p, sc_c, states_u, states_c)
    return jnp.sum(gains, axis=0)  # (F, N)


@partial(
    jax.jit,
    static_argnames=("config", "input_dim", "num_restarts", "raw_samples", "maxiter"),
)
def optimize_coupled_jes_all_fidelities(
    su_p,
    su_c,
    sc_p,
    sc_c,
    config: M.MFDGPConfig,
    key: jax.Array,
    input_dim: int,
    num_restarts: int = 5,
    raw_samples: int = 200,
    maxiter: int = 200,
):
    """Maximize the coupled JES acquisition at EVERY fidelity in ONE program.

    Replaces the per-fidelity Python loop over optimize_coupled_jes (round-2
    jesmoc.py:338-347, the dominant late-campaign phase): the inducing
    Cholesky chains are factored once and shared, raw-sample screening scores
    all fidelities from one forward pass, and all F x num_restarts L-BFGS
    lanes run in one vmapped while_loop. Returns (xs (F, d), values (F,)).
    """
    states_u = _stacked_states(su_p, su_c, config, with_inv=ACQ_INV_SOLVES)
    states_c = _stacked_states(sc_p, sc_c, config, with_inv=ACQ_INV_SOLVES)
    dtype = su_c.z_x[0].dtype

    def acq_all(xx):
        return _coupled_gain_all_stacked(
            su_p, su_c, sc_p, sc_c, config, xx, states_u, states_c
        )

    return optimize_acqf_box_multi(
        acq_all, config.num_fidelities, input_dim, key,
        num_restarts=num_restarts, raw_samples=raw_samples, maxiter=maxiter,
        dtype=dtype,
    )


@partial(
    jax.jit,
    static_argnames=(
        "config", "fidelity", "input_dim", "rho",
        "num_restarts", "raw_samples", "maxiter",
    ),
)
def optimize_coupled_jes_penalized(
    su_p,
    su_c,
    sc_p,
    sc_c,
    config: M.MFDGPConfig,
    fidelity: int,
    chosen,  # (k, d) already-chosen batch points, PAD-padded
    key: jax.Array,
    input_dim: int,
    rho: float,
    num_restarts: int = 5,
    raw_samples: int = 200,
    maxiter: int = 200,
):
    """One greedy batch pick: coupled JES with a local-penalization repulsion
    factor around `chosen` (acquisition/batch.py's construction, but module
    level with params as runtime args so BO iterations 2+ hit the jit cache)."""
    dtype = su_c.z_x[0].dtype
    states_u = _stacked_states(su_p, su_c, config, with_inv=ACQ_INV_SOLVES)
    states_c = _stacked_states(sc_p, sc_c, config, with_inv=ACQ_INV_SOLVES)

    def acq(xx):
        base = _coupled_gain_stacked(
            su_p, su_c, sc_p, sc_c, config, fidelity, xx, states_u, states_c
        )
        d2 = jnp.sum((xx[:, None, :] - chosen[None, :, :]) ** 2, axis=-1)
        pen = 1.0 - jnp.exp(-d2 / (2.0 * rho**2))
        return base * jnp.prod(pen, axis=1)

    return optimize_acqf_box(
        acq, input_dim, key,
        num_restarts=num_restarts, raw_samples=raw_samples, maxiter=maxiter,
        dtype=dtype,
    )


class _JES_MFDGP:
    """Per-blackbox, per-fidelity information gain (reference :19-53)."""

    def __init__(self, fidelity: int, mfdgp_uncond: M.MFDGPModel, mfdgp_cond: M.MFDGPModel):
        self.fidelity = fidelity
        self.mfdgp_uncond = mfdgp_uncond
        self.mfdgp_cond = mfdgp_cond

    def __call__(self, x: Array) -> Array:
        if x.ndim > 2:  # botorch-style (b, q=1, d) batches
            x = x[:, 0, :]
        return info_gain(
            self.mfdgp_uncond.params, self.mfdgp_uncond.consts,
            self.mfdgp_cond.params, self.mfdgp_cond.consts,
            self.mfdgp_uncond.config, self.fidelity, x,
        )


class JESMOC_MFDGP:
    def __init__(
        self,
        model: BlackBoxMFDGPFitter,
        num_fidelities: int = 1,
        model_cond: Optional[BlackBoxMFDGPFitter] = None,
        standard_bounds=None,
        eval_highest_fidelity: bool = False,
        seed: int = 0,
        acq_maxiter: int = 200,
        acq_raw_samples: int = 200,
    ):
        """acq_maxiter caps the candidate L-BFGS (reference parity: 200,
        botorch options maxiter at JESMOC_MFDGP.py:159-160). Large-m scale
        configs lower it to keep the optimizer's device program under the
        TPU worker's ~2-minute execution limit; the loop normally converges
        in 20-60 iterations."""
        self.standard_bounds = standard_bounds
        self.eval_highest_fidelity = eval_highest_fidelity
        self.acq_maxiter = int(acq_maxiter)
        self.acq_raw_samples = int(acq_raw_samples)
        self.blackbox_mfdgp_fitter_uncond = model.copy_uncond()
        self.key = jax.random.key(seed)

        if model_cond is None:
            solution = model.sample_and_store_pareto_solution()
            self.pareto_set = solution.pareto_set
            self.pareto_front = solution.pareto_front
            model.train_conditioned_mfdgps()
            self.blackbox_mfdgp_fitter_cond = model
        else:
            self.pareto_set = model_cond.pareto_set
            self.pareto_front = model_cond.pareto_front
            self.blackbox_mfdgp_fitter_cond = model_cond

        self.num_fidelities = num_fidelities
        self.objectives: Dict[int, Dict[str, _JES_MFDGP]] = {}
        self.constraints: Dict[int, Dict[str, _JES_MFDGP]] = {}
        self.costs_blackboxes: Dict[int, Dict[str, float]] = {}
        for n_f in range(num_fidelities):
            self.objectives[n_f] = {}
            self.constraints[n_f] = {}
            self.costs_blackboxes[n_f] = {"total": 0.0}
        self._stacked_cache: Dict[int, tuple] = {}

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def add_blackbox(
        self, fidelity: int, blackbox_name: str, cost_evaluation: float = 1.0,
        is_constraint: bool = False,
    ) -> _JES_MFDGP:
        mfdgp_uncond = self.blackbox_mfdgp_fitter_uncond.get_model(
            blackbox_name, is_constraint=is_constraint
        )
        mfdgp_cond = self.blackbox_mfdgp_fitter_cond.get_model(
            blackbox_name, is_constraint=is_constraint
        )
        jes = _JES_MFDGP(fidelity, mfdgp_uncond, mfdgp_cond)
        if is_constraint:
            self.constraints[fidelity][blackbox_name] = jes
        else:
            self.objectives[fidelity][blackbox_name] = jes
        self.costs_blackboxes[fidelity]["total"] += cost_evaluation
        self.costs_blackboxes[fidelity][blackbox_name] = cost_evaluation
        self._stacked_cache.pop(fidelity, None)
        return jes

    def decoupled_acq(self, x: Array, fidelity: int, blackbox_name: str, is_constraint=True) -> Array:
        reg = self.constraints if is_constraint else self.objectives
        return reg[fidelity][blackbox_name](x)

    def _stacked(self, fidelity: int):
        """Stack all blackboxes registered at `fidelity` (uncond + cond).
        Returns None when no blackbox is registered at this fidelity."""
        if fidelity not in self._stacked_cache:
            items = list(self.objectives[fidelity].values()) + list(
                self.constraints[fidelity].values()
            )
            if not items:
                self._stacked_cache[fidelity] = None
            else:
                su_p, su_c, config = trainer.stack_models(
                    [j.mfdgp_uncond for j in items]
                )
                sc_p, sc_c, _ = trainer.stack_models([j.mfdgp_cond for j in items])
                self._stacked_cache[fidelity] = (su_p, su_c, sc_p, sc_c, config)
        return self._stacked_cache[fidelity]

    def coupled_acq(self, x: Array, fidelity: int) -> Array:
        if x.ndim > 2:
            x = x[:, 0, :]
        stacked = self._stacked(fidelity)
        if stacked is None:  # empty sum over registered blackboxes
            return jnp.zeros((x.shape[0],), dtype=x.dtype)
        su_p, su_c, sc_p, sc_c, config = stacked
        return coupled_acq_stacked(su_p, su_c, sc_p, sc_c, config, fidelity, x)

    # -- candidate selection (reference :137-184) -------------------------------

    def _input_dim(self) -> int:
        for f in range(self.num_fidelities):
            some = next(iter(self.objectives[f].values()), None) or next(
                iter(self.constraints[f].values()), None
            )
            if some is not None:
                return some.mfdgp_uncond.consts.z_x[0].shape[1]
        raise ValueError("no blackboxes registered at any fidelity")

    def _optimize_fidelity(self, fidelity: int):
        stacked = self._stacked(fidelity)
        if stacked is None:
            return None, 0.0
        su_p, su_c, sc_p, sc_c, config = stacked
        return optimize_coupled_jes(
            su_p, su_c, sc_p, sc_c, config, fidelity, self._next_key(),
            self._input_dim(), maxiter=self.acq_maxiter,
            raw_samples=self.acq_raw_samples,
        )

    def _get_nextpoint_coupled_highest_fidelity(self, iteration=None, verbose=False):
        fidelity = self.num_fidelities - 1
        x_best, value = self._optimize_fidelity(fidelity)
        if verbose:
            print(
                f"Iter: {iteration} Acquisition: "
                f"{float(value) / self.costs_blackboxes[0]['total']} "
                f"Evaluating fidelity {fidelity} at {x_best}"
            )
        return x_best, fidelity

    def _fused_eligible(self):
        """The fused all-fidelity optimizer needs the SAME blackbox set
        registered at every fidelity (the standard coupled campaign). Returns
        the shared stacked pytrees, or None (-> per-fidelity fallback)."""
        ref = None
        for f in range(self.num_fidelities):
            names = (
                tuple(self.objectives[f].keys()),
                tuple(self.constraints[f].keys()),
            )
            if not (names[0] or names[1]):
                return None
            if ref is None:
                ref = names
            elif names != ref:
                return None
        return self._stacked(0)

    def _get_nextpoint_coupled(self, iteration=None, verbose=False):
        best_weighted, best_x, best_fid = None, None, 0
        fused = self._fused_eligible() if self.num_fidelities > 1 else None
        if fused is not None:
            su_p, su_c, sc_p, sc_c, config = fused
            xs, vals = optimize_coupled_jes_all_fidelities(
                su_p, su_c, sc_p, sc_c, config, self._next_key(),
                self._input_dim(), maxiter=self.acq_maxiter,
                raw_samples=self.acq_raw_samples,
            )
            xs, vals = np.asarray(xs), np.asarray(vals)
            for fidelity in range(self.num_fidelities):
                weighted = float(vals[fidelity]) / self.costs_blackboxes[fidelity]["total"]
                if best_weighted is None or weighted > best_weighted:
                    best_weighted, best_x, best_fid = weighted, xs[fidelity], fidelity
        else:
            for fidelity in range(self.num_fidelities):
                x_f, value = self._optimize_fidelity(fidelity)
                if x_f is None:  # no blackboxes registered at this fidelity
                    continue
                weighted = float(value) / self.costs_blackboxes[fidelity]["total"]
                if best_weighted is None or weighted > best_weighted:
                    best_weighted, best_x, best_fid = weighted, x_f, fidelity
        if best_x is None:
            raise ValueError("no blackboxes registered at any fidelity")
        if verbose:
            print(
                f"Iter: {iteration} Acquisition: "
                f"{best_weighted * self.costs_blackboxes[best_fid]['total']} "
                f"Evaluating fidelity {best_fid} at {best_x}"
            )
        return best_x, best_fid

    def get_nextpoint_coupled(self, iteration=None, verbose=False):
        if self.eval_highest_fidelity:
            return self._get_nextpoint_coupled_highest_fidelity(iteration, verbose)
        return self._get_nextpoint_coupled(iteration, verbose)

    def get_batch_coupled(self, fidelity: int, q: int, x0=None, rho=None):
        """Greedy local-penalization q-batch at `fidelity` (BASELINE config
        #5; new capability — the reference is q=1 only). `x0` (k0, d) seeds
        the already-chosen set so the q=1 maximizer can be the batch's first
        point. Returns (q, d) candidates."""
        from mobocmf_tpu.acquisition.batch import PAD_VALUE

        stacked = self._stacked(fidelity)
        if stacked is None:
            raise ValueError(f"no blackboxes registered at fidelity {fidelity}")
        su_p, su_c, sc_p, sc_c, config = stacked
        d = self._input_dim()
        dtype = su_c.z_x[0].dtype
        if rho is None:
            rho = 0.05 * (d**0.5)
        k0 = 0 if x0 is None else int(np.atleast_2d(np.asarray(x0)).shape[0])
        chosen = jnp.full((k0 + q, d), PAD_VALUE, dtype=dtype)
        if k0:
            chosen = chosen.at[:k0].set(
                jnp.asarray(np.atleast_2d(np.asarray(x0)), dtype=dtype)
            )
        for k in range(q):
            x_k, _ = optimize_coupled_jes_penalized(
                su_p, su_c, sc_p, sc_c, config, fidelity, chosen,
                self._next_key(), d, float(rho), maxiter=self.acq_maxiter,
                raw_samples=self.acq_raw_samples,
            )
            chosen = chosen.at[k0 + k].set(x_k)
        return chosen[k0:]
