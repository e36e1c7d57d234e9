"""MESMOC acquisition over MFGP models.

Re-implements /root/reference/mobocmf/acquisition_functions/MESMOC_MFGP.py:
max-value entropy search with constraints. For objectives, the truncated-
Gaussian entropy reduction given the best value y*:

    a(x) = clamp( 0.5 log(sigma^2 + sigma_n^2) - 0.5 log(sigma_trunc^2 + sigma_n^2), 0 )
    sigma_trunc^2 = sigma^2 * clamp(1 + (g - r) r, CLAMP_LB),
    g = (y* - mu)/sigma,  r = pdf(g) / (1 - cdf(g))

For constraints, the feasibility probability 1 - Phi((t - mu)/sigma).
Coupled acquisition = (sum of objective entropies) * (product of constraint
feasibility probabilities at the HIGHEST fidelity) (:118-130). Fidelity
selection is cost-normalized like JESMOC (:132-157).

All jitted programs are module-level and take the MFGP models + best values /
thresholds as runtime pytree arguments, so rebuilding the acquisition object
each BO iteration never recompiles (same pattern as acquisition/jesmoc.py).
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

from mobocmf_tpu.acquisition.optimize import optimize_acqf_box
from mobocmf_tpu.models import mfgp as G

Array = jnp.ndarray

CLAMP_LB = float(np.finfo(np.float32).eps)  # reference :19


def _objective_entropy(
    model: G.MFGPModel, best_value: Array, fidelity: int, x: Array, state=None
) -> Array:
    mean, var = G.predict(model, x, fidelity, state=state)
    std = jnp.sqrt(var)
    g = (best_value - mean) / std
    cdf = jnp.minimum(norm.cdf(g), 1.0 - CLAMP_LB)
    pdf = jnp.exp(norm.logpdf(g))
    ratio = pdf / (1.0 - cdf)
    var_trunc = var * jnp.maximum(1.0 + (g - ratio) * ratio, CLAMP_LB)
    sigma_n = G.noise(model.params)
    ent_cond = 0.5 * jnp.log(var_trunc + sigma_n)
    ent_uncond = 0.5 * jnp.log(var + sigma_n)
    return jnp.clip(ent_uncond - ent_cond, min=0.0)


def _constraint_prob(
    model: G.MFGPModel, threshold: Array, fidelity: int, x: Array, state=None
) -> Array:
    """1 - Phi((t - mu)/sigma). The reference's constraint branch uses the
    UNCLAMPED cdf (MESMOC_MFGP.py:71 recomputes normal.cdf, not the clamped
    cdf_mvs from :53), so deeply infeasible points return exactly 0."""
    mean, var = G.predict(model, x, fidelity, state=state)
    g = (threshold - mean) / jnp.sqrt(var)
    return 1.0 - norm.cdf(g)


@partial(jax.jit, static_argnames=("fidelity", "is_constraint"))
def mes_forward(
    model: G.MFGPModel, value: Array, fidelity: int, is_constraint: bool, x: Array
) -> Array:
    if is_constraint:
        return _constraint_prob(model, value, fidelity, x)
    return _objective_entropy(model, value, fidelity, x)


def _coupled_mes(obj_models, best_values, con_models, thresholds, fidelity,
                 top_fidelity, x, obj_states=None, con_states=None):
    if obj_states is None:
        obj_states = tuple(None for _ in obj_models)
    if con_states is None:
        con_states = tuple(None for _ in con_models)
    acq = jnp.zeros((x.shape[0],), dtype=x.dtype)
    for model, best, st in zip(obj_models, best_values, obj_states):
        acq = acq + _objective_entropy(model, best, fidelity, x, state=st)
    prob = jnp.ones((x.shape[0],), dtype=x.dtype)
    for model, thr, st in zip(con_models, thresholds, con_states):
        prob = prob * _constraint_prob(model, thr, top_fidelity, x, state=st)
    return acq * prob


@partial(jax.jit, static_argnames=("fidelity", "top_fidelity"))
def coupled_mes(obj_models, best_values, con_models, thresholds, fidelity, top_fidelity, x):
    return _coupled_mes(obj_models, best_values, con_models, thresholds, fidelity, top_fidelity, x)


@partial(
    jax.jit,
    static_argnames=(
        "fidelity", "top_fidelity", "input_dim", "num_restarts", "raw_samples", "maxiter",
    ),
)
def optimize_coupled_mes(
    obj_models,
    best_values,
    con_models,
    thresholds,
    fidelity: int,
    top_fidelity: int,
    key: jax.Array,
    input_dim: int,
    num_restarts: int = 5,
    raw_samples: int = 200,
    maxiter: int = 200,
):
    dtype = obj_models[0].x_train.dtype
    # factor every model's train Gram ONCE; the L-BFGS loop's hundreds of
    # candidate evaluations reuse (l, alpha) instead of refactorizing N x N
    obj_states = tuple(G.posterior_state(m) for m in obj_models)
    con_states = tuple(G.posterior_state(m) for m in con_models)

    def acq(xx):
        return _coupled_mes(
            obj_models, best_values, con_models, thresholds, fidelity,
            top_fidelity, xx, obj_states, con_states,
        )

    return optimize_acqf_box(
        acq, input_dim, key,
        num_restarts=num_restarts, raw_samples=raw_samples, maxiter=maxiter,
        dtype=dtype,
    )


class _MES_MFGP:
    def __init__(self, fidelity: int, model: G.MFGPModel, best_value: float, is_constraint: bool):
        self.fidelity = fidelity
        self.model = model
        self.best_value = float(best_value)
        self.is_constraint = is_constraint

    def __call__(self, x: Array) -> Array:
        if x.ndim > 2:
            x = x[:, 0, :]
        value = jnp.asarray(self.best_value, dtype=x.dtype)
        return mes_forward(self.model, value, self.fidelity, self.is_constraint, x)


class MESMOC_MFGP:
    def __init__(
        self,
        objectives: Dict[str, G.MFGPModel],
        constraints: Dict[str, G.MFGPModel],
        input_dim: int,
        num_fidelities: int,
        best_objective_values: Dict[str, float],
        constraint_thresholds: Dict[str, float],
        standard_bounds=None,
        seed: int = 0,
    ):
        self.standard_bounds = standard_bounds
        self.num_fidelities = num_fidelities
        self.input_dim = input_dim
        self.objectives = objectives
        self.constraints = constraints
        self.best_objective_values = best_objective_values
        self.constraint_thresholds = constraint_thresholds
        self.key = jax.random.key(seed)

        self.acquisition_objs: Dict[int, Dict[str, _MES_MFGP]] = {}
        self.acquisition_cons: Dict[int, Dict[str, _MES_MFGP]] = {}
        self.costs_blackboxes: Dict[int, Dict[str, float]] = {}
        for n_f in range(num_fidelities):
            self.acquisition_objs[n_f] = {}
            self.acquisition_cons[n_f] = {}
            self.costs_blackboxes[n_f] = {"total": 0.0}

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def add_blackbox(
        self, fidelity: int, blackbox_name: str, cost_evaluation: float = 1.0,
        is_constraint: bool = False,
    ) -> _MES_MFGP:
        if not is_constraint:
            mes = _MES_MFGP(
                fidelity, self.objectives[blackbox_name],
                self.best_objective_values[blackbox_name], False,
            )
            self.acquisition_objs[fidelity][blackbox_name] = mes
            self.costs_blackboxes[fidelity]["total"] += cost_evaluation
            self.costs_blackboxes[fidelity][blackbox_name] = cost_evaluation
        else:
            mes = _MES_MFGP(
                fidelity, self.constraints[blackbox_name],
                self.constraint_thresholds[blackbox_name], True,
            )
            self.acquisition_cons[fidelity][blackbox_name] = mes
        return mes

    def _gather(self, fidelity: int):
        top = self.num_fidelities - 1
        objs = list(self.acquisition_objs[fidelity].values())
        cons = list(self.acquisition_cons[top].values())
        dtype = objs[0].model.x_train.dtype if objs else jnp.float64
        obj_models = tuple(a.model for a in objs)
        best_values = tuple(jnp.asarray(a.best_value, dtype=dtype) for a in objs)
        con_models = tuple(a.model for a in cons)
        thresholds = tuple(jnp.asarray(a.best_value, dtype=dtype) for a in cons)
        return obj_models, best_values, con_models, thresholds, top

    def coupled_acq(self, x: Array, fidelity: int) -> Array:
        if x.ndim > 2:
            x = x[:, 0, :]
        obj_models, best_values, con_models, thresholds, top = self._gather(fidelity)
        return coupled_mes(obj_models, best_values, con_models, thresholds, fidelity, top, x)

    def get_nextpoint_coupled(self, iteration=None, verbose=False):
        best_weighted, best_x, best_fid = None, None, 0
        for fidelity in range(self.num_fidelities):
            obj_models, best_values, con_models, thresholds, top = self._gather(fidelity)
            if not obj_models:  # no objectives registered at this fidelity
                continue
            x_f, value = optimize_coupled_mes(
                obj_models, best_values, con_models, thresholds,
                fidelity, top, self._next_key(), self.input_dim,
            )
            weighted = float(value) / self.costs_blackboxes[fidelity]["total"]
            if best_weighted is None or weighted > best_weighted:
                best_weighted, best_x, best_fid = weighted, x_f, fidelity
        if best_x is None:
            raise ValueError("no objectives registered at any fidelity")
        if verbose:
            print(
                f"Iter: {iteration} Acquisition: "
                f"{best_weighted * self.costs_blackboxes[best_fid]['total']} "
                f"Evaluating fidelity {best_fid} at {best_x}"
            )
        return best_x, best_fid
