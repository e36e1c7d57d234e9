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
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from mobocmf_tpu.acquisition.optimize import optimize_acqf_box
from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
from mobocmf_tpu.models import mfdgp as M

Array = jnp.ndarray


class _JES_MFDGP:
    """Per-blackbox, per-fidelity information gain (reference :19-53)."""

    def __init__(self, fidelity: int, mfdgp_uncond: M.MFDGPModel, mfdgp_cond: M.MFDGPModel):
        self.fidelity = fidelity
        self.mfdgp_uncond = mfdgp_uncond
        self.mfdgp_cond = mfdgp_cond
        self._jit_forward = jax.jit(self._forward_impl)

    def _forward_impl(self, x: Array) -> Array:
        mu_u, var_u = M.predict_for_acquisition(
            self.mfdgp_uncond.params, self.mfdgp_uncond.consts,
            self.mfdgp_uncond.config, x, self.fidelity,
        )
        mu_c, var_c = M.predict_for_acquisition(
            self.mfdgp_cond.params, self.mfdgp_cond.consts,
            self.mfdgp_cond.config, x, self.fidelity,
        )
        return 0.5 * jnp.clip(jnp.log(var_u) - jnp.log(var_c), min=0.0)

    def __call__(self, x: Array) -> Array:
        if x.ndim > 2:  # botorch-style (b, q=1, d) batches
            x = x[:, 0, :]
        return self._jit_forward(x)


class JESMOC_MFDGP:
    def __init__(
        self,
        model: BlackBoxMFDGPFitter,
        num_fidelities: int = 1,
        model_cond: Optional[BlackBoxMFDGPFitter] = None,
        standard_bounds=None,
        eval_highest_fidelity: bool = False,
        seed: int = 0,
    ):
        self.standard_bounds = standard_bounds
        self.eval_highest_fidelity = eval_highest_fidelity
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
        return jes

    def decoupled_acq(self, x: Array, fidelity: int, blackbox_name: str, is_constraint=True) -> Array:
        reg = self.constraints if is_constraint else self.objectives
        return reg[fidelity][blackbox_name](x)

    def coupled_acq(self, x: Array, fidelity: int) -> Array:
        acq = jnp.zeros((x.shape[0],), dtype=x.dtype)
        for obj in self.objectives[fidelity].values():
            acq = acq + obj(x)
        for con in self.constraints[fidelity].values():
            acq = acq + con(x)
        return acq

    # -- candidate selection (reference :137-184) -------------------------------

    def _input_dim(self) -> int:
        some = next(iter(self.objectives[0].values()), None) or next(
            iter(self.constraints[0].values())
        )
        return some.mfdgp_uncond.consts.z_x[0].shape[1]

    def _optimize_fidelity(self, fidelity: int):
        d = self._input_dim()
        dtype = (
            next(iter(self.objectives[0].values())).mfdgp_uncond.consts.z_x[0].dtype
            if self.objectives[0]
            else jnp.float64
        )
        # one jitted program per fidelity (cached across BO iterations of the
        # same shapes); eager dispatch over a remote TPU tunnel is the enemy
        if not hasattr(self, "_opt_jit_cache"):
            self._opt_jit_cache = {}
        if fidelity not in self._opt_jit_cache:
            import functools

            self._opt_jit_cache[fidelity] = jax.jit(
                functools.partial(
                    optimize_acqf_box,
                    lambda xx: self.coupled_acq(xx, fidelity),
                    d,
                    num_restarts=5,
                    raw_samples=200,
                    maxiter=200,
                    dtype=dtype,
                )
            )
        return self._opt_jit_cache[fidelity](self._next_key())

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

    def _get_nextpoint_coupled(self, iteration=None, verbose=False):
        best_weighted, best_x, best_fid = None, None, 0
        for fidelity in range(self.num_fidelities):
            x_f, value = self._optimize_fidelity(fidelity)
            weighted = float(value) / self.costs_blackboxes[fidelity]["total"]
            if fidelity == 0 or weighted > best_weighted:
                best_weighted, best_x, best_fid = weighted, x_f, fidelity
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
