"""Random acquisition baseline.

Re-implements /root/reference/mobocmf/acquisition_functions/Random_choice.py:
uniform random candidate; fidelity sampled with probability proportional to
1 - cost_f / total_cost (:44-56)."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jnp.ndarray


class Random_choice:
    def __init__(self, input_size=None, num_fidelities: int = 1, seed=None):
        self.input_size = input_size
        self.num_fidelities = num_fidelities
        self.key = jax.random.key(0 if seed is None else seed)

        self.costs_blackboxes: Dict[int, Dict[str, float]] = {}
        for n_f in range(num_fidelities):
            self.costs_blackboxes[n_f] = {"total": 0.0}
        self.coupled_costs_fidelities = jnp.zeros((num_fidelities,))
        self.total_cost_fidelities = 0.0

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def add_blackbox(self, fidelity: int, blackbox_name: str, cost_evaluation: float = 1.0):
        self.costs_blackboxes[fidelity][blackbox_name] = cost_evaluation
        self.coupled_costs_fidelities = self.coupled_costs_fidelities.at[fidelity].add(
            cost_evaluation
        )
        self.total_cost_fidelities += cost_evaluation

    def decoupled_acq(self, x: Array, fidelity: int, blackbox_name=None) -> Array:
        return jax.random.uniform(self._next_key(), (x.shape[0],))

    def coupled_acq(self, x: Array, fidelity: int) -> Array:
        return jax.random.uniform(self._next_key(), (x.shape[0],))

    def get_batch_coupled(self, q: int, iteration=None, verbose=False):
        """q iid uniform candidates at one sampled fidelity — the q>1 batch
        analogue of get_nextpoint_coupled (mirrors JESMOC_MFDGP's
        get_batch_coupled interface so BO loops can swap acquisitions)."""
        x0, fidelity = self.get_nextpoint_coupled(iteration=iteration, verbose=verbose)
        if q == 1:
            return x0[None, :], fidelity
        extra = jax.random.uniform(self._next_key(), (q - 1, self.input_size))
        return jnp.vstack([x0[None, :], extra]), fidelity

    def get_nextpoint_coupled(self, iteration=None, verbose=False):
        probs = 1.0 - self.coupled_costs_fidelities / self.total_cost_fidelities
        nextpoint = jax.random.uniform(self._next_key(), (self.input_size,))
        fidelity = int(
            jax.random.choice(
                self._next_key(), self.num_fidelities, (), p=probs / jnp.sum(probs)
            )
        )
        if verbose:
            print(f"Iter: {iteration}  Evaluating fidelity {fidelity} at {nextpoint}")
        return nextpoint, fidelity
