"""Feasibility-calibrated problems sampled from the MFDGP prior.

The reference generates its toy benchmark problems by sampling ground-truth
objectives/constraints from an untrained MFDGP prior via RFF, and
rejection-samples each constraint until 10-90% of a probe grid is feasible
(reference examples/toy_synthetic_2D_JESMOCMF/toy_synthetic_2D_JESMOCMF.py:50-96,
feasibility calibration :60-76).  This module is the shared generator used by
the toy example AND bench.py so both operate on problems with a comparable,
non-degenerate feasible region — an uncalibrated prior draw can leave a
near-empty feasible set, which sends the Pareto-sampling retry loop
(fit/fitter.py) into tens of silent resamples and makes iteration wall-clock
bimodal.
"""

from __future__ import annotations

from typing import List

import numpy as np


def sample_problem(
    key,
    d: int = 2,
    num_constraints: int = 2,
    num_fidelities: int = 2,
    max_tries: int = 30,
    probe: np.ndarray | None = None,
    min_joint_feasible: float = 0.05,
):
    """Prior-sampled objectives + feasibility-calibrated constraints.

    Returns (objs, cons): lists of `rff.MFDGPFunctionSample` ground-truth
    functions (evaluate with `rff.eval_sample(s, x, layer=fidelity)`).

    Per-constraint feasibility (fraction of probe points with value >= 0) is
    rejection-sampled into [0.1, 0.9] like the reference (toy:60-76), PLUS a
    joint-feasibility floor: independently calibrated constraints can
    otherwise leave a jointly infeasible problem (observed for the toy
    example's SEED=4: joint feasible fraction exactly 0).

    `probe` defaults to 500 points derived from `key` itself, so the WHOLE
    problem (objectives, constraints, calibration probe) is a pure function
    of one jax PRNG key — one seeded stream, no global-numpy-RNG dependence
    (the reference splits seeding across torch and numpy globals, toy:22-23;
    round-2 inherited that flaw through a global np.random probe draw).
    """
    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.sampling import rff

    keys = jax.random.split(key, 2)
    objs = [rff.sample_prior(k, d, num_fidelities) for k in keys]

    cons: List = []
    if probe is None:
        probe = np.asarray(
            jax.random.uniform(jax.random.fold_in(key, 777), (500, d)),
            dtype=float,
        )
    probe_j = jnp.asarray(probe)
    key_c = jax.random.fold_in(key, 999)
    joint_feas = np.ones(probe.shape[0], dtype=bool)
    while len(cons) < num_constraints:
        for _ in range(max_tries):
            key_c, k = jax.random.split(key_c)
            cand = rff.sample_prior(k, d, num_fidelities)
            vals = np.asarray(rff.eval_sample(cand, probe_j))
            frac = float((vals >= 0).mean())
            if 0.1 <= frac <= 0.9 and (
                (joint_feas & (vals >= 0)).mean() >= min_joint_feasible
            ):
                cons.append(cand)
                joint_feas &= vals >= 0
                break
        else:
            raise ValueError(
                "could not sample a constraint with 10-90% feasibility"
            )
    return objs, cons
