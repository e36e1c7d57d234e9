"""Feasibility-calibrated prior-problem generator (test_functions/prior_problem).

Mirrors the reference's problem construction for its toy benchmark
(examples/toy_synthetic_2D_JESMOCMF/toy_synthetic_2D_JESMOCMF.py:50-96):
objectives sampled from the MFDGP prior, constraints rejection-sampled to
10-90% per-constraint feasibility plus a joint-feasibility floor.
"""

import jax
import numpy as np
import pytest

from mobocmf_tpu.sampling import rff
from mobocmf_tpu.test_functions.prior_problem import sample_problem


@pytest.mark.parametrize("seed", [0, 4])
def test_calibrated_feasibility(seed):
    probe = np.random.default_rng(123).uniform(size=(500, 2))
    objs, cons = sample_problem(
        jax.random.key(seed), d=2, num_constraints=2, probe=probe
    )
    assert len(objs) == 2 and len(cons) == 2

    joint = np.ones(probe.shape[0], dtype=bool)
    for c in cons:
        vals = np.asarray(rff.eval_sample(c, probe))
        frac = float((vals >= 0).mean())
        assert 0.1 <= frac <= 0.9, frac
        joint &= vals >= 0
    # the guarantee that kills the silent Pareto retry storms: a jointly
    # feasible region covering >= 5% of the probe grid
    assert joint.mean() >= 0.05

    # objectives are usable function samples at both fidelities
    for o in objs:
        for layer in range(2):
            v = np.asarray(rff.eval_sample(o, probe[:16], layer=layer))
            assert np.isfinite(v).all()


def test_deterministic_given_key_and_probe():
    probe = np.random.default_rng(5).uniform(size=(500, 2))
    a = sample_problem(jax.random.key(1), d=2, num_constraints=1, probe=probe)
    b = sample_problem(jax.random.key(1), d=2, num_constraints=1, probe=probe)
    va = np.asarray(rff.eval_sample(a[1][0], probe[:8]))
    vb = np.asarray(rff.eval_sample(b[1][0], probe[:8]))
    np.testing.assert_allclose(va, vb)
