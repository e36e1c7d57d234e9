"""Fused all-fidelity acquisition optimization: equivalence + usage.

The round-3 acquisition redesign runs the coupled JES candidate optimization
for every fidelity in ONE program (acquisition/jesmoc.py
optimize_coupled_jes_all_fidelities): one all-layer forward scores all
fidelities (the layer stack is sequential, so the top-fidelity propagation
computes the lower layers anyway), the inducing Cholesky chains are shared,
and all F x restarts L-BFGS lanes run in one vmapped while_loop.

These tests pin the fused path to the per-fidelity path it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobocmf_tpu.acquisition import jesmoc as J
from mobocmf_tpu.fit import trainer
from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
from mobocmf_tpu.models import mfdgp as M
from mobocmf_tpu.sampling import rff


@pytest.fixture(scope="module")
def fitters():
    key = jax.random.key(0)
    d = 2
    samples = [rff.sample_prior(k, d, 2) for k in jax.random.split(key, 3)]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(14, d)))
    fid = jnp.asarray((np.arange(14) % 2))
    fitter = BlackBoxMFDGPFitter(
        num_fidelities=2, batch_size=14, num_epochs_1=5, num_epochs_2=8,
        opt_grid_size=30, pareto_set_size=6,
    )
    for i, name in enumerate(["obj1", "obj2"]):
        y = np.asarray(rff.eval_sample(samples[i], x))
        y = (y - y.mean()) / (y.std() + 1e-12)
        fitter.initialize_mfdgp(x, jnp.asarray(y[:, None]), fid, name)
    y = np.asarray(rff.eval_sample(samples[2], x))
    fitter.initialize_mfdgp(
        x, jnp.asarray(((y - y.mean()) / (y.std() + 1e-12))[:, None]), fid,
        "con1", threshold_constraint=0.0, is_constraint=True,
    )
    fitter.train_mfdgps()
    cond = fitter.copy_uncond()
    cond.sample_and_store_pareto_solution()
    cond.num_epochs_2 = 5
    cond.train_conditioned_mfdgps()
    return fitter, cond


def _jes(fitter, cond, **kw):
    jes = J.JESMOC_MFDGP(model=fitter, num_fidelities=2, model_cond=cond, **kw)
    for f in range(2):
        jes.add_blackbox(f, "obj1", cost_evaluation=1.0 if f == 0 else 10.0)
        jes.add_blackbox(f, "obj2", cost_evaluation=1.0 if f == 0 else 10.0)
        jes.add_blackbox(
            f, "con1", cost_evaluation=1.0 if f == 0 else 10.0, is_constraint=True
        )
    return jes


def test_predict_for_acquisition_all_matches_per_fidelity(fitters):
    fitter, _ = fitters
    model = fitter.get_model("obj1")
    x = jnp.asarray(np.random.default_rng(1).uniform(size=(9, 2)))
    mus_all, vars_all = M.predict_for_acquisition_all(
        model.params, model.consts, model.config, x
    )
    for f in range(2):
        mu_f, var_f = M.predict_for_acquisition(
            model.params, model.consts, model.config, x, f
        )
        np.testing.assert_allclose(np.asarray(mus_all[f]), np.asarray(mu_f),
                                   rtol=1e-6, atol=1e-10)
        np.testing.assert_allclose(np.asarray(vars_all[f]), np.asarray(var_f),
                                   rtol=1e-6, atol=1e-10)


def test_fused_gain_matches_coupled_acq(fitters):
    fitter, cond = fitters
    jes = _jes(fitter, cond)
    su_p, su_c, sc_p, sc_c, config = jes._fused_eligible()
    x = jnp.asarray(np.random.default_rng(2).uniform(size=(7, 2)))
    states_u = J._stacked_states(su_p, su_c, config)
    states_c = J._stacked_states(sc_p, sc_c, config)
    gains = J._coupled_gain_all_stacked(
        su_p, su_c, sc_p, sc_c, config, x, states_u, states_c
    )
    for f in range(2):
        ref = jes.coupled_acq(x, f)
        np.testing.assert_allclose(np.asarray(gains[f]), np.asarray(ref),
                                   rtol=1e-6, atol=1e-10)


def test_fused_optimizer_matches_per_fidelity_argmax(fitters):
    """Same key -> the fused program and the per-fidelity programs screen the
    same raw samples and must land on (near-)identical maximizers."""
    fitter, cond = fitters
    jes = _jes(fitter, cond)
    su_p, su_c, sc_p, sc_c, config = jes._fused_eligible()
    key = jax.random.key(7)
    xs, vals = J.optimize_coupled_jes_all_fidelities(
        su_p, su_c, sc_p, sc_c, config, key, 2, maxiter=60, raw_samples=64,
    )
    for f in range(2):
        x_f, v_f = J.optimize_coupled_jes(
            su_p, su_c, sc_p, sc_c, config, f, key, 2, maxiter=60, raw_samples=64,
        )
        # same acquisition value to optimizer tolerance; the maximizer itself
        # can differ between equally-good restarts, so compare values
        np.testing.assert_allclose(float(vals[f]), float(v_f), rtol=1e-3, atol=1e-6)
        gains_at = J._coupled_gain_all_stacked(
            su_p, su_c, sc_p, sc_c, config, xs[f][None, :],
            J._stacked_states(su_p, su_c, config),
            J._stacked_states(sc_p, sc_c, config),
        )
        np.testing.assert_allclose(float(gains_at[f, 0]), float(vals[f]),
                                   rtol=1e-5, atol=1e-8)


def test_get_nextpoint_uses_fused_path(fitters, monkeypatch):
    """The standard coupled campaign registration (same blackboxes at every
    fidelity) must take the fused path, not the per-fidelity fallback."""
    fitter, cond = fitters
    jes = _jes(fitter, cond)
    assert jes._fused_eligible() is not None
    called = {"per_fidelity": 0}
    orig = jes._optimize_fidelity

    def spy(f):
        called["per_fidelity"] += 1
        return orig(f)

    monkeypatch.setattr(jes, "_optimize_fidelity", spy)
    x_next, fid_next = jes.get_nextpoint_coupled(iteration=0)
    assert called["per_fidelity"] == 0
    assert x_next.shape == (2,)
    assert 0 <= fid_next < 2
    assert np.all((np.asarray(x_next) >= 0) & (np.asarray(x_next) <= 1))


def test_asymmetric_registration_falls_back(fitters):
    """Blackboxes registered at only one fidelity -> per-fidelity fallback
    still works (decoupled-style registration)."""
    fitter, cond = fitters
    jes = J.JESMOC_MFDGP(model=fitter, num_fidelities=2, model_cond=cond)
    jes.add_blackbox(0, "obj1", cost_evaluation=1.0)
    jes.add_blackbox(1, "obj1", cost_evaluation=10.0)
    jes.add_blackbox(1, "obj2", cost_evaluation=10.0)
    assert jes._fused_eligible() is None
    x_next, fid_next = jes.get_nextpoint_coupled(iteration=0)
    assert x_next.shape == (2,)
    assert 0 <= fid_next < 2


def test_inv_solve_states_match_exact_solves(fitters):
    """LayerState.lk_inv (explicit L^{-1}, the MXU-matmul acquisition path,
    MOBOCMF_ACQ_INV=1) must reproduce the triangular-solve predictive."""
    fitter, cond = fitters
    jes = _jes(fitter, cond)
    stacked = jes._stacked(1)
    su_p, su_c, sc_p, sc_c, config = stacked

    grid = jnp.asarray(np.random.default_rng(5).uniform(size=(20, 2)))
    st_exact = trainer.states_stacked(su_p, su_c, config)
    st_inv = trainer.states_stacked(su_p, su_c, config, with_inv=True)
    stc_exact = trainer.states_stacked(sc_p, sc_c, config)
    stc_inv = trainer.states_stacked(sc_p, sc_c, config, with_inv=True)

    g_exact = J._coupled_gain_all_stacked(
        su_p, su_c, sc_p, sc_c, config, grid, st_exact, stc_exact
    )
    g_inv = J._coupled_gain_all_stacked(
        su_p, su_c, sc_p, sc_c, config, grid, st_inv, stc_inv
    )
    np.testing.assert_allclose(
        np.asarray(g_inv), np.asarray(g_exact), rtol=1e-6, atol=1e-8
    )
