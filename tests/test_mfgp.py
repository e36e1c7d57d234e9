"""MFGP / MFGP_lin / ExactGP / MESMOC tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.acquisition.mesmoc import MESMOC_MFGP
from mobocmf_tpu.models import exact_gp as EG
from mobocmf_tpu.models import mfgp as G
from mobocmf_tpu.models import mfgp_lin as GL


def _mf_data(seed=0, n=24, d=2):
    rng = np.random.default_rng(seed)
    x = rng.uniform(size=(n, d))
    fid = (np.arange(n) % 2).astype(float)
    y_true = np.sin(3 * x[:, 0]) + 0.5 * x[:, 1]
    y = y_true + 0.3 * (fid == 0) * np.sin(9 * x[:, 1]) + 0.05 * rng.normal(size=n)
    xf = np.concatenate([x, fid[:, None]], axis=1)
    return jnp.asarray(xf), jnp.asarray(y)


def test_mfgp_fit_reduces_nlml_and_predicts():
    xf, y = _mf_data()
    model = G.init_mfgp(xf, y, num_fidelities=2)
    nlml0 = float(G.nlml(model.params, xf, y, model.jitter))
    model = G.fit_mfgp(model, num_iters=150, lr=0.05)
    nlml1 = float(G.nlml(model.params, xf, y, model.jitter))
    assert nlml1 < nlml0

    mean, var = G.predict(model, xf[:, :-1][:5], 1)
    assert mean.shape == (5,) and var.shape == (5,)
    assert np.all(np.asarray(var) > 0)
    # predictions at training points of matching fidelity are close to targets
    sel = np.asarray(xf[:, -1]) == 1
    mean_tr, _ = G.predict(model, xf[sel, :-1], 1)
    assert np.abs(np.asarray(mean_tr) - np.asarray(y)[sel]).mean() < 0.4


def test_mfgp_rff_sample_tracks_posterior():
    xf, y = _mf_data(seed=1)
    model = G.fit_mfgp(G.init_mfgp(xf, y, 2), num_iters=150, lr=0.05)
    keys = jax.random.split(jax.random.key(0), 48)
    grid = jnp.asarray(np.random.default_rng(3).uniform(size=(10, 2)))
    vals = np.stack(
        [np.asarray(G.eval_mfgp_sample(G.sample_from_posterior(k, model, 1), grid)) for k in keys]
    )
    mean_emp = vals.mean(axis=0)
    mean_post, var_post = G.predict(model, grid, 1)
    err = np.abs(mean_emp - np.asarray(mean_post))
    assert err.mean() < 3 * np.sqrt(np.asarray(var_post)).mean() + 0.15


def test_mfgp_lin_fit_and_mean_function():
    xf, y = _mf_data(seed=2)
    model = GL.init_mfgp_lin(xf, y, num_fidelities=2)
    n0 = float(GL.nlml_model(model.params, model))
    model = GL.fit_mfgp_lin(model, num_iters=100, lr=0.05)
    assert float(GL.nlml_model(model.params, model)) < n0

    mean_fn = GL.get_mean_function_high_fidelity(model)
    x_test = np.random.default_rng(4).uniform(size=(4, 2))
    vals = mean_fn(x_test)
    assert vals.shape == (4,)
    grads = mean_fn(x_test, gradient=True)
    assert grads.shape == (4, 2)
    # finite-difference check of the gradient
    h = 1e-5
    e0 = np.zeros(2)
    e0[0] = h
    fd = (mean_fn(x_test + e0) - mean_fn(x_test - e0)) / (2 * h)
    np.testing.assert_allclose(grads[:, 0], fd, rtol=1e-3, atol=1e-5)


def test_mfgp_batched_inputs_match_per_row():
    """(b, q, d) batched predict equals flattened per-row predict with q > 1
    (the reference's MFKernel_lin expand semantics, mfgp_lin.py:131-145,
    186-189; VERDICT r2 item 6 — round 2 silently squeezed to q=1)."""
    xf, y = _mf_data(seed=8)
    rng = np.random.default_rng(9)
    b, q, d = 4, 3, 2
    xb = jnp.asarray(rng.uniform(size=(b, q, d)))

    for model, mod in [
        (G.fit_mfgp(G.init_mfgp(xf, y, 2), num_iters=30), G),
        (GL.fit_mfgp_lin(GL.init_mfgp_lin(xf, y, 2), num_iters=30), GL),
    ]:
        mean_b, var_b = mod.predict(model, xb, 1)
        assert mean_b.shape == (b, q) and var_b.shape == (b, q)
        mean_f, var_f = mod.predict(model, xb.reshape(b * q, d), 1)
        np.testing.assert_allclose(
            np.asarray(mean_b).ravel(), np.asarray(mean_f), rtol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(var_b).ravel(), np.asarray(var_f), rtol=1e-10
        )


def test_exact_gp_interpolates():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(size=(15, 2)))
    y = jnp.asarray(np.sin(4 * np.asarray(x)[:, 0]))
    model = EG.fit_exact_gp(EG.init_exact_gp(x, y, initial_length_scale=0.3), num_iters=200)
    mean, var = EG.predict(model, x)
    assert np.abs(np.asarray(mean) - np.asarray(y)).mean() < 0.15


def test_mesmoc_acquisition_shapes_and_signs():
    xf, y = _mf_data(seed=6)
    obj = G.fit_mfgp(G.init_mfgp(xf, y, 2), num_iters=50)
    con = G.fit_mfgp(G.init_mfgp(xf, -y, 2), num_iters=50)
    mes = MESMOC_MFGP(
        objectives={"o": obj}, constraints={"c": con}, input_dim=2, num_fidelities=2,
        best_objective_values={"o": float(np.asarray(y).min())},
        constraint_thresholds={"c": 0.0},
    )
    for f in range(2):
        mes.add_blackbox(f, "o", cost_evaluation=1.0 if f == 0 else 10.0)
        mes.add_blackbox(f, "c", is_constraint=True)
    grid = jnp.asarray(np.random.default_rng(7).uniform(size=(9, 2)))
    acq = mes.coupled_acq(grid, 0)
    assert acq.shape == (9,)
    assert np.all(np.asarray(acq) >= 0.0)
    x_next, f_next = mes.get_nextpoint_coupled(iteration=0)
    assert x_next.shape == (2,) and 0 <= f_next < 2


def test_random_choice_baseline():
    from mobocmf_tpu.acquisition.random_choice import Random_choice

    rc = Random_choice(input_size=3, num_fidelities=2, seed=0)
    rc.add_blackbox(0, "obj1", cost_evaluation=1.0)
    rc.add_blackbox(1, "obj1", cost_evaluation=10.0)
    counts = np.zeros(2)
    for _ in range(60):
        x, f = rc.get_nextpoint_coupled()
        assert x.shape == (3,)
        assert np.all((np.asarray(x) >= 0) & (np.asarray(x) <= 1))
        counts[f] += 1
    # P(fidelity) proportional to 1 - cost/total: f0 ~ 10/11, f1 ~ 1/11
    assert counts[0] > counts[1]
    acq = rc.coupled_acq(jnp.ones((5, 3)), 0)
    assert acq.shape == (5,)
    # public q>1 batch API (used by bo/loop's acquisition='random' path)
    xb, fb = rc.get_batch_coupled(4)
    assert xb.shape == (4, 3) and 0 <= fb < 2
    assert np.all((np.asarray(xb) >= 0) & (np.asarray(xb) <= 1))
    x1, _ = rc.get_batch_coupled(1)
    assert x1.shape == (1, 3)


def test_mfgp_posterior_state_matches_stateless():
    """predict(state=...) must equal the stateless path bitwise, and the
    analytic kernel diagonal must equal the full-gram diagonal — the MESMOC
    optimizer hoists posterior_state outside its L-BFGS loop, so divergence
    here silently corrupts acquisition surfaces."""
    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.kernels import mf_exact
    from mobocmf_tpu.models import mfgp as G

    rng = np.random.default_rng(3)
    n = 20
    xf = jnp.asarray(
        np.hstack([rng.uniform(size=(n, 2)), rng.integers(1, 3, size=(n, 1))])
    )
    y = jnp.asarray(rng.normal(size=(n,)))
    m = G.init_mfgp(xf, y, 2)
    x = jnp.asarray(rng.uniform(size=(9, 2)))

    mu0, v0 = G.predict(m, x, 1)
    st = G.posterior_state(m)
    mu1, v1 = G.predict(m, x, 1, state=st)
    np.testing.assert_array_equal(np.asarray(mu0), np.asarray(mu1))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))

    xa = jnp.concatenate([x, jnp.ones((9, 1), dtype=x.dtype)], axis=1)
    np.testing.assert_allclose(
        np.asarray(mf_exact.mf_kernel_diag(m.params.kernel, xa)),
        np.asarray(jnp.diagonal(mf_exact.mf_kernel_gram(m.params.kernel, xa, xa))),
        rtol=1e-12,
    )


def test_mfgp_fits_share_one_executable_across_models():
    """Same-shape fits must hit the jit cache (the MESMOC loop refits every
    blackbox each BO iteration; closure-jits recompiled per fit)."""
    xf, y = _mf_data(seed=5)
    G.fit_mfgp(G.init_mfgp(xf, y, 2), num_iters=10)
    before = G._fit_mfgp_run._cache_size()
    xf2, y2 = _mf_data(seed=6)
    G.fit_mfgp(G.init_mfgp(xf2, y2, 2), num_iters=10)
    assert G._fit_mfgp_run._cache_size() == before

    x_lin = jnp.concatenate([xf[:, :-1], xf[:, -1:] ], axis=1)
    GL.fit_mfgp_lin(GL.init_mfgp_lin(x_lin, y, 2), num_iters=10)
    before_lin = GL._fit_mfgp_lin_run._cache_size()
    GL.fit_mfgp_lin(GL.init_mfgp_lin(x_lin, y2, 2), num_iters=10)
    assert GL._fit_mfgp_lin_run._cache_size() == before_lin


def test_mfgp_padded_rows_do_not_change_posterior():
    """Bucket-padding rows (row_valid=False -> PAD_PENALTY extra noise) must
    leave the fit and the posterior numerically unchanged."""
    xf, y = _mf_data(seed=7, n=20)
    n_pad = 8
    pad_x = jnp.concatenate([xf, jnp.full((n_pad, xf.shape[1]), 0.5, xf.dtype)], axis=0)
    pad_y = jnp.concatenate([y, jnp.zeros((n_pad,), y.dtype)])
    valid = jnp.concatenate(
        [jnp.ones((20,), bool), jnp.zeros((n_pad,), bool)]
    )

    m = G.fit_mfgp(G.init_mfgp(xf, y, 2), num_iters=100)
    mp = G.fit_mfgp(G.init_mfgp(pad_x, pad_y, 2, row_valid=valid), num_iters=100)

    grid = jnp.asarray(np.random.default_rng(11).uniform(size=(12, 2)))
    mean0, var0 = G.predict(m, grid, 1)
    meanp, varp = G.predict(mp, grid, 1)
    np.testing.assert_allclose(np.asarray(meanp), np.asarray(mean0), atol=2e-4)
    np.testing.assert_allclose(np.asarray(varp), np.asarray(var0), atol=2e-4)

    # pathwise samples exclude pads exactly (zeroed feature columns/targets)
    s0 = G.sample_from_posterior(jax.random.key(2), m, 1)
    sp = G.sample_from_posterior(jax.random.key(2), mp, 1)
    v0 = np.asarray(G.eval_mfgp_sample(s0, grid))
    vp = np.asarray(G.eval_mfgp_sample(sp, grid))
    np.testing.assert_allclose(vp, v0, atol=2e-3)
