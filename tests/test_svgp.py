"""SVGP layer tests against naive dense formulas."""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.kernels import rbf
from mobocmf_tpu.models import svgp


def _setup(seed=0, m=12, n=7, d=2):
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.uniform(size=(m, d)))
    x = jnp.asarray(rng.uniform(size=(n, d)))
    kp = rbf.init_scale_rbf_params(0.7, 1.3, d)
    mean = jnp.asarray(rng.normal(size=m))
    a = rng.normal(size=(m, m))
    cov = a @ a.T / m + 0.5 * np.eye(m)
    var = svgp.init_variational(mean, jnp.asarray(cov))
    return z, x, kp, var, np.asarray(cov)


def test_predict_diag_matches_naive():
    z, x, kp, var, cov = _setup()
    jitter = 2e-6
    mu, v, lk = svgp.predict_diag(rbf.rbf_gram, rbf.rbf_diag, kp, var, z, x, jitter)

    kzz = np.asarray(rbf.rbf_gram(kp, z, z)) + jitter * np.eye(z.shape[0])
    kzx = np.asarray(rbf.rbf_gram(kp, z, x))
    kxx = np.asarray(rbf.rbf_diag(kp, x))
    a = np.linalg.solve(kzz, kzx)
    mu_naive = a.T @ np.asarray(var.mean)
    s = np.tril(np.asarray(var.chol_raw)) @ np.tril(np.asarray(var.chol_raw)).T
    v_naive = kxx - np.sum(a * kzx, 0) + np.diag(a.T @ s @ a)
    np.testing.assert_allclose(np.asarray(mu), mu_naive, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(v), v_naive, rtol=1e-7, atol=1e-10)


def test_kl_matches_naive():
    z, x, kp, var, cov = _setup(seed=1)
    jitter = 2e-6
    kl = svgp.kl_divergence(rbf.rbf_gram, kp, var, z, jitter)

    m = np.asarray(var.mean)
    ls = np.tril(np.asarray(var.chol_raw))
    s = ls @ ls.T
    kzz = np.asarray(rbf.rbf_gram(kp, z, z)) + jitter * np.eye(z.shape[0])
    kinv = np.linalg.inv(kzz)
    kl_naive = 0.5 * (
        np.trace(kinv @ s)
        + m @ kinv @ m
        - m.shape[0]
        + np.linalg.slogdet(kzz)[1]
        - np.linalg.slogdet(s)[1]
    )
    np.testing.assert_allclose(float(kl), kl_naive, rtol=1e-8)


def test_whitened_consistent_with_unwhitened():
    """Converting unwhitened (m,S) to whitened coords must give the same
    predictive."""
    z, x, kp, var, cov = _setup(seed=2)
    jitter = 2e-6
    mu_u, v_u, lk = svgp.predict_diag(rbf.rbf_gram, rbf.rbf_diag, kp, var, z, x, jitter)

    lk_np = np.asarray(lk)
    m_w = np.linalg.solve(lk_np, np.asarray(var.mean))
    ls = np.tril(np.asarray(var.chol_raw))
    ls_w = np.linalg.solve(lk_np, ls)
    var_w = svgp.SVGPVariational(mean=jnp.asarray(m_w), chol_raw=jnp.asarray(ls_w))
    mu_w, v_w, _ = svgp.predict_diag_whitened(
        rbf.rbf_gram, rbf.rbf_diag, kp, var_w, z, x, jitter
    )
    np.testing.assert_allclose(np.asarray(mu_w), np.asarray(mu_u), rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(v_w), np.asarray(v_u), rtol=1e-6, atol=1e-9)
    # KL identity: KL_whitened(q_w) == KL_unwhitened(q)
    kl_u = svgp.kl_divergence(rbf.rbf_gram, kp, var, z, jitter)
    kl_w = svgp.kl_divergence_whitened(var_w)
    np.testing.assert_allclose(float(kl_w), float(kl_u), rtol=1e-7)


def test_elbo_matches_manual():
    """Multi-fidelity ELBO against a hand computation on a tiny model."""
    from mobocmf_tpu.mlls.elbo import elbo_terms, gaussian_expected_log_prob
    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(3)
    n, d = 9, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    fid = jnp.asarray((rng.uniform(size=n) > 0.5).astype(int))
    model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2)
    eps = M.sample_eps(jax.random.key(1), model.config, n, x.dtype)

    elbo, kl = elbo_terms(model.params, model.consts, model.config, x, y, fid, eps, n)

    outs = M.forward(model.params, model.consts, model.config, x, eps)
    data = 0.0
    for i in range(2):
        sel = np.asarray(fid) == i
        noise = float(M.likelihood_noise(model.params, model.consts, i))
        mu, var = np.asarray(outs[i][0]), np.asarray(outs[i][1])
        data += float(
            np.sum(
                np.asarray(
                    gaussian_expected_log_prob(
                        jnp.asarray(np.asarray(y)[sel]),
                        jnp.asarray(mu[sel]),
                        jnp.asarray(var[sel]),
                        jnp.asarray(noise),
                    )
                )
            )
        )
    kl_manual = float(M.kl_all_layers(model.params, model.consts, model.config))
    np.testing.assert_allclose(float(elbo), data - kl_manual, rtol=1e-8)
    np.testing.assert_allclose(float(kl), kl_manual, rtol=1e-8)


def test_dynamic_inducing_gradients_flow_to_previous_layer():
    """The dynamic-Z chain must carry gradients from layer 1's KL into layer
    0's variational mean (the reference's central architectural trick)."""
    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(4)
    n, d = 8, 1
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    fid = jnp.asarray((np.arange(n) % 2))
    model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2)

    def layer1_kl(m0):
        layers = list(model.params.layers)
        layers[0] = layers[0]._replace(
            variational=layers[0].variational._replace(mean=m0)
        )
        p = model.params._replace(layers=tuple(layers))
        states = M.compute_layer_states(p, model.consts, model.config)
        from mobocmf_tpu.models import svgp as S
        from mobocmf_tpu.kernels import deep_mf

        return S.kl_divergence(
            deep_mf.deep_mf_gram, p.layers[1].kernel, p.layers[1].variational,
            states[1].z, model.config.jitter, lk=states[1].lk,
        )

    g = jax.grad(layer1_kl)(model.params.layers[0].variational.mean)
    assert float(jnp.abs(g).max()) > 0.0, "no gradient through dynamic inducing chain"


def test_state_based_predictive_and_kl_match_direct():
    """predict_diag_state / kl_state (the hoisted shared path used by
    mfdgp.forward) must equal the direct per-parameterization functions."""
    from mobocmf_tpu.linalg.ops import safe_cholesky

    z, x, kp, var, _ = _setup()
    jitter = 2e-6
    lk = safe_cholesky(rbf.rbf_gram(kp, z, z), jitter)

    # unwhitened
    mu_u, v_u, _ = svgp.predict_diag(rbf.rbf_gram, rbf.rbf_diag, kp, var, z, x, jitter)
    wm, wl = svgp.solve_variational(var, lk, whitened=False)
    mu_s, v_s = svgp.predict_diag_state(rbf.rbf_gram, rbf.rbf_diag, kp, z, x, lk, wm, wl)
    np.testing.assert_allclose(np.asarray(mu_s), np.asarray(mu_u), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_u), rtol=1e-12, atol=1e-12)
    kl_u = svgp.kl_divergence(rbf.rbf_gram, kp, var, z, jitter)
    kl_s = svgp.kl_state(var, lk, wm, wl, whitened=False)
    np.testing.assert_allclose(float(kl_s), float(kl_u), rtol=1e-12)

    # whitened
    mu_w, v_w, _ = svgp.predict_diag_whitened(
        rbf.rbf_gram, rbf.rbf_diag, kp, var, z, x, jitter
    )
    wmw, wlw = svgp.solve_variational(var, lk, whitened=True)
    mu_ws, v_ws = svgp.predict_diag_state(
        rbf.rbf_gram, rbf.rbf_diag, kp, z, x, lk, wmw, wlw
    )
    np.testing.assert_allclose(np.asarray(mu_ws), np.asarray(mu_w), rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v_ws), np.asarray(v_w), rtol=1e-12, atol=1e-12)
    kl_w = svgp.kl_divergence_whitened(var)
    kl_ws = svgp.kl_state(var, lk, wmw, wlw, whitened=True)
    np.testing.assert_allclose(float(kl_ws), float(kl_w), rtol=1e-12)
