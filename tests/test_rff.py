"""RFF pathwise sampling tests: prior statistics + posterior consistency."""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.kernels import rbf
from mobocmf_tpu.models import mfdgp as M
from mobocmf_tpu.sampling import rff


def test_prior_layer0_covariance_matches_kernel():
    """Layer-0 prior samples must have cov ~= the fixed prior RBF kernel
    (ls = 0.25*d, outputscale 1; reference layer file :339-348)."""
    d = 2
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(6, d)))
    n_mc = 600
    keys = jax.random.split(jax.random.key(0), n_mc)
    vals = np.stack(
        [np.asarray(rff.eval_sample(rff.sample_prior(k, d, 1), x)) for k in keys]
    )
    emp_cov = np.cov(vals.T)
    kp = rbf.init_scale_rbf_params(0.25 * d, 1.0, d)
    want = np.asarray(rbf.rbf_gram(kp, x, x))
    np.testing.assert_allclose(emp_cov, want, atol=0.2)


def test_posterior_sample_matches_variational_mean():
    """With a tight variational posterior, pathwise samples at the inducing
    points must concentrate near the variational means."""
    rng = np.random.default_rng(1)
    n, d = 10, 1
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(np.sin(4 * np.asarray(x)[:, 0]))
    fid = jnp.asarray(np.zeros(n, dtype=int))
    model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 1)

    keys = jax.random.split(jax.random.key(1), 64)
    vals = np.stack(
        [
            np.asarray(
                rff.eval_sample(
                    rff.sample_posterior(k, model.params, model.consts, model.config), x
                )
            )
            for k in keys
        ]
    )
    mean_emp = vals.mean(axis=0)
    m_var = np.asarray(model.params.layers[0].variational.mean)
    # RFF is an approximation: generous tolerance, but clearly informative
    assert np.abs(mean_emp - m_var).mean() < 0.12


def test_eval_sample_grad_matches_fd():
    d = 2
    sample = rff.sample_prior(jax.random.key(2), d, 2)
    x0 = jnp.asarray(np.array([0.3, 0.6]))
    g = np.asarray(rff.eval_sample_grad(sample, x0))
    h = 1e-6
    for i in range(d):
        e = np.zeros(d)
        e[i] = h
        fp = float(rff.eval_sample(sample, jnp.asarray(np.array([0.3, 0.6]) + e)[None, :])[0])
        fm = float(rff.eval_sample(sample, jnp.asarray(np.array([0.3, 0.6]) - e)[None, :])[0])
        fd = (fp - fm) / (2 * h)
        np.testing.assert_allclose(g[i], fd, rtol=1e-4, atol=1e-6)


def test_deep_sample_chains_layers():
    """Top-layer samples must differ from layer-0 samples (chaining happens)."""
    d = 1
    sample = rff.sample_prior(jax.random.key(3), d, 2)
    x = jnp.asarray(np.linspace(0, 1, 5)[:, None])
    v0 = np.asarray(rff.eval_sample(sample, x, layer=0))
    v1 = np.asarray(rff.eval_sample(sample, x, layer=1))
    assert np.abs(v0 - v1).max() > 1e-8


def test_host_dual_theta_m_greater_than_features():
    """M > F regime (2048 inducing, 500 features): the dual solve must handle
    the full-rank case where reduced QR gives rectangular R."""
    rng = np.random.default_rng(7)
    f_dim, m_dim = 64, 200  # scaled-down M > F
    phi = rng.normal(size=(f_dim, m_dim)) / np.sqrt(f_dim)
    y = rng.normal(size=m_dim)
    s = np.eye(m_dim) * 0.01
    theta = rff.host_dual_theta(0, phi, y, s, sigma2=1e-6)
    assert theta.shape == (f_dim,)
    assert np.all(np.isfinite(theta))
    # mean check: E[theta] = A^{-1} Phi y
    a = phi @ phi.T + 1e-6 * np.eye(f_dim)
    m_expected = np.linalg.solve(a, phi @ y)
    thetas = np.stack([rff.host_dual_theta(i, phi, y, s, 1e-6) for i in range(200)])
    np.testing.assert_allclose(thetas.mean(0), m_expected, atol=0.1)


def test_host_dual_theta_matches_primal_covariance():
    """Dual sampling distribution == the reference's primal formula (M < F)."""
    rng = np.random.default_rng(8)
    f_dim, m_dim = 40, 12
    phi = rng.normal(size=(f_dim, m_dim)) / np.sqrt(f_dim)
    y = rng.normal(size=m_dim)
    ls = rng.normal(size=(m_dim, m_dim)) * 0.05
    s = ls @ ls.T + 0.01 * np.eye(m_dim)
    sigma2 = 1e-6
    a = phi @ phi.T + sigma2 * np.eye(f_dim)
    a_inv = np.linalg.inv(a)
    m_primal = a_inv @ phi @ y
    cov_primal = sigma2 * a_inv + a_inv @ phi @ s @ phi.T @ a_inv

    thetas = np.stack([rff.host_dual_theta(i, phi, y, s, sigma2) for i in range(3000)])
    np.testing.assert_allclose(thetas.mean(0), m_primal, atol=0.05)
    emp_cov = np.cov(thetas.T)
    np.testing.assert_allclose(emp_cov, cov_primal, atol=0.12)  # MC noise: SE ~ 0.026/entry at 3000 draws
