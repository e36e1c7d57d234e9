"""Kernel unit tests against closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobocmf_tpu.core.constraints import Interval, Positive, inv_softplus, softplus
from mobocmf_tpu.core.distances import compute_dist, median_lengthscale
from mobocmf_tpu.kernels import deep_mf, mf_exact, rbf


def naive_rbf(x1, x2, ls, os_):
    n1, n2 = x1.shape[0], x2.shape[0]
    out = np.zeros((n1, n2))
    for i in range(n1):
        for j in range(n2):
            d2 = np.sum(((x1[i] - x2[j]) / ls) ** 2)
            out[i, j] = os_ * np.exp(-0.5 * d2)
    return out


def test_softplus_roundtrip():
    vals = jnp.array([1e-6, 0.01, 1.0, 25.0, 100.0])
    assert jnp.allclose(softplus(inv_softplus(vals)), vals, rtol=1e-10)


def test_interval_roundtrip():
    iv = Interval(1e-8, 0.37)
    vals = jnp.array([1e-6, 0.01, 0.1, 0.3])
    assert jnp.allclose(iv.forward(iv.inverse(vals)), vals, rtol=1e-10)


def test_rbf_gram_matches_naive():
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(7, 3))
    x2 = rng.normal(size=(5, 3))
    ls = np.array([0.5, 1.2, 2.0])
    params = rbf.init_scale_rbf_params(jnp.asarray(ls), 1.7, 3)
    got = rbf.rbf_gram(params, jnp.asarray(x1), jnp.asarray(x2))
    want = naive_rbf(x1, x2, ls, 1.7)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_rbf_diag_is_outputscale():
    params = rbf.init_scale_rbf_params(0.3, 2.5, 2)
    x = jnp.ones((4, 2))
    np.testing.assert_allclose(np.asarray(rbf.rbf_diag(params, x)), 2.5, rtol=1e-6)


def test_deep_mf_kernel_structure():
    """k = kx1*(klin + kf) + kx2 with the reference's inits."""
    rng = np.random.default_rng(1)
    d = 2
    x = rng.normal(size=(6, d))
    f = rng.normal(size=(6, 1))
    xf = jnp.asarray(np.concatenate([x, f], axis=1))
    ls0 = 0.8
    params = deep_mf.init_deep_mf_params(ls0, d)
    got = deep_mf.deep_mf_gram(params, xf, xf)

    kx1 = naive_rbf(x, x, np.full(d, 10 * ls0), 1.0)
    kf = naive_rbf(f, f, np.array([1.0]), 1.0)
    klin = 1.0 * (f @ f.T)
    kx2 = naive_rbf(x, x, np.full(d, ls0), 0.01)
    want = kx1 * (klin + kf) + kx2
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
    # diag consistency
    np.testing.assert_allclose(
        np.asarray(deep_mf.deep_mf_diag(params, xf)), np.diag(want), rtol=1e-7
    )


def test_mf_exact_kernel_min_fidelity_factor():
    rng = np.random.default_rng(2)
    d = 2
    x = rng.normal(size=(5, d))
    fid = np.array([0.0, 1.0, 1.0, 0.0, 2.0])
    xf = jnp.asarray(np.concatenate([x, fid[:, None]], axis=1))
    params = mf_exact.init_mf_kernel_params(1.0, d)
    got = np.asarray(mf_exact.mf_kernel_gram(params, xf, xf))
    c = mf_exact.mf_kernel_constrained(params)
    ks = naive_rbf(x, x, np.asarray(c["signal_ls"]), float(c["signal_os"]))
    kn = naive_rbf(x, x, np.asarray(c["noise_ls"]), float(c["noise_os"]))
    minf = np.minimum(fid[:, None], fid[None, :])
    np.testing.assert_allclose(got, ks + minf * kn, rtol=1e-6)


def test_mf_lin_kernel_factors():
    rng = np.random.default_rng(3)
    d, num_fid = 2, 3
    x = rng.normal(size=(6, d))
    fid = np.array([0, 1, 2, 0, 1, 2], dtype=float)
    xf = jnp.asarray(np.concatenate([x, fid[:, None]], axis=1))
    params = mf_exact.init_mf_lin_kernel_params(1.0, d, num_fid)
    got = np.asarray(mf_exact.mf_lin_kernel_gram(params, xf, xf, num_fid))
    rho = np.asarray(params["rho"])
    cp = np.concatenate([[1.0], np.cumprod(rho)])
    fs = np.outer(cp[fid.astype(int)], cp[fid.astype(int)])
    min1 = np.minimum(fid[:, None], fid[None, :]) + 1
    fn = (min1 >= 2).astype(float)  # range(3, num_fid-1) empty for F=3
    ks = naive_rbf(x, x, np.ones(d) * softplus_inv_check(1.0), 1.0)
    # simpler: recompute with module helpers
    ks = np.asarray(rbf.rbf_gram(params["signal"], jnp.asarray(x), jnp.asarray(x)))
    kn = np.asarray(rbf.rbf_gram(params["noise"], jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, fs * ks + fn * kn, rtol=1e-6)


def softplus_inv_check(v):
    return v


def test_median_lengthscale_matches_reference_formula():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(9, 3))
    d2 = compute_dist(jnp.asarray(x))
    iu = np.triu_indices(9, k=1)
    want = np.sqrt(np.median(np.asarray(d2)[iu]))
    got = float(median_lengthscale(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_mf_lin_kernel_f5_replicates_reference_off_by_one():
    """For F=5 the reference's noise-factor loop runs range(3, 4) — only the
    rho[1]^2 term, skipping rho[2]^2 (mfgp_lin.py:183). Replicated exactly."""
    rng = np.random.default_rng(9)
    d, num_fid = 2, 5
    x = rng.normal(size=(6, d))
    fid = np.array([0, 1, 2, 3, 4, 4], dtype=float)
    xf = jnp.asarray(np.concatenate([x, fid[:, None]], axis=1))
    params = mf_exact.init_mf_lin_kernel_params(1.0, d, num_fid)
    got = np.asarray(mf_exact.mf_lin_kernel_gram(params, xf, xf, num_fid))
    rho = np.asarray(params["rho"])
    cp = np.concatenate([[1.0], np.cumprod(rho)])
    fs = np.outer(cp[fid.astype(int)], cp[fid.astype(int)])
    min1 = np.minimum(fid[:, None], fid[None, :]) + 1
    fn = (min1 >= 2).astype(float) + (min1 >= 3).astype(float) * rho[1] ** 2
    # NOTE: no rho[2]^2 term even though min1 reaches 5 — reference off-by-one
    ks = np.asarray(rbf.rbf_gram(params["signal"], jnp.asarray(x), jnp.asarray(x)))
    kn = np.asarray(rbf.rbf_gram(params["noise"], jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(got, fs * ks + fn * kn, rtol=1e-6)
