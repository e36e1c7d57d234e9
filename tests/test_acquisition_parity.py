"""Acquisition-path parity: predict_for_acquisition vs a torch f64 mirror.

Extends tests/test_parity_torch.py to the eval-mode path: fixed per-layer
normals tiled over 25 copies per test point, moment matching across copies
(reference mfdgp.py:237-262 + mfdgp_hidden_layer.py:263-274), and the JES
information gain on top.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from mobocmf_tpu.models import mfdgp as M

torch.set_default_dtype(torch.float64)


def _torch_predict_acq(params, consts, config, x_np, fidelity):
    """Reference-equivalent eval-mode tiled predictive in torch f64."""
    sp = torch.nn.functional.softplus

    def t(a):
        return torch.from_numpy(np.asarray(a, dtype=np.float64))

    jitter = config.jitter
    s_acq = config.num_samples_for_acquisition
    n = x_np.shape[0]
    x_tile = np.repeat(x_np, s_acq, axis=0)
    x = torch.from_numpy(x_tile)

    def rbf(x1, x2, raw_ls, raw_os):
        ls, os_ = sp(raw_ls), sp(raw_os)
        a, b = x1 / ls, x2 / ls
        d2 = (a * a).sum(1, keepdim=True) - 2 * a @ b.T + (b * b).sum(1, keepdim=True).T
        return os_ * torch.exp(-0.5 * d2.clamp_min(0))

    k0 = params.layers[0].kernel
    gram0 = lambda a, b: rbf(a, b, t(k0["raw_lengthscale"]), t(k0["raw_outputscale"]))
    k1 = params.layers[1].kernel

    def gram1(xf1, xf2):
        x1, f1 = xf1[:, :-1], xf1[:, -1:]
        x2, f2 = xf2[:, :-1], xf2[:, -1:]
        kx1 = rbf(x1, x2, t(k1["kx1"]["raw_lengthscale"]), t(k1["kx1"]["raw_outputscale"]))
        kf = rbf(f1, f2, t(k1["kf"]["raw_lengthscale"]), t(k1["kf"]["raw_outputscale"]))
        klin = sp(t(k1["klin"]["raw_variance"])) * (f1 @ f2.T)
        kx2 = rbf(x1, x2, t(k1["kx2"]["raw_lengthscale"]), t(k1["kx2"]["raw_outputscale"]))
        return kx1 * (klin + kf) + kx2

    m_ind = consts.z_x[0].shape[0]

    def svgp_layer(gram, diag, m, ls_raw, z, xq):
        kzz = gram(z, z) + jitter * torch.eye(z.shape[0])
        l = torch.linalg.cholesky(kzz)
        kzx = gram(z, xq)
        a = torch.cholesky_solve(kzx, l)
        mu = a.T @ m
        s_chol = torch.tril(ls_raw)
        b = s_chol.T @ a
        var = (diag - (a * kzx).sum(0) + (b * b).sum(0)).clamp_min(1e-12)
        return mu, var, l

    z0 = t(consts.z_x[0])
    m0 = t(params.layers[0].variational.mean)
    mu0, var0, l0 = svgp_layer(
        gram0, sp(t(k0["raw_outputscale"])).expand(x.shape[0]), m0,
        t(params.layers[0].variational.chol_raw), z0, x,
    )
    chain = m0 - jitter * torch.cholesky_solve(m0.unsqueeze(1), l0)[:, 0]

    # eval mode: FIXED per-layer normals tiled across test points
    acq_eps = np.asarray(consts.acq_eps)[1]  # layer 1's fixed normals, (S,)
    eps_tiled = torch.from_numpy(np.tile(acq_eps, n))
    f_prev = mu0 + torch.sqrt(var0) * eps_tiled

    z1 = torch.cat([t(consts.z_x[1]), chain.unsqueeze(1)], 1)
    x1_in = torch.cat([x, f_prev.unsqueeze(1)], 1)
    diag1 = torch.diagonal(gram1(x1_in, x1_in))
    mu1, var1, _ = svgp_layer(
        gram1, diag1, t(params.layers[1].variational.mean),
        t(params.layers[1].variational.chol_raw), z1, x1_in,
    )
    mu_f, var_f = (mu0, var0) if fidelity == 0 else (mu1, var1)

    lows = torch.from_numpy(np.asarray(consts.noise_lower, dtype=np.float64))
    ups = torch.from_numpy(np.asarray(consts.noise_upper, dtype=np.float64))
    noise = (lows + (ups - lows) * torch.sigmoid(t(params.raw_noises)))[fidelity]
    var_f = var_f + noise

    mus = mu_f.reshape(n, s_acq)
    vars_ = var_f.reshape(n, s_acq)
    mean = mus.mean(dim=1)
    second = (vars_ + mus**2).mean(dim=1)
    return mean.numpy(), (second - mean**2).numpy()


def test_predict_for_acquisition_parity():
    rng = np.random.default_rng(0)
    n, d = 10, 2
    x_train = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    fid = jnp.asarray(np.arange(n) % 2)
    model = M.init_mfdgp(jax.random.key(0), x_train, y[:, None], fid, 2)

    x_test = rng.uniform(size=(6, d))
    for fidelity in (0, 1):
        mu_j, var_j = M.predict_for_acquisition(
            model.params, model.consts, model.config, jnp.asarray(x_test), fidelity
        )
        mu_t, var_t = _torch_predict_acq(
            model.params, model.consts, model.config, x_test, fidelity
        )
        np.testing.assert_allclose(np.asarray(mu_j), mu_t, rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(var_j), var_t, rtol=1e-8, atol=1e-12)


def test_jes_information_gain_nonnegative_and_zero_when_same_model():
    rng = np.random.default_rng(1)
    n, d = 10, 2
    x_train = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    fid = jnp.asarray(np.arange(n) % 2)
    model = M.init_mfdgp(jax.random.key(0), x_train, y[:, None], fid, 2)

    from mobocmf_tpu.acquisition.jesmoc import _JES_MFDGP

    jes = _JES_MFDGP(1, model, model)  # cond == uncond -> zero gain
    acq = jes(jnp.asarray(rng.uniform(size=(8, d))))
    np.testing.assert_allclose(np.asarray(acq), 0.0, atol=1e-12)
