"""Cross-implementation parity: JAX MFDGP vs an independent torch mirror.

gpytorch/botorch are not installed in this environment, so the reference
cannot be executed directly; instead this test re-implements the reference's
per-step math (unwhitened SVGP predictive with the dynamic inducing chain,
deep MF kernel, multi-fidelity ELBO — exactly what gpytorch computes for the
reference) independently in torch float64, copies the JAX model's raw
parameters over, feeds BOTH implementations the same propagation noise, and
demands agreement to 1e-9 relative — far beyond the 1e-5 parity bar.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mobocmf_tpu.mlls.elbo import elbo_terms
from mobocmf_tpu.models import mfdgp as M

torch.set_default_dtype(torch.float64)


def torch_mirror(params, consts, config, x_np, y_np, fid_np, eps_np, num_data):
    """Reference-equivalent forward + ELBO in torch f64."""
    sp = torch.nn.functional.softplus
    x = torch.from_numpy(x_np)
    y = torch.from_numpy(y_np)
    jitter = config.jitter
    n = x.shape[0]

    def rbf(x1, x2, raw_ls, raw_os):
        ls, os_ = sp(raw_ls), sp(raw_os)
        a, b = x1 / ls, x2 / ls
        d2 = (a * a).sum(1, keepdim=True) - 2 * a @ b.T + (b * b).sum(1, keepdim=True).T
        return os_ * torch.exp(-0.5 * d2.clamp_min(0))

    def t(a):
        return torch.from_numpy(np.asarray(a, dtype=np.float64))

    k0 = params.layers[0].kernel

    def gram0(x1, x2):
        return rbf(x1, x2, t(k0["raw_lengthscale"]), t(k0["raw_outputscale"]))

    k1 = params.layers[1].kernel

    def gram1(xf1, xf2):
        x1, f1 = xf1[:, :-1], xf1[:, -1:]
        x2, f2 = xf2[:, :-1], xf2[:, -1:]
        kx1 = rbf(x1, x2, t(k1["kx1"]["raw_lengthscale"]), t(k1["kx1"]["raw_outputscale"]))
        kf = rbf(f1, f2, t(k1["kf"]["raw_lengthscale"]), t(k1["kf"]["raw_outputscale"]))
        klin = sp(t(k1["klin"]["raw_variance"])) * (f1 @ f2.T)
        kx2 = rbf(x1, x2, t(k1["kx2"]["raw_lengthscale"]), t(k1["kx2"]["raw_outputscale"]))
        return kx1 * (klin + kf) + kx2

    def svgp(gram, diag_val, m, ls_raw, z, xq):
        kzz = gram(z, z) + jitter * torch.eye(z.shape[0])
        l = torch.linalg.cholesky(kzz)
        kzx = gram(z, xq)
        a = torch.cholesky_solve(kzx, l)
        mu = a.T @ m
        s_chol = torch.tril(ls_raw)
        b = s_chol.T @ a
        var = (diag_val - (a * kzx).sum(0) + (b * b).sum(0)).clamp_min(1e-12)
        return mu, var, l

    # layer 0
    m0 = t(params.layers[0].variational.mean)
    ls0 = t(params.layers[0].variational.chol_raw)
    z0 = t(consts.z_x[0])
    diag0 = sp(t(k0["raw_outputscale"])).expand(n)
    mu0, var0, l0 = svgp(gram0, diag0, m0, ls0, z0, x)

    # dynamic chain: mean of layer 0 at its own inducing inputs
    w = torch.cholesky_solve(m0.unsqueeze(1), l0)
    chain = m0 - jitter * w[:, 0]

    # layer 1
    f_prev = mu0 + torch.sqrt(var0) * torch.from_numpy(eps_np[0])
    z1 = torch.cat([t(consts.z_x[1]), chain.unsqueeze(1)], 1)
    x1_in = torch.cat([x, f_prev.unsqueeze(1)], 1)
    m1 = t(params.layers[1].variational.mean)
    ls1 = t(params.layers[1].variational.chol_raw)
    diag1 = torch.diagonal(gram1(x1_in, x1_in))
    kzz1 = gram1(z1, z1) + jitter * torch.eye(n)
    l1 = torch.linalg.cholesky(kzz1)
    kzx1 = gram1(z1, x1_in)
    a1 = torch.cholesky_solve(kzx1, l1)
    mu1 = a1.T @ m1
    s1 = torch.tril(ls1)
    b1 = s1.T @ a1
    var1 = (diag1 - (a1 * kzx1).sum(0) + (b1 * b1).sum(0)).clamp_min(1e-12)

    # likelihood noises
    lows = torch.from_numpy(np.asarray(consts.noise_lower, dtype=np.float64))
    ups = torch.from_numpy(np.asarray(consts.noise_upper, dtype=np.float64))
    raw = t(params.raw_noises)
    noises = lows + (ups - lows) * torch.sigmoid(raw)

    fidt = torch.from_numpy(fid_np)
    data = 0.0
    for i, (mu, var) in enumerate([(mu0, var0), (mu1, var1)]):
        sel = fidt == i
        ll = -0.5 * (
            torch.log(2 * torch.pi * noises[i]) + ((y[sel] - mu[sel]) ** 2 + var[sel]) / noises[i]
        )
        data = data + ll.sum()

    kl = 0.0
    for l, s_chol, m in [(l0, torch.tril(ls0), m0), (l1, s1, m1)]:
        wk = torch.linalg.solve_triangular(l, s_chol, upper=False)
        lm = torch.linalg.solve_triangular(l, m.unsqueeze(1), upper=False)
        kl = kl + 0.5 * (
            (wk * wk).sum() + (lm * lm).sum() - n
            + 2 * torch.log(torch.diagonal(l)).sum()
            - 2 * torch.log(torch.diagonal(s_chol).abs()).sum()
        )
    elbo = data - kl * n / num_data
    return (
        np.stack([mu0.numpy(), mu1.numpy()]),
        np.stack([var0.numpy(), var1.numpy()]),
        float(elbo),
        float(kl),
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_mfdgp_elbo_parity_vs_torch_mirror(seed):
    rng = np.random.default_rng(seed)
    n, d = 14, 2
    x_np = rng.uniform(size=(n, d))
    y_np = rng.normal(size=n)
    fid_np = (np.arange(n) % 2).astype(np.int64)

    x = jnp.asarray(x_np)
    y = jnp.asarray(y_np)
    fid = jnp.asarray(fid_np)
    model = M.init_mfdgp(jax.random.key(seed), x, y[:, None], fid, 2)
    eps = M.sample_eps(jax.random.key(seed + 100), model.config, n, x.dtype)
    eps_np = np.asarray(eps, dtype=np.float64)

    # JAX side
    states = M.compute_layer_states(model.params, model.consts, model.config)
    outs = M.forward(model.params, model.consts, model.config, x, eps, states=states)
    elbo_j, kl_j = elbo_terms(model.params, model.consts, model.config, x, y, fid, eps, n)
    kl_raw = M.kl_all_layers(model.params, model.consts, model.config, states=states)

    # torch mirror
    mus_t, vars_t, elbo_t, kl_t = torch_mirror(
        model.params, model.consts, model.config, x_np, y_np, fid_np, eps_np, n
    )

    for i in range(2):
        np.testing.assert_allclose(np.asarray(outs[i][0]), mus_t[i], rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(outs[i][1]), vars_t[i], rtol=1e-8, atol=1e-12)
    np.testing.assert_allclose(float(elbo_j), elbo_t, rtol=1e-9)
    np.testing.assert_allclose(float(kl_raw), kl_t, rtol=1e-9)
