"""Torch-f64 mirror parity for the MESMOC_MFGP acquisition math.

VERDICT r2 item 7: the truncated-Gaussian entropy and constraint-probability
formulas (reference MESMOC_MFGP.py:38-71) previously had only shape/sign
checks. Here an independently-written torch float64 mirror reproduces:

1. the MFGP posterior predictive (min-fidelity kernel
   K = k_sig + min(fid,fid')*k_noise with Interval-constrained params,
   reference mfgp.py:145-184 / 50-61), and
2. the MESMOC objective entropy / constraint feasibility probability
   evaluated on that posterior (reference MESMOC_MFGP.py:38-71, incl. the
   float32-eps CLAMP_LB at :19),

and must agree with the JAX implementation to 1e-9 (tests run f64 on CPU,
conftest.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from mobocmf_tpu.acquisition import mesmoc as MES
from mobocmf_tpu.models import mfgp as G

torch.set_default_dtype(torch.float64)


def _torch_sigmoid_interval(raw, lo, hi):
    return lo + (hi - lo) * torch.sigmoid(raw)


def _torch_rbf(x1, x2, ls, os_):
    a, b = x1 / ls, x2 / ls
    d2 = (
        (a * a).sum(-1, keepdim=True)
        - 2.0 * a @ b.T
        + (b * b).sum(-1, keepdim=True).T
    )
    return os_ * torch.exp(-0.5 * d2.clamp_min(0.0))


def _torch_mf_gram(params, xf1, xf2):
    """Mirror of kernels/mf_exact.mf_kernel_gram (reference mfgp.py:172-184)."""
    x1, f1 = xf1[:, :-1], xf1[:, -1]
    x2, f2 = xf2[:, :-1], xf2[:, -1]
    sig_ls = _torch_sigmoid_interval(params["sig_raw_ls"], 1e-3, 1000.0)
    sig_os = _torch_sigmoid_interval(params["sig_raw_os"], 1e-3, 100.0)
    noi_ls = _torch_sigmoid_interval(params["noi_raw_ls"], 1e-3, 1000.0)
    noi_os = _torch_sigmoid_interval(params["noi_raw_os"], 1e-3, 100.0)
    min_fid = torch.minimum(f1[:, None], f2[None, :])
    return _torch_rbf(x1, x2, sig_ls, sig_os) + min_fid * _torch_rbf(
        x1, x2, noi_ls, noi_os
    )


def _torch_predict(params, x_train, y_train, x_aug, jitter, noise_val):
    """Mirror of models/mfgp.predict (reference mfgp.py:50-61)."""
    n = x_train.shape[0]
    k = _torch_mf_gram(params, x_train, x_train) + (jitter + noise_val) * torch.eye(n)
    l = torch.linalg.cholesky(k)
    k_cross = _torch_mf_gram(params, x_train, x_aug)
    w = torch.linalg.solve_triangular(l, k_cross, upper=False)
    alpha = torch.linalg.solve_triangular(l, y_train[:, None], upper=False)
    mean = (w.T @ alpha)[:, 0]
    k_diag = torch.diagonal(_torch_mf_gram(params, x_aug, x_aug))
    var = (k_diag - (w * w).sum(0)).clamp_min(1e-12)
    return mean, var


@pytest.fixture(scope="module")
def model_and_mirror():
    rng = np.random.default_rng(0)
    n, d = 18, 2
    x = rng.uniform(size=(n, d))
    fid = (np.arange(n) % 2).astype(float)
    y = np.sin(3 * x[:, 0]) + 0.2 * rng.normal(size=n)
    xf = jnp.asarray(np.concatenate([x, fid[:, None]], axis=1), dtype=jnp.float64)
    model = G.fit_mfgp(
        G.init_mfgp(xf, jnp.asarray(y, dtype=jnp.float64), 2), num_iters=40
    )
    k = model.params.kernel
    t_params = {
        "sig_raw_ls": torch.from_numpy(np.asarray(k["signal"]["raw_lengthscale"], dtype=np.float64)),
        "sig_raw_os": torch.from_numpy(np.asarray(k["signal"]["raw_outputscale"], dtype=np.float64)),
        "noi_raw_ls": torch.from_numpy(np.asarray(k["noise"]["raw_lengthscale"], dtype=np.float64)),
        "noi_raw_os": torch.from_numpy(np.asarray(k["noise"]["raw_outputscale"], dtype=np.float64)),
    }
    # likelihood noise: GreaterThan(1e-4) softplus transform (models/mfgp.py:34)
    raw_noise = torch.from_numpy(np.asarray(model.params.raw_noise, dtype=np.float64))
    t_noise = 1e-4 + torch.nn.functional.softplus(raw_noise)
    t_x_train = torch.from_numpy(np.asarray(model.x_train, dtype=np.float64))
    t_y_train = torch.from_numpy(np.asarray(model.y_train, dtype=np.float64))
    return model, t_params, t_noise, t_x_train, t_y_train


def test_mfgp_predict_parity(model_and_mirror):
    model, t_params, t_noise, t_x, t_y = model_and_mirror
    rng = np.random.default_rng(1)
    xs = rng.uniform(size=(11, 2))
    for fidelity in (0, 1):
        mean_j, var_j = G.predict(model, jnp.asarray(xs, dtype=jnp.float64), fidelity)
        x_aug = torch.from_numpy(
            np.concatenate([xs, np.full((11, 1), float(fidelity))], axis=1)
        )
        mean_t, var_t = _torch_predict(
            t_params, t_x, t_y, x_aug, model.jitter, t_noise
        )
        np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(np.asarray(var_j), var_t.numpy(), rtol=1e-9, atol=1e-12)


def test_mesmoc_objective_entropy_parity(model_and_mirror):
    """Truncated-Gaussian entropy reduction (reference MESMOC_MFGP.py:47-64)."""
    model, t_params, t_noise, t_x, t_y = model_and_mirror
    rng = np.random.default_rng(2)
    xs = rng.uniform(size=(13, 2))
    best_value = float(np.asarray(model.y_train).min())
    CLAMP_LB = float(np.finfo(np.float32).eps)  # reference :19

    for fidelity in (0, 1):
        acq_j = MES.mes_forward(
            model, jnp.asarray(best_value, dtype=jnp.float64), fidelity, False,
            jnp.asarray(xs, dtype=jnp.float64),
        )
        x_aug = torch.from_numpy(
            np.concatenate([xs, np.full((13, 1), float(fidelity))], axis=1)
        )
        mean, var = _torch_predict(t_params, t_x, t_y, x_aug, model.jitter, t_noise)
        normal = torch.distributions.Normal(torch.zeros(1), torch.ones(1))
        g = (best_value - mean) / var.sqrt()
        cdf = normal.cdf(g).clamp_max(1 - CLAMP_LB)
        pdf = torch.exp(normal.log_prob(g))
        ratio = pdf / (1.0 - cdf)
        var_trunc = var * (1 + (g - ratio) * ratio).clamp_min(CLAMP_LB)
        ent_cond = 0.5 * torch.log(var_trunc + t_noise)
        ent_uncond = 0.5 * torch.log(var + t_noise)
        acq_t = torch.clamp(ent_uncond - ent_cond, min=0.0)
        np.testing.assert_allclose(np.asarray(acq_j), acq_t.numpy(), rtol=1e-9, atol=1e-12)


def test_mesmoc_constraint_probability_parity(model_and_mirror):
    """Feasibility probability 1 - Phi((t - mu)/sigma) (reference :66-71)."""
    model, t_params, t_noise, t_x, t_y = model_and_mirror
    rng = np.random.default_rng(3)
    xs = rng.uniform(size=(13, 2))
    threshold = 0.1

    for fidelity in (0, 1):
        acq_j = MES.mes_forward(
            model, jnp.asarray(threshold, dtype=jnp.float64), fidelity, True,
            jnp.asarray(xs, dtype=jnp.float64),
        )
        x_aug = torch.from_numpy(
            np.concatenate([xs, np.full((13, 1), float(fidelity))], axis=1)
        )
        mean, var = _torch_predict(t_params, t_x, t_y, x_aug, model.jitter, t_noise)
        normal = torch.distributions.Normal(torch.zeros(1), torch.ones(1))
        g = (threshold - mean) / var.sqrt()
        # reference :71 uses the UNCLAMPED cdf in the constraint branch
        acq_t = 1.0 - normal.cdf(g)
        np.testing.assert_allclose(np.asarray(acq_j), acq_t.numpy(), rtol=1e-9, atol=1e-12)
