"""MFGP_lin: exact multi-fidelity GP with the AR(1)-style rho kernel.

Re-design of /root/reference/mobocmf/models/mfgp_lin.py: a single exact GP
over [x, fidelity] with MFKernel_lin (learnable correlations rho, init 0.5;
see mobocmf_tpu/kernels/mf_exact.py for the kernel math), zero mean, Gaussian
likelihood noise init 1e-1. `get_mean_function_high_fidelity` returns a
closure (value + gradient per row) for use as a Pareto-set objective
(reference :68-97) — here backed by jax.grad.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.scipy.linalg import solve_triangular

from mobocmf_tpu.core.constraints import GreaterThan
from mobocmf_tpu.core.distances import median_lengthscale_np
from mobocmf_tpu.kernels import mf_exact
from mobocmf_tpu.linalg.ops import add_jitter, cholesky, logdet_from_chol

Array = jnp.ndarray
_NOISE_CONSTRAINT = GreaterThan(1e-4)


class MFGPLinParams(NamedTuple):
    kernel: Dict
    raw_noise: Array


class MFGPLinModel(NamedTuple):
    params: MFGPLinParams
    x_train: Array
    y_train: Array
    num_fidelities: int
    input_dim: int
    jitter: float


def init_mfgp_lin(
    x_train: Array, y_train: Array, num_fidelities: int, jitter: float = 1e-8
) -> MFGPLinModel:
    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train).reshape(-1)
    input_dim = x_train.shape[1] - 1
    init_ls = median_lengthscale_np(np.asarray(x_train)[:, :input_dim])
    kernel = mf_exact.init_mf_lin_kernel_params(init_ls, input_dim, num_fidelities)
    kernel = jax.tree.map(lambda a: jnp.asarray(a, dtype=x_train.dtype), kernel)
    return MFGPLinModel(
        params=MFGPLinParams(
            kernel=kernel,
            raw_noise=_NOISE_CONSTRAINT.inverse(jnp.asarray(0.1, dtype=x_train.dtype)),
        ),
        x_train=x_train,
        y_train=y_train,
        num_fidelities=num_fidelities,
        input_dim=input_dim,
        jitter=jitter,
    )


def _train_chol(model: MFGPLinModel, params: MFGPLinParams) -> Array:
    n = model.x_train.shape[0]
    k = mf_exact.mf_lin_kernel_gram(
        params.kernel, model.x_train, model.x_train, model.num_fidelities
    )
    k = add_jitter(k, model.jitter) + _NOISE_CONSTRAINT.forward(params.raw_noise) * jnp.eye(
        n, dtype=model.x_train.dtype
    )
    return cholesky(k)


def nlml(params: MFGPLinParams, x: Array, y: Array, jitter: float,
         num_fidelities: int) -> Array:
    """Exact negative log marginal likelihood (data args, one definition
    shared by the fit loop and external callers/tests)."""
    n = x.shape[0]
    k = mf_exact.mf_lin_kernel_gram(params.kernel, x, x, num_fidelities)
    k = add_jitter(k, jitter) + _NOISE_CONSTRAINT.forward(params.raw_noise) * jnp.eye(
        n, dtype=x.dtype
    )
    l = cholesky(k)
    alpha = solve_triangular(l, y[:, None], lower=True)
    return 0.5 * (jnp.sum(alpha**2) + logdet_from_chol(l) + n * jnp.log(2.0 * jnp.pi))


def nlml_model(params: MFGPLinParams, model: MFGPLinModel) -> Array:
    return nlml(params, model.x_train, model.y_train, model.jitter,
                model.num_fidelities)


@partial(jax.jit, static_argnames=("num_fidelities", "num_iters", "lr"))
def _fit_mfgp_lin_run(params, x, y, jitter, num_fidelities, num_iters, lr):
    # module-level jit with data as runtime args (same-shape fits share one
    # executable; a closure-jit here recompiled per fit)
    opt = optax.adam(lr)

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(nlml)(p, x, y, jitter, num_fidelities)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (p, _), losses = jax.lax.scan(step, (params, opt.init(params)), None, length=num_iters)
    return p, losses


def fit_mfgp_lin(model: MFGPLinModel, num_iters: int = 500, lr: float = 0.05) -> MFGPLinModel:
    params, _ = _fit_mfgp_lin_run(
        model.params, model.x_train, model.y_train, model.jitter,
        model.num_fidelities, num_iters, lr,
    )
    return model._replace(params=params)


def predict(model: MFGPLinModel, x: Array, fidelity: int) -> Tuple[Array, Array]:
    """Posterior latent mean/var at [x, fidelity]. Accepts botorch-style
    (b, q, d) batches and returns (b, q) — the reference's MFKernel_lin
    expand path semantics (mfgp_lin.py:131-145,186-189): every (batch, q)
    point predicted as if flattened to rows."""
    if x.ndim == 3:
        b, q, d = x.shape
        mean, var = predict(model, x.reshape(b * q, d), fidelity)
        return mean.reshape(b, q), var.reshape(b, q)
    fid_col = jnp.full((x.shape[0], 1), float(fidelity), dtype=x.dtype)
    x_aug = jnp.concatenate([x, fid_col], axis=1)
    return _predict_aug(model, x_aug)


def _predict_aug(model: MFGPLinModel, x_aug: Array) -> Tuple[Array, Array]:
    params = model.params
    l = _train_chol(model, params)
    k_cross = mf_exact.mf_lin_kernel_gram(
        params.kernel, model.x_train, x_aug, model.num_fidelities
    )
    w = solve_triangular(l, k_cross, lower=True)
    alpha = solve_triangular(l, model.y_train[:, None], lower=True)
    mean = (w.T @ alpha)[:, 0]
    k_diag = jnp.diagonal(
        mf_exact.mf_lin_kernel_gram(params.kernel, x_aug, x_aug, model.num_fidelities)
    )
    var = jnp.maximum(k_diag - jnp.sum(w * w, axis=0), 1e-12)
    return mean, var


def get_mean_function_high_fidelity(model: MFGPLinModel):
    """Numpy-facing closure: posterior mean (and jax.grad gradient) at the
    highest fidelity (reference mfgp_lin.py:68-97)."""
    top = model.num_fidelities - 1

    @jax.jit
    def mean_at(x):
        return predict(model, x, top)[0]

    mean_grad = jax.jit(jax.vmap(jax.grad(lambda x1: mean_at(x1[None, :])[0])))

    def mean_function(x, gradient: bool = False):
        x = np.asarray(x, dtype=float)
        if x.ndim != 2:
            x = x.reshape(1, -1)
        xj = jnp.asarray(x)
        if not gradient:
            return np.asarray(mean_at(xj))
        return np.asarray(mean_grad(xj))

    return mean_function
