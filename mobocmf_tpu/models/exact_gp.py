"""Minimal single-fidelity exact GP baseline.

Re-design of /root/reference/mobocmf/models/exact_gp.py: zero mean +
Scale(RBF-ARD), Gaussian likelihood, exact inference."""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.scipy.linalg import solve_triangular

from mobocmf_tpu.core.constraints import GreaterThan
from mobocmf_tpu.kernels import rbf
from mobocmf_tpu.linalg.ops import add_jitter, cholesky, logdet_from_chol

Array = jnp.ndarray
_NOISE_CONSTRAINT = GreaterThan(1e-4)


class ExactGPParams(NamedTuple):
    kernel: Dict
    raw_noise: Array


class ExactGPModel(NamedTuple):
    params: ExactGPParams
    x_train: Array
    y_train: Array
    jitter: float


def init_exact_gp(
    x_train: Array, y_train: Array, initial_length_scale: float = 0.05, jitter: float = 1e-8
) -> ExactGPModel:
    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train).reshape(-1)
    kernel = rbf.init_scale_rbf_params(initial_length_scale, 1.0, x_train.shape[1])
    kernel = jax.tree.map(lambda a: jnp.asarray(a, dtype=x_train.dtype), kernel)
    return ExactGPModel(
        params=ExactGPParams(
            kernel=kernel,
            raw_noise=_NOISE_CONSTRAINT.inverse(jnp.asarray(0.1, dtype=x_train.dtype)),
        ),
        x_train=x_train,
        y_train=y_train,
        jitter=jitter,
    )


def nlml(params: ExactGPParams, x: Array, y: Array, jitter: float) -> Array:
    n = x.shape[0]
    k = add_jitter(rbf.rbf_gram(params.kernel, x, x), jitter)
    k = k + _NOISE_CONSTRAINT.forward(params.raw_noise) * jnp.eye(n, dtype=x.dtype)
    l = cholesky(k)
    alpha = solve_triangular(l, y[:, None], lower=True)
    return 0.5 * (jnp.sum(alpha**2) + logdet_from_chol(l) + n * jnp.log(2.0 * jnp.pi))


@partial(jax.jit, static_argnames=("num_iters", "lr"))
def _fit_exact_gp_run(params, x, y, jitter, num_iters, lr):
    # module-level jit with data as runtime args (same-shape fits share one
    # executable; a closure-jit here recompiled per fit)
    opt = optax.adam(lr)

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(nlml)(p, x, y, jitter)
        updates, s = opt.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    (p, _), losses = jax.lax.scan(step, (params, opt.init(params)), None, length=num_iters)
    return p, losses


def fit_exact_gp(model: ExactGPModel, num_iters: int = 500, lr: float = 0.05) -> ExactGPModel:
    params, _ = _fit_exact_gp_run(
        model.params, model.x_train, model.y_train, model.jitter, num_iters, lr
    )
    return model._replace(params=params)


def predict(model: ExactGPModel, x: Array, noiseless: bool = True) -> Tuple[Array, Array]:
    params = model.params
    n = model.x_train.shape[0]
    k = add_jitter(rbf.rbf_gram(params.kernel, model.x_train, model.x_train), model.jitter)
    noise = _NOISE_CONSTRAINT.forward(params.raw_noise)
    k = k + noise * jnp.eye(n, dtype=x.dtype)
    l = cholesky(k)
    k_cross = rbf.rbf_gram(params.kernel, model.x_train, x)
    w = solve_triangular(l, k_cross, lower=True)
    alpha = solve_triangular(l, model.y_train[:, None], lower=True)
    mean = (w.T @ alpha)[:, 0]
    var = jnp.maximum(rbf.rbf_diag(params.kernel, x) - jnp.sum(w * w, axis=0), 1e-12)
    if not noiseless:
        var = var + noise
    return mean, var
