"""Linear-algebra helpers shared by the GP layers (solves, logdets)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from mobocmf_tpu.linalg.chol import cholesky

Array = jnp.ndarray


def add_jitter(k: Array, jitter: float) -> Array:
    n = k.shape[-1]
    return k + jitter * jnp.eye(n, dtype=k.dtype)


def safe_cholesky(k: Array, jitter: float) -> Array:
    """Cholesky of k + jitter*I with escalating-jitter fallback (f32 only).

    In f64 this is a single factorization identical to the reference's
    2e-6-jitter one. In f32 (TPU fast path) the needed jitter is PROBED on a
    stop-gradient copy (a failed probe's NaN factor must never touch the
    autodiff graph: even a zero cotangent times NaN poisons every upstream
    gradient), then ONE differentiable factorization runs with the selected
    jitter. Escalation: 1x -> 100x -> 10000x.
    """
    if k.dtype == jnp.float64:
        return cholesky(add_jitter(k, jitter))

    eye = jnp.eye(k.shape[-1], dtype=k.dtype)
    k_probe = jax.lax.stop_gradient(k)
    jitter = jnp.asarray(jitter, dtype=k.dtype)  # float or traced scalar

    def diag_ok(j):
        l = cholesky(k_probe + j * eye)
        return jnp.all(jnp.isfinite(jnp.diagonal(l, axis1=-2, axis2=-1)))

    ok0 = diag_ok(jitter)
    j_eff = jax.lax.cond(
        ok0,
        lambda _: jitter,
        lambda _: jax.lax.cond(
            diag_ok(jitter * 100.0),
            lambda __: jitter * 100.0,
            lambda __: jitter * 10000.0,
            None,
        ),
        None,
    )
    return cholesky(k + j_eff * eye)


def safe_cholesky_rel(k: Array, rel: float) -> Array:
    """safe_cholesky with jitter RELATIVE to the mean diagonal — for matrices
    whose scale is data-dependent (RFF posterior weight covariances)."""
    scale = jnp.mean(jnp.abs(jnp.diagonal(jax.lax.stop_gradient(k), axis1=-2, axis2=-1)))
    if k.dtype == jnp.float64:
        return cholesky(k + (rel * scale) * jnp.eye(k.shape[-1], dtype=k.dtype))
    return safe_cholesky(k, rel * scale)


def cho_solve(l: Array, b: Array) -> Array:
    """Solve (L L^T) x = b given lower Cholesky L."""
    y = solve_triangular(l, b, lower=True)
    return solve_triangular(l.T, y, lower=False)


def tri_solve_lower(l: Array, b: Array) -> Array:
    return solve_triangular(l, b, lower=True)


def logdet_from_chol(l: Array) -> Array:
    return 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(l, axis1=-2, axis2=-1))), axis=-1)


__all__ = [
    "cholesky",
    "add_jitter",
    "cho_solve",
    "tri_solve_lower",
    "logdet_from_chol",
]
