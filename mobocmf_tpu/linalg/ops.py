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


def _chol_pullback(l: Array, l_bar: Array) -> Array:
    """VJP of K -> chol(K) evaluated at a FINITE factor L.

    Standard formula: K_bar = 0.5 * (C + C^T) with
    C = L^{-T} phi(L^T L_bar) L^{-1}, phi = tril with halved diagonal.
    """
    p = jnp.matmul(l.T, l_bar, precision=jax.lax.Precision.HIGHEST)
    phi = jnp.tril(p) - 0.5 * jnp.diag(jnp.diagonal(p))
    # C = L^{-T} phi L^{-1}: solve L^T X = phi, then (L^T Y = X^T)^T
    x1 = solve_triangular(l.T, phi, lower=False)
    c = solve_triangular(l.T, x1.T, lower=False).T
    return 0.5 * (c + c.T)


@jax.custom_vjp
def _safe_cholesky_f32(k: Array, jitter: Array) -> Array:
    return _safe_cholesky_f32_fwd(k, jitter)[0]


def _safe_cholesky_f32_fwd(k: Array, jitter: Array):
    eye = jnp.eye(k.shape[-1], dtype=k.dtype)

    def attempt(j):
        return cholesky(k + j * eye)

    def ok(l):
        return jnp.all(jnp.isfinite(jnp.diagonal(l, axis1=-2, axis2=-1)))

    # escalate 1x -> 100x -> 10000x; the backward pass is custom (defined on
    # the final finite factor only), so NaN factors from failed attempts can
    # never poison gradients and no stop-gradient probing is needed — the
    # common case costs exactly ONE factorization.
    l0 = attempt(jitter)
    l = jax.lax.cond(
        ok(l0),
        lambda _: l0,
        lambda _: jax.lax.cond(
            ok(attempt(jitter * 100.0)),
            lambda __: attempt(jitter * 100.0),
            lambda __: attempt(jitter * 10000.0),
            None,
        ),
        None,
    )
    return l, l


def _safe_cholesky_f32_bwd(res, l_bar):
    l = res
    return _chol_pullback(l, l_bar), jnp.zeros((), dtype=l.dtype)


_safe_cholesky_f32.defvjp(_safe_cholesky_f32_fwd, _safe_cholesky_f32_bwd)


def safe_cholesky(k: Array, jitter) -> Array:
    """Cholesky of k + jitter*I with escalating-jitter fallback (f32 only).

    In f64 this is a single factorization identical to the reference's
    2e-6-jitter one. In f32 (TPU fast path) a failed factorization (NaN
    diagonal) escalates the jitter 100x, twice; a custom VJP evaluated on the
    final finite factor keeps failed attempts out of the autodiff graph."""
    if k.dtype == jnp.float64:
        return cholesky(add_jitter(k, jitter))
    return _safe_cholesky_f32(k, jnp.asarray(jitter, dtype=k.dtype))


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
