"""Linear-algebra helpers shared by the GP layers (solves, logdets)."""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from mobocmf_tpu.linalg.chol import cholesky

Array = jnp.ndarray


def add_jitter(k: Array, jitter: float) -> Array:
    n = k.shape[-1]
    return k + jitter * jnp.eye(n, dtype=k.dtype)


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
