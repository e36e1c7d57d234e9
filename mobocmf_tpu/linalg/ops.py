"""Linear-algebra helpers shared by the GP layers (solves, logdets)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
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


def _attempt(k: Array, j) -> Array:
    """chol(k + j*I) with j a scalar or an array aligned to k's batch dims."""
    eye = jnp.eye(k.shape[-1], dtype=k.dtype)
    jj = jnp.asarray(j, dtype=k.dtype)
    if jj.ndim:
        jj = jj.reshape(jj.shape + (1, 1))
    return cholesky(k + jj * eye)


def _ok_elem(l: Array) -> Array:
    """Per-matrix finiteness of the factor's diagonal, shape l.shape[:-2]."""
    return jnp.all(jnp.isfinite(jnp.diagonal(l, axis1=-2, axis2=-1)), axis=-1)


def _diag_scale(k: Array) -> Array:
    """Per-matrix mean |diagonal| (stop-gradient), shape k.shape[:-2].

    The f32 jitter floors below are relative to this scale; like
    safe_cholesky_rel, the (tiny, regularization-only) dependence of the
    jitter on k is excluded from autodiff."""
    return jnp.mean(
        jnp.abs(jnp.diagonal(jax.lax.stop_gradient(k), axis1=-2, axis2=-1)),
        axis=-1,
    )


def _rescue(k: Array, j0, ok0: Array) -> Array:
    """Per-element jitter escalation with scale-RELATIVE floors (rare path).

    The pre-fix ladder was purely absolute (100x, 10000x): on kernel
    matrices whose outputs are large (e.g. Branin-scale y -> trained
    outputscale ~1e3-1e4) even 10000x the reference's 2e-6 jitter is ~5e-6
    RELATIVE — below f32 rounding of the Gram itself once near-duplicate
    inducing rows appear, so every escalation failed and training went NaN
    (observed: branin_currin_512 r5 campaign, iteration 5). Floors: 256*eps
    and sqrt(eps) of the mean diagonal (f32: ~3e-5 / ~3.4e-4 relative; the
    final attempt is guaranteed factorizable for any finite PSD-up-to-
    rounding matrix). Elements that already factorized keep their jitter
    (and recompute the same factor); failed elements escalate independently."""
    eps = jnp.asarray(jnp.finfo(k.dtype).eps, dtype=k.dtype)
    scale = _diag_scale(k)
    j1 = jnp.where(ok0, j0, jnp.maximum(jnp.asarray(j0) * 100.0, 256.0 * eps * scale))
    l1 = _attempt(k, j1)
    j2 = jnp.where(
        _ok_elem(l1), j1, jnp.maximum(j1 * 100.0, jnp.sqrt(eps) * scale)
    )
    return _attempt(k, j2)


@custom_vmap
def _chol_escalate(k: Array, jitter: Array) -> Array:
    # Happy path costs exactly ONE factorization: the predicate reduces over
    # ALL batch dims to a scalar, so lax.cond stays a real branch.
    # The first attempt floors the caller's (reference-exact) jitter at
    # 4*eps*mean_diag — inactive at the reference's O(1)-output scales
    # (4*eps ~ 4.8e-7 < 2e-6), active on large-output Grams where an
    # absolute 2e-6 is below f32 rounding and the factor, even when it
    # succeeds, is barely conditioned (diverging-gradient regime).
    eps = jnp.asarray(jnp.finfo(k.dtype).eps, dtype=k.dtype)
    j0 = jnp.maximum(jitter, 4.0 * eps * _diag_scale(k))
    l0 = _attempt(k, j0)
    ok0 = _ok_elem(l0)
    return jax.lax.cond(
        jnp.all(ok0),
        lambda _: l0,
        lambda _: _rescue(k, j0, ok0),
        None,
    )


@_chol_escalate.def_vmap
def _chol_escalate_vmap(axis_size, in_batched, k, jitter):
    # A naively vmapped lax.cond lowers to select_n with BOTH branches
    # executed, so every training step of a stacked/vmapped model would pay
    # the escalation factorizations unconditionally (measured: 3 Choleskys
    # per call instead of 1). This rule re-enters _chol_escalate with the
    # batch axis as an ordinary leading dim: the body is rank-polymorphic and
    # its scalar any-element-failed predicate keeps the cond a true branch.
    # Nested vmaps recurse through this same rule, collapsing every batch
    # level into leading dims of one unbatched call.
    k_b, j_b = in_batched
    if not k_b:
        k = jnp.broadcast_to(k[None], (axis_size,) + k.shape)
    if j_b and jitter.ndim:
        # align a batched jitter against k's remaining leading dims
        jitter = jitter.reshape(jitter.shape + (1,) * (k.ndim - 2 - jitter.ndim))
    return _chol_escalate(k, jitter), True


@jax.custom_vjp
def _safe_cholesky_f32(k: Array, jitter: Array) -> Array:
    return _chol_escalate(k, jitter)


def _safe_cholesky_f32_fwd(k: Array, jitter: Array):
    # The backward pass is custom (defined on the final finite factor only),
    # so NaN factors from failed attempts can never poison gradients and no
    # stop-gradient probing is needed.
    l = _chol_escalate(k, jitter)
    return l, l


def _safe_cholesky_f32_bwd(res, l_bar):
    l = res
    return _chol_pullback(l, l_bar), jnp.zeros((), dtype=l.dtype)


_safe_cholesky_f32.defvjp(_safe_cholesky_f32_fwd, _safe_cholesky_f32_bwd)


def safe_cholesky(k: Array, jitter) -> Array:
    """Cholesky of k + jitter*I with escalating-jitter fallback (f32 only).

    In f64 this is a single factorization identical to the reference's
    2e-6-jitter one. In f32 (TPU fast path) the jitter gets a 4*eps*scale
    relative floor (inactive at O(1) output scales), and a failed
    factorization (NaN diagonal) escalates 100x twice with 256*eps*scale /
    sqrt(eps)*scale relative floors — see _rescue for the large-output-scale
    failure this fixes. A custom VJP evaluated on the final finite factor
    keeps failed attempts out of the autodiff graph."""
    if k.dtype == jnp.float64:
        return cholesky(add_jitter(k, jitter))
    return _safe_cholesky_f32(k, jnp.asarray(jitter, dtype=k.dtype))


def safe_cholesky_rel(k: Array, rel: float) -> Array:
    """safe_cholesky with jitter RELATIVE to the mean diagonal — for matrices
    whose scale is data-dependent (RFF posterior weight covariances).

    Shares _diag_scale with the f32 jitter floors so the scale heuristic has
    one definition (per-matrix over batch dims; scalar for 2-D inputs)."""
    scale = _diag_scale(k)
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
