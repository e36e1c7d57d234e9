"""Sparse-variational GP layer: predictive + KL, as pure functions.

This replaces gpytorch's `UnwhitenedVariationalStrategy` +
`CholeskyVariationalDistribution` (used by the reference's MFDGP hidden
layers, /root/reference/mobocmf/layers/mfdgp_hidden_layer.py:127-148) with
explicit math.

Unwhitened parameterization (reference semantics — the variational q(u) =
N(m, S) lives directly in function-value space, which is what makes the
dynamic-inducing-point trick of MFDGUnwhitenedVariationalStrategy meaningful):

    A   = Kzz^{-1} Kzx
    mu  = A^T m
    var = diag(Kxx) - diag(Kxz A) + diag(A^T S A)
    KL(q || N(0, Kzz)) = 0.5 [ tr(Kzz^{-1} S) + m^T Kzz^{-1} m - M
                               + logdet Kzz - logdet S ]

Whitened parameterization (optional TPU-friendly redesign, BASELINE.json): with
u = L_K v, q(v) = N(m_w, S_w):

    mu  = (Kxz L_K^{-T}) m_w
    var = diag(Kxx) - diag(P P^T) + diag(P S_w P^T),  P = Kxz L_K^{-T}
    KL(q || N(0, I)) = 0.5 [ tr(S_w) + m_w^T m_w - M - logdet S_w ]

The variational covariance is parameterized by an unconstrained full matrix
whose lower triangle is the Cholesky factor (gpytorch convention: S = L L^T,
L = tril(raw)).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from mobocmf_tpu.linalg.ops import (
    logdet_from_chol,
    safe_cholesky,
    tri_solve_lower,
)

Array = jnp.ndarray
KernelGram = Callable[[Dict, Array, Array], Array]
KernelDiag = Callable[[Dict, Array], Array]


class SVGPVariational(NamedTuple):
    """Variational parameters of one layer. mean: (M,), chol_raw: (M, M)."""

    mean: Array
    chol_raw: Array


def tril(mat: Array) -> Array:
    return jnp.tril(mat)


def init_variational(
    mean: Array, cov: Array, dtype=None
) -> SVGPVariational:
    """Initialize q(u) = N(mean, cov) (reference: init_dist at
    mfdgp_hidden_layer.py:131-136, top layer cov = K(Z)*(1e-2*y_std^2)^2,
    other layers 1e-8*I; mean_init_std=0 keeps the mean exact).

    The factorization happens on host in float64 regardless of the compute
    dtype: the init covariances have eigenvalues down to ~1e-13, which a
    float32 Cholesky cannot factor (it would silently NaN on TPU). When the
    covariance was itself assembled in f32 (TPU fast path) its rounding noise
    can make it indefinite; escalate a tiny RELATIVE jitter until the f64
    factorization succeeds (starts at 1e-12 of the mean diagonal — far below
    anything the optimizer can feel)."""
    import numpy as _np

    cov_np = _np.asarray(cov, dtype=_np.float64)
    scale = float(_np.mean(_np.diag(cov_np)))
    l = None
    for rel in (0.0, 1e-12, 1e-9, 1e-6, 1e-3):
        try:
            l = _np.linalg.cholesky(cov_np + rel * scale * _np.eye(cov_np.shape[0]))
            break
        except _np.linalg.LinAlgError:
            continue
    if l is None:
        raise _np.linalg.LinAlgError("init covariance not factorizable")
    l = jnp.asarray(l)
    if dtype is not None:
        mean = mean.astype(dtype)
        l = l.astype(dtype)
    return SVGPVariational(mean=mean, chol_raw=l)


def predict_diag(
    kernel_gram: KernelGram,
    kernel_diag: KernelDiag,
    kparams: Dict,
    var: SVGPVariational,
    z: Array,
    x: Array,
    jitter: float,
    lk: Array | None = None,
) -> Tuple[Array, Array, Array]:
    """Marginal predictive q(f(x)) = N(mu, var) per point.

    Returns (mu, var, lk) where lk = chol(Kzz + jitter I) so callers that
    evaluate several test sets against the same inducing state can reuse it.
    """
    if lk is None:
        lk = safe_cholesky(kernel_gram(kparams, z, z), jitter)
    kzx = kernel_gram(kparams, z, x)  # (M, N)
    w = tri_solve_lower(lk, kzx)  # L^{-1} Kzx, (M, N)
    # A^T m with A = Kzz^{-1} Kzx: mu = w^T (L^{-1} m)
    lm = tri_solve_lower(lk, var.mean[:, None])  # (M, 1)
    mu = jnp.matmul(w.T, lm, precision=jax.lax.Precision.HIGHEST)[:, 0]
    kxx = kernel_diag(kparams, x)
    # diag(Kxz Kzz^-1 Kzx) = colsum(w^2)
    v1 = jnp.sum(w * w, axis=0)
    # diag(A^T S A) = colsum(((L^{-1} L_S)^T w)^2): one MxM solve instead of
    # an MxN upper solve — cheaper for the 25x-tiled acquisition path
    ls = tril(var.chol_raw)
    w_ls = tri_solve_lower(lk, ls)  # (M, M)
    b = jnp.matmul(w_ls.T, w, precision=jax.lax.Precision.HIGHEST)
    v2 = jnp.sum(b * b, axis=0)
    pred_var = kxx - v1 + v2
    return mu, jnp.maximum(pred_var, 1e-12), lk


def predict_mean(
    kernel_gram: KernelGram,
    kparams: Dict,
    var: SVGPVariational,
    z: Array,
    x: Array,
    jitter: float,
    lk: Array | None = None,
) -> Tuple[Array, Array]:
    """Predictive mean only (used for the dynamic inducing-point chain)."""
    if lk is None:
        lk = safe_cholesky(kernel_gram(kparams, z, z), jitter)
    kzx = kernel_gram(kparams, z, x)
    w = tri_solve_lower(lk, kzx)
    lm = tri_solve_lower(lk, var.mean[:, None])
    return jnp.matmul(w.T, lm, precision=jax.lax.Precision.HIGHEST)[:, 0], lk


def kl_divergence(
    kernel_gram: KernelGram,
    kparams: Dict,
    var: SVGPVariational,
    z: Array,
    jitter: float,
    lk: Array | None = None,
) -> Array:
    """KL( N(m, S) || N(0, Kzz + jitter I) ), unwhitened."""
    if lk is None:
        lk = safe_cholesky(kernel_gram(kparams, z, z), jitter)
    m = var.mean
    ls = tril(var.chol_raw)
    # tr(Kzz^{-1} S) = || L^{-1} L_S ||_F^2
    w = tri_solve_lower(lk, ls)
    trace_term = jnp.sum(w * w)
    lm = tri_solve_lower(lk, m[:, None])
    maha = jnp.sum(lm * lm)
    logdet_k = logdet_from_chol(lk)
    logdet_s = logdet_from_chol(ls)
    mdim = m.shape[0]
    return 0.5 * (trace_term + maha - mdim + logdet_k - logdet_s)


# ---------------------------------------------------------------------------
# Whitened variant (optional redesign; not used by the parity path)
# ---------------------------------------------------------------------------


def predict_diag_whitened(
    kernel_gram: KernelGram,
    kernel_diag: KernelDiag,
    kparams: Dict,
    var: SVGPVariational,
    z: Array,
    x: Array,
    jitter: float,
    lk: Array | None = None,
) -> Tuple[Array, Array, Array]:
    if lk is None:
        lk = safe_cholesky(kernel_gram(kparams, z, z), jitter)
    kzx = kernel_gram(kparams, z, x)
    p = tri_solve_lower(lk, kzx)  # L^{-1} Kzx = P^T, (M, N)
    mu = p.T @ var.mean
    kxx = kernel_diag(kparams, x)
    v1 = jnp.sum(p * p, axis=0)
    ls = tril(var.chol_raw)
    b = ls.T @ p
    v2 = jnp.sum(b * b, axis=0)
    return mu, jnp.maximum(kxx - v1 + v2, 1e-12), lk


def kl_divergence_whitened(var: SVGPVariational) -> Array:
    ls = tril(var.chol_raw)
    m = var.mean
    trace_term = jnp.sum(ls * ls)
    maha = jnp.sum(m * m)
    logdet_s = logdet_from_chol(ls)
    return 0.5 * (trace_term + maha - m.shape[0] - logdet_s)
