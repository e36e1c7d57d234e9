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
    diag = _np.diag(cov_np)
    if not _np.any(cov_np - _np.diag(diag)) and bool(_np.all(diag > 0)):
        # exactly diagonal with positive entries (every non-top layer inits
        # at 1e-8*I): chol is sqrt of the diagonal — skips an O(m^3) dense
        # host factorization (~seconds per layer per blackbox per BO
        # iteration at m=2048). A singular diagonal (e.g. y_high_std == 0
        # making the top-layer cov exactly zero) falls through to the
        # escalation loop below, which raises loudly instead of returning a
        # zero factor that would -inf the KL logdet.
        l = jnp.asarray(_np.diag(_np.sqrt(diag)))
        if dtype is not None:
            return SVGPVariational(mean=mean.astype(dtype), chol_raw=l.astype(dtype))
        return SVGPVariational(mean=mean, chol_raw=l)
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
# State-hoisted variant: predictive/KL from precomputed solved variational
# quantities. With w_mean = L^{-1} m and w_ls = L^{-1} L_S (unwhitened) or
# w_mean = m_w and w_ls = L_S (whitened), the predictive is IDENTICAL in both
# parameterizations:
#
#     w   = L^{-1} Kzx
#     mu  = w^T w_mean
#     var = diag(Kxx) - colsum(w^2) + colsum((w_ls^T w)^2)
#
# and the KL differs only by the logdet Kzz term (present unwhitened, absent
# whitened). Hoisting (w_mean, w_ls) into the per-layer state shares the
# x-independent triangular solves between the predictive and the KL and
# across every evaluation against the same inducing state — per training
# step this removes ~2 solves/layer plus their transposed twins in the VJP.
# ---------------------------------------------------------------------------


def solve_variational(
    var: SVGPVariational, lk: Array, whitened: bool
) -> Tuple[Array, Array]:
    """(w_mean, w_ls) for the state-hoisted predictive/KL.

    Unwhitened: one triangular solve with [m | L_S] concatenated — columns of
    a multi-RHS solve are independent, so the result equals the two separate
    solves the predictive and KL previously issued."""
    ls = tril(var.chol_raw)
    if whitened:
        return var.mean, ls
    sol = tri_solve_lower(lk, jnp.concatenate([var.mean[:, None], ls], axis=1))
    return sol[:, 0], sol[:, 1:]


def predict_diag_state(
    kernel_gram: KernelGram,
    kernel_diag: KernelDiag,
    kparams: Dict,
    z: Array,
    x: Array,
    lk: Array,
    w_mean: Array,
    w_ls: Array,
    lk_inv: Array | None = None,
) -> Tuple[Array, Array]:
    """Marginal predictive q(f(x)) from a precomputed layer state.

    Equals predict_diag (unwhitened state) / predict_diag_whitened (whitened
    state); the per-x work is one triangular solve + two matmuls.

    lk_inv: optional explicit L^{-1} (computed once per program by
    compute_layer_states(with_inv=True)): the per-x triangular solve becomes
    a plain matmul — MXU-friendly on TPU for evaluation loops (L-BFGS bodies)
    that call this many times against one state. f32 cost: |w| error ~
    cond(L) * eps relative (~1e-4 at jittered kernel conditioning) — fine for
    acquisition surfaces, not used on the training/parity path."""
    kzx = kernel_gram(kparams, z, x)  # (M, N)
    if lk_inv is not None:
        w = jnp.matmul(lk_inv, kzx, precision=jax.lax.Precision.HIGHEST)
    else:
        w = tri_solve_lower(lk, kzx)
    mu = jnp.matmul(w.T, w_mean[:, None], precision=jax.lax.Precision.HIGHEST)[:, 0]
    kxx = kernel_diag(kparams, x)
    v1 = jnp.sum(w * w, axis=0)
    b = jnp.matmul(w_ls.T, w, precision=jax.lax.Precision.HIGHEST)
    v2 = jnp.sum(b * b, axis=0)
    return mu, jnp.maximum(kxx - v1 + v2, 1e-12)


def kl_state(
    var: SVGPVariational, lk: Array, w_mean: Array, w_ls: Array, whitened: bool
) -> Array:
    """KL(q || prior) from the precomputed state; shared core, the unwhitened
    prior N(0, Kzz + jitter I) adds logdet Kzz."""
    trace_term = jnp.sum(w_ls * w_ls)
    maha = jnp.sum(w_mean * w_mean)
    logdet_s = logdet_from_chol(tril(var.chol_raw))
    mdim = var.mean.shape[0]
    core = trace_term + maha - mdim - logdet_s
    if not whitened:
        core = core + logdet_from_chol(lk)
    return 0.5 * core


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
