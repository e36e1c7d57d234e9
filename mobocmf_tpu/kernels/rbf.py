"""RBF-ARD / scale / linear kernels as pure functions over raw-param pytrees.

Matches the constrained-value semantics of gpytorch's
ScaleKernel(RBFKernel(ard)) and LinearKernel as used by the reference's
MFDGP hidden layers (/root/reference/mobocmf/layers/mfdgp_hidden_layer.py:41-115):

    k_scale_rbf(x, z) = outputscale * exp(-0.5 * sum_d ((x_d - z_d)/ls_d)^2)
    k_lin(x, z)       = variance * x @ z.T

Raw params use the softplus ("Positive") transform, see core/constraints.py.
The Gram computation is written as one matmul + elementwise exp so XLA maps it
onto the MXU (precision=HIGHEST — see CLAUDE.md's f32 numerical rules).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mobocmf_tpu.core.constraints import Positive

Array = jnp.ndarray
_positive = Positive()


def init_scale_rbf_params(lengthscale, outputscale, ard_dims: int) -> Dict[str, Array]:
    """Raw params for outputscale * RBF_ard. `lengthscale` scalar or (d,)."""
    ls = jnp.broadcast_to(jnp.asarray(lengthscale, dtype=jnp.result_type(float)), (ard_dims,))
    return {
        "raw_lengthscale": _positive.inverse(ls),
        "raw_outputscale": _positive.inverse(jnp.asarray(outputscale, dtype=ls.dtype)),
    }


def init_linear_params(variance) -> Dict[str, Array]:
    return {"raw_variance": _positive.inverse(jnp.asarray(variance, dtype=jnp.result_type(float)))}


def scale_rbf_constrained(params):
    return _positive.forward(params["raw_lengthscale"]), _positive.forward(
        params["raw_outputscale"]
    )


def rbf_gram(params: Dict[str, Array], x1: Array, x2: Array) -> Array:
    """outputscale * exp(-0.5 ||(x1-x2)/ls||^2), shape (n1, n2).

    Computed via the expansion trick so the inner product hits the MXU:
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b on lengthscale-normalized inputs.
    """
    ls, os_ = scale_rbf_constrained(params)
    a = x1 / ls
    b = x2 / ls
    sq_a = jnp.sum(a * a, axis=-1, keepdims=True)
    sq_b = jnp.sum(b * b, axis=-1, keepdims=True)
    # HIGHEST precision is required on TPU: the default bf16 MXU passes make
    # the expansion trick cancel catastrophically and the Gram goes indefinite
    # by O(1e-2) — far beyond any reasonable jitter.
    ab = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(sq_a - 2.0 * ab + sq_b.T, 0.0)
    return os_ * jnp.exp(-0.5 * d2)


def rbf_diag(params: Dict[str, Array], x: Array) -> Array:
    """diag of rbf_gram(x, x) == outputscale everywhere."""
    _, os_ = scale_rbf_constrained(params)
    return jnp.full((x.shape[0],), 1.0, dtype=x.dtype) * os_


def linear_gram(params: Dict[str, Array], x1: Array, x2: Array) -> Array:
    v = _positive.forward(params["raw_variance"])
    return v * jnp.matmul(x1, x2.T, precision=jax.lax.Precision.HIGHEST)


def linear_diag(params: Dict[str, Array], x: Array) -> Array:
    v = _positive.forward(params["raw_variance"])
    return v * jnp.sum(x * x, axis=-1)
