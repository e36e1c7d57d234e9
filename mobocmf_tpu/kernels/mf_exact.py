"""Multi-fidelity kernels for the exact-GP models MFGP and MFGP_lin.

MFKernel (reference /root/reference/mobocmf/models/mfgp.py:145-184), over
inputs whose LAST column is the (0-based) fidelity:

    K = k_signal(x, x') + min(fid, fid') * k_noise(x, x')

(the reference counts fidelities from 1 and multiplies by (min_fid - 1), which
equals min of the 0-based fidelities). Lengthscales live in Interval(1e-3, 1e3)
and outputscales in Interval(1e-3, 1e2); init outputscales 1.0 / 0.1.

MFKernel_lin (reference /root/reference/mobocmf/models/mfgp_lin.py:101-189),
an AR(1)-style kernel with learnable correlations rho in R^{F-1} (init 0.5):

    signal factor[i,j] = cp[fid_i] * cp[fid_j],  cp = [1, cumprod(rho)]
    noise factor[i,j]  = 1{min1based >= 2} + sum_{k=3}^{F-2} 1{min1based >= k} rho[k-2]^2
    K = signal_factor * k_signal + noise_factor * k_noise

NOTE: the reference's noise-factor loop runs `range(3, num_fidelities - 1)`
(mfgp_lin.py:183) which skips the last rho^2 term for F >= 5; we replicate it
bit-for-bit for parity (flagged in SURVEY.md section 7.3).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from mobocmf_tpu.core.constraints import Interval
from mobocmf_tpu.kernels import rbf

Array = jnp.ndarray

_LS_INTERVAL = Interval(1e-3, 1000.0)
_OS_INTERVAL = Interval(1e-3, 100.0)


def init_mf_kernel_params(init_lengthscale, input_dim_x: int) -> Dict:
    """Raw params for MFKernel. `input_dim_x` excludes the fidelity column."""
    ls = jnp.broadcast_to(jnp.asarray(init_lengthscale, dtype=jnp.result_type(float)), (input_dim_x,))
    return {
        "signal": {
            "raw_lengthscale": _LS_INTERVAL.inverse(ls),
            "raw_outputscale": _OS_INTERVAL.inverse(jnp.asarray(1.0, dtype=ls.dtype)),
        },
        "noise": {
            "raw_lengthscale": _LS_INTERVAL.inverse(ls),
            "raw_outputscale": _OS_INTERVAL.inverse(jnp.asarray(0.1, dtype=ls.dtype)),
        },
    }


def _interval_rbf_gram(p: Dict, x1: Array, x2: Array) -> Array:
    ls = _LS_INTERVAL.forward(p["raw_lengthscale"])
    os_ = _OS_INTERVAL.forward(p["raw_outputscale"])
    a, b = x1 / ls, x2 / ls
    ab = jnp.matmul(a, b.T, precision=jax.lax.Precision.HIGHEST)
    d2 = (
        jnp.sum(a * a, -1, keepdims=True)
        - 2.0 * ab
        + jnp.sum(b * b, -1, keepdims=True).T
    )
    return os_ * jnp.exp(-0.5 * jnp.maximum(d2, 0.0))


def mf_kernel_constrained(params: Dict):
    return {
        "signal_ls": _LS_INTERVAL.forward(params["signal"]["raw_lengthscale"]),
        "signal_os": _OS_INTERVAL.forward(params["signal"]["raw_outputscale"]),
        "noise_ls": _LS_INTERVAL.forward(params["noise"]["raw_lengthscale"]),
        "noise_os": _OS_INTERVAL.forward(params["noise"]["raw_outputscale"]),
    }


def mf_kernel_gram(params: Dict, xf1: Array, xf2: Array) -> Array:
    x1, fid1 = xf1[:, :-1], xf1[:, -1]
    x2, fid2 = xf2[:, :-1], xf2[:, -1]
    min_fid = jnp.minimum(fid1[:, None], fid2[None, :])
    k_sig = _interval_rbf_gram(params["signal"], x1, x2)
    k_noi = _interval_rbf_gram(params["noise"], x1, x2)
    return k_sig + min_fid * k_noi


def mf_kernel_diag(params: Dict, xf: Array) -> Array:
    """diag K([x,f], [x,f]) without the O(M^2) gram: an RBF at distance 0 is
    exactly its outputscale, so diag = os_signal + fid * os_noise (the
    reference evaluates the full gram and takes the diagonal,
    mfgp.py:172-184; the analytic value avoids the expansion-trick rounding
    on the diagonal as well)."""
    fid = xf[:, -1]
    os_sig = _OS_INTERVAL.forward(params["signal"]["raw_outputscale"])
    os_noi = _OS_INTERVAL.forward(params["noise"]["raw_outputscale"])
    return os_sig + fid * os_noi


def init_mf_lin_kernel_params(init_lengthscale, input_dim_x: int, num_fidelities: int) -> Dict:
    ls = jnp.broadcast_to(jnp.asarray(init_lengthscale, dtype=jnp.result_type(float)), (input_dim_x,))
    return {
        "signal": rbf.init_scale_rbf_params(ls, 1.0, input_dim_x),
        "noise": rbf.init_scale_rbf_params(ls, 0.1, input_dim_x),
        "rho": 0.5 * jnp.ones((num_fidelities - 1,), dtype=ls.dtype),
    }


def mf_lin_kernel_gram(params: Dict, xf1: Array, xf2: Array, num_fidelities: int) -> Array:
    x1, fid1 = xf1[:, :-1], xf1[:, -1].astype(jnp.int32)
    x2, fid2 = xf2[:, :-1], xf2[:, -1].astype(jnp.int32)
    rho = params["rho"]
    cp = jnp.concatenate([jnp.ones((1,), dtype=rho.dtype), jnp.cumprod(rho)])
    factor_signal = jnp.outer(cp[fid1], cp[fid2])

    min1 = jnp.minimum(fid1[:, None], fid2[None, :]) + 1  # 1-based min fidelity
    factor_noise = (min1 >= 2).astype(rho.dtype)
    # replicate reference's range(3, num_fidelities - 1) exactly (see module doc)
    for k in range(3, num_fidelities - 1):
        factor_noise = factor_noise + (min1 >= k).astype(rho.dtype) * rho[k - 2] ** 2

    k_sig = rbf.rbf_gram(params["signal"], x1, x2)
    k_noi = rbf.rbf_gram(params["noise"], x1, x2)
    return factor_signal * k_sig + factor_noise * k_noi
