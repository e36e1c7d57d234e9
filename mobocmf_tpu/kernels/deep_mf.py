"""The deep multi-fidelity kernel of MFDGP hidden layers (layer > 0).

Over augmented inputs [x, f] (f = previous-layer output, last column):

    k([x,f],[x',f']) = k_x1(x,x') * (k_lin(f,f') + k_f(f,f')) + k_x2(x,x')

with k_x1, k_f, k_x2 Scale(RBF) and k_lin a linear kernel — the structure and
initialization of /root/reference/mobocmf/layers/mfdgp_hidden_layer.py:64-115:
k_x1.ls = 10*ls0, k_f.ls = 1, k_x2.ls = ls0, k_lin.var = 1, outputscales
(1, 1, 0.01).

Layer-0 kernels are plain Scale(RBF) with outputscale 1 (same file, :41-47).
The `only_hf` variant reduces each deep layer to k_x2(x,x') alone — the
behavioral equivalent of mfdgp_hidden_layer_only_hf.py:85-89,193-199, which
zeroes and freezes every other component.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from mobocmf_tpu.kernels import rbf

Array = jnp.ndarray


def init_deep_mf_params(init_lengthscale, input_dims_x: int) -> Dict:
    """Raw params for a deep layer kernel. `input_dims_x` is dim of x (not [x,f])."""
    return {
        "kx1": rbf.init_scale_rbf_params(init_lengthscale * 10.0, 1.0, input_dims_x),
        "kf": rbf.init_scale_rbf_params(1.0, 1.0, 1),
        "kx2": rbf.init_scale_rbf_params(init_lengthscale, 0.01, input_dims_x),
        "klin": rbf.init_linear_params(1.0),
    }


def _split(xf: Array):
    return xf[:, :-1], xf[:, -1:]


def deep_mf_gram(params: Dict, xf1: Array, xf2: Array) -> Array:
    x1, f1 = _split(xf1)
    x2, f2 = _split(xf2)
    kx1 = rbf.rbf_gram(params["kx1"], x1, x2)
    kf = rbf.rbf_gram(params["kf"], f1, f2)
    klin = rbf.linear_gram(params["klin"], f1, f2)
    kx2 = rbf.rbf_gram(params["kx2"], x1, x2)
    return kx1 * (klin + kf) + kx2


def deep_mf_diag(params: Dict, xf: Array) -> Array:
    x, f = _split(xf)
    kx1 = rbf.rbf_diag(params["kx1"], x)
    kf = rbf.rbf_diag(params["kf"], f)
    klin = rbf.linear_diag(params["klin"], f)
    kx2 = rbf.rbf_diag(params["kx2"], x)
    return kx1 * (klin + kf) + kx2


def only_hf_gram(params: Dict, xf1: Array, xf2: Array) -> Array:
    """use_only_highest_fidelity variant: k_x2(x, x') with outputscale ~ 1."""
    x1, _ = _split(xf1)
    x2, _ = _split(xf2)
    return rbf.rbf_gram(params["kx2"], x1, x2)


def only_hf_diag(params: Dict, xf: Array) -> Array:
    x, _ = _split(xf)
    return rbf.rbf_diag(params["kx2"], x)


def init_only_hf_params(init_lengthscale, input_dims_x: int) -> Dict:
    """only-HF ablation: k_x2 gets outputscale 1 (mfdgp_hidden_layer_only_hf.py:85-89)."""
    p = init_deep_mf_params(init_lengthscale, input_dims_x)
    p["kx2"] = rbf.init_scale_rbf_params(init_lengthscale, 1.0, input_dims_x)
    return p
