"""Hyperparameter introspection.

Parity with MFDGPHiddenLayer.print_lengthscales_and_outputscale
(/root/reference/mobocmf/layers/mfdgp_hidden_layer.py:191-224): returns the
constrained kernel hyperparameters of every layer as a dict (the reference's
examples dump these to params/*.txt)."""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax

from mobocmf_tpu.models import mfdgp as M


def _softplus(raw):
    # numpy softplus (stable): runs on HOST — eager device ops over the TPU
    # dispatch is cheap (~0.1 ms, benchmarks/probe_setup.py) but python+
    # dispatch overhead aggregates: this is called ~20x per model per dump
    raw = np.asarray(raw, dtype=np.float64)
    return np.log1p(np.exp(-np.abs(raw))) + np.maximum(raw, 0.0)


def describe_hyperparams(model: M.MFDGPModel) -> Dict[str, Dict]:
    # ONE device->host fetch of everything needed, then pure numpy
    params = jax.device_get(model.params)
    noise_lower = np.asarray(model.consts.noise_lower, dtype=np.float64)
    noise_upper = np.asarray(model.consts.noise_upper, dtype=np.float64)

    out: Dict[str, Dict] = {}
    for ell, lp in enumerate(params.layers):
        if ell == 0:
            out[f"layer_{ell}"] = {
                "l0_lengthscale": _softplus(lp.kernel["raw_lengthscale"]),
                "l0_outputscale": float(_softplus(lp.kernel["raw_outputscale"])),
            }
        else:
            alpha_x1 = float(_softplus(lp.kernel["kx1"]["raw_outputscale"]))
            alpha_f = float(_softplus(lp.kernel["kf"]["raw_outputscale"]))
            out[f"layer_{ell}"] = {
                "lengthscale_x1": _softplus(lp.kernel["kx1"]["raw_lengthscale"]),
                "lengthscale_f": _softplus(lp.kernel["kf"]["raw_lengthscale"]),
                "lengthscale_x2": _softplus(lp.kernel["kx2"]["raw_lengthscale"]),
                "alpha_x1": alpha_x1,
                "alpha_f": alpha_f,
                "alpha_x1f": alpha_x1 * alpha_f,
                "alpha_x2": float(_softplus(lp.kernel["kx2"]["raw_outputscale"])),
                "nu_lin": float(_softplus(lp.kernel["klin"]["raw_variance"])),
            }
        # Interval noise transform (constraints.Interval.forward), in numpy
        lo, hi = noise_lower[ell], noise_upper[ell]
        raw = float(np.asarray(params.raw_noises)[ell])
        out[f"layer_{ell}"]["likelihood_noise"] = float(
            lo + (hi - lo) / (1.0 + np.exp(-raw))
        )
    return out


def print_lengthscales_and_outputscale(model: M.MFDGPModel, custom_print=print):
    for layer_name, vals in describe_hyperparams(model).items():
        custom_print({layer_name: vals})
