"""Hyperparameter introspection.

Parity with MFDGPHiddenLayer.print_lengthscales_and_outputscale
(/root/reference/mobocmf/layers/mfdgp_hidden_layer.py:191-224): returns the
constrained kernel hyperparameters of every layer as a dict (the reference's
examples dump these to params/*.txt)."""

from __future__ import annotations

from typing import Dict

import numpy as np

from mobocmf_tpu.core.constraints import Positive
from mobocmf_tpu.models import mfdgp as M

_p = Positive()


def describe_hyperparams(model: M.MFDGPModel) -> Dict[str, Dict]:
    out: Dict[str, Dict] = {}
    for ell, lp in enumerate(model.params.layers):
        if ell == 0:
            out[f"layer_{ell}"] = {
                "l0_lengthscale": np.asarray(_p.forward(lp.kernel["raw_lengthscale"])),
                "l0_outputscale": float(_p.forward(lp.kernel["raw_outputscale"])),
            }
        else:
            alpha_x1 = float(_p.forward(lp.kernel["kx1"]["raw_outputscale"]))
            alpha_f = float(_p.forward(lp.kernel["kf"]["raw_outputscale"]))
            out[f"layer_{ell}"] = {
                "lengthscale_x1": np.asarray(_p.forward(lp.kernel["kx1"]["raw_lengthscale"])),
                "lengthscale_f": np.asarray(_p.forward(lp.kernel["kf"]["raw_lengthscale"])),
                "lengthscale_x2": np.asarray(_p.forward(lp.kernel["kx2"]["raw_lengthscale"])),
                "alpha_x1": alpha_x1,
                "alpha_f": alpha_f,
                "alpha_x1f": alpha_x1 * alpha_f,
                "alpha_x2": float(_p.forward(lp.kernel["kx2"]["raw_outputscale"])),
                "nu_lin": float(_p.forward(lp.kernel["klin"]["raw_variance"])),
            }
        out[f"layer_{ell}"]["likelihood_noise"] = float(
            M.likelihood_noise(model.params, model.consts, ell)
        )
    return out


def print_lengthscales_and_outputscale(model: M.MFDGPModel, custom_print=print):
    for layer_name, vals in describe_hyperparams(model).items():
        custom_print({layer_name: vals})
