"""mobocmf_tpu: TPU-native JESMOCMF — multi-objective, constrained,
multi-fidelity Bayesian optimization on JAX/XLA/Pallas.

A from-scratch re-design of fernandezdaniel/MOBOCMF (see SURVEY.md) with no
torch/gpytorch/botorch dependency. Public surface mirrors the reference:

    from mobocmf_tpu import (
        MFDGP, BlackBoxMFDGPFitter, JESMOC_MFDGP, MESMOC_MFGP, Random_choice,
        MOOP, TL,
    )

The functional core (pure pytrees + jitted transforms) lives in the
submodules: models/ (mfdgp, mfgp, mfgp_lin, exact_gp, svgp), kernels/,
linalg/ (Pallas + XLA), mlls/ (multi-fidelity ELBO), fit/ (two-phase and
conditioned trainers), sampling/ (RFF pathwise), moop/, acquisition/, bo/
(outer loop), parallel/ (mesh sharding), util/ (checkpoint, hypervolume,
profiling).
"""

from mobocmf_tpu.acquisition.jesmoc import JESMOC_MFDGP, _JES_MFDGP
from mobocmf_tpu.acquisition.mesmoc import MESMOC_MFGP, _MES_MFGP
from mobocmf_tpu.acquisition.random_choice import Random_choice
from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
from mobocmf_tpu.models.mfdgp import (
    MFDGPConfig,
    MFDGPConsts,
    MFDGPModel,
    MFDGPParams,
    TL,
    init_mfdgp,
)
from mobocmf_tpu.moop.moop import MOOP, NotFeasiblePoints, ParetoSolution

# Object-style alias: the reference's MFDGP class maps to the functional
# model bundle + the functions in models/mfdgp.py.
MFDGP = MFDGPModel

__all__ = [
    "BlackBoxMFDGPFitter",
    "JESMOC_MFDGP",
    "MESMOC_MFGP",
    "MFDGP",
    "MFDGPConfig",
    "MFDGPConsts",
    "MFDGPModel",
    "MFDGPParams",
    "MOOP",
    "NotFeasiblePoints",
    "ParetoSolution",
    "Random_choice",
    "TL",
    "init_mfdgp",
    "_JES_MFDGP",
    "_MES_MFGP",
]
