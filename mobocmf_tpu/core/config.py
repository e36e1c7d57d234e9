"""Global numerical configuration for the TPU rebuild.

The reference runs float64 everywhere with a 2e-6 jitter on kernel matrices
(/root/reference/mobocmf/layers/mfdgp_hidden_layer.py:17-20 and
/root/reference/mobocmf/util/blackbox_mfdgp_fitter.py:32).  On TPU we run
float32 by default (MXU-friendly) with a dtype-aware jitter; parity runs on
CPU enable jax_enable_x64 (see tests/conftest.py) and recover the reference's
2e-6 jitter automatically.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

# Jitter added to K(Z,Z) before Cholesky. Matches the reference's 2e-6
# (CovarianceMatrixMF.add_jitter) in f64; widened for f32 where 2e-6 is only
# ~17x machine eps and Cholesky of near-singular Grams can fail.
JITTER_F64 = 2e-6
JITTER_F32 = 1e-5

# RFF machinery (reference: mfdgp_hidden_layer.py:297-307)
RFF_NUM_FEATURES = 500
RFF_SIGMA2 = 1e-6

# Acquisition (reference: mfdgp.py:23 num_samples_for_acquisition)
NUM_SAMPLES_FOR_ACQUISITION = 25

# Variance floor for predictive variances (numerical safety only; the
# reference relies on gpytorch's psd-safety machinery instead).
MIN_VARIANCE = 1e-12


def default_jitter(dtype) -> float:
    if jnp.dtype(dtype) == jnp.float64:
        return JITTER_F64
    return JITTER_F32


@dataclasses.dataclass(frozen=True)
class FitConfig:
    """Hyperparameters of the two-phase + conditioned trainers.

    Defaults mirror BlackBoxMFDGPFitter
    (/root/reference/mobocmf/util/blackbox_mfdgp_fitter.py:43-44).
    """

    lr_1: float = 0.003
    lr_2: float = 0.001
    num_epochs_1: int = 5000
    num_epochs_2: int = 15000
    pareto_set_size: int = 50
    opt_grid_size: int = 1000
    eps: float = 1e-8
