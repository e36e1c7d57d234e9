"""Multi-fidelity variational ELBO.

Re-implements /root/reference/mobocmf/mlls/variational_elbo_mf.py: the data
term sums, over fidelities i, the Gaussian expected log-likelihood of the rows
whose fidelity is i under layer i's marginal; the KL term aggregates all
layers and is rescaled by batch/num_data:

    elbo = sum_i sum_{n: fid_n = i} E_q[log N(y_n | f_i(x_n), sigma_i^2)]
           - KL * num_batch / num_data

Gaussian expected log prob (gpytorch GaussianLikelihood.expected_log_prob):
    -0.5 * [ log(2 pi sigma^2) + ((y - mu)^2 + var) / sigma^2 ]

A `weights` array (0/1) supports padded minibatches with static shapes.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from mobocmf_tpu.models import mfdgp as M

Array = jnp.ndarray


def gaussian_expected_log_prob(y: Array, mu: Array, var: Array, noise: Array) -> Array:
    """Per-point E_{q(f)}[log N(y | f, noise)]."""
    return -0.5 * (jnp.log(2.0 * math.pi * noise) + ((y - mu) ** 2 + var) / noise)


def _data_term(params, consts, config, outs, y, fid, weights):
    data_term = jnp.asarray(0.0, dtype=y.dtype)
    for i in range(config.num_fidelities):
        mu, var = outs[i]
        noise = M.likelihood_noise(params, consts, i)
        ll = gaussian_expected_log_prob(y, mu, var, noise)
        sel = jnp.where(fid == i, ll, 0.0)
        if weights is not None:
            sel = sel * weights
        data_term = data_term + jnp.sum(sel)
    return data_term


def elbo_terms(
    params: M.MFDGPParams,
    consts: M.MFDGPConsts,
    config: M.MFDGPConfig,
    x: Array,
    y: Array,
    fidelities: Array,
    eps: Array,
    num_data: int,
    weights: Optional[Array] = None,
    states=None,
) -> Tuple[Array, Array]:
    """Returns (elbo, scaled_kl) like VariationalELBOMF.forward (:24-51).

    `states` (M.compute_layer_states output) lets callers evaluating several
    terms against the same model — e.g. the conditioned loss's batch +
    Pareto-front + omega terms — factor the inducing chain once."""
    if states is None:
        states = M.compute_layer_states(params, consts, config)
    outs = M.forward(params, consts, config, x, eps, states=states)
    y = y.reshape(-1)
    fid = fidelities.reshape(-1)
    num_batch = y.shape[0] if weights is None else jnp.sum(weights)

    data_term = _data_term(params, consts, config, outs, y, fid, weights)
    kl = M.kl_all_layers(params, consts, config, states=states)
    scaled_kl = kl * num_batch / num_data
    return data_term - scaled_kl, scaled_kl


def elbo_data_term(
    params: M.MFDGPParams,
    consts: M.MFDGPConsts,
    config: M.MFDGPConfig,
    x: Array,
    y: Array,
    fidelities: Array,
    eps: Array,
    weights: Optional[Array] = None,
    states=None,
) -> Array:
    """Data term only (include_kl_term=False path, used by the conditioned
    trainer's pareto-front factors, blackbox_mfdgp_fitter.py:291-293)."""
    outs = M.forward(params, consts, config, x, eps, states=states)
    return _data_term(
        params, consts, config, outs, y.reshape(-1), fidelities.reshape(-1), weights
    )
