"""Pathwise RFF samples of MFDGP layer posteriors/priors.

Re-implements the RFF machinery of /root/reference/mobocmf/layers/
mfdgp_hidden_layer.py:288-514 in JAX. A "function sample" is a pytree of
feature weights; evaluation chains layers (layer ell consumes the previous
layer's sampled value), is fully batched over inputs, differentiable with
jax.grad (replacing the reference's hand-written feature gradients), and
vmappable over grid points / blackboxes.

Feature maps (reference :288-292):
    phi(x)  = sqrt(2 alpha / F) * cos(W x^T + b),  W ~ N(0,1)/lengthscale,
              b ~ U[0, 2 pi)
Posterior weights (reference :297-307), with Phi = phi(X_inducing) (F, M):
    A     = Phi Phi^T + sigma2 I   (sigma2 = 1e-6)
    m     = A^{-1} Phi y
    cov   = sigma2 A^{-1} + A^{-1} Phi S Phi^T A^{-1}
    theta = m + chol(cov) eps
Deep layers use the 3-block feature concat (reference :394-398):
    Phi = [ phi_x1(x) * f * sqrt(nu_lin) ; phi_x1f([x, f]) ; phi_x2(x) ]
where f is the previous layer's sampled value at x; b_x1f = b_x1 and
W_x1f = [W_x1, W_f].

The sampled X_inducing/y/S are the layer's CURRENT dynamic inducing points and
variational distribution (the reference reads the inducing_points property).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from mobocmf_tpu.core import config as cfg
from mobocmf_tpu.linalg.ops import cho_solve, cholesky
from mobocmf_tpu.models import mfdgp as M
from mobocmf_tpu.models import svgp

Array = jnp.ndarray


class Layer0Sample(NamedTuple):
    w: Array  # (F, d)
    b: Array  # (F, 1)
    alpha: Array  # ()
    theta: Array  # (F,)


class DeepLayerSample(NamedTuple):
    w_x1: Array  # (F, d)
    w_x1f: Array  # (F, d+1)
    w_x2: Array  # (F, d)
    b_x1: Array  # (F, 1)
    b_x2: Array  # (F, 1)
    alpha_x1: Array
    alpha_x1f: Array
    alpha_x2: Array
    nu_lin: Array
    theta: Array  # (3F,)


class MFDGPFunctionSample(NamedTuple):
    """One pathwise sample of the whole layer stack."""

    layers: Tuple  # Layer0Sample then DeepLayerSample per layer > 0


def _phi(x: Array, w: Array, b: Array, alpha: Array, n_features: int) -> Array:
    """(F, N) feature matrix, reference _phi_rbf (:288-292)."""
    return jnp.sqrt(2.0 * alpha / n_features) * jnp.cos(
        jnp.matmul(w, x.T, precision=jax.lax.Precision.HIGHEST) + b
    )


def _posterior_theta(
    key: jax.Array, phi: Array, y: Array, s: Array, sigma2: float = cfg.RFF_SIGMA2
) -> Array:
    f = phi.shape[0]
    a = jnp.matmul(phi, phi.T, precision=jax.lax.Precision.HIGHEST) + sigma2 * jnp.eye(f, dtype=phi.dtype)
    la = cholesky(a)
    m = cho_solve(la, phi @ y)
    a_inv = cho_solve(la, jnp.eye(f, dtype=phi.dtype))
    mm = lambda u, v: jnp.matmul(u, v, precision=jax.lax.Precision.HIGHEST)
    extra = mm(mm(mm(a_inv, phi), s), mm(phi.T, a_inv))
    cov = sigma2 * a_inv + extra
    # tiny relative jitter for Cholesky safety (the reference relies on
    # scipy raising; jnp.linalg.cholesky would silently NaN instead)
    cov = cov + (1e-10 * jnp.mean(jnp.diag(cov))) * jnp.eye(f, dtype=phi.dtype)
    eps = jax.random.normal(key, (f,), dtype=phi.dtype)
    return m + cholesky(cov) @ eps


def sample_posterior(
    key: jax.Array,
    params: M.MFDGPParams,
    consts: M.MFDGPConsts,
    config: M.MFDGPConfig,
    n_features: int = cfg.RFF_NUM_FEATURES,
) -> MFDGPFunctionSample:
    """Pathwise posterior sample of every layer (reference
    sample_function_from_each_layer, mfdgp.py:264-275)."""
    states = M.compute_layer_states(params, consts, config)
    layers: List = []
    for ell in range(config.num_fidelities):
        lp = params.layers[ell]
        z = states[ell].z
        y = lp.variational.mean
        ls_chol = svgp.tril(lp.variational.chol_raw)
        s = ls_chol @ ls_chol.T
        key, k_feat, k_theta = jax.random.split(key, 3)
        if ell == 0:
            from mobocmf_tpu.kernels.rbf import scale_rbf_constrained

            ls, alpha = scale_rbf_constrained(lp.kernel)
            kw, kb = jax.random.split(k_feat)
            w = jax.random.normal(kw, (n_features, z.shape[1]), dtype=z.dtype) / ls
            b = jax.random.uniform(
                kb, (n_features, 1), dtype=z.dtype, maxval=2.0 * jnp.pi
            )
            phi = _phi(z, w, b, alpha, n_features)
            theta = _posterior_theta(k_theta, phi, y, s)
            layers.append(Layer0Sample(w=w, b=b, alpha=alpha, theta=theta))
        else:
            layers.append(
                _sample_deep_layer(
                    k_feat, k_theta, lp.kernel, z, y, s, n_features, prior=False
                )
            )
    return MFDGPFunctionSample(layers=tuple(layers))


def _deep_kernel_constrained(kernel):
    from mobocmf_tpu.core.constraints import Positive

    p = Positive()
    return dict(
        ls_x1=p.forward(kernel["kx1"]["raw_lengthscale"]),
        ls_f=p.forward(kernel["kf"]["raw_lengthscale"]),
        ls_x2=p.forward(kernel["kx2"]["raw_lengthscale"]),
        a_x1=p.forward(kernel["kx1"]["raw_outputscale"]),
        a_f=p.forward(kernel["kf"]["raw_outputscale"]),
        a_x2=p.forward(kernel["kx2"]["raw_outputscale"]),
        nu_lin=p.forward(kernel["klin"]["raw_variance"]),
    )


def _sample_deep_layer(k_feat, k_theta, kernel, z, y, s, n_features, prior: bool):
    """Deep-layer RFF sample (reference :364-444 posterior, :446-514 prior)."""
    d = z.shape[1] - 1  # x dims
    dtype = z.dtype
    if prior:
        c = dict(
            ls_x1=10 * 0.25 * d, ls_f=1.0, ls_x2=0.25 * d,
            a_x1=1.0, a_f=1.0, a_x2=0.01, nu_lin=1.0,
        )
    else:
        c = _deep_kernel_constrained(kernel)
    kw1, kwf, kw2, kb1, kb2 = jax.random.split(k_feat, 5)
    w_x1 = jax.random.normal(kw1, (n_features, d), dtype=dtype) / c["ls_x1"]
    w_f = jax.random.normal(kwf, (n_features, 1), dtype=dtype) / c["ls_f"]
    w_x1f = jnp.concatenate([w_x1, w_f], axis=1)
    w_x2 = jax.random.normal(kw2, (n_features, d), dtype=dtype) / c["ls_x2"]
    b_x1 = jax.random.uniform(kb1, (n_features, 1), dtype=dtype, maxval=2 * jnp.pi)
    b_x2 = jax.random.uniform(kb2, (n_features, 1), dtype=dtype, maxval=2 * jnp.pi)
    a_x1f = jnp.asarray(c["a_x1"] * c["a_f"], dtype=dtype)

    sample = DeepLayerSample(
        w_x1=w_x1, w_x1f=w_x1f, w_x2=w_x2, b_x1=b_x1, b_x2=b_x2,
        alpha_x1=jnp.asarray(c["a_x1"], dtype=dtype),
        alpha_x1f=a_x1f,
        alpha_x2=jnp.asarray(c["a_x2"], dtype=dtype),
        nu_lin=jnp.asarray(c["nu_lin"], dtype=dtype),
        theta=jnp.zeros((3 * n_features,), dtype=dtype),
    )
    if prior:
        theta = jax.random.normal(k_theta, (3 * n_features,), dtype=dtype)
    else:
        x_data, f_data = z[:, :-1], z[:, -1]
        phi = _deep_features(sample, x_data, f_data, n_features)
        theta = _posterior_theta(k_theta, phi, y, s)
    return sample._replace(theta=theta)


def _deep_features(s: DeepLayerSample, x: Array, f: Array, n_features: int) -> Array:
    """3-block deep feature matrix (3F, N); f is the previous-layer value."""
    xf = jnp.concatenate([x, f[:, None]], axis=1)
    phi_x1 = _phi(x, s.w_x1, s.b_x1, s.alpha_x1, n_features)
    phi_x1f = _phi(xf, s.w_x1f, s.b_x1, s.alpha_x1f, n_features)
    phi_x2 = _phi(x, s.w_x2, s.b_x2, s.alpha_x2, n_features)
    return jnp.concatenate(
        [phi_x1 * f[None, :] * jnp.sqrt(s.nu_lin), phi_x1f, phi_x2], axis=0
    )


def sample_prior(
    key: jax.Array,
    input_dims: int,
    num_fidelities: int,
    n_features: int = cfg.RFF_NUM_FEATURES,
    dtype=None,
) -> MFDGPFunctionSample:
    """Prior sample of the whole stack (reference
    sample_function_from_prior_each_layer, mfdgp.py:277-288; fixed prior
    hyperparameters, layer file :339-362 and :446-514)."""
    if dtype is None:
        dtype = jnp.result_type(float)  # f64 under x64, else f32
    layers: List = []
    for ell in range(num_fidelities):
        key, k_feat, k_theta = jax.random.split(key, 3)
        if ell == 0:
            ls = 0.25 * input_dims
            kw, kb = jax.random.split(k_feat)
            w = jax.random.normal(kw, (n_features, input_dims), dtype=dtype) / ls
            b = jax.random.uniform(kb, (n_features, 1), dtype=dtype, maxval=2 * jnp.pi)
            theta = jax.random.normal(k_theta, (n_features,), dtype=dtype)
            layers.append(
                Layer0Sample(w=w, b=b, alpha=jnp.asarray(1.0, dtype=dtype), theta=theta)
            )
        else:
            z_dummy = jnp.zeros((1, input_dims + 1), dtype=dtype)
            layers.append(
                _sample_deep_layer(
                    k_feat, k_theta, None, z_dummy, None, None, n_features, prior=True
                )
            )
    return MFDGPFunctionSample(layers=tuple(layers))


def eval_sample(
    sample: MFDGPFunctionSample, x: Array, layer: Optional[int] = None
) -> Array:
    """Evaluate the sampled function at x (N, d) -> (N,), chaining layers.

    layer=None evaluates the top layer (the reference always consumes
    sample_function_from_each_layer()[-1])."""
    if x.ndim == 1:
        x = x[None, :]
    num_layers = len(sample.layers) if layer is None else layer + 1
    n_features = sample.layers[0].w.shape[0]
    f = None
    for ell in range(num_layers):
        s = sample.layers[ell]
        if ell == 0:
            feats = _phi(x, s.w, s.b, s.alpha, n_features)
        else:
            feats = _deep_features(s, x, f, n_features)
        f = jnp.matmul(s.theta, feats, precision=jax.lax.Precision.HIGHEST)
    return f


def eval_sample_scalar(sample: MFDGPFunctionSample, x_single: Array) -> Array:
    """Scalar evaluation for jax.grad (x_single: (d,))."""
    return eval_sample(sample, x_single[None, :])[0]


eval_sample_grad = jax.grad(eval_sample_scalar, argnums=1)
