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


def host_dual_theta(
    seed: int, phi, y, s_cov, sigma2: float = cfg.RFF_SIGMA2
):
    """Posterior RFF weights via the DUAL (QR/Woodbury) formulation, host f64.

    The reference's primal system A = Phi Phi^T + sigma2*I (reference
    :297-307) is FxF with rank M << F and smallest eigenvalue sigma2 = 1e-6 —
    hopeless to factor in f32 and wasteful even in f64. With the thin QR
    Phi = Q R (Q: FxM, R: MxM) and G = R R^T + sigma2 I, the SAME posterior
    N(m, cov) is

        m    = Q G^{-1} R y
        cov  = (I - Q Q^T) + Q C Q^T,   C = sigma2 G^{-1} + G^{-1} R S R^T G^{-1}
        theta = m + (eps1 - Q Q^T eps1) + Q chol(C) eps2

    (substitute A^{-1} = Q G^{-1} Q^T + sigma2^{-1}(I - Q Q^T); identical to
    the reference's sampling distribution, factored exactly). Everything
    ill-conditioned is MxM and solved here in float64 on host — the RFF
    posterior is drawn once per BO iteration, off the jit hot path.
    """
    import numpy as _np

    phi = _np.asarray(phi, dtype=_np.float64)
    y = _np.asarray(y, dtype=_np.float64).reshape(-1)
    s_cov = _np.asarray(s_cov, dtype=_np.float64)
    f_dim = phi.shape[0]
    q, r = _np.linalg.qr(phi)  # q (F, k), r (k, M), k = min(F, M)
    k = q.shape[1]
    g = r @ r.T + sigma2 * _np.eye(k)
    g_inv = _np.linalg.solve(g, _np.eye(k))
    m = q @ (g_inv @ (r @ y))
    c = sigma2 * g_inv + g_inv @ r @ s_cov @ r.T @ g_inv
    c = 0.5 * (c + c.T)
    scale = max(float(_np.mean(_np.diag(c))), 1e-300)
    lc = None
    for rel in (0.0, 1e-12, 1e-9, 1e-6):
        try:
            lc = _np.linalg.cholesky(c + rel * scale * _np.eye(k))
            break
        except _np.linalg.LinAlgError:
            continue
    if lc is None:
        raise _np.linalg.LinAlgError("RFF dual covariance not factorizable")
    rng = _np.random.default_rng(seed)
    eps1 = rng.standard_normal(f_dim)
    eps2 = rng.standard_normal(k)
    return m + (eps1 - q @ (q.T @ eps1)) + q @ (lc @ eps2)


def _key_to_seed(key: jax.Array) -> int:
    return int(jax.random.randint(key, (), 0, 2**31 - 1))


def _sample_posterior_features(
    key: jax.Array,
    params: M.MFDGPParams,
    consts: M.MFDGPConsts,
    config: M.MFDGPConfig,
    n_features: int = cfg.RFF_NUM_FEATURES,
):
    """Device part of posterior sampling: draw W/b, build per-layer feature
    matrices Phi(Z) at the current dynamic inducing points, and collect each
    layer's variational (y, S). Thetas are zeros, filled by the host pass."""
    states = M.compute_layer_states(params, consts, config)
    layers: List = []
    phis: List = []
    ys: List = []
    covs: List = []
    for ell in range(config.num_fidelities):
        lp = params.layers[ell]
        z = states[ell].z
        y = lp.variational.mean
        ls_chol = svgp.tril(lp.variational.chol_raw)
        if config.whitened:
            # convert whitened q(v) to function-value space: m = L_K m_w,
            # L_S = L_K L_w (the RFF weight posterior consumes unwhitened m, S)
            lk = states[ell].lk
            y = jnp.matmul(lk, y, precision=jax.lax.Precision.HIGHEST)
            ls_chol = jnp.matmul(lk, ls_chol, precision=jax.lax.Precision.HIGHEST)
        s = jnp.matmul(ls_chol, ls_chol.T, precision=jax.lax.Precision.HIGHEST)
        key, k_feat = jax.random.split(key)
        if ell == 0:
            from mobocmf_tpu.kernels.rbf import scale_rbf_constrained

            ls, alpha = scale_rbf_constrained(lp.kernel)
            kw, kb = jax.random.split(k_feat)
            w = jax.random.normal(kw, (n_features, z.shape[1]), dtype=z.dtype) / ls
            b = jax.random.uniform(
                kb, (n_features, 1), dtype=z.dtype, maxval=2.0 * jnp.pi
            )
            phi = _phi(z, w, b, alpha, n_features)
            layers.append(
                Layer0Sample(
                    w=w, b=b, alpha=alpha,
                    theta=jnp.zeros((n_features,), dtype=z.dtype),
                )
            )
        else:
            lay = _sample_deep_layer(
                k_feat, None, lp.kernel, z, y, s, n_features, prior=False,
                skip_theta=True,
            )
            phi = _deep_features(lay, z[:, :-1], z[:, -1], n_features)
            layers.append(lay)
        phis.append(phi)
        ys.append(y)
        covs.append(s)
    return MFDGPFunctionSample(layers=tuple(layers)), tuple(phis), tuple(ys), tuple(covs)


_sample_posterior_features_jit = jax.jit(
    _sample_posterior_features, static_argnames=("config", "n_features")
)


def sample_posterior(
    key: jax.Array,
    params: M.MFDGPParams,
    consts: M.MFDGPConsts,
    config: M.MFDGPConfig,
    n_features: int = cfg.RFF_NUM_FEATURES,
) -> MFDGPFunctionSample:
    """Pathwise posterior sample of every layer (reference
    sample_function_from_each_layer, mfdgp.py:264-275).

    Hybrid: features on device (jitted), posterior weights via the f64
    dual-space solve on host (see host_dual_theta) — called once per BO
    iteration, off the training hot path."""
    import numpy as _np

    key_feat, key_theta = jax.random.split(key)
    skeleton, phis, ys, covs = _sample_posterior_features_jit(
        key_feat, params, consts, config, n_features
    )
    dtype = consts.z_x[0].dtype
    new_layers = []
    for ell, lay in enumerate(skeleton.layers):
        seed = _key_to_seed(jax.random.fold_in(key_theta, ell))
        theta = host_dual_theta(seed, phis[ell], ys[ell], covs[ell])
        new_layers.append(lay._replace(theta=jnp.asarray(theta, dtype=dtype)))
    return skeleton._replace(layers=tuple(new_layers))


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


def _sample_deep_layer(
    k_feat, k_theta, kernel, z, y, s, n_features, prior: bool, skip_theta: bool = False
):
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
    if skip_theta:
        return sample
    assert prior, "posterior thetas are computed by the host dual-space pass"
    theta = jax.random.normal(k_theta, (3 * n_features,), dtype=dtype)
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


# sample_posterior is already hybrid (jitted features + host theta); keep the
# name used by callers
sample_posterior_jit = sample_posterior


_VMAPPED_FEATURES = None


def _vmapped_features_jit():
    # built once: a jax.jit(...) created at the call site would start with an
    # empty executable cache every call, forcing a compile (or a persistent-
    # cache reload) per Pareto phase
    global _VMAPPED_FEATURES
    if _VMAPPED_FEATURES is None:
        from mobocmf_tpu.fit.trainer import CONSTS_AXES

        _VMAPPED_FEATURES = jax.jit(
            jax.vmap(
                _sample_posterior_features,
                in_axes=(0, 0, CONSTS_AXES, None, None),
            ),
            static_argnames=("config", "n_features"),
        )
    return _VMAPPED_FEATURES


def sample_posterior_stacked(
    key: jax.Array,
    stacked_params,
    stacked_consts,
    config: M.MFDGPConfig,
    num_models: int,
    n_features: int = cfg.RFF_NUM_FEATURES,
):
    """Vmapped pathwise sampling over stacked blackboxes (BASELINE config #4:
    'vmapped Pareto sampling'). One device program draws every model's
    features; the tiny MxM dual solves loop on host."""
    keys = jax.random.split(key, num_models + 1)
    feat_keys, key_theta = keys[:num_models], keys[num_models]
    skeletons, phis, ys, covs = _vmapped_features_jit()(
        feat_keys, stacked_params, stacked_consts, config, n_features
    )
    dtype = stacked_consts.z_x[0].dtype
    samples = []
    for i in range(num_models):
        new_layers = []
        for ell in range(config.num_fidelities):
            lay = jax.tree.map(lambda a, i=i: a[i], skeletons.layers[ell])
            seed = _key_to_seed(jax.random.fold_in(key_theta, i * 131 + ell))
            theta = host_dual_theta(seed, phis[ell][i], ys[ell][i], covs[ell][i])
            new_layers.append(lay._replace(theta=jnp.asarray(theta, dtype=dtype)))
        samples.append(MFDGPFunctionSample(layers=tuple(new_layers)))
    return samples

sample_prior_jit = jax.jit(
    sample_prior,
    static_argnames=("input_dims", "num_fidelities", "n_features", "dtype"),
)


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


def eval_sample_fn(sample: MFDGPFunctionSample, x: Array) -> Array:
    """Module-level top-layer evaluator with stable identity: used as the
    `fn` of moop.SampledFunction so jit caches survive resampling."""
    return eval_sample(sample, x)
