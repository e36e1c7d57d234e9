"""MFGP: exact multi-fidelity GP with the min-fidelity kernel.

Re-design of /root/reference/mobocmf/models/mfgp.py: a single exact GP over
augmented inputs [x, fidelity] with

    K = k_signal(x, x') + min(fid, fid') * k_noise(x, x')

(both Scale(RBF-ARD) with Interval constraints, outputscales init 1.0 / 0.1,
median-heuristic lengthscales), a single Gaussian likelihood with noise init
1e-1, zero mean. Includes pathwise RFF posterior sampling with the reference's
per-fidelity feature masks (mfgp.py:88-141) and an NLML trainer (the reference
delegates fitting to botorch; here it is an optax Adam loop on the exact
marginal likelihood).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax
from jax.scipy.linalg import solve_triangular

from mobocmf_tpu.core.constraints import GreaterThan
from mobocmf_tpu.core.distances import median_lengthscale_np
from mobocmf_tpu.kernels import mf_exact
from mobocmf_tpu.linalg.ops import add_jitter, cholesky, logdet_from_chol
from mobocmf_tpu.models.mfdgp import TL

Array = jnp.ndarray

# gpytorch GaussianLikelihood default noise constraint
_NOISE_CONSTRAINT = GreaterThan(1e-4)


class MFGPParams(NamedTuple):
    kernel: Dict
    raw_noise: Array


class MFGPModel(NamedTuple):
    params: MFGPParams
    x_train: Array  # (N, d+1) with fidelity last column
    y_train: Array  # (N,)
    num_fidelities: int
    input_dim: int  # x dims (without fidelity)
    jitter: float
    # (N,) extra per-row observation noise: 0 for real rows, PAD_PENALTY for
    # shape-padding rows. A padded row's coupling to the posterior scales as
    # k/PAD_PENALTY (~1e-6), making bucketed fits numerically equivalent to
    # unpadded ones while keeping every jitted program's shapes constant.
    row_penalty: Optional[Array] = None


PAD_PENALTY = 1e6


def init_mfgp(
    x_train: Array,
    y_train: Array,
    num_fidelities: int,
    type_lengthscale: TL = TL.MEDIAN,
    jitter: float = 1e-8,
    row_valid: Optional[Array] = None,
) -> MFGPModel:
    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train).reshape(-1)
    input_dim = x_train.shape[1] - 1
    if row_valid is not None:
        valid_np = np.asarray(row_valid).astype(bool)
        # init heuristics must see only real rows (pads would pollute the
        # median pairwise distance)
        init_ls = median_lengthscale_np(np.asarray(x_train)[valid_np][:, :input_dim])
    else:
        init_ls = median_lengthscale_np(np.asarray(x_train)[:, :input_dim])
    kernel = mf_exact.init_mf_kernel_params(init_ls, input_dim)
    kernel = jax.tree.map(lambda a: jnp.asarray(a, dtype=x_train.dtype), kernel)
    raw_noise = _NOISE_CONSTRAINT.inverse(jnp.asarray(0.1, dtype=x_train.dtype))
    penalty = (
        None
        if row_valid is None
        else jnp.where(
            jnp.asarray(row_valid, dtype=bool),
            jnp.zeros((x_train.shape[0],), dtype=x_train.dtype),
            jnp.asarray(PAD_PENALTY, dtype=x_train.dtype),
        )
    )
    return MFGPModel(
        params=MFGPParams(kernel=kernel, raw_noise=raw_noise),
        x_train=x_train,
        y_train=y_train,
        num_fidelities=num_fidelities,
        input_dim=input_dim,
        jitter=jitter,
        row_penalty=penalty,
    )


def noise(params: MFGPParams) -> Array:
    return _NOISE_CONSTRAINT.forward(params.raw_noise)


def nlml(
    params: MFGPParams, x: Array, y: Array, jitter: float, row_penalty=None
) -> Array:
    """Exact negative log marginal likelihood.

    row_penalty (N,): extra per-row noise (PAD_PENALTY on padded rows). A
    padded row contributes a parameter-independent constant to quad/logdet up
    to O(1/PAD_PENALTY), so argmin over kernel params matches the unpadded
    NLML."""
    n = x.shape[0]
    k = mf_exact.mf_kernel_gram(params.kernel, x, x)
    k = add_jitter(k, jitter) + noise(params) * jnp.eye(n, dtype=x.dtype)
    if row_penalty is not None:
        k = k + jnp.diag(row_penalty)
    l = cholesky(k)
    alpha = solve_triangular(l, y[:, None], lower=True)
    quad = jnp.sum(alpha**2)
    return 0.5 * (quad + logdet_from_chol(l) + n * jnp.log(2.0 * jnp.pi))


@partial(jax.jit, static_argnames=("num_iters", "lr"))
def _fit_mfgp_run(params, x, y, jitter, row_penalty, num_iters, lr):
    # module-level jit with data as runtime args: models sharing a data shape
    # (e.g. all blackboxes of one MESMOC iteration) share one executable
    opt = optax.adam(lr)

    def step(carry, _):
        p, s = carry
        loss, g = jax.value_and_grad(nlml)(p, x, y, jitter, row_penalty)
        updates, s = opt.update(g, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s), loss

    (p, _), losses = jax.lax.scan(step, (params, opt.init(params)), None, length=num_iters)
    return p, losses


def fit_mfgp(model: MFGPModel, num_iters: int = 500, lr: float = 0.05) -> MFGPModel:
    """Adam on the exact NLML (replaces botorch's fit loop)."""
    params, _ = _fit_mfgp_run(
        model.params, model.x_train, model.y_train, model.jitter,
        model.row_penalty, num_iters, lr,
    )
    return model._replace(params=params)


class MFGPPosteriorState(NamedTuple):
    """x-independent posterior pieces: l = chol(K_train + (jitter+noise) I),
    alpha = L^{-1} y. Hoisted once per program by callers that evaluate many
    candidate batches (the MESMOC L-BFGS loop) instead of refactorizing the
    N x N train Gram per evaluation."""

    l: Array
    alpha: Array


def posterior_state(model: MFGPModel) -> MFGPPosteriorState:
    params = model.params
    n = model.x_train.shape[0]
    k_train = mf_exact.mf_kernel_gram(params.kernel, model.x_train, model.x_train)
    k_train = add_jitter(k_train, model.jitter) + noise(params) * jnp.eye(
        n, dtype=model.x_train.dtype
    )
    if model.row_penalty is not None:
        k_train = k_train + jnp.diag(model.row_penalty)
    l = cholesky(k_train)
    alpha = solve_triangular(l, model.y_train[:, None], lower=True)
    return MFGPPosteriorState(l=l, alpha=alpha)


def predict(
    model: MFGPModel, x: Array, fidelity: int, state: MFGPPosteriorState = None
) -> Tuple[Array, Array]:
    """Posterior latent mean/var at [x, fidelity] (reference mfgp.py:50-61).

    Returns the noiseless predictive (gpytorch `self(x)` posterior).

    Batched inputs: a botorch-style (b, q, d) batch returns (b, q) mean/var —
    each batch row predicted independently (the reference asserts q == 1 and
    squeezes, mfgp.py:52-54; MFKernel_lin carries the general expand path,
    mfgp_lin.py:131-145,186-189 — here both models accept any q)."""
    if x.ndim == 3:
        b, q, d = x.shape
        mean, var = predict(model, x.reshape(b * q, d), fidelity, state=state)
        return mean.reshape(b, q), var.reshape(b, q)
    fid_col = jnp.full((x.shape[0], 1), float(fidelity), dtype=x.dtype)
    x_aug = jnp.concatenate([x, fid_col], axis=1)
    params = model.params
    if state is None:
        state = posterior_state(model)
    k_cross = mf_exact.mf_kernel_gram(params.kernel, model.x_train, x_aug)  # (N, M)
    w = solve_triangular(state.l, k_cross, lower=True)
    mean = (w.T @ state.alpha)[:, 0]
    k_diag = mf_exact.mf_kernel_diag(params.kernel, x_aug)
    var = jnp.maximum(k_diag - jnp.sum(w * w, axis=0), 1e-12)
    return mean, var


# ---------------------------------------------------------------------------
# RFF pathwise sampling with per-fidelity feature masks (reference :88-141)
# ---------------------------------------------------------------------------


class MFGPSample(NamedTuple):
    w_signal: Array
    b_signal: Array
    alpha_signal: Array
    w_noise: Array
    b_noise: Array
    alpha_noise: Array
    theta: Array  # ((num_fid) * F,) = signal block + (num_fid-1) noise blocks
    fidelity: int
    num_fidelities: int


def sample_from_posterior(
    key: jax.Array, model: MFGPModel, fidelity: int, n_features: int = 500
) -> MFGPSample:
    """Pathwise sample of the fidelity-`fidelity` process.

    The noise features are tiled (num_fidelities - 1) times; block t is active
    only for points whose fidelity is > t (the reference's mask zeroes the
    first nFeatures*(F - fid - 1) rows, :110-116)."""
    params = model.params
    c = mf_exact.mf_kernel_constrained(params.kernel)
    dtype = model.x_train.dtype
    d = model.input_dim
    x_data = model.x_train[:, :d]
    fid_data = model.x_train[:, d]

    kws, kbs, kwn, kbn, kth = jax.random.split(key, 5)
    w_s = jax.random.normal(kws, (n_features, d), dtype=dtype) / c["signal_ls"]
    b_s = jax.random.uniform(kbs, (n_features, 1), dtype=dtype, maxval=2 * jnp.pi)
    w_n = jax.random.normal(kwn, (n_features, d), dtype=dtype) / c["noise_ls"]
    b_n = jax.random.uniform(kbn, (n_features, 1), dtype=dtype, maxval=2 * jnp.pi)

    def phi(x, w, b, alpha):
        return jnp.sqrt(2.0 * alpha / n_features) * jnp.cos(
            jnp.matmul(w, x.T, precision=jax.lax.Precision.HIGHEST) + b
        )

    phi_s = phi(x_data, w_s, b_s, c["signal_os"])  # (F, N)
    phi_n = phi(x_data, w_n, b_n, c["noise_os"])
    if model.row_penalty is not None:
        # exclude padded rows from the dual solve exactly: zero their feature
        # columns (and targets below), so A = Phi Phi^T and Phi y see only
        # real observations
        real = (model.row_penalty == 0).astype(dtype)[None, :]
        phi_s = phi_s * real
        phi_n = phi_n * real
    nf1 = model.num_fidelities - 1
    # mask[t*F : (t+1)*F, i] active iff F - fid_i - 1 <= t  (reference :112-113)
    blocks = []
    for t in range(nf1):
        active = (model.num_fidelities - fid_data - 1) <= t
        blocks.append(phi_n * active[None, :].astype(dtype))
    phi_full = jnp.concatenate([phi_s] + blocks, axis=0)

    # posterior weights via the f64 host dual-space solve (S = 0 for the
    # exact-GP case: cov = sigma2 * A^{-1}); see sampling/rff.host_dual_theta
    from mobocmf_tpu.sampling.rff import host_dual_theta, _key_to_seed

    sigma2 = float(noise(params))
    n_rows = phi_full.shape[0]
    import numpy as _np

    y_dual = (
        model.y_train
        if model.row_penalty is None
        else model.y_train * (model.row_penalty == 0).astype(dtype)
    )
    theta = jnp.asarray(
        host_dual_theta(
            _key_to_seed(kth), phi_full, y_dual,
            _np.zeros((model.x_train.shape[0], model.x_train.shape[0])), sigma2,
        ),
        dtype=dtype,
    )

    return MFGPSample(
        w_signal=w_s, b_signal=b_s, alpha_signal=jnp.asarray(c["signal_os"], dtype=dtype),
        w_noise=w_n, b_noise=b_n, alpha_noise=jnp.asarray(c["noise_os"], dtype=dtype),
        theta=theta, fidelity=fidelity, num_fidelities=model.num_fidelities,
    )


def eval_mfgp_sample(s: MFGPSample, x: Array) -> Array:
    if x.ndim == 1:
        x = x[None, :]
    n_features = s.w_signal.shape[0]

    def phi(x, w, b, alpha):
        return jnp.sqrt(2.0 * alpha / n_features) * jnp.cos(
            jnp.matmul(w, x.T, precision=jax.lax.Precision.HIGHEST) + b
        )

    phi_s = phi(x, s.w_signal, s.b_signal, s.alpha_signal)
    phi_n = phi(x, s.w_noise, s.b_noise, s.alpha_noise)
    nf1 = s.num_fidelities - 1
    blocks = []
    for t in range(nf1):
        active = 1.0 if (s.num_fidelities - s.fidelity - 1) <= t else 0.0
        blocks.append(phi_n * active)
    feats = jnp.concatenate([phi_s] + blocks, axis=0)
    return jnp.matmul(s.theta, feats, precision=jax.lax.Precision.HIGHEST)
