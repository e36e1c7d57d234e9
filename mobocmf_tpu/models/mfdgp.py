"""MFDGP: multi-fidelity deep GP as a pure-functional JAX model.

Re-design of /root/reference/mobocmf/models/mfdgp.py + layers/: one
sparse-variational GP layer per fidelity, layer ell > 0 consuming
[x, f_{ell-1}(x)] with the deep MF kernel, trained with the doubly-stochastic
multi-fidelity ELBO.

State is split three ways (the JAX-native replacement for the reference's
stateful nn.Modules):
- MFDGPParams   — trainable pytree (kernel raw params, variational means and
                  Cholesky factors, raw likelihood noises).
- MFDGPConsts   — non-trainable array pytree (inducing x-locations, the fixed
                  eval-mode normals, per-fidelity noise-constraint bounds).
                  Being arrays, these vmap over blackboxes.
- MFDGPConfig   — hashable Python config (num fidelities, flags, jitter).

Key semantics preserved from the reference:
- Dynamic inducing points (MFDGUnwhitenedVariationalStrategy, layer file
  :520-559): for ell > 0 the last column of Z_ell is the PREVIOUS layer's
  posterior mean at the inducing x-locations, recomputed from the current
  parameters. Here the whole chain is computed inside one jitted forward,
  and gradients flow into previous layers' parameters through it.
- Per-fidelity Gaussian likelihoods with Interval(1e-8, 0.1*y_std_f) noise
  (mfdgp.py:113-123); top-layer noise init 1e-2*y_high_std, else 1e-6.
- Nearest-same-fidelity-neighbor inducing values (mfdgp.py:290-317).
- Variational init: mean = inducing values exactly; covariance =
  K(Z)*(1e-2*y_high_std^2)^2 for the top layer else 1e-8*I
  (mfdgp_hidden_layer.py:131-136).
- Train-mode propagation samples fresh standard normals; eval-mode
  (acquisition) uses the per-layer FIXED normals drawn at construction
  (mfdgp_hidden_layer.py:159-163, 263-274), threaded here as explicit arrays.
- predict_for_acquisition: 25x tiling + moment matching (mfdgp.py:237-262).
- use_only_highest_fidelity ablation: per-layer independent GPs of x
  (mfdgp_hidden_layer_only_hf.py), with per-layer inducing sets.

Unlike the reference (which re-evaluates the inducing property and the Kzz
Cholesky many times per step through gpytorch), one forward here computes
each layer's Cholesky exactly once and shares it between the dynamic-Z chain,
the data predictive, and the KL.
"""

from __future__ import annotations

import enum
import time as _time
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.linalg import solve_triangular

from mobocmf_tpu.core import config as cfg
from mobocmf_tpu.core.constraints import Interval
from mobocmf_tpu.kernels import deep_mf, rbf
from mobocmf_tpu.linalg.ops import safe_cholesky
from mobocmf_tpu.models import svgp

Array = jnp.ndarray


class TL(enum.Enum):
    """Type of lengthscale init (reference mfdgp.py:15-18)."""

    ONES = 1
    MEDIAN = 2
    CENTESIMAL = 3


class MFDGPLayerParams(NamedTuple):
    kernel: Dict
    variational: svgp.SVGPVariational


class MFDGPParams(NamedTuple):
    layers: Tuple[MFDGPLayerParams, ...]
    raw_noises: Array  # (F,)


class MFDGPConsts(NamedTuple):
    z_x: Tuple[Array, ...]  # per layer, (M_l, d)
    acq_eps: Array  # (F, S) fixed eval-mode normals per layer
    noise_lower: Array  # (F,)
    noise_upper: Array  # (F,)


class MFDGPConfig(NamedTuple):
    num_fidelities: int
    only_hf: bool
    jitter: float
    num_samples_for_acquisition: int
    # whitened inducing parameterization (BASELINE.json redesign): q(v) with
    # u = chol(Kzz) v. Default False = reference (unwhitened) semantics.
    whitened: bool = False
    # freeze-to-prior mode (reference mfdgp_hidden_layer.py:52-62,90-113,
    # 166-188): kernel params initialized to fixed prior values and excluded
    # from training (the trainer zeroes their gradient masks).
    fix_kernel_params: bool = False


class MFDGPModel(NamedTuple):
    """Convenience bundle used by the object-level API (fitter, acquisitions)."""

    params: MFDGPParams
    consts: MFDGPConsts
    config: MFDGPConfig


def _layer_fns(layer_idx: int, only_hf: bool):
    if layer_idx == 0:
        return rbf.rbf_gram, rbf.rbf_diag
    if only_hf:
        return deep_mf.only_hf_gram, deep_mf.only_hf_diag
    return deep_mf.deep_mf_gram, deep_mf.deep_mf_diag


def likelihood_noise(
    params: MFDGPParams, consts: MFDGPConsts, layer: int
) -> Array:
    iv = Interval(consts.noise_lower[layer], consts.noise_upper[layer])
    return iv.forward(params.raw_noises[layer])


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def get_init_lengthscale(type_lengthscale: TL, inputs) -> np.ndarray:
    """Reference mfdgp.py:137-151. Host numpy: init subsets change shape
    every BO iteration, so eager jnp here would force fresh tiny-op compiles
    per iteration (~1 s of every setup phase on the 1-core host)."""
    from mobocmf_tpu.core.distances import median_lengthscale_np

    inputs = np.asarray(inputs)
    d = inputs.shape[1]
    if type_lengthscale == TL.ONES:
        return np.ones((d,), dtype=inputs.dtype)
    if type_lengthscale == TL.MEDIAN:
        return np.asarray(median_lengthscale_np(inputs), dtype=inputs.dtype)
    if type_lengthscale == TL.CENTESIMAL:
        return 0.01 * np.ones((d,), dtype=inputs.dtype)
    raise ValueError("Wrong type of lengthscale.")


def find_good_initial_inducing_points_and_values(
    x_train: Array, y_train: Array, fidelities: Array, layer: int, only_hf: bool
) -> Tuple[Array, Array]:
    """Nearest-same-fidelity-neighbor inducing init (reference mfdgp.py:290-317).

    Returns (z_x, values): the x-locations and, per location, the target of the
    closest training point of this layer's fidelity.
    """
    fid = np.asarray(fidelities).reshape(-1)
    x_train = np.asarray(x_train)
    y_flat = np.asarray(y_train).reshape(-1)
    sel = fid == layer
    x_fid = x_train[sel]
    y_fid = y_flat[sel]
    z_x = x_train[sel] if only_hf else x_train
    # host numpy: the per-fidelity subset sizes change every BO iteration, so
    # eager jnp here would compile fresh tiny gather/matmul ops per iteration
    d2 = (
        np.sum(z_x**2, 1, keepdims=True)
        - 2.0 * z_x @ x_fid.T
        + np.sum(x_fid**2, 1, keepdims=True).T
    )
    nearest = np.argmin(d2, axis=1)
    return z_x, y_fid[nearest]


# Cumulative wall-clock of the last init_mfdgp calls, keyed fetch/host/ship.
# The BO loop snapshots+resets this around its setup phase to attribute
# setup-time spikes (tunnel stalls surface in fetch/ship, never host).
INIT_TIMINGS: Dict[str, float] = {}


def init_mfdgp(
    key: jax.Array,
    x_train: Array,
    y_train: Array,
    fidelities: Array,
    num_fidelities: int,
    type_lengthscale: TL = TL.MEDIAN,
    num_samples_for_acquisition: int = cfg.NUM_SAMPLES_FOR_ACQUISITION,
    use_only_highest_fidelity: bool = False,
    jitter: Optional[float] = None,
    previously_trained: Optional[MFDGPModel] = None,
    whitened: bool = False,
    init_params_to_prior_and_fix_them: bool = False,
    whitened_init: str = "match",
) -> MFDGPModel:
    """Build a functional MFDGP for one blackbox.

    whitened_init (whitened=True only): "match" converts the reference's
    unwhitened init into whitened coordinates exactly (m_w = L_K^{-1} m) —
    the parity-preserving default. At large m with inducing = training
    inputs, Kzz is numerically singular and the exact conversion
    manufactures |m_w| in the hundreds (a reparameterization-invariant init
    KL the optimizer then carries for thousands of steps; docs/SCALING.md
    §3). "prior" uses the standard whitened-SVGP init instead — m_w = 0,
    L_w = I, i.e. q(u) = prior N(0, Kzz) — which is scale-independent and
    well-conditioned; the two-phase schedule then learns the data from
    scratch, as standard SVGP practice does.

    init_params_to_prior_and_fix_them: freeze-to-prior mode (reference
    mfdgp_hidden_layer.py:52-62,90-113,166-188): kernel hyperparameters are
    set to fixed prior values — layer 0 lengthscale 0.25*d, outputscale 1;
    deep layers ls_x1 = 10*0.25*d, ls_f = 1, ls_x2 = 0.25*d, nu_lin = 1,
    outputscales (1, 1, 0.01) — and excluded from training.

    Runs its (eager, tiny) init math on the LOCAL CPU backend and ships the
    finished pytrees to the ambient default device in one transfer: the
    aggregate python+dispatch overhead of hundreds of tiny eager device ops
    (~0.1 ms dispatch each, benchmarks/probe_setup.py, plus host-side
    tracing on the 1-core box) made per-model init a multi-second affair
    dominating warm BO iterations.
    """
    try:
        cpu = jax.devices("cpu")[0]
    except RuntimeError:
        cpu = None
    ambient = jax.devices()[0]
    if cpu is None or ambient.platform == "cpu":
        t0 = _time.time()
        out = _init_mfdgp_impl(
            key, x_train, y_train, fidelities, num_fidelities,
            type_lengthscale, num_samples_for_acquisition,
            use_only_highest_fidelity, jitter, previously_trained, whitened,
            init_params_to_prior_and_fix_them, whitened_init,
        )
        # single-backend path has no fetch/ship stages; attribute the init to
        # "host" so setup_breakdown.txt stays truthful on CPU-forced runs
        INIT_TIMINGS["host"] = INIT_TIMINGS.get("host", 0.0) + (_time.time() - t0)
        return out
    # pull inputs to host once; re-create them on the CPU backend
    t0 = _time.time()
    x_np = np.asarray(x_train)
    y_np = np.asarray(y_train)
    f_np = np.asarray(fidelities)
    key_cpu = jax.device_put(key, cpu)
    prev_cpu = (
        previously_trained._replace(
            params=jax.tree.map(lambda a: jax.device_put(a, cpu), previously_trained.params),
            consts=jax.tree.map(lambda a: jax.device_put(a, cpu), previously_trained.consts),
        )
        if previously_trained is not None
        else None
    )
    if prev_cpu is not None:
        # warm start fetches previous params device->host: the one
        # synchronous tunnel read in setup. Block here so a stalled
        # transfer is attributed to "fetch", not to host init below.
        jax.block_until_ready((prev_cpu.params, prev_cpu.consts))
    t_fetch = _time.time() - t0
    t0 = _time.time()
    with jax.default_device(cpu):
        model = _init_mfdgp_impl(
            key_cpu, jnp.asarray(x_np), jnp.asarray(y_np), jnp.asarray(f_np),
            num_fidelities, type_lengthscale, num_samples_for_acquisition,
            use_only_highest_fidelity, jitter, prev_cpu, whitened,
            init_params_to_prior_and_fix_them, whitened_init,
        )
        jax.block_until_ready((model.params, model.consts))
    t_host = _time.time() - t0
    t0 = _time.time()
    out = MFDGPModel(
        params=jax.device_put(model.params, ambient),
        consts=jax.device_put(model.consts, ambient),
        config=model.config,
    )
    jax.block_until_ready((out.params, out.consts))
    INIT_TIMINGS["fetch"] = INIT_TIMINGS.get("fetch", 0.0) + t_fetch
    INIT_TIMINGS["host"] = INIT_TIMINGS.get("host", 0.0) + t_host
    INIT_TIMINGS["ship"] = INIT_TIMINGS.get("ship", 0.0) + (_time.time() - t0)
    return out


def _init_mfdgp_impl(
    key: jax.Array,
    x_train: Array,
    y_train: Array,
    fidelities: Array,
    num_fidelities: int,
    type_lengthscale: TL = TL.MEDIAN,
    num_samples_for_acquisition: int = cfg.NUM_SAMPLES_FOR_ACQUISITION,
    use_only_highest_fidelity: bool = False,
    jitter: Optional[float] = None,
    previously_trained: Optional[MFDGPModel] = None,
    whitened: bool = False,
    init_params_to_prior_and_fix_them: bool = False,
    whitened_init: str = "match",
) -> MFDGPModel:
    if whitened_init not in ("match", "prior"):
        raise ValueError(f"whitened_init must be 'match' or 'prior', got {whitened_init!r}")
    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train).reshape(-1, 1).astype(x_train.dtype)
    fid = jnp.asarray(fidelities).reshape(-1)
    dtype = x_train.dtype
    if jitter is None:
        jitter = cfg.default_jitter(dtype)

    # numpy mirrors for the init heuristics: per-fidelity subset sizes change
    # every BO iteration, and eager jnp on those dynamic shapes forced ~50
    # fresh tiny-op compiles per iteration (~1 s of every setup phase)
    x_np = np.asarray(x_train)
    y_np = np.asarray(y_train).reshape(-1)
    fid_np = np.asarray(fid)
    y_high_std = float(np.std(y_np[fid_np == num_fidelities - 1]))

    layers: List[MFDGPLayerParams] = []
    z_xs: List[Array] = []
    noise_lower: List[float] = []
    noise_upper: List[float] = []
    raw_noises: List[Array] = []

    for ell in range(num_fidelities):
        z_x, values = find_good_initial_inducing_points_and_values(
            x_np, y_np, fid_np, ell, use_only_highest_fidelity
        )
        z_xs.append(z_x)
        init_ls = get_init_lengthscale(type_lengthscale, x_np[fid_np == ell])
        d = x_train.shape[1]

        if previously_trained is not None:
            # warm start: restore kernel state (reference mfdgp_hidden_layer.py:122-123)
            kparams = jax.tree.map(lambda a: a, previously_trained.params.layers[ell].kernel)
        elif init_params_to_prior_and_fix_them:
            # fixed prior values (reference mfdgp_hidden_layer.py:52-62,90-113);
            # for deep layers the reference's input_dims includes the f column,
            # so its 0.25*(input_dims-1) is 0.25*d here
            if ell == 0:
                kparams = rbf.init_scale_rbf_params(0.25 * d, 1.0, d)
            elif use_only_highest_fidelity:
                kparams = deep_mf.init_only_hf_params(
                    jnp.full((d,), 0.25 * d, dtype=dtype), d
                )
            else:
                kparams = deep_mf.init_deep_mf_params(
                    jnp.full((d,), 0.25 * d, dtype=dtype), d
                )
        elif ell == 0:
            kparams = rbf.init_scale_rbf_params(init_ls, 1.0, d)
        elif use_only_highest_fidelity:
            kparams = deep_mf.init_only_hf_params(init_ls, d)
        else:
            kparams = deep_mf.init_deep_mf_params(init_ls, d)
        kparams = jax.tree.map(lambda a: jnp.asarray(a, dtype=dtype), kparams)

        # Variational init (reference mfdgp_hidden_layer.py:131-136); for
        # layers > 0 the init Z includes the values column (the static last
        # column before the dynamic chain takes over).
        m0 = values.astype(dtype)
        if whitened and whitened_init == "prior":
            # standard whitened-SVGP init: q(v) = N(0, I), i.e. q(u) = the
            # prior N(0, Kzz) — scale-independent (no L_K^{-1} amplification
            # at singular Kzz) and well-conditioned at any m; the next
            # layer's dynamic chain mean is exactly 0. Skips the reference
            # init entirely (its m×m Gram + host f64 Cholesky is O(m^3) —
            # seconds per top layer per blackbox at m=2048 — and would be
            # discarded here anyway).
            m = z_x.shape[0]
            variational = svgp.SVGPVariational(
                mean=jnp.zeros((m,), dtype=dtype),
                chol_raw=jnp.eye(m, dtype=dtype),
            )
            chain_prev = jnp.zeros((m,), dtype=dtype)
        else:  # reference init (unwhitened coords), converted below if whitened
            if ell == num_fidelities - 1:
                gram, _ = _layer_fns(ell, use_only_highest_fidelity)
                z_full = z_x if ell == 0 else jnp.concatenate([z_x, values[:, None]], 1)
                k0 = gram(kparams, z_full, z_full) + jitter * jnp.eye(z_x.shape[0], dtype=dtype)
                cov0 = k0 * (1e-2 * y_high_std**2) ** 2
            else:
                cov0 = 1e-8 * jnp.eye(z_x.shape[0], dtype=dtype)
            variational = svgp.init_variational(m0, cov0, dtype=dtype)
        if whitened and whitened_init != "prior":
            # Convert the reference's unwhitened init into whitened coords:
            # m_w = L_K^{-1} m, L_w = L_K^{-1} L_S, with K at the DYNAMIC init
            # Z (last column = previous layer's chain mean, the value the
            # forward pass will actually resolve — not the static `values`
            # column), so the initial posterior matches the unwhitened model
            # exactly.
            import scipy.linalg as _spla

            gram, _ = _layer_fns(ell, use_only_highest_fidelity)
            if ell == 0:
                z_dyn = z_x
            elif use_only_highest_fidelity:
                z_dyn = jnp.concatenate(
                    [z_x, jnp.zeros((z_x.shape[0], 1), dtype=dtype)], 1
                )
            else:
                z_dyn = jnp.concatenate([z_x, chain_prev[:, None]], 1)
            k_dyn = np.asarray(
                gram(kparams, z_dyn, z_dyn), dtype=np.float64
            ) + jitter * np.eye(z_x.shape[0])
            lk_np = np.linalg.cholesky(k_dyn)
            m_np = np.asarray(variational.mean, dtype=np.float64)
            m_w = _spla.solve_triangular(lk_np, m_np, lower=True)
            l_w = _spla.solve_triangular(
                lk_np, np.asarray(variational.chol_raw, dtype=np.float64), lower=True
            )
            variational = svgp.SVGPVariational(
                mean=jnp.asarray(m_w, dtype=dtype), chol_raw=jnp.asarray(l_w, dtype=dtype)
            )
            # chain mean of THIS layer at its dynamic init Z (for the next
            # layer's conversion): m - jitter * K^{-1} m in function space
            chain_prev = jnp.asarray(
                m_np
                - jitter
                * _spla.cho_solve((lk_np, True), m_np),
                dtype=dtype,
            )
        layers.append(MFDGPLayerParams(kernel=kparams, variational=variational))

        # per-fidelity likelihood (reference mfdgp.py:113-123)
        y_std_f = float(np.std(y_np[fid_np == ell]))
        lo, up = 1e-8, 0.1 * y_std_f
        noise_lower.append(lo)
        noise_upper.append(up)
        init_noise = 1e-2 * y_high_std if ell == num_fidelities - 1 else 1e-6
        raw_noises.append(Interval(lo, up).inverse(jnp.asarray(init_noise, dtype=dtype)))

    if previously_trained is not None:
        acq_eps = previously_trained.consts.acq_eps
    else:
        acq_eps = jax.random.normal(
            key, (num_fidelities, num_samples_for_acquisition), dtype=dtype
        )

    params = MFDGPParams(layers=tuple(layers), raw_noises=jnp.stack(raw_noises))
    consts = MFDGPConsts(
        z_x=tuple(jnp.asarray(z, dtype=dtype) for z in z_xs),
        acq_eps=acq_eps,
        noise_lower=jnp.asarray(noise_lower, dtype=dtype),
        noise_upper=jnp.asarray(noise_upper, dtype=dtype),
    )
    config = MFDGPConfig(
        num_fidelities=num_fidelities,
        only_hf=use_only_highest_fidelity,
        jitter=float(jitter),
        num_samples_for_acquisition=num_samples_for_acquisition,
        whitened=whitened,
        fix_kernel_params=init_params_to_prior_and_fix_them,
    )
    return MFDGPModel(params=params, consts=consts, config=config)


# ---------------------------------------------------------------------------
# Forward / predictive
# ---------------------------------------------------------------------------


class LayerState(NamedTuple):
    """Per-layer cached inducing state for one forward pass.

    w_mean/w_ls are the solved variational quantities (svgp.solve_variational):
    L^{-1} m and L^{-1} L_S unwhitened, m_w and L_S whitened — hoisted here so
    the predictive and the KL share the x-independent triangular solves."""

    z: Array  # (M, d) or (M, d+1)
    lk: Array  # chol(Kzz + jitter I)
    w_mean: Array  # (M,)
    w_ls: Array  # (M, M)
    # optional explicit L^{-1} (compute_layer_states(with_inv=True)): turns
    # the per-evaluation triangular solve into an MXU matmul for acquisition
    # L-BFGS loops; None on the training/parity path
    lk_inv: Optional[Array] = None


def compute_layer_states(
    params: MFDGPParams, consts: MFDGPConsts, config: MFDGPConfig,
    with_inv: bool = False,
) -> List[LayerState]:
    """Resolve the dynamic inducing-point chain once per forward.

    Z_0 = z_x; Z_ell = [z_x, mu_{ell-1}(Z_{ell-1})] where mu is the previous
    layer's predictive mean at its own inducing inputs — exactly what the
    reference's property computes (previous_layer(Z_x).mean,
    mfdgp_hidden_layer.py:550-557), since the test x-columns coincide with the
    inducing x-columns. Predictive mean at the inducing inputs reduces to
    m - jitter * (Kzz + jitter I)^{-1} m.
    """
    states: List[LayerState] = []
    chain_mean = None
    for ell in range(config.num_fidelities):
        gram, _ = _layer_fns(ell, config.only_hf)
        lp = params.layers[ell]
        z_x = consts.z_x[ell]
        if ell == 0:
            z = z_x
        else:
            if config.only_hf:
                last_col = jnp.zeros((z_x.shape[0],), dtype=z_x.dtype)
            else:
                last_col = chain_mean
            z = jnp.concatenate([z_x, last_col[:, None]], axis=1)
        lk = safe_cholesky(gram(lp.kernel, z, z), config.jitter)
        w_mean, w_ls = svgp.solve_variational(lp.variational, lk, config.whitened)
        lk_inv = (
            solve_triangular(
                lk, jnp.eye(lk.shape[0], dtype=lk.dtype), lower=True
            )
            if with_inv
            else None
        )
        states.append(LayerState(z=z, lk=lk, w_mean=w_mean, w_ls=w_ls, lk_inv=lk_inv))
        if ell + 1 < config.num_fidelities and not config.only_hf:
            m = lp.variational.mean
            if config.whitened:
                # mu(Z) = Kzz_nojit L^{-T} m_w = L m_w - jitter * L^{-T} m_w
                lt_inv_m = solve_triangular(lk.T, m[:, None], lower=False)[:, 0]
                chain_mean = lk @ m - config.jitter * lt_inv_m
            else:
                # m - jitter * Kzz^{-1} m, reusing w_mean = L^{-1} m
                chain_mean = m - config.jitter * solve_triangular(
                    lk.T, w_mean[:, None], lower=False
                )[:, 0]
    return states


def forward(
    params: MFDGPParams,
    consts: MFDGPConsts,
    config: MFDGPConfig,
    x: Array,
    eps: Array,
    max_fidelity: Optional[int] = None,
    states: Optional[List[LayerState]] = None,
) -> List[Tuple[Array, Array]]:
    """Propagate x through the layer stack (reference mfdgp.py:174-196).

    eps: (F-1, N) standard normals used to sample each layer's output before
    feeding the next layer (fresh in train mode, fixed/tiled in eval mode —
    supplied explicitly by the caller). Returns [(mu, var)] per layer.
    """
    num_layers = config.num_fidelities if max_fidelity is None else max_fidelity + 1
    if states is None:
        states = compute_layer_states(params, consts, config)
    outputs: List[Tuple[Array, Array]] = []
    f_prev = None
    for ell in range(num_layers):
        gram, diag = _layer_fns(ell, config.only_hf)
        lp = params.layers[ell]
        st = states[ell]
        if ell == 0:
            x_in = x
        else:
            prev = jnp.zeros_like(f_prev) if config.only_hf else f_prev
            x_in = jnp.concatenate([x, prev[:, None]], axis=1)
        mu, var = svgp.predict_diag_state(
            gram, diag, lp.kernel, st.z, x_in, st.lk, st.w_mean, st.w_ls,
            lk_inv=st.lk_inv,
        )
        outputs.append((mu, var))
        if ell + 1 < num_layers:
            f_prev = mu + jnp.sqrt(var) * eps[ell]
    return outputs


def kl_all_layers(
    params: MFDGPParams,
    consts: MFDGPConsts,
    config: MFDGPConfig,
    states: Optional[List[LayerState]] = None,
) -> Array:
    if states is None:
        states = compute_layer_states(params, consts, config)
    total = jnp.asarray(0.0, dtype=consts.z_x[0].dtype)
    for ell in range(config.num_fidelities):
        lp = params.layers[ell]
        st = states[ell]
        total = total + svgp.kl_state(
            lp.variational, st.lk, st.w_mean, st.w_ls, config.whitened
        )
    return total


def predict(
    params: MFDGPParams,
    consts: MFDGPConsts,
    config: MFDGPConfig,
    x: Array,
    fidelity: int,
    eps: Array,
    states: Optional[List["LayerState"]] = None,
) -> Tuple[Array, Array]:
    """Predictive with likelihood noise at the given fidelity
    (reference mfdgp.py:220-235)."""
    outs = forward(params, consts, config, x, eps, max_fidelity=fidelity, states=states)
    mu, var = outs[fidelity]
    noise = likelihood_noise(params, consts, fidelity)
    return mu, var + noise


def predict_for_acquisition(
    params: MFDGPParams,
    consts: MFDGPConsts,
    config: MFDGPConfig,
    x: Array,
    fidelity: int,
    states: Optional[List["LayerState"]] = None,
) -> Tuple[Array, Array]:
    """25x-tiled eval-mode predictive + moment matching (mfdgp.py:237-262).

    Deterministic: uses the fixed per-layer acq_eps normals, which keeps the
    acquisition surface smooth for gradient-based candidate optimization.

    `states` (compute_layer_states output) lets callers evaluating many
    candidate batches — e.g. every iteration of the acquisition L-BFGS —
    factor the x-independent inducing Cholesky chain ONCE instead of per
    evaluation (at m=512+ the repeated factorizations put the optimizer
    program past the TPU worker's execution limit).
    """
    n = x.shape[0]
    s = config.num_samples_for_acquisition
    x_tile = jnp.repeat(x, s, axis=0)  # row n*s + i
    if config.num_fidelities > 1:
        # layer ell (>0) uses its fixed acq_eps tiled across test points
        eps = jnp.tile(consts.acq_eps[1:, :], (1, n))
    else:
        eps = jnp.zeros((0, n * s), dtype=x.dtype)
    mus_t, vars_t = predict(params, consts, config, x_tile, fidelity, eps, states=states)
    mus_t = mus_t.reshape(n, s)
    vars_t = vars_t.reshape(n, s)
    mus = jnp.mean(mus_t, axis=1)
    second = jnp.mean(vars_t + mus_t**2, axis=1)
    return mus, second - mus**2


def predict_for_acquisition_all(
    params: MFDGPParams,
    consts: MFDGPConsts,
    config: MFDGPConfig,
    x: Array,
    states: Optional[List["LayerState"]] = None,
) -> Tuple[Array, Array]:
    """predict_for_acquisition at EVERY fidelity from ONE all-layer forward.

    The layer stack is sequential (layer ell consumes layer ell-1,
    reference mfdgp.py:174-196), so propagating to the top fidelity computes
    every lower fidelity's tiled predictive for free. Returns (mus, vars)
    of shape (F, n) — row f identical to predict_for_acquisition(..., f)
    (the per-layer eps tiling and moment matching are unchanged). This is
    the fused acquisition path: the coupled JES candidate optimization runs
    one program over all fidelities instead of F sequential programs.
    """
    n = x.shape[0]
    s = config.num_samples_for_acquisition
    x_tile = jnp.repeat(x, s, axis=0)
    if config.num_fidelities > 1:
        eps = jnp.tile(consts.acq_eps[1:, :], (1, n))
    else:
        eps = jnp.zeros((0, n * s), dtype=x.dtype)
    outs = forward(params, consts, config, x_tile, eps, states=states)
    mus_all, vars_all = [], []
    for f, (mu_t, var_t) in enumerate(outs):
        var_t = var_t + likelihood_noise(params, consts, f)
        mu_t = mu_t.reshape(n, s)
        var_t = var_t.reshape(n, s)
        mu = jnp.mean(mu_t, axis=1)
        second = jnp.mean(var_t + mu_t**2, axis=1)
        mus_all.append(mu)
        vars_all.append(second - mu**2)
    return jnp.stack(mus_all), jnp.stack(vars_all)


# Module-level jitted predictive for host-level callers (plotting, ad-hoc
# evaluation); the hot paths (acquisition, recommendation) wrap it in their
# own larger programs.
predict_for_acquisition_jit = jax.jit(
    predict_for_acquisition, static_argnames=("config", "fidelity")
)


def sample_eps(key: jax.Array, config: MFDGPConfig, n: int, dtype) -> Array:
    """Fresh train-mode propagation normals, shape (F-1, n)."""
    f = max(config.num_fidelities - 1, 0)
    if f == 0:
        return jnp.zeros((0, n), dtype=dtype)
    return jax.random.normal(key, (f, n), dtype=dtype)
