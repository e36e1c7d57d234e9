"""Two-phase unconditioned MFDGP training (TPU-native redesign).

Replaces the reference's Python epoch loops over torch Adam
(/root/reference/mobocmf/util/blackbox_mfdgp_fitter.py:117-176):

- phase 1: variational hypers FIXED (likelihood noises + variational Cholesky
  frozen; means + kernel params train), num_epochs_1 @ lr_1;
- phase 2: everything free, num_epochs_2 @ lr_2.

TPU-first differences (semantics preserved, schedule identical):
- an entire phase is ONE jitted lax.scan over epochs (one dispatch instead of
  20k Python-loop steps);
- all blackbox models (objectives + constraints share x, hence shapes) are
  stacked into a single pytree and trained simultaneously with vmap — the
  reference trains them sequentially (:134-152);
- parameter freezing is a 0/1 mask on gradients (torch requires_grad analog).

Minibatching follows torch DataLoader(shuffle=True, drop_last=False): each
epoch draws a fresh permutation; the trailing partial batch is padded and
masked with zero weights.
"""

from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from mobocmf_tpu.mlls.elbo import elbo_terms
from mobocmf_tpu.models import mfdgp as M
from mobocmf_tpu.util import heartbeat

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# Freezing masks (reference mfdgp.py:198-218)
# ---------------------------------------------------------------------------


def _ones_like_tree(tree):
    return jax.tree.map(jnp.ones_like, tree)


def _zeros_like_tree(tree):
    return jax.tree.map(jnp.zeros_like, tree)


def mask_fix_variational_hypers(params: M.MFDGPParams) -> M.MFDGPParams:
    """fix_variational_hypers(True): freeze raw noises + variational chol."""
    layers = tuple(
        M.MFDGPLayerParams(
            kernel=_ones_like_tree(lp.kernel),
            variational=lp.variational._replace(
                mean=jnp.ones_like(lp.variational.mean),
                chol_raw=jnp.zeros_like(lp.variational.chol_raw),
            ),
        )
        for lp in params.layers
    )
    return M.MFDGPParams(layers=layers, raw_noises=jnp.zeros_like(params.raw_noises))


def mask_all_free(params: M.MFDGPParams) -> M.MFDGPParams:
    return jax.tree.map(jnp.ones_like, params)


def apply_kernel_freeze(mask, config: M.MFDGPConfig):
    """Zero the kernel-gradient masks when the model runs in freeze-to-prior
    mode (init_params_to_prior_and_fix_them, reference
    mfdgp_hidden_layer.py:166-188). Works on single or stacked masks."""
    if not config.fix_kernel_params:
        return mask
    layers = tuple(
        lp._replace(kernel=_zeros_like_tree(lp.kernel)) for lp in mask.layers
    )
    return mask._replace(layers=layers)


def mask_fix_cond(params: M.MFDGPParams) -> M.MFDGPParams:
    """fix_variational_hypers_cond(True): freeze raw noises + ALL kernel params."""
    layers = tuple(
        M.MFDGPLayerParams(
            kernel=_zeros_like_tree(lp.kernel),
            variational=_ones_like_tree(lp.variational),
        )
        for lp in params.layers
    )
    return M.MFDGPParams(layers=layers, raw_noises=jnp.zeros_like(params.raw_noises))


# The reference's parameter-freezing schedule has exactly three shapes
# (fix_variational_hypers True/False, fix_variational_hypers_cond; mfdgp.py
# :198-218), so the trainers take a STATIC `mask_kind` and build the gradient
# mask at trace time — outside-jit mask pytrees cost one eager device op plus
# one argument transfer per leaf per phase over the TPU tunnel.
MASK_BUILDERS = {
    "fix_variational_hypers": mask_fix_variational_hypers,
    "all_free": mask_all_free,
    "fix_cond": mask_fix_cond,
}


def build_mask(params: M.MFDGPParams, mask_kind: str, config: M.MFDGPConfig):
    """Gradient mask for `mask_kind`, with the freeze-to-prior kernel freeze
    (config.fix_kernel_params) folded in. Works on single or stacked params."""
    return apply_kernel_freeze(MASK_BUILDERS[mask_kind](params), config)


# ---------------------------------------------------------------------------
# Single-model phase trainer
# ---------------------------------------------------------------------------


class EpochLog(NamedTuple):
    loss: Array  # summed negative ELBO over the epoch's batches
    kl: Array


def make_adam(lr: float):
    """Adam with the reference's eps (torch default 1e-8).

    MOBOCMF_FLAT_ADAM=1 wraps it in optax.flatten: the per-leaf update math
    (identical element-wise; XLA re-fusion moves results ~1e-14 in f64) runs
    on ONE raveled vector —
    a step-time experiment for the HLO-count-bound small-m regime where ~14
    param leaves otherwise each carry their own mu/nu update ops. Default off
    until the TPU step-time A/B lands (benchmarks/ab_step_time.py)."""
    opt = optax.adam(lr, eps=1e-8)
    if os.environ.get("MOBOCMF_FLAT_ADAM", "0") == "1":
        opt = optax.flatten(opt)
    return opt


def _batch_plan(num_data: int, batch_size: int) -> Tuple[int, int]:
    batch_size = min(batch_size, num_data)
    num_batches = math.ceil(num_data / batch_size)
    return batch_size, num_batches


def train_phase_carry(
    params: M.MFDGPParams,
    consts: M.MFDGPConsts,
    config: M.MFDGPConfig,
    x: Array,
    y: Array,
    fidelities: Array,
    key: jax.Array,
    num_epochs: int,
    lr: float,
    mask_kind: str,
    batch_size: int,
    row_weights: Array = None,
    num_data: Array = None,
    opt_state=None,
) -> Tuple[M.MFDGPParams, object, EpochLog]:
    """One training phase as a single scan with explicit Adam-state carry;
    returns (params, opt_state, logs).

    opt_state=None initializes a fresh optimizer. Passing the returned state
    back in continues the phase exactly — used to CHUNK long phases into
    several bounded device programs (single XLA programs running longer than
    ~2 minutes crash the axon TPU worker; measured: 65 s OK, ~195 s fatal).

    mask_kind selects the parameter-freezing schedule (MASK_BUILDERS); the
    mask is built at trace time. row_weights (n,) marks real rows 1.0 /
    padded rows 0.0 (bucketed shapes, fit/bucketing.py); num_data is the REAL
    row count used for KL scaling. Both default to the unpadded semantics.
    """
    mask = build_mask(params, mask_kind, config)
    n = x.shape[0]
    bsz, num_batches = _batch_plan(n, batch_size)
    padded = bsz * num_batches
    fid = fidelities.reshape(-1)
    if row_weights is None:
        row_weights = jnp.ones((n,), dtype=x.dtype)
    nd = jnp.sum(row_weights) if num_data is None else num_data
    opt = make_adam(lr)

    def loss_fn(p, xb, yb, fb, wb, eps):
        elbo, kl = elbo_terms(p, consts, config, xb, yb, fb, eps, nd, weights=wb)
        return -elbo, kl

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    full_batch = num_batches == 1  # implies bsz == n == padded (_batch_plan)

    def epoch_step_full(carry, key_e):
        # Full-batch epoch: every row is in the one batch, so the reference
        # DataLoader's shuffle only permutes which propagation-eps draw lands
        # on which row — an identically-distributed MC estimate of the same
        # epoch sum. Skipping it avoids the per-epoch threefry + argsort and
        # the row gathers; for a FIXED seed the eps-to-row pairing (hence the
        # trajectory) differs from the shuffled path, but the estimator and
        # the seeded-reproducibility contract (same code + seed -> same run)
        # are unchanged.
        p, opt_state = carry
        _, keps = jax.random.split(key_e)
        eps1 = M.sample_eps(keps, config, n, x.dtype)
        (loss, kl), grads = grad_fn(p, x, y, fid, row_weights, eps1)
        grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, opt_state = opt.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return (p, opt_state), EpochLog(loss=loss, kl=kl)

    def epoch_step(carry, key_e):
        p, opt_state = carry
        kperm, keps = jax.random.split(key_e)
        perm = jax.random.permutation(kperm, n)
        idx = jnp.concatenate([perm, jnp.zeros((padded - n,), dtype=perm.dtype)])
        w_all = jnp.concatenate(
            [row_weights[perm], jnp.zeros((padded - n,), dtype=x.dtype)]
        )
        idx = idx.reshape(num_batches, bsz)
        w_all = w_all.reshape(num_batches, bsz)
        eps_all = M.sample_eps(keps, config, padded, x.dtype).reshape(
            max(config.num_fidelities - 1, 0), num_batches, bsz
        )

        def batch_step(carry, inp):
            p, opt_state = carry
            bidx, bw, beps = inp
            (loss, kl), grads = grad_fn(p, x[bidx], y[bidx], fid[bidx], bw, beps)
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
            updates, opt_state = opt.update(grads, opt_state, p)
            p = optax.apply_updates(p, updates)
            return (p, opt_state), (loss, kl)

        (p, opt_state), (losses, kls) = jax.lax.scan(
            batch_step,
            (p, opt_state),
            (idx, w_all, jnp.moveaxis(eps_all, 1, 0)),
        )
        return (p, opt_state), EpochLog(loss=jnp.sum(losses), kl=jnp.sum(kls))

    if opt_state is None:
        opt_state = opt.init(params)
    keys = jax.random.split(key, num_epochs)
    (params, opt_state), logs = jax.lax.scan(
        epoch_step_full if full_batch else epoch_step, (params, opt_state), keys
    )
    return params, opt_state, logs


def train_phase(
    params: M.MFDGPParams,
    consts: M.MFDGPConsts,
    config: M.MFDGPConfig,
    x: Array,
    y: Array,
    fidelities: Array,
    key: jax.Array,
    num_epochs: int,
    lr: float,
    mask_kind: str,
    batch_size: int,
    row_weights: Array = None,
    num_data: Array = None,
) -> Tuple[M.MFDGPParams, EpochLog]:
    """One training phase as a single scan; returns final params + logs.
    See train_phase_carry for the chunkable variant."""
    params, _, logs = train_phase_carry(
        params, consts, config, x, y, fidelities, key, num_epochs, lr,
        mask_kind, batch_size, row_weights, num_data,
    )
    return params, logs


train_phase_jit = jax.jit(
    train_phase,
    static_argnames=("config", "num_epochs", "lr", "mask_kind", "batch_size"),
)


def train_mfdgp_two_phase(
    model: M.MFDGPModel,
    x: Array,
    y: Array,
    fidelities: Array,
    key: jax.Array,
    num_epochs_1: int,
    num_epochs_2: int,
    lr_1: float,
    lr_2: float,
    batch_size: int,
) -> Tuple[M.MFDGPModel, EpochLog, EpochLog]:
    """Reference train_mfdgps schedule (blackbox_mfdgp_fitter.py:154-176)."""
    k1, k2 = jax.random.split(key)
    p = model.params
    p, log1 = train_phase_jit(
        p, model.consts, model.config, x, y, fidelities, k1,
        num_epochs_1, lr_1, "fix_variational_hypers", batch_size,
    )
    p, log2 = train_phase_jit(
        p, model.consts, model.config, x, y, fidelities, k2,
        num_epochs_2, lr_2, "all_free", batch_size,
    )
    return model._replace(params=p), log1, log2


# ---------------------------------------------------------------------------
# Stacked (vmapped) multi-blackbox trainer
# ---------------------------------------------------------------------------

# consts vmap axes: z_x shared (None), per-model acq_eps / noise bounds mapped
CONSTS_AXES = M.MFDGPConsts(z_x=None, acq_eps=0, noise_lower=0, noise_upper=0)


def states_stacked(
    stacked_params, stacked_consts, config: M.MFDGPConfig, with_inv: bool = False
):
    """Per-model layer states (inducing Cholesky chain + solved variational
    quantities), vmapped over the stacked-blackbox leading axis. x-independent:
    callers evaluating several terms or many candidates against the same
    models compute this ONCE and thread it through (acquisition/jesmoc.py,
    fit/conditioned.py). with_inv: also carry the explicit L^{-1}
    (LayerState.lk_inv) so per-evaluation solves become MXU matmuls."""
    return jax.vmap(
        lambda p, c: M.compute_layer_states(p, c, config, with_inv=with_inv),
        in_axes=(0, CONSTS_AXES),
    )(stacked_params, stacked_consts)


@jax.jit
def _stack_jit(params_list, acq_eps_list, nl_list, nu_list):
    # ONE dispatch for the whole stack (eager per-leaf jnp.stack costs one
    # ~15 ms tunnel round trip per leaf)
    return (
        jax.tree.map(lambda *a: jnp.stack(a), *params_list),
        jnp.stack(acq_eps_list),
        jnp.stack(nl_list),
        jnp.stack(nu_list),
    )


def stack_models(models):
    """Stack per-blackbox params/consts along a leading axis (shared config)."""
    assert all(m.config == models[0].config for m in models), (
        "stacked blackboxes must share the same MFDGPConfig"
    )
    params, acq_eps, nl, nu = _stack_jit(
        tuple(m.params for m in models),
        tuple(m.consts.acq_eps for m in models),
        tuple(m.consts.noise_lower for m in models),
        tuple(m.consts.noise_upper for m in models),
    )
    consts = M.MFDGPConsts(
        z_x=models[0].consts.z_x,
        acq_eps=acq_eps,
        noise_lower=nl,
        noise_upper=nu,
    )
    return params, consts, models[0].config


@partial(jax.jit, static_argnames=("num_models",))
def _unstack_jit(stacked_params, num_models: int):
    return tuple(
        jax.tree.map(lambda a, i=i: a[i], stacked_params) for i in range(num_models)
    )


def unstack_params(stacked_params, num_models):
    return list(_unstack_jit(stacked_params, num_models))


def train_phase_stacked(
    stacked_params,
    stacked_consts,
    config: M.MFDGPConfig,
    x: Array,
    ys: Array,  # (num_models, N)
    fidelities: Array,
    keys: jax.Array,  # (num_models, 2)
    num_epochs: int,
    lr: float,
    mask_kind: str,
    batch_size: int,
    row_weights: Array = None,
    num_data: Array = None,
):
    """vmap the phase trainer over stacked blackboxes (same x / shapes).

    mask_kind is static and shared by the whole group (stacked blackboxes
    share one MFDGPConfig, so the freezing schedule is identical)."""
    if row_weights is None:
        row_weights = jnp.ones((x.shape[0],), dtype=x.dtype)
    if num_data is None:
        num_data = jnp.sum(row_weights)

    def one(p, c, ys_i, key_i):
        return train_phase(
            p, c, config, x, ys_i, fidelities, key_i, num_epochs, lr,
            mask_kind, batch_size, row_weights, num_data,
        )

    f = jax.vmap(one, in_axes=(0, CONSTS_AXES, 0, 0))
    return f(stacked_params, stacked_consts, ys, keys)


train_phase_stacked_jit = jax.jit(
    train_phase_stacked,
    static_argnames=("config", "num_epochs", "lr", "mask_kind", "batch_size"),
)


def train_phase_stacked_carry(
    stacked_params,
    stacked_consts,
    config: M.MFDGPConfig,
    x: Array,
    ys: Array,
    fidelities: Array,
    keys: jax.Array,
    num_epochs: int,
    lr: float,
    mask_kind: str,
    batch_size: int,
    row_weights: Array = None,
    num_data: Array = None,
    opt_states=None,
):
    """Stacked phase trainer with explicit per-model Adam-state carry."""
    if row_weights is None:
        row_weights = jnp.ones((x.shape[0],), dtype=x.dtype)
    if num_data is None:
        num_data = jnp.sum(row_weights)

    def one(p, c, ys_i, key_i, os_i):
        return train_phase_carry(
            p, c, config, x, ys_i, fidelities, key_i, num_epochs, lr,
            mask_kind, batch_size, row_weights, num_data, os_i,
        )

    os_axes = None if opt_states is None else 0
    f = jax.vmap(one, in_axes=(0, CONSTS_AXES, 0, 0, os_axes))
    return f(stacked_params, stacked_consts, ys, keys, opt_states)


train_phase_stacked_carry_jit = jax.jit(
    train_phase_stacked_carry,
    static_argnames=("config", "num_epochs", "lr", "mask_kind", "batch_size"),
)


# Chunk schedule: keep every device program well under the ~2-minute axon
# worker kill threshold. Sizes keyed on the (bucketed) row count = inducing
# count, the dominant cost (O(m^3) Cholesky per step), so the plan is
# DETERMINISTIC — chunk boundaries feed the RNG stream, and a data-dependent
# plan would make seeded campaigns irreproducible.
_CHUNK_LADDER = ((256, 5000), (768, 1000), (1536, 250), (3072, 50))
_CHUNK_MIN = 25


def chunk_size_for(m: int) -> int:
    for cap, c in _CHUNK_LADDER:
        if m <= cap:
            return c
    return _CHUNK_MIN


def train_phase_stacked_chunked(
    stacked_params,
    stacked_consts,
    config: M.MFDGPConfig,
    x: Array,
    ys: Array,
    fidelities: Array,
    key: jax.Array,
    num_models: int,
    num_epochs: int,
    lr: float,
    mask_kind: str,
    batch_size: int,
    row_weights: Array = None,
    num_data: Array = None,
):
    """Run a (possibly long) stacked phase as bounded chunks with Adam-state
    carry. At most three program sizes compile per phase (chunk, remainder,
    first-chunk-with-fresh-state), all deterministic given shapes."""
    c = chunk_size_for(x.shape[0])
    sizes = [c] * (num_epochs // c)
    if num_epochs % c:
        sizes.append(num_epochs % c)
    opt_states = None
    logs = []
    sp = stacked_params
    for ci, sz in enumerate(sizes):
        keys = jax.random.split(jax.random.fold_in(key, ci), num_models)
        sp, opt_states, lg = train_phase_stacked_carry_jit(
            sp, stacked_consts, config, x, ys, fidelities, keys, sz, lr,
            mask_kind, batch_size, row_weights, num_data, opt_states,
        )
        logs.append(lg)
        heartbeat.beat(f"train:chunk{ci}")
    log = EpochLog(
        loss=jnp.concatenate([l.loss for l in logs], axis=1),
        kl=jnp.concatenate([l.kl for l in logs], axis=1),
    )
    return sp, log
