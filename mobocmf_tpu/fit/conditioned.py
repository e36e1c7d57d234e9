"""Pareto-conditioned MFDGP retraining (JES theta/omega factors).

Re-implements /root/reference/mobocmf/util/blackbox_mfdgp_fitter.py:227-348:
after sampling a Pareto solution (set X*, front F*), all objective and
constraint models are retrained JOINTLY (one Adam over every model's
variational parameters; kernel hypers + noises frozen via
fix_variational_hypers_cond) on the loss

    sum_obj [ -ELBO_o * N/B  - data_term(X* -> F*_o at top fidelity, no KL) ]
  + sum_con [ -ELBO_c * N/B  - theta_c(X*) ]
  - omega(x_tilde)

with, per iteration, 10 FRESH uniform x_tilde points (reference :277), and

    theta_c  = sum_p log[ (1-eps)^Phi(g) * eps^(1-Phi(g)) ],
               g = (mu_c(x*_p) - t_c) / sd_c(x*_p)                     (:227-233)
    omega    = sum_{p,j} log[ eps^q * (1-eps)^(1-q) ],
               q = prod_c Phi(g_c(x_j)) * prod_k Phi(g*_{p,k}(x_j)),
               g*_{p,k} = (F*_{p,k} - mu_k(x_j)) / sd_k(x_j)            (:235-243)

The whole conditioned phase is one jitted lax.scan; objective and constraint
models are stacked pytrees processed with vmap. Padded (invalid) Pareto rows
are masked out of the theta/omega sums.
"""

from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.scipy.stats import norm

from mobocmf_tpu.fit import trainer
from mobocmf_tpu.mlls.elbo import _data_term, elbo_data_term, elbo_terms
from mobocmf_tpu.mlls.elbo import gaussian_expected_log_prob
from mobocmf_tpu.models import mfdgp as M
from mobocmf_tpu.util import heartbeat

# Fused single-forward conditioned loss is the default (identical math at
# 1e-9, 37% fewer HLO instructions; benchmarks/ab_step_time.py measured the
# TPU step perf-neutral and the program materially cheaper to compile).
# MOBOCMF_FUSED_COND=0 restores the three-forward path.
FUSED_COND_DEFAULT = os.environ.get("MOBOCMF_FUSED_COND", "1") == "1"

Array = jnp.ndarray

NUM_OMEGA_POINTS = 10  # reference :277


def loss_theta_factors(
    cs_mean: Array, cs_var: Array, threshold: Array, eps: float, mask: Array
) -> Array:
    """Reference :227-233, masked over padded Pareto rows."""
    gamma = (cs_mean - threshold) / jnp.sqrt(cs_var)
    cdf = norm.cdf(gamma)
    per_point = math.log(1.0 - eps) * cdf + math.log(eps) * (1.0 - cdf)
    return jnp.sum(jnp.where(mask, per_point, 0.0))


def loss_omega_factors(
    fs_mean: Array,  # (K, J) objective means at x_tilde
    fs_var: Array,
    cs_mean: Array,  # (C, J)
    cs_var: Array,
    thresholds: Array,  # (C,)
    pareto_front: Array,  # (P, K)
    front_mask: Array,  # (P,)
    eps: float,
) -> Array:
    """Reference :235-243, masked over padded Pareto rows."""
    gamma_c = (cs_mean - thresholds[:, None]) / jnp.sqrt(cs_var)  # (C, J)
    gamma_f = (pareto_front[:, :, None] - fs_mean[None, :, :]) / jnp.sqrt(
        fs_var[None, :, :]
    )  # (P, K, J)
    prob_feas = jnp.prod(norm.cdf(gamma_c), axis=0)  # (J,)
    prob_dom = jnp.prod(norm.cdf(gamma_f), axis=1)  # (P, J)
    q = prob_feas[None, :] * prob_dom  # (P, J)
    per = math.log(eps) * q + math.log(1.0 - eps) * (1.0 - q)
    return jnp.sum(jnp.where(front_mask[:, None], per, 0.0))


class ConditionedData(NamedTuple):
    x: Array  # (N, d)
    ys_obj: Array  # (O, N)
    ys_con: Array  # (C, N)
    fidelities: Array  # (N,)
    pareto_set: Array  # (P, d)
    pareto_front: Array  # (P, O)
    front_mask: Array  # (P,)
    thresholds: Array  # (C,)
    row_weights: Array = None  # (N,) 1.0 real / 0.0 padded rows (bucketing)


def _model_top_moments(params, consts, config, x, eps, states=None):
    outs = M.forward(params, consts, config, x, eps, states=states)
    return outs[config.num_fidelities - 1]




def conditioned_loss(
    obj_params,  # stacked (O, ...)
    con_params,  # stacked (C, ...)
    obj_consts,
    con_consts,
    config: M.MFDGPConfig,
    data: ConditionedData,
    key: jax.Array,
    eps_const: float,
    batch_idx: Array,
    batch_w: Array,
    fused: bool = False,
) -> Array:
    n = data.x.shape[0]
    b = batch_idx.shape[0]
    p = data.pareto_set.shape[0]
    num_obj = data.ys_obj.shape[0]
    num_con = data.ys_con.shape[0]
    dtype = data.x.dtype
    fm1 = max(config.num_fidelities - 1, 0)
    # real row count (padded rows carry weight 0, fit/bucketing.py)
    n_real = n if data.row_weights is None else jnp.sum(data.row_weights)

    k_xt, k_rest = jax.random.split(key)
    x_tilde = jax.random.uniform(k_xt, (NUM_OMEGA_POINTS, data.x.shape[1]), dtype=dtype)
    keys = jax.random.split(k_rest, 6)

    xb = data.x[batch_idx]
    fb = data.fidelities[batch_idx]
    top_fid = jnp.full((p,), config.num_fidelities - 1)

    loss = jnp.asarray(0.0, dtype=dtype)

    # factor every model's inducing chain ONCE; all three loss terms reuse it.
    # Objectives + constraints are concatenated into ONE stacked computation:
    # a single batched Cholesky per layer (one expander loop on TPU) instead
    # of two separate obj/con programs. This relies on obj/con sharing z_x —
    # guaranteed by the coupled-evaluation contract (all blackboxes observe
    # the same x, asserted by the fitter as in the reference
    # blackbox_mfdgp_fitter.py:87-91); the shape check below catches callers
    # wiring constraint models fit on different inducing inputs.
    if num_con > 0:
        assert all(
            zo.shape == zc.shape
            for zo, zc in zip(obj_consts.z_x, con_consts.z_x)
        ), "conditioned_loss requires obj/con models with shared inducing inputs"
        all_p = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), obj_params, con_params
        )
        all_c = obj_consts._replace(
            acq_eps=jnp.concatenate([obj_consts.acq_eps, con_consts.acq_eps], axis=0),
            noise_lower=jnp.concatenate(
                [obj_consts.noise_lower, con_consts.noise_lower], axis=0
            ),
            noise_upper=jnp.concatenate(
                [obj_consts.noise_upper, con_consts.noise_upper], axis=0
            ),
        )
        states_all = trainer.states_stacked(all_p, all_c, config)
        states_o = jax.tree.map(lambda a: a[:num_obj], states_all)
        states_c = jax.tree.map(lambda a: a[num_obj:], states_all)
    else:
        states_o = trainer.states_stacked(obj_params, obj_consts, config)
        states_c = None

    if fused:
        # Fused evaluation (MOBOCMF_FUSED_COND=1): ONE forward per model at
        # the concatenated rows [xb; X*; x_tilde] instead of three separate
        # forwards (batch ELBO, Pareto-front term, omega points). The forward
        # is row-independent given the (already shared) layer states, and the
        # eps draws below use the SAME keys and shapes as the unfused path,
        # concatenated along the row axis — so the loss value is identical
        # math (same draw lands on the same row) with ~3x fewer evaluation
        # kernels per step; the phase is HLO-count/latency bound (CLAUDE.md).
        top = config.num_fidelities - 1
        x_cat = jnp.concatenate([xb, data.pareto_set, x_tilde], axis=0)
        fmask = data.front_mask.astype(dtype)
        batch_count = jnp.maximum(jnp.sum(batch_w), 1.0)

        def fused_elbo_part(params_i, consts_i, y_i, outs, st_i):
            outs_b = [(mu[:b], var[:b]) for mu, var in outs]
            db = _data_term(
                params_i, consts_i, config, outs_b, y_i[batch_idx], fb, batch_w
            )
            kl = M.kl_all_layers(params_i, consts_i, config, states=st_i)
            elbo = db - kl * jnp.sum(batch_w) / n_real
            return -elbo / batch_count * n_real

        def obj_term_f(params_i, consts_i, y_i, front_i, eps_cat, st_i):
            outs = M.forward(params_i, consts_i, config, x_cat, eps_cat, states=st_i)
            l = fused_elbo_part(params_i, consts_i, y_i, outs, st_i)
            mu_top, var_top = outs[top]
            noise = M.likelihood_noise(params_i, consts_i, top)
            ll = gaussian_expected_log_prob(
                front_i, mu_top[b : b + p], var_top[b : b + p], noise
            )
            return l - jnp.sum(ll * fmask), (mu_top[b + p :], var_top[b + p :])

        eps_b_o = jax.random.normal(keys[0], (num_obj, fm1, b), dtype=dtype)
        eps_p_o = jax.random.normal(keys[1], (num_obj, fm1, p), dtype=dtype)
        eps_t_o = jax.random.normal(
            keys[4], (num_obj, fm1, NUM_OMEGA_POINTS), dtype=dtype
        )
        eps_o = jnp.concatenate([eps_b_o, eps_p_o, eps_t_o], axis=-1)
        obj_losses, (fs_mean, fs_var) = jax.vmap(
            obj_term_f, in_axes=(0, trainer.CONSTS_AXES, 0, 1, 0, 0)
        )(obj_params, obj_consts, data.ys_obj, data.pareto_front, eps_o, states_o)
        loss = loss + jnp.sum(obj_losses)

        if num_con > 0:

            def con_term_f(params_i, consts_i, y_i, thr_i, eps_cat, st_i):
                outs = M.forward(
                    params_i, consts_i, config, x_cat, eps_cat, states=st_i
                )
                l = fused_elbo_part(params_i, consts_i, y_i, outs, st_i)
                mu_top, var_top = outs[top]
                theta = loss_theta_factors(
                    mu_top[b : b + p], var_top[b : b + p], thr_i, eps_const,
                    data.front_mask,
                )
                return l - theta, (mu_top[b + p :], var_top[b + p :])

            eps_b_c = jax.random.normal(keys[2], (num_con, fm1, b), dtype=dtype)
            eps_p_c = jax.random.normal(keys[3], (num_con, fm1, p), dtype=dtype)
            eps_t_c = jax.random.normal(
                keys[5], (num_con, fm1, NUM_OMEGA_POINTS), dtype=dtype
            )
            eps_c = jnp.concatenate([eps_b_c, eps_p_c, eps_t_c], axis=-1)
            con_losses, (cs_mean, cs_var) = jax.vmap(
                con_term_f, in_axes=(0, trainer.CONSTS_AXES, 0, 0, 0, 0)
            )(con_params, con_consts, data.ys_con, data.thresholds, eps_c, states_c)
            loss = loss + jnp.sum(con_losses)
        else:
            cs_mean = jnp.zeros((0, NUM_OMEGA_POINTS), dtype=dtype)
            cs_var = jnp.ones((0, NUM_OMEGA_POINTS), dtype=dtype)

        omega = loss_omega_factors(
            fs_mean, fs_var, cs_mean, cs_var, data.thresholds,
            data.pareto_front, data.front_mask, eps_const,
        )
        return loss - omega

    # ---- objectives ----
    def obj_term(params_i, consts_i, y_i, front_i, eps_b, eps_p, st_i):
        elbo, _ = elbo_terms(
            params_i, consts_i, config, xb, y_i[batch_idx], fb, eps_b, n_real,
            weights=batch_w, states=st_i,
        )
        # guard: with pad_data and batch_size < N a minibatch can sample only
        # padded rows (all weights 0); elbo is exactly 0 there, so clamping
        # the divisor yields the correct zero contribution instead of 0/0=NaN
        # (which would poison Adam state permanently)
        batch_count = jnp.maximum(jnp.sum(batch_w), 1.0)
        l = -elbo / batch_count * n_real
        # pareto-front data term at top fidelity (no KL), masked rows weighted 0
        dt = elbo_data_term(
            params_i, consts_i, config, data.pareto_set, front_i, top_fid, eps_p,
            weights=data.front_mask.astype(dtype), states=st_i,
        )
        return l - dt

    eps_b_o = jax.random.normal(keys[0], (num_obj, fm1, b), dtype=dtype)
    eps_p_o = jax.random.normal(keys[1], (num_obj, fm1, p), dtype=dtype)
    obj_losses = jax.vmap(obj_term, in_axes=(0, trainer.CONSTS_AXES, 0, 1, 0, 0, 0))(
        obj_params, obj_consts, data.ys_obj, data.pareto_front, eps_b_o, eps_p_o,
        states_o,
    )
    loss = loss + jnp.sum(obj_losses)

    # ---- constraints ----
    def con_term(params_i, consts_i, y_i, thr_i, eps_b, eps_p, st_i):
        elbo, _ = elbo_terms(
            params_i, consts_i, config, xb, y_i[batch_idx], fb, eps_b, n_real,
            weights=batch_w, states=st_i,
        )
        # same all-padded-minibatch guard as obj_term
        batch_count = jnp.maximum(jnp.sum(batch_w), 1.0)
        l = -elbo / batch_count * n_real
        mu, var = _model_top_moments(
            params_i, consts_i, config, data.pareto_set, eps_p, states=st_i
        )
        theta = loss_theta_factors(mu, var, thr_i, eps_const, data.front_mask)
        return l - theta

    if num_con > 0:
        eps_b_c = jax.random.normal(keys[2], (num_con, fm1, b), dtype=dtype)
        eps_p_c = jax.random.normal(keys[3], (num_con, fm1, p), dtype=dtype)
        con_losses = jax.vmap(
            con_term, in_axes=(0, trainer.CONSTS_AXES, 0, 0, 0, 0, 0)
        )(
            con_params, con_consts, data.ys_con, data.thresholds, eps_b_c, eps_p_c,
            states_c,
        )
        loss = loss + jnp.sum(con_losses)

    # ---- omega factors at x_tilde ----
    eps_t_o = jax.random.normal(keys[4], (num_obj, fm1, NUM_OMEGA_POINTS), dtype=dtype)
    fs_mean, fs_var = jax.vmap(
        _model_top_moments, in_axes=(0, trainer.CONSTS_AXES, None, None, 0, 0)
    )(obj_params, obj_consts, config, x_tilde, eps_t_o, states_o)
    if num_con > 0:
        eps_t_c = jax.random.normal(
            keys[5], (num_con, fm1, NUM_OMEGA_POINTS), dtype=dtype
        )
        cs_mean, cs_var = jax.vmap(
            _model_top_moments, in_axes=(0, trainer.CONSTS_AXES, None, None, 0, 0)
        )(con_params, con_consts, config, x_tilde, eps_t_c, states_c)
    else:
        cs_mean = jnp.zeros((0, NUM_OMEGA_POINTS), dtype=dtype)
        cs_var = jnp.ones((0, NUM_OMEGA_POINTS), dtype=dtype)
    omega = loss_omega_factors(
        fs_mean, fs_var, cs_mean, cs_var, data.thresholds,
        data.pareto_front, data.front_mask, eps_const,
    )
    return loss - omega


def train_conditioned_carry(
    obj_params,
    con_params,
    obj_consts,
    con_consts,
    config: M.MFDGPConfig,
    data: ConditionedData,
    key: jax.Array,
    num_iters: int,
    lr: float,
    eps_const: float,
    batch_size: int,
    opt_state=None,
    fused: bool = False,
):
    """Joint conditioned training scan with explicit Adam-state carry;
    opt_state=None starts fresh, passing it back continues (used to chunk
    long phases into bounded device programs — see trainer.chunk_size_for).

    The reference cycles each model's own shuffled DataLoader (:282-285); here
    every model sees the same per-iteration minibatch (identical when
    batch_size >= N, the examples' default)."""
    n = data.x.shape[0]
    bsz = min(batch_size, n)

    mask_o = jax.vmap(trainer.mask_fix_cond)(obj_params)
    # vmap over a zero-length leading axis is valid: with no constraints the
    # stacked con pytree is explicitly empty and this yields empty masks
    mask_c = jax.vmap(trainer.mask_fix_cond)(con_params)
    opt = trainer.make_adam(lr)

    def loss_fn(ps, key, bidx, bw):
        op, cp = ps
        return conditioned_loss(
            op, cp, obj_consts, con_consts, config, data, key, eps_const, bidx,
            bw, fused=fused,
        )

    grad_fn = jax.value_and_grad(loss_fn)

    rw = (
        jnp.ones((n,), dtype=data.x.dtype)
        if data.row_weights is None
        else data.row_weights
    )

    def step(carry, key_i):
        ps, opt_state = carry
        kb, kl = jax.random.split(key_i)
        if bsz == n:
            bidx = jnp.arange(n)
        else:
            bidx = jax.random.choice(kb, n, (bsz,), replace=False)
        bw = rw[bidx]
        loss, grads = grad_fn(ps, kl, bidx, bw)
        grads = (
            jax.tree.map(lambda g, m: g * m, grads[0], mask_o),
            jax.tree.map(lambda g, m: g * m, grads[1], mask_c),
        )
        updates, opt_state = opt.update(grads, opt_state, ps)
        ps = optax.apply_updates(ps, updates)
        return (ps, opt_state), loss

    ps = (obj_params, con_params)
    if opt_state is None:
        opt_state = opt.init(ps)
    keys = jax.random.split(key, num_iters)
    (ps, opt_state), losses = jax.lax.scan(step, (ps, opt_state), keys)
    return ps[0], ps[1], opt_state, losses


train_conditioned_carry_jit = jax.jit(
    train_conditioned_carry,
    static_argnames=("config", "num_iters", "lr", "eps_const", "batch_size",
                     "fused"),
)


def train_conditioned(
    obj_params,
    con_params,
    obj_consts,
    con_consts,
    config: M.MFDGPConfig,
    data: ConditionedData,
    key: jax.Array,
    num_iters: int,
    lr: float,
    eps_const: float,
    batch_size: int,
    fused: bool = FUSED_COND_DEFAULT,
):
    op, cp, _, losses = train_conditioned_carry(
        obj_params, con_params, obj_consts, con_consts, config, data, key,
        num_iters, lr, eps_const, batch_size, fused=fused,
    )
    return op, cp, losses


train_conditioned_jit = jax.jit(
    train_conditioned,
    static_argnames=("config", "num_iters", "lr", "eps_const", "batch_size",
                     "fused"),
)


def _check_shared_inducing(obj_consts, con_consts) -> None:
    """Host-side value check of the obj/con shared-z_x fusion contract.

    `conditioned_loss` fuses objective and constraint models into one stacked
    computation, which is only correct when both groups share the SAME
    inducing inputs (coupled-evaluation contract, reference
    blackbox_mfdgp_fitter.py:87-91). Inside the jit only shapes are
    checkable; here the consts are concrete, so compare values — constraint
    models fit on different inducing inputs with identical (bucketed) shapes
    would otherwise silently reuse the objectives' states.
    """
    if con_consts is None:
        return
    import numpy as np

    for ell, (zo, zc) in enumerate(zip(obj_consts.z_x, con_consts.z_x)):
        if zo.shape != zc.shape or not np.array_equal(
            np.asarray(zo), np.asarray(zc)
        ):
            raise ValueError(
                "conditioned training requires objective and constraint models "
                f"with identical inducing inputs; layer {ell} differs "
                f"(shapes {zo.shape} vs {zc.shape})"
            )


def train_conditioned_chunked(
    obj_params,
    con_params,
    obj_consts,
    con_consts,
    config: M.MFDGPConfig,
    data: ConditionedData,
    key: jax.Array,
    num_iters: int,
    lr: float,
    eps_const: float,
    batch_size: int,
):
    """Bounded-program chunking of the conditioned phase (single XLA programs
    running longer than ~2 min crash the axon TPU worker).

    The fused-evaluation conditioned loss (one forward per model over
    [batch; X*; x_tilde]) is the DEFAULT: identical math (value+grad
    equivalence at 1e-9, tests/test_conditioned.py) with 37% fewer HLO
    instructions / 60% fewer dots in the compiled step (CPU lowering, 2+2
    models at m=128) — the phase is kernel-launch bound on TPU.
    MOBOCMF_FUSED_COND=0 restores the three-forward path (A/B harness:
    benchmarks/ab_step_time.py)."""
    _check_shared_inducing(obj_consts, con_consts)
    fused = FUSED_COND_DEFAULT
    c = trainer.chunk_size_for(data.x.shape[0])
    sizes = [c] * (num_iters // c)
    if num_iters % c:
        sizes.append(num_iters % c)
    opt_state = None
    losses = []
    op, cp = obj_params, con_params
    for ci, sz in enumerate(sizes):
        op, cp, opt_state, ls = train_conditioned_carry_jit(
            op, cp, obj_consts, con_consts, config, data,
            jax.random.fold_in(key, ci), sz, lr, eps_const, batch_size,
            opt_state, fused=fused,
        )
        losses.append(ls)
        heartbeat.beat(f"cond:chunk{ci}")
    return op, cp, jnp.concatenate(losses)
