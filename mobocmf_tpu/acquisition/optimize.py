"""On-device multi-start acquisition maximization over the unit box.

Replaces botorch.optim.optimize_acqf(q=1, num_restarts=5, raw_samples=200,
options={"maxiter": 200}) as used by the reference acquisitions
(/root/reference/mobocmf/acquisition_functions/JESMOC_MFDGP.py:159-160).

Strategy (everything jitted, one dispatch per call):
1. evaluate the acquisition at `raw_samples` uniform points;
2. take the top `num_restarts` as starts (botorch uses Boltzmann sampling over
   the raw values; we pick the top-k deterministically — documented deviation);
3. run L-BFGS (optax) in an unconstrained reparameterization x = sigmoid(z)
   of the box, vmapped over restarts (botorch runs L-BFGS-B per restart);
4. return the best point seen (clipped to the box).

maxiter is a CAP, not a step count: iteration runs inside a bounded
lax.while_loop that stops once the restart's gradient satisfies
max|g| <= gtol — the same convergence contract as scipy L-BFGS-B's
pgtol=1e-5 that botorch's optimize_acqf inherits. Acquisition surfaces
typically converge in 20-60 iterations, so this cuts the dominant
BO-iteration acquisition phase several-fold versus a fixed 200-step scan
(under vmap the loop runs until the slowest restart converges).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import optax

Array = jnp.ndarray


def _logit(x: Array) -> Array:
    x = jnp.clip(x, 1e-6, 1.0 - 1e-6)
    return jnp.log(x) - jnp.log1p(-x)


def optimize_acqf_box(
    acq_fn: Callable[[Array], Array],
    input_dim: int,
    key: jax.Array,
    num_restarts: int = 5,
    raw_samples: int = 200,
    maxiter: int = 200,
    gtol: float = 1e-5,
    dtype=jnp.float64,
) -> Tuple[Array, Array]:
    """Maximize acq_fn (batched: (N,d)->(N,)) over [0,1]^d.

    Returns (x_best (d,), value_best ())."""

    raw = jax.random.uniform(key, (raw_samples, input_dim), dtype=dtype)
    raw_vals = acq_fn(raw)
    _, top_idx = jax.lax.top_k(raw_vals, num_restarts)
    starts = raw[top_idx]

    def neg_acq_z(z):
        x = jax.nn.sigmoid(z)
        return -acq_fn(x[None, :])[0]

    solver = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(neg_acq_z)

    def run_one(z0):
        def cond(carry):
            _, _, grad, it = carry
            # scipy L-BFGS-B's pgtol contract: stop when max|g| <= gtol
            # (grad lags one step: it is the gradient at the previous iterate)
            return (it < maxiter) & (jnp.max(jnp.abs(grad)) > gtol)

        def body(carry):
            z, state, _, it = carry
            value, grad = value_and_grad(z, state=state)
            updates, state = solver.update(
                grad, state, z, value=value, grad=grad, value_fn=neg_acq_z
            )
            z = optax.apply_updates(z, updates)
            return (z, state, grad, it + 1)

        state0 = solver.init(z0)
        g0 = jnp.full_like(z0, jnp.inf)  # force at least one iteration
        (z, _, _, _) = jax.lax.while_loop(cond, body, (z0, state0, g0, 0))
        x = jax.nn.sigmoid(z)
        return x, acq_fn(x[None, :])[0]

    xs, vals = jax.vmap(run_one)(_logit(starts))
    # include the raw screening values so a failed line search can't regress
    all_x = jnp.concatenate([xs, starts], axis=0)
    all_v = jnp.concatenate([vals, raw_vals[top_idx]], axis=0)
    best = jnp.argmax(all_v)
    return all_x[best], all_v[best]


def optimize_acqf_box_multi(
    acq_all_fn: Callable[[Array], Array],
    n_out: int,
    input_dim: int,
    key: jax.Array,
    num_restarts: int = 5,
    raw_samples: int = 200,
    maxiter: int = 200,
    gtol: float = 1e-5,
    dtype=jnp.float64,
) -> Tuple[Array, Array]:
    """Maximize `n_out` acquisition surfaces sharing one evaluator, jointly.

    acq_all_fn: (N, d) -> (n_out, N). Used for the fused per-fidelity JES
    optimization (acquisition/jesmoc.py): raw-sample screening is shared (one
    evaluation scores every fidelity) and ALL n_out x num_restarts L-BFGS
    lanes run inside ONE vmapped while_loop, so the sequential trip count is
    the max over surfaces instead of their sum and the program dispatches
    once instead of n_out times.

    Returns (xs (n_out, d), values (n_out,)).
    """
    raw = jax.random.uniform(key, (raw_samples, input_dim), dtype=dtype)
    raw_vals = acq_all_fn(raw)  # (n_out, raw_samples)
    top_vals, top_idx = jax.lax.top_k(raw_vals, num_restarts)  # (n_out, R)
    starts = raw[top_idx]  # (n_out, R, d)

    solver = optax.lbfgs()
    lanes = n_out * num_restarts
    out_ids = jnp.repeat(jnp.arange(n_out), num_restarts)  # (lanes,)

    def run_one(z0, out_id):
        def neg_acq_z(z):
            x = jax.nn.sigmoid(z)
            return -acq_all_fn(x[None, :])[out_id, 0]

        value_and_grad = optax.value_and_grad_from_state(neg_acq_z)

        def cond(carry):
            _, _, grad, it = carry
            return (it < maxiter) & (jnp.max(jnp.abs(grad)) > gtol)

        def body(carry):
            z, state, _, it = carry
            value, grad = value_and_grad(z, state=state)
            updates, state = solver.update(
                grad, state, z, value=value, grad=grad, value_fn=neg_acq_z
            )
            z = optax.apply_updates(z, updates)
            return (z, state, grad, it + 1)

        state0 = solver.init(z0)
        g0 = jnp.full_like(z0, jnp.inf)
        (z, _, _, _) = jax.lax.while_loop(cond, body, (z0, state0, g0, 0))
        x = jax.nn.sigmoid(z)
        return x, acq_all_fn(x[None, :])[out_id, 0]

    z0s = _logit(starts.reshape(lanes, input_dim))
    xs, vals = jax.vmap(run_one)(z0s, out_ids)
    xs = xs.reshape(n_out, num_restarts, input_dim)
    vals = vals.reshape(n_out, num_restarts)
    # include the raw screening values so a failed line search can't regress
    all_x = jnp.concatenate([xs, starts], axis=1)  # (n_out, 2R, d)
    all_v = jnp.concatenate([vals, top_vals], axis=1)  # (n_out, 2R)
    best = jnp.argmax(all_v, axis=1)
    take = jnp.arange(n_out)
    return all_x[take, best], all_v[take, best]


