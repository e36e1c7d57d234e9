"""q-batch candidate selection (new capability: BASELINE.json config #5).

The reference only supports q=1 (optimize_acqf(q=1), JESMOC_MFDGP.py:159).
For batch BO we select q points by SEQUENTIAL GREEDY maximization with a
local-penalization repulsion term: after choosing each point, subsequent
maximizations of the same acquisition are penalized near already-chosen
points, which spreads the batch without retraining conditioned models per
pick (a standard batch-BO construction; the information-gain acquisition is
approximately submodular, so greedy is a principled choice).

    a_k(x) = a(x) * prod_{j<k} [1 - exp(-||x - x_j||^2 / (2 rho^2))]

rho defaults to 5% of the box diagonal. Everything is one jitted program per
pick (same multi-start L-BFGS engine as the q=1 path).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from mobocmf_tpu.acquisition.optimize import optimize_acqf_box
from mobocmf_tpu.util import heartbeat

Array = jnp.ndarray


_PICK_CACHE: dict = {}
_PICK_CACHE_MAX = 8  # FIFO-evicted; see the cache note in optimize_acqf_batch

PAD_VALUE = 1e6  # unfilled batch slots live far outside the unit box: their
# penalty factor is exactly 1 and, unlike NaN padding, they cannot poison the
# VJP (0 * NaN = NaN would propagate through the where branches otherwise)


def penalized_acq(acq_fn: Callable, chosen: Array, rho: float):
    """Repulsion-penalized acquisition; `chosen` is (k, d), PAD_VALUE-padded."""

    def fn(x: Array) -> Array:  # (N, d) -> (N,)
        base = acq_fn(x)
        d2 = jnp.sum((x[:, None, :] - chosen[None, :, :]) ** 2, axis=-1)  # (N, k)
        pen = 1.0 - jnp.exp(-d2 / (2.0 * rho**2))
        return base * jnp.prod(pen, axis=1)

    return fn


def optimize_acqf_batch(
    acq_fn: Callable[[Array], Array],
    input_dim: int,
    q: int,
    key: jax.Array,
    num_restarts: int = 5,
    raw_samples: int = 200,
    maxiter: int = 200,
    rho: float | None = None,
    dtype=jnp.float64,
) -> Tuple[Array, Array]:
    """Greedy q-batch maximization. Returns (X (q, d), values (q,))."""
    if rho is None:
        rho = 0.05 * (input_dim**0.5)

    chosen = jnp.full((q, input_dim), PAD_VALUE, dtype=dtype)
    values = jnp.zeros((q,), dtype=dtype)

    # jit cache keyed by (acq_fn identity, statics): repeated calls with a
    # STABLE acq_fn (module-level function, params threaded via its tree)
    # reuse one executable. A per-call CLOSURE acq_fn gets no reuse by
    # construction, and its entry would pin the params captured in the
    # closure (the cached jitted partial holds a strong reference to
    # acq_fn, so weakref-based eviction can never fire) — such entries are
    # therefore dropped explicitly after the batch loop; the bounded FIFO
    # eviction remains as the backstop. (The production q>1 path does not
    # come through here: jesmoc.optimize_coupled_jes_penalized is
    # module-level jitted.)
    cache_key = (id(acq_fn), input_dim, num_restarts, raw_samples, maxiter, rho, dtype)
    if cache_key not in _PICK_CACHE:
        while len(_PICK_CACHE) >= _PICK_CACHE_MAX:
            _PICK_CACHE.pop(next(iter(_PICK_CACHE)))
        _PICK_CACHE[cache_key] = jax.jit(
            partial(
                _one_pick, acq_fn, input_dim,
                num_restarts=num_restarts, raw_samples=raw_samples,
                maxiter=maxiter, rho=rho, dtype=dtype,
            )
        )
    opt = _PICK_CACHE[cache_key]
    try:
        for k in range(q):
            key, kk = jax.random.split(key)
            x_k, v_k = opt(chosen, kk)
            chosen = chosen.at[k].set(x_k)
            values = values.at[k].set(v_k)
            heartbeat.beat(f"batch:pick{k}")
    finally:
        if _is_per_call_callable(acq_fn):
            _PICK_CACHE.pop(cache_key, None)
    return chosen, values


def _is_per_call_callable(fn) -> bool:
    """True for closures/lambdas/bound methods — callables that cannot recur
    across calls by identity, so caching their jit wrapper only pins memory."""
    if getattr(fn, "__closure__", None):
        return True
    qualname = getattr(fn, "__qualname__", "")
    return "<locals>" in qualname or "<lambda>" in qualname


def _one_pick(acq_fn, input_dim, chosen, key, *, num_restarts, raw_samples, maxiter, rho, dtype):
    fn = penalized_acq(acq_fn, chosen, rho)
    return optimize_acqf_box(
        fn, input_dim, key,
        num_restarts=num_restarts, raw_samples=raw_samples,
        maxiter=maxiter, dtype=dtype,
    )


