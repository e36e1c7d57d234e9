"""q-batch acquisition tests (new capability, BASELINE config #5)."""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.acquisition.batch import optimize_acqf_batch, penalized_acq
from mobocmf_tpu.acquisition.optimize import optimize_acqf_box


def two_bump_acq(x):
    """Two well-separated maxima of slightly different heights."""
    d2a = jnp.sum((x - jnp.array([0.2, 0.2])) ** 2, axis=-1)
    d2b = jnp.sum((x - jnp.array([0.8, 0.8])) ** 2, axis=-1)
    return jnp.exp(-d2a / 0.005) + 0.9 * jnp.exp(-d2b / 0.005)


def test_single_start_finds_max():
    x, v = optimize_acqf_box(two_bump_acq, 2, jax.random.key(0), raw_samples=400)
    np.testing.assert_allclose(np.asarray(x), [0.2, 0.2], atol=0.02)
    assert float(v) > 0.95


def test_batch_spreads_over_both_bumps():
    xs, vs = optimize_acqf_batch(two_bump_acq, 2, q=2, key=jax.random.key(1), raw_samples=400)
    xs = np.asarray(xs)
    d_to_a = np.linalg.norm(xs - np.array([0.2, 0.2]), axis=1)
    d_to_b = np.linalg.norm(xs - np.array([0.8, 0.8]), axis=1)
    # one point near each bump
    assert (d_to_a < 0.1).sum() == 1
    assert (d_to_b < 0.1).sum() == 1


def test_batch_q16_runs_and_is_diverse():
    def acq(x):
        return jnp.sin(6 * x[:, 0]) + jnp.cos(4 * x[:, 1]) + 2.0

    xs, vs = optimize_acqf_batch(acq, 2, q=16, key=jax.random.key(2), raw_samples=100, maxiter=30)
    xs = np.asarray(xs)
    assert xs.shape == (16, 2)
    assert np.all((xs >= 0) & (xs <= 1))
    # pairwise min distance is not degenerate
    d = np.sqrt(((xs[:, None] - xs[None]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    assert d.min() > 1e-3


def test_penalization_suppresses_chosen_neighborhood():
    chosen = jnp.array([[0.2, 0.2]])
    fn = penalized_acq(two_bump_acq, chosen, rho=0.05 * np.sqrt(2))
    at_chosen = float(fn(jnp.array([[0.2, 0.2]]))[0])
    at_other = float(fn(jnp.array([[0.8, 0.8]]))[0])
    assert at_chosen < 1e-6
    assert at_other > 0.8


def test_pick_cache_drops_closure_entries_but_keeps_module_fns():
    """Per-call closure acq_fns pin their captured params via the cached
    jitted partial; their cache entries must be dropped after the batch loop.
    Module-level functions stay cached for reuse."""
    from mobocmf_tpu.acquisition import batch as B

    B._PICK_CACHE.clear()

    big = jnp.ones((8, 8))

    def closure_acq(x):  # has a closure cell -> per-call
        return -jnp.sum((x - 0.5) ** 2, axis=-1) + 0.0 * jnp.sum(big).astype(
            x.dtype
        )

    B.optimize_acqf_batch(
        closure_acq, 2, 2, jax.random.key(0),
        num_restarts=2, raw_samples=16, maxiter=5,
    )
    assert len(B._PICK_CACHE) == 0, "closure entry not evicted"

    B.optimize_acqf_batch(
        _module_level_acq, 2, 2, jax.random.key(0),
        num_restarts=2, raw_samples=16, maxiter=5,
    )
    assert len(B._PICK_CACHE) == 1, "module-level entry should stay cached"
    B._PICK_CACHE.clear()


def _module_level_acq(x):
    return -jnp.sum((x - 0.5) ** 2, axis=-1)
