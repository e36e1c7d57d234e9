"""Step-time experiment variants must be EXACTLY equivalent to the defaults.

MOBOCMF_FLAT_ADAM (trainer.make_adam) and MOBOCMF_FUSED_COND
(conditioned_loss fused=True, covered in test_conditioned.py) are HLO-count
experiments for the latency-bound small-m regime; neither may change any
numerical result. Flat Adam ravels the param pytree into one vector before
the (element-wise) Adam math — same math, though XLA re-fuses the update so
agreement is to f64 machine precision (observed 1e-14), not bitwise; pinned
over a real multi-epoch phase so a regression in the wrapper (or an optax
upgrade changing flatten semantics) is caught.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.fit import trainer as T
from mobocmf_tpu.models import mfdgp as M


def _problem(seed=0, n=12, d=2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    fid = jnp.asarray((np.arange(n) % 2).astype(int))
    y = jnp.asarray(rng.normal(size=(n, 1)))
    model = M.init_mfdgp(jax.random.key(seed), x, y, fid, 2)
    return x, y[:, 0], fid, model


def test_flat_adam_bitwise_matches_per_leaf_adam(monkeypatch):
    x, y, fid, model = _problem()

    def run():
        p, _, logs = T.train_phase_carry(
            model.params, model.consts, model.config, x, y, fid,
            jax.random.key(3), 25, 0.003, "all_free", x.shape[0],
        )
        return p, logs

    monkeypatch.setenv("MOBOCMF_FLAT_ADAM", "0")
    p_ref, logs_ref = run()
    monkeypatch.setenv("MOBOCMF_FLAT_ADAM", "1")
    p_flat, logs_flat = run()

    # per-step re-fusion rounding is ~1e-14 but compounds through 25 epochs
    # of training dynamics (measured ~4e-12 on params); 1e-9 is still far
    # below anything semantically visible while robust to XLA version drift
    for a, b in zip(jax.tree.leaves(p_flat), jax.tree.leaves(p_ref)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-11
        )
    np.testing.assert_allclose(
        np.asarray(logs_flat.loss), np.asarray(logs_ref.loss), rtol=1e-9
    )


def test_flat_adam_carry_across_chunks(monkeypatch):
    """Chunked phases thread the Adam state back in; under flat Adam the
    returned (flattened) state must still be accepted and USED by the next
    chunk — a continued run must differ from a fresh-state run from the same
    params (Adam moments matter), proving the carry survives the wrapper."""
    x, y, fid, model = _problem(seed=1)
    monkeypatch.setenv("MOBOCMF_FLAT_ADAM", "1")

    p_a, os_a, _ = T.train_phase_carry(
        model.params, model.consts, model.config, x, y, fid,
        jax.random.key(6), 10, 0.003, "all_free", x.shape[0],
    )
    p_cont, _, _ = T.train_phase_carry(
        p_a, model.consts, model.config, x, y, fid,
        jax.random.key(7), 10, 0.003, "all_free", x.shape[0], opt_state=os_a,
    )
    p_fresh, _, _ = T.train_phase_carry(
        p_a, model.consts, model.config, x, y, fid,
        jax.random.key(7), 10, 0.003, "all_free", x.shape[0], opt_state=None,
    )
    diffs = [
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree.leaves(p_cont), jax.tree.leaves(p_fresh))
    ]
    assert max(diffs) > 0.0
