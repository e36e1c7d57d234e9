"""Cholesky / solve tests: Pallas kernel (interpret mode on CPU) vs XLA."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.linalg.chol import _chol_block_unblocked, _tri_lower_inverse_block, cholesky
from mobocmf_tpu.linalg.ops import add_jitter, cho_solve, logdet_from_chol


def _spd(n, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, n)).astype(dtype)
    return a @ a.T + n * np.eye(n, dtype=dtype)


def test_unblocked_chol_block():
    a = jnp.asarray(_spd(128, dtype=np.float64))
    l = _chol_block_unblocked(a)
    np.testing.assert_allclose(np.asarray(l), np.linalg.cholesky(np.asarray(a)), rtol=1e-8)


def test_tri_lower_inverse_block():
    a = np.linalg.cholesky(_spd(128, seed=1, dtype=np.float64))
    inv = _tri_lower_inverse_block(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(inv) @ a, np.eye(128), atol=1e-8)


@pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas kernel validated on TPU; interpret mode hits a JAX-internal "
    "recursion for multi-block kernels (numeric pieces are covered by the "
    "two block-level tests above)",
)
def test_pallas_cholesky_on_tpu():
    for n in (200, 384):
        a = _spd(n, seed=2, dtype=np.float32)
        l = np.asarray(cholesky(jnp.asarray(a), force_pallas=True))
        rel = np.abs(l @ l.T - a).max() / np.abs(a).max()
        assert rel < 1e-5


def test_xla_fallback_and_cho_solve():
    a = jnp.asarray(_spd(64, seed=4, dtype=np.float64))
    l = cholesky(a)
    b = jnp.asarray(np.random.default_rng(5).normal(size=(64, 3)))
    x = cho_solve(l, b)
    np.testing.assert_allclose(np.asarray(a @ x), np.asarray(b), atol=1e-8)
    # logdet
    sign, want = np.linalg.slogdet(np.asarray(a))
    np.testing.assert_allclose(float(logdet_from_chol(l)), want, rtol=1e-10)


def test_add_jitter():
    a = jnp.zeros((5, 5))
    np.testing.assert_allclose(np.asarray(add_jitter(a, 2e-6)), 2e-6 * np.eye(5), rtol=0)


def test_chol_pullback_matches_jax_grad():
    """Custom cholesky VJP must equal jax's native cholesky gradient."""
    from mobocmf_tpu.linalg.ops import _chol_pullback

    a = jnp.asarray(_spd(24, seed=7, dtype=np.float64))

    def loss_native(k):
        l = jnp.linalg.cholesky(k)
        return jnp.sum(jnp.sin(l) * jnp.arange(24.0)[None, :])

    g_native = jax.grad(loss_native)(a)
    # same cotangent through the custom pullback
    l = jnp.linalg.cholesky(a)
    l_bar = jax.grad(lambda ll: jnp.sum(jnp.sin(ll) * jnp.arange(24.0)[None, :]))(l)
    g_custom = _chol_pullback(l, l_bar)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_native), rtol=1e-8, atol=1e-10)


def test_safe_cholesky_f32_gradients_finite_under_escalation():
    from mobocmf_tpu.linalg.ops import safe_cholesky

    # a Gram-like matrix that needs escalation in f32
    rng = np.random.default_rng(8)
    x = rng.uniform(size=(64, 2)).astype(np.float32)
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    k = np.exp(-0.5 * d2 / 0.25).astype(np.float32)

    def loss(kk):
        l = safe_cholesky(kk, 1e-7)  # deliberately too small; must escalate
        return jnp.sum(l * l)

    val, g = jax.value_and_grad(loss)(jnp.asarray(k))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))


def test_safe_cholesky_large_scale_f32_duplicate_rows():
    """Regression: the r5 branin_currin_512 campaign NaN'd because large
    outputs (trained outputscale ~1e3-1e4) make the ABSOLUTE escalation
    ladder (2e-6 -> 2e-4 -> 2e-2) ~5e-6 relative at best — below f32 Gram
    rounding once near-duplicate inducing rows appear. The scale-relative
    floors must factor such matrices and keep gradients finite."""
    from mobocmf_tpu.linalg.ops import safe_cholesky

    rng = np.random.default_rng(5)
    x = rng.uniform(size=(256, 2))
    x[200] = x[100]  # exact duplicate rows (duplicate training inputs)
    x[201] = x[101] + 1e-7
    d2 = ((x[:, None] - x[None]) ** 2).sum(-1)
    scale = 4000.0  # Branin-like trained outputscale
    k = (scale * np.exp(-0.5 * d2 / 0.25)).astype(np.float32)

    def loss(kk):
        l = safe_cholesky(kk, 2e-6)  # reference jitter, hopeless at scale 4e3
        return jnp.sum(l * l) / scale

    val, g = jax.value_and_grad(loss)(jnp.asarray(k))
    assert np.isfinite(float(val))
    assert np.all(np.isfinite(np.asarray(g)))
    # the factor reconstructs K to f32 accuracy at this scale
    l = safe_cholesky(jnp.asarray(k), 2e-6)
    rec = np.asarray(l) @ np.asarray(l).T
    np.testing.assert_allclose(rec, k, atol=scale * 5e-3)

    # the same matrix under vmap (the stacked-training path that NaN'd)
    kb = jnp.asarray(np.stack([k, k]))
    lb = jax.jit(jax.vmap(lambda kk: safe_cholesky(kk, 2e-6)))(kb)
    assert bool(jnp.all(jnp.isfinite(lb)))


def test_safe_cholesky_f64_path_is_exact_reference_jitter():
    """The f64 (parity) path must remain a single plain factorization at the
    caller's exact jitter — the f32 relative floors must not leak into it."""
    from mobocmf_tpu.linalg.ops import add_jitter, safe_cholesky

    k = jnp.asarray(_spd(24, seed=3, dtype=np.float64) * 3000.0)
    l_safe = safe_cholesky(k, 2e-6)
    l_plain = jnp.linalg.cholesky(add_jitter(k, 2e-6))
    np.testing.assert_array_equal(np.asarray(l_safe), np.asarray(l_plain))


def test_safe_cholesky_vmap_keeps_true_branch():
    """Batched safe_cholesky must keep a real HLO conditional.

    A naively vmapped lax.cond lowers to select_n and executes ALL escalation
    attempts on every call — 3 Choleskys per kernel matrix per training step
    of a stacked/vmapped model instead of 1 (measured on CPU HLO). The
    custom_vmap rule reduces the failure predicate to a scalar so the
    escalation stays a branch; this pins that property for vmap, vmap+grad
    and nested vmap."""
    from mobocmf_tpu.linalg.ops import safe_cholesky

    def f(k):
        return safe_cholesky(k, 1e-6)

    k = jnp.asarray(np.stack([_spd(16, seed=s) for s in range(3)]))
    txts = {
        "vmap": jax.jit(jax.vmap(f)).lower(k).compile().as_text(),
        "vmap_grad": jax.jit(
            jax.grad(lambda kk: jnp.sum(jax.vmap(f)(kk)))
        ).lower(k).compile().as_text(),
        "nested_vmap": jax.jit(jax.vmap(jax.vmap(f)))
        .lower(k[None].repeat(2, 0))
        .compile()
        .as_text(),
    }
    for name, txt in txts.items():
        assert "conditional" in txt, f"{name}: escalation cond was flattened to select"


def test_safe_cholesky_vmap_matches_per_element():
    """Batched values/escalation equal per-element application."""
    from mobocmf_tpu.linalg.ops import safe_cholesky

    ks = np.stack([_spd(16, seed=s) for s in range(4)])
    # make element 2 indefinite so the rescue path runs for the whole batch
    w, v = np.linalg.eigh(ks[2])
    w[0] = -1e-3
    ks[2] = (v * w) @ v.T
    ks = jnp.asarray(ks)

    batched = jax.jit(jax.vmap(lambda k: safe_cholesky(k, 1e-6)))(ks)
    single = [jax.jit(lambda k: safe_cholesky(k, 1e-6))(ks[i]) for i in range(4)]
    assert bool(jnp.all(jnp.isfinite(batched)))
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single[i]), rtol=1e-6, atol=1e-6
        )
