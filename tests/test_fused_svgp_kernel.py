"""Interpret-mode correctness of the experimental fused SVGP Pallas kernel.

linalg/fused_svgp.py was measured-and-rejected on TPU v5e (241us vs 160us for
the XLA path at m=128; Mosaic f32 matmuls ignore HIGHEST precision) but is
kept as the starting point for a future software-f32 version. VERDICT r2
item 8: in-tree code must be tested — these run the kernel in Pallas
interpret mode (pure CPU emulation, exact f32 semantics) against the jnp
reference oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobocmf_tpu.linalg.fused_svgp import fused_rbf_svgp_forward, reference_forward


def _problem(m, n, d, seed):
    """Well-conditioned SVGP state: a 128-point RBF Gram of [0,1]^3 points at
    lengthscale ~0.5 is numerically singular in f32, where the oracle's
    safe_cholesky escalates jitter but the fused kernel does not — the two
    then solve DIFFERENT systems and any comparison measures conditioning,
    not kernel correctness. Short lengthscale + large jitter keeps both on
    the same well-posed system."""
    rng = np.random.default_rng(seed)
    z = jnp.asarray(rng.uniform(size=(m, d)), dtype=jnp.float32)
    x = jnp.asarray(rng.uniform(size=(n, d)), dtype=jnp.float32)
    mean = jnp.asarray(rng.normal(size=(m,)), dtype=jnp.float32)
    a = rng.normal(size=(m, m)) * 0.05
    ls_chol = jnp.asarray(np.tril(a) + 0.3 * np.eye(m), dtype=jnp.float32)
    lengthscale = jnp.asarray([0.15] * d, dtype=jnp.float32)
    outputscale = jnp.asarray(1.3, dtype=jnp.float32)
    jitter = jnp.asarray(1e-2, dtype=jnp.float32)
    return z, x, mean, ls_chol, lengthscale, outputscale, jitter


@pytest.mark.parametrize("m,n", [(128, 128), (100, 150)])
def test_fused_kernel_matches_reference_interpret(m, n):
    """Fused Gram+chol+solve+moments == jnp reference, incl. non-multiple-of-
    block shapes exercising the far-away row padding."""
    args = _problem(m, n, d=3, seed=0)
    mu_f, var_f = fused_rbf_svgp_forward(*args, interpret=True)
    mu_r, var_r = reference_forward(*args)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_r), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(var_f), np.asarray(var_r), rtol=2e-3, atol=2e-3)
    assert bool(jnp.all(var_f > 0))
