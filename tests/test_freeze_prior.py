"""Freeze-to-prior mode (init_params_to_prior_and_fix_them).

Reference /root/reference/mobocmf/layers/mfdgp_hidden_layer.py:52-62,90-113,
166-188 and fitter arg blackbox_mfdgp_fitter.py:27: kernel hyperparameters
are initialized to fixed prior values and excluded from optimization, while
variational parameters and likelihood noises keep training.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
from mobocmf_tpu.kernels.rbf import _positive
from mobocmf_tpu.models import mfdgp as M


def _problem(seed=0, n=12, d=2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    fid = jnp.asarray((np.arange(n) % 2).astype(int))
    y = jnp.asarray(rng.normal(size=n))
    return x, y, fid


def test_prior_init_values():
    """Layer 0: ls = 0.25*d, os = 1. Deep layer: ls_x1 = 10*0.25*d, ls_f = 1,
    ls_x2 = 0.25*d, nu_lin = 1, outputscales (1, 1, 0.01)."""
    x, y, fid = _problem()
    d = x.shape[1]
    model = M.init_mfdgp(
        jax.random.key(0), x, y[:, None], fid, 2,
        init_params_to_prior_and_fix_them=True,
    )
    k0 = model.params.layers[0].kernel
    np.testing.assert_allclose(
        np.asarray(_positive.forward(k0["raw_lengthscale"])), 0.25 * d, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_positive.forward(k0["raw_outputscale"])), 1.0, rtol=1e-6
    )
    k1 = model.params.layers[1].kernel
    np.testing.assert_allclose(
        np.asarray(_positive.forward(k1["kx1"]["raw_lengthscale"])), 10 * 0.25 * d, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_positive.forward(k1["kf"]["raw_lengthscale"])), 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_positive.forward(k1["kx2"]["raw_lengthscale"])), 0.25 * d, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_positive.forward(k1["klin"]["raw_variance"])), 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(_positive.forward(k1["kx2"]["raw_outputscale"])), 0.01, rtol=1e-5
    )
    assert model.config.fix_kernel_params


def test_kernel_frozen_variational_trains():
    x, y, fid = _problem(1)
    fitter = BlackBoxMFDGPFitter(
        num_fidelities=2, batch_size=x.shape[0], num_epochs_1=3, num_epochs_2=5,
    )
    fitter.initialize_mfdgp(
        x, y, fid, "obj1", is_constraint=False,
        init_params_to_prior_and_fix_them=True,
    )
    before = jax.tree.map(jnp.array, fitter.models_objs["obj1"].params)
    fitter.train_mfdgps()
    after = fitter.models_objs["obj1"].params

    for ell in range(2):
        kb = jax.tree.leaves(before.layers[ell].kernel)
        ka = jax.tree.leaves(after.layers[ell].kernel)
        for a, b in zip(ka, kb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # variational means must have moved
    moved = any(
        bool(jnp.any(before.layers[ell].variational.mean != after.layers[ell].variational.mean))
        for ell in range(2)
    )
    assert moved, "variational params did not train under freeze-to-prior"
    # likelihood noises must have moved (phase 2 frees them)
    assert bool(jnp.any(before.raw_noises != after.raw_noises))
