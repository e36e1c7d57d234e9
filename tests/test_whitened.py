"""Whitened-parameterization MFDGP tests: init-time equivalence + training."""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.fit import trainer
from mobocmf_tpu.mlls.elbo import elbo_terms
from mobocmf_tpu.models import mfdgp as M


def _data(seed=0, n=12, d=2):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    fid = jnp.asarray(np.arange(n) % 2)
    return x, y, fid


def test_whitened_matches_unwhitened_at_init():
    """At initialization the whitened model must produce the same posterior
    and ELBO as the unwhitened one (same q(u), different coordinates)."""
    x, y, fid = _data()
    mu_model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2, whitened=False)
    mw_model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2, whitened=True)

    eps = M.sample_eps(jax.random.key(1), mu_model.config, x.shape[0], x.dtype)
    outs_u = M.forward(mu_model.params, mu_model.consts, mu_model.config, x, eps)
    outs_w = M.forward(mw_model.params, mw_model.consts, mw_model.config, x, eps)
    for (mu_u, var_u), (mu_w, var_w) in zip(outs_u, outs_w):
        np.testing.assert_allclose(np.asarray(mu_w), np.asarray(mu_u), rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(np.asarray(var_w), np.asarray(var_u), rtol=1e-5, atol=1e-8)

    e_u, kl_u = elbo_terms(mu_model.params, mu_model.consts, mu_model.config, x, y, fid, eps, x.shape[0])
    e_w, kl_w = elbo_terms(mw_model.params, mw_model.consts, mw_model.config, x, y, fid, eps, x.shape[0])
    np.testing.assert_allclose(float(e_w), float(e_u), rtol=1e-6)
    np.testing.assert_allclose(float(kl_w), float(kl_u), rtol=1e-6)


def test_whitened_prior_init():
    """whitened_init='prior': q(v)=N(0,I) i.e. q(u)=prior — KL must be
    exactly 0 at init, predictive mean 0 / variance = kernel prior variance,
    the chain column 0, and a short training phase must run finite and
    improve the ELBO. 'match' stays the default (exact reference-init
    parity, pinned elsewhere)."""
    import numpy as np

    from mobocmf_tpu.fit import trainer as T
    from mobocmf_tpu.mlls.elbo import elbo_terms

    rng = np.random.default_rng(4)
    n, d = 12, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=(n, 1)))
    fid = jnp.asarray((np.arange(n) % 2).astype(int))
    model = M.init_mfdgp(
        jax.random.key(0), x, y, fid, 2, whitened=True, whitened_init="prior"
    )
    kl = M.kl_all_layers(model.params, model.consts, model.config)
    np.testing.assert_allclose(float(kl), 0.0, atol=1e-12)

    states = M.compute_layer_states(model.params, model.consts, model.config)
    # dynamic chain column of layer 1's Z (last col) is the zero chain mean
    np.testing.assert_allclose(np.asarray(states[1].z[:, -1]), 0.0, atol=1e-12)
    eps = M.sample_eps(jax.random.key(1), model.config, n, x.dtype)
    outs = M.forward(model.params, model.consts, model.config, x, eps, states=states)
    np.testing.assert_allclose(np.asarray(outs[0][0]), 0.0, atol=1e-10)

    p, logs = T.train_phase(
        model.params, model.consts, model.config, x, y[:, 0], fid,
        jax.random.key(2), 60, 0.003, "all_free", n,
    )
    losses = np.asarray(logs.loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    elbo, _ = elbo_terms(p, model.consts, model.config, x, y[:, 0], fid, eps, n)
    assert np.isfinite(float(elbo))

    import pytest

    with pytest.raises(ValueError):
        M.init_mfdgp(jax.random.key(0), x, y, fid, 2, whitened=True,
                     whitened_init="bogus")


def test_whitened_training_improves_elbo():
    x, y, fid = _data(seed=1)
    model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2, whitened=True)
    p, logs = trainer.train_phase_jit(
        model.params, model.consts, model.config, x, y, fid,
        jax.random.key(1), 30, 0.003, "all_free", x.shape[0],
    )
    loss = np.asarray(logs.loss)
    assert np.all(np.isfinite(loss))
    assert loss[-1] < loss[0]


def test_whitened_rff_sampling_finite():
    from mobocmf_tpu.sampling import rff

    x, y, fid = _data(seed=2)
    model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2, whitened=True)
    s = rff.sample_posterior(jax.random.key(3), model.params, model.consts, model.config)
    vals = rff.eval_sample(s, x)
    assert np.all(np.isfinite(np.asarray(vals)))


def test_whitened_combines_with_only_hf_and_freeze_prior():
    """Edge combinations: whitened x use_only_highest_fidelity and
    whitened x init_params_to_prior_and_fix_them must initialize, match the
    unwhitened posterior at init, and produce finite ELBO terms."""
    x, y, fid = _data(seed=3)
    for kw in (
        {"use_only_highest_fidelity": True},
        {"init_params_to_prior_and_fix_them": True},
        {"use_only_highest_fidelity": True, "init_params_to_prior_and_fix_them": True},
    ):
        mu_model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2,
                                whitened=False, **kw)
        mw_model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2,
                                whitened=True, **kw)
        eps = M.sample_eps(jax.random.key(1), mu_model.config, x.shape[0], x.dtype)
        outs_u = M.forward(mu_model.params, mu_model.consts, mu_model.config, x, eps)
        outs_w = M.forward(mw_model.params, mw_model.consts, mw_model.config, x, eps)
        for (mu_u, var_u), (mu_w, var_w) in zip(outs_u, outs_w):
            np.testing.assert_allclose(
                np.asarray(mu_w), np.asarray(mu_u), rtol=1e-5, atol=1e-7,
                err_msg=f"mean mismatch for {kw}",
            )
            np.testing.assert_allclose(
                np.asarray(var_w), np.asarray(var_u), rtol=1e-4, atol=1e-7,
                err_msg=f"var mismatch for {kw}",
            )
        e_w, kl_w = elbo_terms(
            mw_model.params, mw_model.consts, mw_model.config, x, y, fid, eps,
            x.shape[0],
        )
        assert np.isfinite(float(e_w)) and np.isfinite(float(kl_w)), kw
