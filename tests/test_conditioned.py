"""Conditioned-training factor tests vs manual numpy/scipy computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm as scipy_norm

from mobocmf_tpu.fit.conditioned import loss_omega_factors, loss_theta_factors


def test_theta_factors_match_reference_formula():
    """Reference blackbox_mfdgp_fitter.py:227-233."""
    rng = np.random.default_rng(0)
    p = 7
    mean = rng.normal(size=p)
    var = rng.uniform(0.1, 2.0, size=p)
    thr, eps = 0.3, 1e-8
    got = float(
        loss_theta_factors(
            jnp.asarray(mean), jnp.asarray(var), jnp.asarray(thr), eps,
            jnp.ones(p, dtype=bool),
        )
    )
    gamma = (mean - thr) / np.sqrt(var)
    cdf = scipy_norm.cdf(gamma)
    want = np.sum(np.log(1 - eps) * cdf + np.log(eps) * (1 - cdf))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_theta_factors_mask_excludes_rows():
    mean = jnp.asarray([0.0, 100.0])
    var = jnp.ones(2)
    full = float(loss_theta_factors(mean, var, jnp.asarray(0.0), 1e-8, jnp.ones(2, dtype=bool)))
    masked = float(
        loss_theta_factors(mean, var, jnp.asarray(0.0), 1e-8, jnp.asarray([True, False]))
    )
    # the second point is (almost) surely feasible: contributes log(1-eps) ~ 0
    assert abs(full - masked) < 1e-6
    masked0 = float(
        loss_theta_factors(mean, var, jnp.asarray(0.0), 1e-8, jnp.asarray([False, True]))
    )
    assert abs(masked0 - (full - masked0)) > 1.0  # first point carries the loss


def test_omega_factors_match_reference_formula():
    """Reference blackbox_mfdgp_fitter.py:235-243."""
    rng = np.random.default_rng(1)
    k_obj, n_con, p, j = 2, 2, 5, 10
    fs_mean = rng.normal(size=(k_obj, j))
    fs_var = rng.uniform(0.1, 2.0, size=(k_obj, j))
    cs_mean = rng.normal(size=(n_con, j))
    cs_var = rng.uniform(0.1, 2.0, size=(n_con, j))
    thr = rng.normal(size=n_con)
    front = rng.normal(size=(p, k_obj))
    eps = 1e-8

    got = float(
        loss_omega_factors(
            jnp.asarray(fs_mean), jnp.asarray(fs_var), jnp.asarray(cs_mean),
            jnp.asarray(cs_var), jnp.asarray(thr), jnp.asarray(front),
            jnp.ones(p, dtype=bool), eps,
        )
    )
    gamma_c = (cs_mean - thr[:, None]) / np.sqrt(cs_var)
    gamma_f = (front[:, :, None] - fs_mean[None]) / np.sqrt(fs_var[None])
    q = scipy_norm.cdf(gamma_c).prod(axis=0)[None, :] * scipy_norm.cdf(gamma_f).prod(axis=1)
    want = np.sum(np.log(eps) * q + np.log(1 - eps) * (1 - q))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_only_hf_mode_trains():
    """use_only_highest_fidelity ablation: independent per-layer GPs of x."""
    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(2)
    n, d = 12, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    y = jnp.asarray(rng.normal(size=n))
    fid = jnp.asarray(np.arange(n) % 2)
    model = M.init_mfdgp(
        jax.random.key(0), x, y[:, None], fid, 2, use_only_highest_fidelity=True
    )
    # per-layer inducing sets in only-HF mode (reference mfdgp.py:295-296)
    assert model.consts.z_x[0].shape[0] == int((np.asarray(fid) == 0).sum())
    assert model.consts.z_x[1].shape[0] == int((np.asarray(fid) == 1).sum())
    p, logs = trainer.train_phase_jit(
        model.params, model.consts, model.config, x, y, fid,
        jax.random.key(1), 20, 0.003, "all_free", n,
    )
    loss = np.asarray(logs.loss)
    assert np.all(np.isfinite(loss)) and loss[-1] < loss[0]

    # propagation is zeroed: layer-1 output must not depend on layer-0 params
    eps = M.sample_eps(jax.random.key(2), model.config, n, x.dtype)

    def layer1_mean_sum(m0):
        layers = list(p.layers)
        layers[0] = layers[0]._replace(
            variational=layers[0].variational._replace(mean=m0)
        )
        pp = p._replace(layers=tuple(layers))
        outs = M.forward(pp, model.consts, model.config, x, eps)
        return jnp.sum(outs[1][0])

    g = jax.grad(layer1_mean_sum)(p.layers[0].variational.mean)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-12)


def test_only_hf_fitter_pipeline():
    """Fitter-level only-HF ablation: train + pareto sample end-to-end."""
    from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter

    rng = np.random.default_rng(5)
    n, d = 14, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    fid = jnp.asarray(np.arange(n) % 2)
    fitter = BlackBoxMFDGPFitter(2, batch_size=n, num_epochs_1=3, num_epochs_2=4,
                                 opt_grid_size=20, pareto_set_size=4)
    fitter.initialize_mfdgp(
        x, jnp.asarray(rng.normal(size=(n, 1))), fid, "obj1",
        use_only_highest_fidelity=True,
    )
    fitter.train_mfdgps()
    sol = fitter.sample_and_store_pareto_solution()
    assert sol.num_valid >= 1
    assert np.all(np.isfinite(np.asarray(sol.pareto_front)[np.asarray(sol.mask)]))


def test_describe_hyperparams():
    from mobocmf_tpu.models import mfdgp as M
    from mobocmf_tpu.util.describe import describe_hyperparams

    rng = np.random.default_rng(6)
    n = 10
    x = jnp.asarray(rng.uniform(size=(n, 2)))
    model = M.init_mfdgp(
        jax.random.key(0), x, jnp.asarray(rng.normal(size=(n, 1))),
        jnp.asarray(np.arange(n) % 2), 2,
    )
    d = describe_hyperparams(model)
    assert set(d) == {"layer_0", "layer_1"}
    assert float(d["layer_0"]["l0_outputscale"]) == pytest_approx(1.0)
    assert float(d["layer_1"]["alpha_x2"]) == pytest_approx(0.01)
    assert float(d["layer_1"]["nu_lin"]) == pytest_approx(1.0)
    assert d["layer_0"]["likelihood_noise"] > 0


def pytest_approx(v, rel=1e-5):
    import pytest as _pytest

    return _pytest.approx(v, rel=rel)


def test_zero_constraint_conditioned_training():
    """With no constraints, the stacked constraint pytrees are explicitly
    EMPTY (leading axis 0): the trainer must leave them empty, still update
    objective params, and produce finite decreasing loss."""
    from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter

    rng = np.random.default_rng(5)
    n, d = 12, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    fid = jnp.asarray((np.arange(n) % 2).astype(int))
    ys = [jnp.asarray(rng.normal(size=n)) for _ in range(2)]

    fitter = BlackBoxMFDGPFitter(
        num_fidelities=2, batch_size=n, num_epochs_1=2, num_epochs_2=3,
        opt_grid_size=20, pareto_set_size=4,
    )
    fitter.initialize_mfdgp(x, ys[0], fid, "obj1", is_constraint=False)
    fitter.initialize_mfdgp(x, ys[1], fid, "obj2", is_constraint=False)
    fitter.train_mfdgps()
    params_before = jax.tree.map(
        jnp.array, fitter.models_objs["obj1"].params
    )
    cond = fitter.copy_uncond()
    cond.sample_and_store_pareto_solution()
    cond.train_conditioned_mfdgps()

    assert cond.num_con == 0 and not cond.models_cons
    moved = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: bool(jnp.any(a != b)),
            params_before, cond.models_objs["obj1"].params,
        )
    )
    assert any(moved), "objective params did not move in conditioned training"


def test_recommendation_uses_noiseless_constraint_variance():
    """Reference toy:545-546 subtracts the likelihood noise from constraint
    predictive variances before the P > 0.999 feasibility test. Compare the
    feasibility probability the loop computes against a hand computation with
    the noiseless variance."""
    from scipy.stats import norm as _norm

    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(7)
    n, d = 10, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    fid = jnp.asarray((np.arange(n) % 2).astype(int))
    y = jnp.asarray(rng.normal(size=(n, 1)))
    model = M.init_mfdgp(jax.random.key(0), x, y, fid, 2)
    grid = jnp.asarray(rng.uniform(size=(6, d)))

    mu, var = M.predict_for_acquisition(model.params, model.consts, model.config, grid, 1)
    noise = float(M.likelihood_noise(model.params, model.consts, 1))
    want = 1.0 - _norm.cdf(
        (0.0 - np.asarray(mu)) / np.sqrt(np.maximum(np.asarray(var) - noise, 1e-12))
    )

    # replicate the loop's computation path (bo/loop.recommend_and_score)
    var_latent = np.maximum(np.asarray(var) - noise, 1e-12)
    got = 1.0 - _norm.cdf((0.0 - np.asarray(mu)) / np.sqrt(var_latent))
    np.testing.assert_allclose(got, want, rtol=1e-12)
    # and the noisy version must differ (the round-1 bug)
    noisy = 1.0 - _norm.cdf((0.0 - np.asarray(mu)) / np.sqrt(np.asarray(var)))
    assert np.max(np.abs(noisy - want)) > 0

    # the loop's actual single-dispatch device pass must agree with the hand
    # computation: feasible == (p_feas > 0.999) with the NOISELESS variance
    from mobocmf_tpu.bo.loop import _recommendation_model_pass_jit
    from mobocmf_tpu.fit import trainer

    obj_p, obj_c, mcfg = trainer.stack_models([model])
    thr_std = jnp.asarray([0.0], dtype=x.dtype)
    obj_scale = jnp.asarray([[0.0, 1.0]], dtype=x.dtype)
    means, feasible, mask = _recommendation_model_pass_jit(
        obj_p, obj_c, obj_p, obj_c, mcfg, 1, grid, thr_std, obj_scale, 0.999
    )
    np.testing.assert_allclose(np.asarray(means)[0], np.asarray(mu), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(feasible), want > 0.999)
    # cull consistency: mask selects only feasible points
    assert not np.any(np.asarray(mask) & ~np.asarray(feasible))


def test_conditioned_loss_finite_on_all_padded_minibatch():
    """pad_data + batch_size < N can sample a minibatch of only padded rows
    (all batch weights 0); the data-term rescale must yield exactly 0, not
    0/0 = NaN (which would poison Adam state for the rest of the phase)."""
    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.fit.conditioned import ConditionedData, conditioned_loss
    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(3)
    n, d, p = 8, 2, 3
    x = jnp.asarray(rng.uniform(size=(n, d)))
    fid = jnp.asarray((np.arange(n) % 2).astype(int))
    ys = rng.normal(size=(2, n))
    models = [
        M.init_mfdgp(jax.random.key(i), x, jnp.asarray(y[:, None]), fid, 2)
        for i, y in enumerate(ys)
    ]
    op, oc, config = trainer.stack_models([models[0]])
    cp, cc, _ = trainer.stack_models([models[1]])
    data = ConditionedData(
        x=x,
        ys_obj=jnp.asarray(ys[:1]),
        ys_con=jnp.asarray(ys[1:]),
        fidelities=fid,
        pareto_set=jnp.asarray(rng.uniform(size=(p, d))),
        pareto_front=jnp.asarray(rng.normal(size=(p, 1))),
        front_mask=jnp.ones(p, dtype=bool),
        thresholds=jnp.zeros(1),
        row_weights=jnp.concatenate([jnp.ones(n - 3), jnp.zeros(3)]),
    )
    batch_idx = jnp.asarray([n - 3, n - 2, n - 1])  # ONLY padded rows
    batch_w = data.row_weights[batch_idx]
    assert float(jnp.sum(batch_w)) == 0.0

    def loss_fn(ps):
        return conditioned_loss(
            ps[0], ps[1], oc, cc, config, data, jax.random.key(9), 1e-8,
            batch_idx, batch_w,
        )

    loss, grads = jax.value_and_grad(loss_fn)((op, cp))
    assert np.isfinite(float(loss))
    for leaf in jax.tree.leaves(grads):
        assert np.isfinite(np.asarray(leaf)).all()


@pytest.mark.parametrize("num_fid", [2, 3])
def test_conditioned_loss_fused_matches_unfused(num_fid):
    """The fused-evaluation conditioned loss (one forward per model over
    [batch; X*; x_tilde], MOBOCMF_FUSED_COND) must equal the three-forward
    path exactly: the eps draws use the same keys/shapes concatenated along
    the row axis, and the forward is row-independent given states — value AND
    gradients agree to f64 solve precision, with and without constraints,
    at 2 AND 3 fidelities (the DTLZ2 scale config is 3-fidelity; f32 runs
    differ by reduction-order rounding ~1e-4, so equivalence is pinned
    in f64)."""
    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.fit.conditioned import ConditionedData, conditioned_loss
    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(11)
    n, d, p = 12, 2, 4
    x = jnp.asarray(rng.uniform(size=(n, d)))
    fid = jnp.asarray((np.arange(n) % num_fid).astype(int))
    ys = rng.normal(size=(4, n))
    models = [
        M.init_mfdgp(jax.random.key(i), x, jnp.asarray(y[:, None]), fid, num_fid)
        for i, y in enumerate(ys)
    ]
    op, oc, config = trainer.stack_models(models[:2])
    batch_idx = jnp.arange(n)
    for with_con in (True, False):
        if with_con:
            cp, cc, _ = trainer.stack_models(models[2:])
            ys_con = jnp.asarray(ys[2:])
            thresholds = jnp.zeros(2)
        else:
            cp = jax.tree.map(lambda a: a[:0], op)
            cc = oc._replace(
                acq_eps=oc.acq_eps[:0],
                noise_lower=oc.noise_lower[:0],
                noise_upper=oc.noise_upper[:0],
            )
            ys_con = jnp.zeros((0, n))
            thresholds = jnp.zeros(0)
        data = ConditionedData(
            x=x,
            ys_obj=jnp.asarray(ys[:2]),
            ys_con=ys_con,
            fidelities=fid,
            pareto_set=jnp.asarray(rng.uniform(size=(p, d))),
            pareto_front=jnp.asarray(rng.normal(size=(p, 2))),
            front_mask=jnp.asarray([True, True, True, False]),
            thresholds=thresholds,
            row_weights=jnp.concatenate([jnp.ones(n - 2), jnp.zeros(2)]),
        )
        batch_w = data.row_weights

        def loss_fn(ps, fused):
            return conditioned_loss(
                ps[0], ps[1], oc, cc, config, data, jax.random.key(7), 1e-8,
                batch_idx, batch_w, fused=fused,
            )

        l_ref, g_ref = jax.value_and_grad(lambda ps: loss_fn(ps, False))((op, cp))
        l_fus, g_fus = jax.value_and_grad(lambda ps: loss_fn(ps, True))((op, cp))
        np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-9)
        for a, b in zip(jax.tree.leaves(g_fus), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-8, atol=1e-10
            )


def test_conditioned_rejects_mismatched_inducing_inputs():
    """The obj/con stacked-states fusion is only valid when both groups share
    the SAME inducing inputs (coupled-evaluation contract). Same-shaped but
    different-VALUED z_x (e.g. constraint models fit on different bucketed
    inputs) must raise, not silently reuse the objectives' states."""
    import pytest

    from mobocmf_tpu.fit import conditioned as C
    from mobocmf_tpu.fit import trainer as T
    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(0)
    n, d = 10, 2
    fid = jnp.asarray((np.arange(n) % 2).astype(int))
    x1 = jnp.asarray(rng.uniform(size=(n, d)))
    x2 = jnp.asarray(rng.uniform(size=(n, d)))  # same shape, different values
    mk = lambda x, i: M.init_mfdgp(
        jax.random.key(i), x, jnp.asarray(rng.normal(size=(n, 1))), fid, 2
    )
    op, oc, cfg = T.stack_models([mk(x1, 0), mk(x1, 1)])
    cp, cc, _ = T.stack_models([mk(x2, 2), mk(x2, 3)])

    p = 4
    data = C.ConditionedData(
        x=x1,
        ys_obj=jnp.zeros((2, n)),
        ys_con=jnp.zeros((2, n)),
        fidelities=fid,
        pareto_set=jnp.asarray(rng.uniform(size=(p, d))),
        pareto_front=jnp.asarray(rng.normal(size=(p, 2))),
        front_mask=jnp.ones((p,), dtype=bool),
        thresholds=jnp.zeros((2,)),
    )
    with pytest.raises(ValueError, match="identical inducing inputs"):
        C.train_conditioned_chunked(
            op, cp, oc, cc, cfg, data, jax.random.key(0), 2, 1e-3, 1e-8, n
        )
