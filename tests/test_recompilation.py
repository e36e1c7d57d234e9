"""Acquisition programs must NOT recompile across BO iterations.

Round-1 weakness: _JES_MFDGP jitted closures reading self.mfdgp_*.params baked
the parameters in as compile-time constants, so every BO iteration's fresh
acquisition objects forced full recompiles (1-5 min each over the TPU tunnel).
The fix makes every jitted program module-level with params as runtime
arguments; this test builds two 'BO iterations' worth of acquisition objects
over identical shapes and asserts the jit caches do not grow on the second.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.acquisition import jesmoc
from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
from mobocmf_tpu.sampling import rff


def _make_fitter(seed: int):
    key = jax.random.key(seed)
    d = 2
    keys = jax.random.split(key, 3)
    samples = [rff.sample_prior(k, d, 2) for k in keys]

    rng = np.random.default_rng(seed)
    n_low, n_high = 8, 4
    x_low = rng.uniform(size=(n_low, d))
    x_high = rng.uniform(size=(n_high, d))
    x = jnp.asarray(np.vstack([x_high, x_low]))
    fid = jnp.asarray(np.concatenate([np.ones(n_high), np.zeros(n_low)]).astype(int))

    ys = []
    for s in samples:
        y_low = np.asarray(rff.eval_sample(s, jnp.asarray(x_low), layer=0))
        y_high = np.asarray(rff.eval_sample(s, jnp.asarray(x_high), layer=1))
        y = np.concatenate([y_high, y_low])
        ys.append(jnp.asarray((y - y.mean()) / y.std()))

    fitter = BlackBoxMFDGPFitter(
        num_fidelities=2, batch_size=x.shape[0], num_epochs_1=2, num_epochs_2=3,
        opt_grid_size=20, pareto_set_size=4, seed=seed,
    )
    fitter.initialize_mfdgp(x, ys[0], fid, "obj1", is_constraint=False)
    fitter.initialize_mfdgp(x, ys[1], fid, "obj2", is_constraint=False)
    fitter.initialize_mfdgp(x, ys[2], fid, "con1", threshold_constraint=0.0, is_constraint=True)
    fitter.train_mfdgps()
    return fitter


def _one_iteration(seed: int):
    fitter = _make_fitter(seed)
    cond = fitter.copy_uncond()
    cond.sample_and_store_pareto_solution()
    cond.train_conditioned_mfdgps()
    jes = jesmoc.JESMOC_MFDGP(
        model=fitter, num_fidelities=2, model_cond=cond, seed=seed
    )
    for name, is_con in [("obj1", False), ("obj2", False), ("con1", True)]:
        for f in range(2):
            jes.add_blackbox(f, name, cost_evaluation=1.0 + 9.0 * f, is_constraint=is_con)
    x_next, fid_next = jes.get_nextpoint_coupled()
    # also exercise the decoupled/coupled surfaces
    grid = jnp.asarray(np.random.default_rng(seed).uniform(size=(6, 2)))
    jes.decoupled_acq(grid, 1, "obj1", is_constraint=False)
    jes.coupled_acq(grid, 0)
    return x_next, fid_next


def test_zero_xla_compiles_on_second_same_bucket_iteration(caplog):
    """THE regression guard for the per-iteration-recompile bug class
    (call-site jits, eager ops on per-iteration dynamic shapes): a full
    fit + Pareto + conditioned + acquisition pass at an already-seen data
    shape must trigger ZERO XLA compilations."""
    import logging

    _one_iteration(7)  # warm every program at this shape
    jax.config.update("jax_log_compiles", True)
    try:
        with caplog.at_level(logging.WARNING, logger="jax._src.dispatch"):
            _one_iteration(8)
    finally:
        jax.config.update("jax_log_compiles", False)
    compiles = [r for r in caplog.records if "Finished XLA compilation" in r.getMessage()]
    assert not compiles, (
        f"{len(compiles)} XLA compiles on a same-shape iteration: "
        + "; ".join(r.getMessage()[:80] for r in compiles[:5])
    )


def test_no_acquisition_recompiles_across_iterations():
    _one_iteration(0)
    # the standard coupled registration takes the FUSED all-fidelity program
    # (round 3, optimize_coupled_jes_all_fidelities); the per-fidelity
    # optimize_coupled_jes is the asymmetric-registration fallback and stays
    # cold here
    sizes_before = {
        "optimize_all": jesmoc.optimize_coupled_jes_all_fidelities._cache_size(),
        "coupled": jesmoc.coupled_acq_stacked._cache_size(),
        "info_gain": jesmoc.info_gain._cache_size(),
    }
    assert all(v > 0 for v in sizes_before.values())

    # second BO iteration: same shapes, fresh params -> zero new compiles
    _one_iteration(1)
    sizes_after = {
        "optimize_all": jesmoc.optimize_coupled_jes_all_fidelities._cache_size(),
        "coupled": jesmoc.coupled_acq_stacked._cache_size(),
        "info_gain": jesmoc.info_gain._cache_size(),
    }
    assert sizes_after == sizes_before, (
        f"acquisition programs recompiled: {sizes_before} -> {sizes_after}"
    )


def test_no_stacking_or_recommendation_recompiles_across_iterations():
    """The round-2 single-dispatch programs (jitted stack/unstack, the
    recommendation model pass) must also hit their caches on iteration 2."""
    from mobocmf_tpu.bo.loop import _recommendation_model_pass_jit
    from mobocmf_tpu.fit import trainer

    def one(seed):
        fitter = _make_fitter(seed)
        obj_p, obj_c, mcfg = trainer.stack_models(
            [fitter.models_objs[n] for n in fitter.obj_names]
        )
        con_models = [fitter.models_cons[n] for n in fitter.con_names]
        con_p, con_c, _ = trainer.stack_models(con_models)
        grid = jnp.asarray(np.random.default_rng(seed).uniform(size=(16, 2)))
        thr = jnp.zeros((len(con_models),), dtype=grid.dtype)
        scale = jnp.asarray([[0.0, 1.0]] * len(fitter.obj_names), dtype=grid.dtype)
        _recommendation_model_pass_jit(
            obj_p, obj_c, con_p, con_c, mcfg, 1, grid, thr, scale, 0.999
        )

    one(0)
    before = {
        "stack": trainer._stack_jit._cache_size(),
        "unstack": trainer._unstack_jit._cache_size(),
        "recommend": _recommendation_model_pass_jit._cache_size(),
    }
    assert all(v > 0 for v in before.values())
    one(1)
    after = {
        "stack": trainer._stack_jit._cache_size(),
        "unstack": trainer._unstack_jit._cache_size(),
        "recommend": _recommendation_model_pass_jit._cache_size(),
    }
    assert after == before, f"round-2 programs recompiled: {before} -> {after}"


def test_no_pareto_sampling_recompiles_across_iterations():
    """The stacked RFF feature program must hit its cache on iteration 2: a
    jax.jit built at the call site (round-3 bug) started cold every call,
    recompiling (or reloading from the persistent cache) once per Pareto
    phase."""
    f0 = _make_fitter(3)
    f0.sample_and_store_pareto_solution()
    vm = rff._vmapped_features_jit()
    before = vm._cache_size()
    assert before > 0

    f1 = _make_fitter(4)
    f1.sample_and_store_pareto_solution()
    assert vm._cache_size() == before, "stacked RFF sampling recompiled"


def test_fidelity_with_no_blackboxes_yields_zero_surface():
    """A fidelity with no registered blackboxes must give a zero coupled
    acquisition and be skipped in fidelity selection (not crash in
    stack_models)."""
    fitter = _make_fitter(2)
    cond = fitter.copy_uncond()
    cond.sample_and_store_pareto_solution()
    cond.train_conditioned_mfdgps()
    jes = jesmoc.JESMOC_MFDGP(model=fitter, num_fidelities=2, model_cond=cond)
    # register ONLY at fidelity 1
    for name, is_con in [("obj1", False), ("obj2", False), ("con1", True)]:
        jes.add_blackbox(1, name, cost_evaluation=10.0, is_constraint=is_con)
    grid = jnp.asarray(np.random.default_rng(0).uniform(size=(5, 2)))
    np.testing.assert_array_equal(np.asarray(jes.coupled_acq(grid, 0)), 0.0)
    x_next, fid_next = jes.get_nextpoint_coupled()
    assert fid_next == 1 and x_next.shape == (2,)
