"""End-to-end JESMOCMF pipeline smoke test.

Mirrors /root/reference/examples/example_synthetic/example_synthetic_2D.py with
the reference's fast settings (num_epochs_1=10, num_epochs_2=20,
num_epochs_cond=10): fake blackboxes sampled from the MFDGP prior, two
objectives + two constraints, unconditioned training, Pareto sampling,
conditioned training, JES acquisition evaluation and candidate selection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobocmf_tpu.acquisition.jesmoc import JESMOC_MFDGP
from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
from mobocmf_tpu.sampling import rff


@pytest.fixture(scope="module")
def problem():
    key = jax.random.key(0)
    d = 2
    keys = jax.random.split(key, 4)
    samples = [rff.sample_prior(k, d, 2) for k in keys]

    rng = np.random.default_rng(0)
    n_low, n_high = 10, 5
    x_low = rng.uniform(size=(n_low, d))
    x_high = rng.uniform(size=(n_high, d))
    x = jnp.asarray(np.vstack([x_high, x_low]))
    fid = jnp.asarray(np.concatenate([np.ones(n_high), np.zeros(n_low)]).astype(int))

    ys = []
    for s in samples:
        y_low = np.asarray(rff.eval_sample(s, jnp.asarray(x_low), layer=0))
        y_high = np.asarray(rff.eval_sample(s, jnp.asarray(x_high), layer=1))
        y = np.concatenate([y_high, y_low])
        mean, std = y.mean(), y.std()
        ys.append(jnp.asarray((y - mean) / std))
    return x, fid, ys, samples


@pytest.fixture(scope="module")
def trained_fitter(problem):
    x, fid, ys, _ = problem
    fitter = BlackBoxMFDGPFitter(
        num_fidelities=2, batch_size=x.shape[0], num_epochs_1=10, num_epochs_2=20,
        opt_grid_size=50, pareto_set_size=8,
    )
    fitter.initialize_mfdgp(x, ys[0], fid, "obj1", is_constraint=False)
    fitter.initialize_mfdgp(x, ys[1], fid, "obj2", is_constraint=False)
    fitter.initialize_mfdgp(x, ys[2], fid, "con1", threshold_constraint=0.0, is_constraint=True)
    fitter.initialize_mfdgp(x, ys[3], fid, "con2", threshold_constraint=0.0, is_constraint=True)
    fitter.train_mfdgps()
    return fitter


def test_unconditioned_training_runs(trained_fitter):
    assert trained_fitter.models_uncond_trained
    for name in ("obj1", "obj2"):
        m = trained_fitter.get_model(name)
        assert np.all(np.isfinite(np.asarray(m.params.raw_noises)))


def test_full_jesmoc_pipeline(problem, trained_fitter):
    x, fid, ys, _ = problem
    fitter = trained_fitter
    cond = fitter.copy_uncond()
    solution = cond.sample_and_store_pareto_solution()
    assert solution.num_valid >= 1
    assert solution.pareto_set.shape[1] == 2
    # front values must be finite on valid rows
    front = np.asarray(solution.pareto_front)[np.asarray(solution.mask)]
    assert np.all(np.isfinite(front))

    cond.num_epochs_2 = 10
    cond.train_conditioned_mfdgps()

    jes = JESMOC_MFDGP(model=fitter, num_fidelities=2, model_cond=cond)
    for f in range(2):
        for name in ("obj1", "obj2"):
            jes.add_blackbox(f, name, cost_evaluation=1.0 if f == 0 else 10.0)
        for name in ("con1", "con2"):
            jes.add_blackbox(f, name, cost_evaluation=1.0 if f == 0 else 10.0, is_constraint=True)

    grid = jnp.asarray(np.random.default_rng(1).uniform(size=(13, 2)))
    acq = jes.decoupled_acq(grid, fidelity=0, blackbox_name="obj1", is_constraint=False)
    assert acq.shape == (13,)
    assert np.all(np.asarray(acq) >= 0.0)  # clamped information gain

    acq_coupled = jes.coupled_acq(grid, fidelity=1)
    assert np.all(np.isfinite(np.asarray(acq_coupled)))

    x_next, fid_next = jes.get_nextpoint_coupled(iteration=0, verbose=True)
    assert x_next.shape == (2,)
    assert 0 <= fid_next < 2
    assert np.all((np.asarray(x_next) >= 0) & (np.asarray(x_next) <= 1))


def test_warm_start_restores_kernel_state(problem):
    """previously_trained_model restores kernel raw params + acq eps
    (reference mfdgp_hidden_layer.py:122-123, :158-159)."""
    import jax as _jax
    from mobocmf_tpu.models import mfdgp as M

    x, fid, ys, _ = problem
    m1 = M.init_mfdgp(_jax.random.key(0), x, ys[0][:, None], fid, 2)
    # pretend training moved the kernels
    moved = _jax.tree.map(lambda a: a + 0.37, m1.params.layers[0].kernel)
    layers = list(m1.params.layers)
    layers[0] = layers[0]._replace(kernel=moved)
    m1 = m1._replace(params=m1.params._replace(layers=tuple(layers)))

    m2 = M.init_mfdgp(
        _jax.random.key(9), x, ys[1][:, None], fid, 2, previously_trained=m1
    )
    for a, b in zip(
        _jax.tree.leaves(m2.params.layers[0].kernel),
        _jax.tree.leaves(m1.params.layers[0].kernel),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(m2.consts.acq_eps), np.asarray(m1.consts.acq_eps)
    )


def test_bo_loop_one_iteration(tmp_path):
    """Library BO loop: one iteration end-to-end with recommendation scoring
    and file-based resume artifacts."""
    from mobocmf_tpu.bo.loop import Blackbox, BOConfig, run_bo_loop

    def make(shift):
        return [
            lambda xs, s=shift: ((np.atleast_2d(xs)[:, 0] - s) ** 2
                                 + np.atleast_2d(xs)[:, 1] ** 2 + 0.3),
            lambda xs, s=shift: ((np.atleast_2d(xs)[:, 0] - s) ** 2
                                 + np.atleast_2d(xs)[:, 1] ** 2),
        ]

    blackboxes = [
        Blackbox("obj1", make(0.25)),
        Blackbox("obj2", make(0.75)),
        Blackbox("con1", [lambda xs: 0.9 - np.atleast_2d(xs)[:, 1],
                          lambda xs: 0.9 - np.atleast_2d(xs)[:, 1]],
                 is_constraint=True, threshold=0.0),
    ]
    rng = np.random.default_rng(0)
    x_init = rng.uniform(size=(12, 2))
    fid_init = np.concatenate([np.zeros(8), np.ones(4)]).astype(int)
    config = BOConfig(
        num_bo_iterations=1, num_epochs_1=5, num_epochs_2=8,
        opt_grid_size=25, pareto_set_size=6, seed=1,
        log_dir=str(tmp_path), track_recommendation=True,
        recommendation_grid_size=200,
        hv_reference=np.array([10.0, 10.0]),
    )
    state = run_bo_loop(blackboxes, x_init, fid_init, config)
    assert state.x.shape[0] == 13
    assert len(state.hypervolumes) == 1
    assert (tmp_path / "points_evaluated.txt").exists()
    # reference-format logs: hypervolumes.txt = the 6-tuple (toy:616-618),
    # hypervolume_solution.txt = the optimal HV (toy:620-621)
    row = np.loadtxt(tmp_path / "hypervolumes.txt").reshape(-1)
    assert row.shape[0] == 6
    hv_rec, hv_opt, feas, n_inf, n_fini, n_ini = row
    assert hv_opt >= hv_rec >= 0.0
    assert n_ini >= n_fini >= 0 and n_inf == n_ini - n_fini
    assert np.isfinite(hv_opt) and hv_opt > 0
    assert float(np.loadtxt(tmp_path / "hypervolume_solution.txt")) == hv_opt


def test_bo_loop_whitened_end_to_end(tmp_path):
    """BOConfig.whitened threads the whitened inducing parameterization
    (the BASELINE north-star redesign) through the full campaign path:
    training, Pareto sampling, conditioning, acquisition — no NaNs, valid
    candidate (VERDICT r2 item 1)."""
    from mobocmf_tpu.bo.loop import Blackbox, BOConfig, run_bo_loop

    def make(shift):
        return [
            lambda xs, s=shift: ((np.atleast_2d(xs)[:, 0] - s) ** 2
                                 + np.atleast_2d(xs)[:, 1] ** 2 + 0.3),
            lambda xs, s=shift: ((np.atleast_2d(xs)[:, 0] - s) ** 2
                                 + np.atleast_2d(xs)[:, 1] ** 2),
        ]

    blackboxes = [
        Blackbox("obj1", make(0.25)),
        Blackbox("obj2", make(0.75)),
        Blackbox("con1", [lambda xs: 0.9 - np.atleast_2d(xs)[:, 1],
                          lambda xs: 0.9 - np.atleast_2d(xs)[:, 1]],
                 is_constraint=True, threshold=0.0),
    ]
    rng = np.random.default_rng(5)
    x_init = rng.uniform(size=(12, 2))
    fid_init = np.concatenate([np.zeros(8), np.ones(4)]).astype(int)
    config = BOConfig(
        num_bo_iterations=1, num_epochs_1=5, num_epochs_2=8,
        opt_grid_size=25, pareto_set_size=6, seed=1, whitened=True,
        log_dir=str(tmp_path),
    )
    state = run_bo_loop(blackboxes, x_init, fid_init, config)
    assert state.x.shape[0] == 13
    assert np.all(np.isfinite(state.x[-1]))
    assert np.isfinite(state.hypervolumes[-1])


def test_bo_loop_q_batch(tmp_path):
    """q>1: each iteration evaluates q distinct points at one fidelity
    (greedy local-penalization batch, BASELINE config #5), and resume
    counts iterations as points//q."""
    from mobocmf_tpu.bo.loop import Blackbox, BOConfig, run_bo_loop

    def make(shift):
        return [
            lambda xs, s=shift: ((np.atleast_2d(xs)[:, 0] - s) ** 2
                                 + np.atleast_2d(xs)[:, 1] ** 2 + 0.3),
            lambda xs, s=shift: ((np.atleast_2d(xs)[:, 0] - s) ** 2
                                 + np.atleast_2d(xs)[:, 1] ** 2),
        ]

    blackboxes = [
        Blackbox("obj1", make(0.25)),
        Blackbox("obj2", make(0.75)),
    ]
    rng = np.random.default_rng(3)
    x_init = rng.uniform(size=(10, 2))
    fid_init = np.concatenate([np.zeros(7), np.ones(3)]).astype(int)
    config = BOConfig(
        num_bo_iterations=1, num_epochs_1=4, num_epochs_2=6,
        opt_grid_size=20, pareto_set_size=5, seed=2, q=3,
        log_dir=str(tmp_path),
    )
    state = run_bo_loop(blackboxes, x_init, fid_init, config)
    assert state.x.shape[0] == 13  # 10 + q
    new_pts = state.x[-3:]
    # all three batch points at the same fidelity
    assert len(set(state.fidelities[-3:])) == 1
    # batch points are distinct (repulsion term spreads them)
    d01 = np.linalg.norm(new_pts[0] - new_pts[1])
    d02 = np.linalg.norm(new_pts[0] - new_pts[2])
    assert d01 > 1e-3 and d02 > 1e-3

    # resume: 3 evaluated points = 1 iteration at q=3
    config2 = BOConfig(
        num_bo_iterations=2, num_epochs_1=4, num_epochs_2=6,
        opt_grid_size=20, pareto_set_size=5, seed=2, q=3,
        log_dir=str(tmp_path),
    )
    state2 = run_bo_loop(blackboxes, x_init, fid_init, config2)
    assert state2.x.shape[0] == 16  # 10 + 2 iterations x q


def test_bo_loop_random_acquisition_baseline(tmp_path):
    """BOConfig.acquisition='random' drives the reference's Random_choice
    baseline end-to-end: uniform candidates, cost-weighted fidelity, no
    Pareto/conditioning phases, artifacts still written."""
    from mobocmf_tpu.bo.loop import Blackbox, BOConfig, run_bo_loop

    def make(shift):
        return [
            lambda xs, s=shift: ((np.atleast_2d(xs)[:, 0] - s) ** 2
                                 + np.atleast_2d(xs)[:, 1] ** 2 + 0.3),
            lambda xs, s=shift: ((np.atleast_2d(xs)[:, 0] - s) ** 2
                                 + np.atleast_2d(xs)[:, 1] ** 2),
        ]

    blackboxes = [
        Blackbox("obj1", make(0.25)),
        Blackbox("obj2", make(0.75)),
        Blackbox("con1", [lambda xs: 0.9 - np.atleast_2d(xs)[:, 1]] * 2,
                 is_constraint=True, threshold=0.0),
    ]
    rng = np.random.default_rng(3)
    x_init = rng.uniform(size=(12, 2))
    fid_init = np.concatenate([np.zeros(8), np.ones(4)]).astype(int)
    config = BOConfig(
        num_bo_iterations=2, num_epochs_1=5, num_epochs_2=8,
        opt_grid_size=25, pareto_set_size=6, seed=2, acquisition="random",
        log_dir=str(tmp_path), track_recommendation=True, plot_surfaces=True,
        recommendation_grid_size=200, hv_reference=np.array([10.0, 10.0]),
    )
    state = run_bo_loop(blackboxes, x_init, fid_init, config)
    assert state.x.shape[0] == 14
    assert np.all(state.x[-2:] >= 0.0) and np.all(state.x[-2:] <= 1.0)
    # pareto/cond phases skipped -> zero columns in phase_seconds.txt
    rows = np.atleast_2d(np.loadtxt(tmp_path / "phase_seconds.txt"))
    assert np.all(rows[:, 4] == 0.0) and np.all(rows[:, 5] == 0.0)
    # recommendation scoring still ran (model-based, uses the trained fitter)
    assert (tmp_path / "hypervolumes.txt").exists()
    # predictive surfaces are plotted without a conditioned model; only the
    # JES acquisition figure (which needs cond) is skipped
    assert (tmp_path / "plots" / "predictive_iter0.pdf").exists()
    assert not (tmp_path / "plots" / "acquisition_iter0.pdf").exists()


def test_boconfig_validates_acquisition_and_polish():
    """Typos must fail loudly — a silently-ignored acquisition value would
    run the full JESMOC pipeline in a supposed random-baseline arm."""
    import pytest

    from mobocmf_tpu.bo.loop import BOConfig

    with pytest.raises(ValueError, match="acquisition"):
        BOConfig(acquisition="Random")
    with pytest.raises(ValueError, match="polish"):
        BOConfig(polish="slsqp ")
    BOConfig(acquisition="random", polish="none")  # valid combos pass


def test_random_without_consumers_skips_model_training(monkeypatch):
    """acquisition='random' with nothing consuming the models (no
    recommendation/plots/dumps/warm start/checkpoints) must not pay for
    MFDGP construction or training at all."""
    import mobocmf_tpu.bo.loop as bo_loop

    def _boom(*a, **k):
        raise AssertionError("BlackBoxMFDGPFitter constructed in pure random mode")

    monkeypatch.setattr(bo_loop, "BlackBoxMFDGPFitter", _boom)

    def f(xs):
        xs = np.atleast_2d(xs)
        return xs[:, 0] ** 2 + xs[:, 1] ** 2

    blackboxes = [
        bo_loop.Blackbox("obj1", [f, f]),
        bo_loop.Blackbox("obj2", [f, f]),
    ]
    rng = np.random.default_rng(1)
    config = bo_loop.BOConfig(
        num_bo_iterations=2, seed=0, acquisition="random",
        hv_reference=np.array([10.0, 10.0]),
    )
    state = bo_loop.run_bo_loop(
        blackboxes, rng.uniform(size=(6, 2)),
        np.array([0, 0, 0, 0, 1, 1]), config,
    )
    assert state.x.shape[0] == 8


def test_random_checkpoint_store_then_restore(tmp_path, capsys):
    """store_models_in_disk in random mode writes only the unconditioned
    fitter; a later load_models_from_disk run must restore it (not fail on
    the absent 'cond' checkpoint and silently retrain every iteration)."""
    from mobocmf_tpu.bo.loop import Blackbox, BOConfig, run_bo_loop

    def f(xs):
        xs = np.atleast_2d(xs)
        return (xs[:, 0] - 0.3) ** 2 + xs[:, 1] ** 2

    blackboxes = [Blackbox("obj1", [f, f]), Blackbox("obj2", [f, f])]
    rng = np.random.default_rng(2)
    x_init = rng.uniform(size=(8, 2))
    fid_init = np.array([0, 0, 0, 0, 0, 0, 1, 1])
    common = dict(
        num_bo_iterations=2, num_epochs_1=4, num_epochs_2=6,
        opt_grid_size=25, pareto_set_size=6, seed=5, acquisition="random",
        log_dir=str(tmp_path), track_recommendation=True,
        recommendation_grid_size=100, hv_reference=np.array([10.0, 10.0]),
    )
    run_bo_loop(blackboxes, x_init, fid_init,
                BOConfig(store_models_in_disk=True, **common))
    # wipe the txt logs (else the second run resumes past both iterations)
    # but keep models/ so the restore path is exercised
    for p in tmp_path.glob("*.txt"):
        p.unlink()
    capsys.readouterr()
    run_bo_loop(blackboxes, x_init, fid_init,
                BOConfig(load_models_from_disk=True, **common))
    out = capsys.readouterr().out
    assert out.count("restored models from") == 2
    assert "restore failed" not in out
