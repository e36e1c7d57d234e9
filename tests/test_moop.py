"""MOOP tests: Pareto cull vs brute force, summary, feasibility, end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.moop.moop import MOOP, pareto_front_mask, summarize_pareto


def brute_force_pareto(pts):
    n = pts.shape[0]
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if np.all(pts[j] <= pts[i]) and np.any(pts[j] < pts[i]):
                keep[i] = False
                break
            if np.all(pts[j] == pts[i]) and j < i:
                keep[i] = False
                break
    return keep


def test_pareto_mask_matches_brute_force():
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(300, 3))
    got = np.asarray(pareto_front_mask(jnp.asarray(pts), jnp.ones(300, dtype=bool)))
    want = brute_force_pareto(pts)
    np.testing.assert_array_equal(got, want)


def test_pareto_mask_with_duplicates_keeps_first():
    pts = np.array([[0.0, 1.0], [0.0, 1.0], [1.0, 0.0], [2.0, 2.0]])
    got = np.asarray(pareto_front_mask(jnp.asarray(pts), jnp.ones(4, dtype=bool)))
    np.testing.assert_array_equal(got, [True, False, True, False])


def test_pareto_mask_respects_validity():
    pts = np.array([[0.0, 0.0], [1.0, 1.0], [2.0, 2.0]])
    valid = jnp.asarray([False, True, True])
    got = np.asarray(pareto_front_mask(jnp.asarray(pts), valid))
    # the dominating point is invalid, so [1,1] is the front
    np.testing.assert_array_equal(got, [False, True, False])


def test_summarize_pareto_seeds_with_objective_minima():
    rng = np.random.default_rng(1)
    front = rng.normal(size=(40, 2))
    pset = rng.uniform(size=(40, 3))
    mask = jnp.ones(40, dtype=bool)
    s_set, s_front, s_mask = summarize_pareto(jnp.asarray(pset), jnp.asarray(front), mask, 10)
    assert s_set.shape == (10, 3) and s_front.shape == (10, 2)
    assert bool(s_mask.all())
    np.testing.assert_allclose(np.asarray(s_front)[0], front[np.argmin(front[:, 0])])
    np.testing.assert_allclose(np.asarray(s_front)[1], front[np.argmin(front[:, 1])])


def test_moop_end_to_end_analytic():
    """Simple analytic 2-obj 1-con problem; known structure."""

    def f1(x):
        return (x[:, 0] - 0.2) ** 2 + x[:, 1] ** 2

    def f2(x):
        return (x[:, 0] - 0.8) ** 2 + x[:, 1] ** 2

    def c1(x):  # feasible iff x1 <= 0.5  (c >= 0)
        return 0.5 - x[:, 1]

    moop = MOOP([f1, f2], [c1], input_dim=2, grid_size=200, pareto_set_size=12,
                feasible_values=np.zeros(1))
    inputs = np.random.default_rng(2).uniform(size=(5, 2))
    res = moop.compute_pareto_solution_from_samples(inputs, jax.random.key(0))
    assert res is not None
    sol, _, _ = res
    ps = np.asarray(sol.pareto_set)[np.asarray(sol.mask)]
    pf = np.asarray(sol.pareto_front)[np.asarray(sol.mask)]
    # pareto set concentrates near the segment x1 in [0.2, 0.8], x2 ~ 0
    assert ps[:, 0].min() > 0.05 and ps[:, 0].max() < 0.95
    assert ps[:, 1].max() < 0.25
    assert np.all(pf[:, 0] >= -1e-9) and np.all(pf[:, 1] >= -1e-9)


def test_moop_infeasible_returns_none_then_fallback():
    def f1(x):
        return x[:, 0]

    def c_bad(x):  # never feasible
        return -1.0 - 0.0 * x[:, 0]

    moop = MOOP([f1], [c_bad], input_dim=1, grid_size=50, pareto_set_size=4,
                feasible_values=np.zeros(1))
    inputs = np.array([[0.5]])
    assert moop.compute_pareto_solution_from_samples(inputs, jax.random.key(0)) is None
    res = moop.compute_pareto_solution_from_samples(
        inputs, jax.random.key(0), allow_negative_constraints=True
    )
    assert res is not None


def test_device_polish_matches_slsqp_quality():
    """The on-device polish must find the constrained optimum like SLSQP."""

    def f1(x):
        return (x[:, 0] - 0.4) ** 2 + (x[:, 1] - 0.6) ** 2

    def c1(x):  # feasible iff x2 <= 0.5
        return 0.5 - x[:, 1]

    inputs = np.random.default_rng(3).uniform(size=(4, 2))
    sols = {}
    for mode in ("slsqp", "device"):
        moop = MOOP([f1], [c1], input_dim=2, grid_size=100, pareto_set_size=4,
                    feasible_values=np.zeros(1), polish=mode)
        res = moop.compute_pareto_solution_from_samples(inputs, jax.random.key(1))
        assert res is not None
        sol, _, _ = res
        front = np.asarray(sol.pareto_front)[np.asarray(sol.mask)]
        sols[mode] = front.min()
    # constrained optimum: x = (0.4, 0.5), f = 0.01
    assert abs(sols["device"] - 0.01) < 2e-3
    assert abs(sols["slsqp"] - 0.01) < 2e-3
