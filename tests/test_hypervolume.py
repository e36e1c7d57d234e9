"""Hypervolume tests against hand-computed values."""

import numpy as np

from mobocmf_tpu.util.hypervolume import hypervolume, hypervolume_2d


def test_hv_2d_single_point():
    assert hypervolume_2d(np.array([[0.0, 0.0]]), np.array([1.0, 1.0])) == 1.0


def test_hv_2d_two_points():
    pts = np.array([[0.0, 0.5], [0.5, 0.0]])
    # union of two rectangles: 1*0.5 + 0.5*1 - 0.5*0.5 = 0.75
    np.testing.assert_allclose(hypervolume_2d(pts, np.array([1.0, 1.0])), 0.75)


def test_hv_dominated_point_ignored():
    pts = np.array([[0.0, 0.0], [0.5, 0.5]])
    np.testing.assert_allclose(hypervolume_2d(pts, np.array([1.0, 1.0])), 1.0)


def test_hv_point_outside_ref_ignored():
    pts = np.array([[2.0, 2.0]])
    assert hypervolume(pts, np.array([1.0, 1.0])) == 0.0


def test_hv_3d_exact():
    pts = np.array([[0.0, 0.0, 0.0]])
    np.testing.assert_allclose(hypervolume(pts, np.array([1.0, 1.0, 1.0])), 1.0)
    pts = np.array([[0.0, 0.0, 0.5], [0.5, 0.5, 0.0]])
    # 1*1*0.5 + 0.5*0.5*1 - 0.5*0.5*0.5 = 0.625
    np.testing.assert_allclose(hypervolume(pts, np.array([1.0, 1.0, 1.0])), 0.625)


def test_hv_wfg_matches_dimension_sweep():
    # two independent exact algorithms must agree to float precision
    from mobocmf_tpu.util.hypervolume import _hv_recursive, _pareto_filter

    rng = np.random.default_rng(0)
    for k in (3, 4, 5):
        pts = rng.uniform(size=(40, k)) * 0.8
        ref = np.ones(k)
        exact_sweep = _hv_recursive(_pareto_filter(pts, ref), ref)
        np.testing.assert_allclose(hypervolume(pts, ref), exact_sweep, rtol=1e-12)


def test_hv_mc_close_to_exact():
    from mobocmf_tpu.util.hypervolume import hypervolume_mc

    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(100, 4)) * 0.8
    ref = np.ones(4)
    hv_mc = hypervolume_mc(pts, ref, mc_samples=400_000)
    np.testing.assert_allclose(hv_mc, hypervolume(pts, ref), rtol=0.05)


def test_hv_large_4objective_front_is_exact_and_fast():
    # a DTLZ2-like 4-objective front larger than the old 64-point exact
    # threshold: previously MC-estimated (noisy), now exact WFG
    import time

    rng = np.random.default_rng(1)
    raw = np.abs(rng.normal(size=(300, 4)))
    pts = 0.9 * raw / np.linalg.norm(raw, axis=1, keepdims=True)  # sphere front
    ref = np.ones(4)
    t0 = time.time()
    hv = hypervolume(pts, ref)
    elapsed = time.time() - t0
    from mobocmf_tpu.util.hypervolume import hypervolume_mc

    np.testing.assert_allclose(hypervolume_mc(pts, ref, mc_samples=400_000), hv, rtol=0.05)
    assert 0.0 < hv < 1.0
    # generous bound: the suite shares a 1-core host with background
    # campaigns (CLAUDE.md); idle-host runtime is a few seconds
    assert elapsed < 300.0


def test_hv_duplicate_points():
    pts = np.array([[0.2, 0.2, 0.2], [0.2, 0.2, 0.2], [0.1, 0.5, 0.5]])
    ref = np.ones(3)
    single = hypervolume(np.array([[0.2, 0.2, 0.2], [0.1, 0.5, 0.5]]), ref)
    np.testing.assert_allclose(hypervolume(pts, ref), single, rtol=1e-12)
