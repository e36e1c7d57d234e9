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


def test_hv_mc_close_to_exact():
    rng = np.random.default_rng(0)
    pts = rng.uniform(size=(100, 4)) * 0.8
    ref = np.ones(4)
    hv_mc = hypervolume(pts, ref, mc_samples=400_000)
    # exact via recursion on the pareto subset (front is small after filtering)
    from mobocmf_tpu.util.hypervolume import _hv_recursive, _pareto_filter

    exact = _hv_recursive(_pareto_filter(pts, ref), ref)
    np.testing.assert_allclose(hv_mc, exact, rtol=0.05)
