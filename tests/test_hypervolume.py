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


def test_hv_front_cap_guard_700_points():
    # VERDICT r4 weak-5: a 700-point 4-objective front (beyond HV_FRONT_CAP)
    # must be summarized to a max-min subset — bounded runtime, a warning,
    # and a tight LOWER bound on the full front's HV
    import time
    import warnings as _w

    from mobocmf_tpu.util.hypervolume import (
        HV_FRONT_CAP,
        _maxmin_subset,
        _pareto_filter,
        hypervolume_mc,
    )

    rng = np.random.default_rng(2)
    raw = np.abs(rng.normal(size=(2400, 4)))
    cand = 0.9 * raw / np.linalg.norm(raw, axis=1, keepdims=True)
    ref = np.ones(4)
    pts = _pareto_filter(cand, ref)[:700]
    assert pts.shape[0] == 700 > HV_FRONT_CAP

    t0 = time.time()
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        hv = hypervolume(pts, ref)
    elapsed = time.time() - t0
    assert any("HV_FRONT_CAP" in str(c.message) for c in caught)
    # lower bound on the full front, tight: within 2% of the MC estimate of
    # the FULL 700-point front (sphere fronts summarize extremely well)
    hv_full = hypervolume_mc(pts, ref, mc_samples=400_000)
    assert hv <= hv_full * 1.01  # <=: allow MC noise on the upper side
    assert hv >= hv_full * 0.98
    # capped-at-512 WFG idle-host runtime is ~5-8 s; generous for a loaded box
    assert elapsed < 300.0

    # subset machinery: keeps every per-objective extreme, right size, and
    # fronts at-or-under the cap are NOT summarized (exact path unchanged)
    sub = _maxmin_subset(pts, HV_FRONT_CAP)
    assert sub.shape == (HV_FRONT_CAP, 4)
    for j in range(4):
        assert np.min(sub[:, j]) == np.min(pts[:, j])
    small = pts[:50]
    with _w.catch_warnings(record=True) as caught2:
        _w.simplefilter("always")
        hypervolume(small, ref)
    assert not any("HV_FRONT_CAP" in str(c.message) for c in caught2)


def test_hv_duplicate_points():
    pts = np.array([[0.2, 0.2, 0.2], [0.2, 0.2, 0.2], [0.1, 0.5, 0.5]])
    ref = np.ones(3)
    single = hypervolume(np.array([[0.2, 0.2, 0.2], [0.1, 0.5, 0.5]]), ref)
    np.testing.assert_allclose(hypervolume(pts, ref), single, rtol=1e-12)


def test_hv_pair_consistent_capping():
    """hypervolume_pair: gap sides share a basis when the cap triggers.

    Independently capping the two sides of a recommendation gap is unsound —
    the optimal side's summarized lower bound can fall below an exact rec HV
    and the gap goes negative. The pair scorer unions the rec basis into the
    capped optimal basis, so hv_opt >= hv_rec by construction whenever the
    rec points lie in the feasible set the optimal front was drawn from."""
    import warnings as _w

    from mobocmf_tpu.util.hypervolume import (
        HV_FRONT_CAP,
        _pareto_filter,
        hypervolume_pair,
    )

    rng = np.random.default_rng(7)
    raw = np.abs(rng.normal(size=(2400, 4)))
    cand = 0.9 * raw / np.linalg.norm(raw, axis=1, keepdims=True)
    ref = np.ones(4)
    pts = _pareto_filter(cand, ref)[:700]
    assert pts.shape[0] == 700 > HV_FRONT_CAP

    # under the cap: identical to independent exact scoring
    ho, hr = hypervolume_pair(pts[:100], pts[:40], ref)
    assert ho == hypervolume(pts[:100], ref)
    assert hr == hypervolume(pts[:40], ref)

    # over the cap: many rec subsets of the (over-cap) optimal front — the
    # pair gap must never go negative, even when the independently-capped
    # optimal HV would fall below the exact rec HV
    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        for k in (300, 450, 512):
            rec = pts[rng.permutation(700)[:k]]
            ho, hr = hypervolume_pair(pts, rec, ref)
            assert ho >= hr, (k, ho, hr)
            # both bounded below by the independently capped opt score
            assert ho >= hypervolume(pts, ref) - 1e-12
    assert any("optimal front exceeds" in str(c.message) for c in caught)

    # rec side itself over the cap: capped, finite, still consistent
    ho, hr = hypervolume_pair(pts, pts[:600], ref)
    assert ho >= hr > 0.0

    # empty rec side
    ho, hr = hypervolume_pair(pts, np.zeros((0, 4)), ref)
    assert hr == 0.0 and ho > 0.0
