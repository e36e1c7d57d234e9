"""Hypervolume indicator (minimization convention).

The reference imports pymoo's HV inside its example
(/root/reference/examples/toy_synthetic_2D_JESMOCMF/toy_synthetic_2D_JESMOCMF.py:533)
solely to score BO progress. pymoo is not available here; we provide an exact
sweep algorithm for 2 objectives (the reference's example dimensionality), an
exact WFG-style recursion for small fronts in any dimension, and a Monte-Carlo
estimator fallback for large high-dimensional fronts.
"""

from __future__ import annotations

import numpy as np


def _pareto_filter(points: np.ndarray, ref: np.ndarray) -> np.ndarray:
    pts = points[np.all(points < ref, axis=1)]
    if pts.shape[0] == 0:
        return pts
    keep = np.ones(pts.shape[0], dtype=bool)
    for i in range(pts.shape[0]):
        if not keep[i]:
            continue
        dominated = np.all(pts <= pts[i], axis=1) & np.any(pts < pts[i], axis=1)
        if dominated.any():
            keep[i] = False
    return pts[keep]


def hypervolume_2d(points: np.ndarray, ref: np.ndarray) -> float:
    """Exact 2-objective hypervolume by sweeping the sorted front."""
    pts = _pareto_filter(np.asarray(points, dtype=float), np.asarray(ref, dtype=float))
    if pts.shape[0] == 0:
        return 0.0
    pts = pts[np.argsort(pts[:, 0])]
    hv = 0.0
    prev_y = ref[1]
    for x, y in pts:
        if y < prev_y:
            hv += (ref[0] - x) * (prev_y - y)
            prev_y = y
    return float(hv)


def _hv_recursive(pts: np.ndarray, ref: np.ndarray) -> float:
    """Exact HV by dimension-sweep recursion (fine for small fronts)."""
    k = pts.shape[1]
    if k == 2:
        return hypervolume_2d(pts, ref)
    order = np.argsort(pts[:, -1])
    pts = pts[order]
    hv = 0.0
    prev = ref[-1]
    for i in range(pts.shape[0] - 1, -1, -1):
        z = pts[i, -1]
        if z >= prev:
            continue
        slab = prev - z
        upper = _hv_recursive(pts[: i + 1, :-1], ref[:-1])
        hv += slab * upper
        prev = z
    return hv


def hypervolume(points: np.ndarray, ref: np.ndarray, mc_samples: int = 200_000, seed: int = 0) -> float:
    """Hypervolume of the region dominated by `points` and bounded by `ref`."""
    points = np.atleast_2d(np.asarray(points, dtype=float))
    ref = np.asarray(ref, dtype=float)
    pts = _pareto_filter(points, ref)
    if pts.shape[0] == 0:
        return 0.0
    k = pts.shape[1]
    if k == 2:
        return hypervolume_2d(pts, ref)
    if pts.shape[0] <= 64 and k <= 5:
        return float(_hv_recursive(pts, ref))
    # Monte-Carlo fallback
    lo = pts.min(axis=0)
    rng = np.random.default_rng(seed)
    u = rng.uniform(size=(mc_samples, k)) * (ref - lo) + lo
    dominated = np.zeros(mc_samples, dtype=bool)
    for p in pts:
        dominated |= np.all(u >= p, axis=1)
    vol_box = float(np.prod(ref - lo))
    return vol_box * float(dominated.mean())
