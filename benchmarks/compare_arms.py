"""Compare two campaign evidence dirs phase-by-phase and on regret.

Usage: python benchmarks/compare_arms.py DIR_A DIR_B [--warm-after K]

Intended uses (round 4):
- toy2d_whitened_r3 vs toy2d_whitened_r4: TPU wall-clock effect of the
  round-3b step-time work (custom_vmap safe_cholesky 3->1 under vmap,
  LayerState solve hoisting 29->18, full-batch permutation skip) at
  identical config/seed.
- toy2d_whitened_r4 vs toy2d_unwhitened_r3: same-seed whitened/unwhitened
  A/B — wall-clock and recommendation-HV-gap sides.

Phases: columns of phase_seconds.txt (it n setup train pareto cond acq
recommend, written by bo/loop.py). "warm" rows drop the first K iterations
(cold compiles + early bucket boundaries) so medians reflect steady state.
HV gap uses the reference 6-tuple hypervolumes.txt (rec HV, optimal HV, ...;
format of toy_synthetic_2D_JESMOCMF.py:616-618 in the reference).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

PHASES = ("setup", "train", "pareto", "cond", "acq", "recommend")


def warm_rows(m, k, process_starts=None):
    """Steady-state rows of a per-iteration log whose column 0 is the BO
    iteration index.

    Rows are appended across resumes and 86/124 retries, so positional
    slicing is wrong twice over: a resumed arm's file doesn't start at
    iteration 0, and every retry re-introduces cold-compile rows mid-file.
    Filter on the index column instead (idx > k), and drop every iteration
    recorded in process_starts.txt (bo/loop.py appends the first iteration
    of each process — those rows carry fresh-process compiles; a resume at
    exactly prev+1 is indistinguishable from a warm row by index alone).
    For older evidence dirs without the file, fall back to the index
    heuristic: drop the first row after any index discontinuity, including
    a file that starts mid-campaign.
    """
    if m is None or m.shape[0] == 0:
        return m
    idx = m[:, 0]
    keep = idx > k
    if process_starts is not None:
        keep &= ~np.isin(idx, process_starts)
    else:
        prev = np.concatenate([[idx[0] - 1.0], idx[:-1]])
        keep &= idx == prev + 1.0
        if idx[0] != 0:  # file starts mid-campaign -> its first row is cold
            keep[0] = False
    return m[keep]


def load(d):
    out = {"name": os.path.basename(os.path.normpath(d))}
    f = os.path.join(d, "process_starts.txt")
    out["starts"] = (
        np.atleast_1d(np.loadtxt(f)) if os.path.exists(f) else None
    )
    f = os.path.join(d, "phase_seconds.txt")
    out["phase"] = np.atleast_2d(np.loadtxt(f)) if os.path.exists(f) else None
    f = os.path.join(d, "iteration_seconds.txt")
    out["iter"] = np.atleast_2d(np.loadtxt(f)) if os.path.exists(f) else None
    f = os.path.join(d, "hypervolumes.txt")
    if os.path.exists(f) and os.path.getsize(f) > 0:
        m = np.atleast_2d(np.loadtxt(f))
        out["gap_pct"] = 100.0 * (m[:, 1] - m[:, 0]) / np.abs(m[:, 1])
    else:
        out["gap_pct"] = None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dir_a")
    ap.add_argument("dir_b")
    ap.add_argument("--warm-after", type=int, default=5,
                    help="drop the first K iterations from the medians")
    args = ap.parse_args()
    a, b = load(args.dir_a), load(args.dir_b)
    k = args.warm_after

    print(f"A = {a['name']}   B = {b['name']}   (medians over iterations > {k})")
    if a["phase"] is not None and b["phase"] is not None:
        pa = warm_rows(a["phase"], k, a["starts"])
        pb = warm_rows(b["phase"], k, b["starts"])
        if pa.shape[0] == 0 or pb.shape[0] == 0:
            print(f"phase medians skipped: too few warm iterations "
                  f"(A n={pa.shape[0]}, B n={pb.shape[0]} after --warm-after {k})")
        else:
            print(f"\n{'phase':>18} {'A med s':>9} {'B med s':>9} {'B/A':>6}")
            for j, name in enumerate(PHASES):
                ma, mb = np.median(pa[:, 2 + j]), np.median(pb[:, 2 + j])
                print(f"{name:>18} {ma:9.2f} {mb:9.2f} "
                      f"{mb / ma if ma else float('nan'):6.2f}")
            # recommend (last column) is evidence-tracking overhead excluded
            # from iteration_seconds.txt wall-clock; print both views so they
            # can't be conflated with the headline iteration timing
            ta, tb = np.median(pa[:, 2:-1].sum(1)), np.median(pb[:, 2:-1].sum(1))
            print(f"{'TOTAL (BO phases)':>18} {ta:9.2f} {tb:9.2f} {tb / ta:6.2f}")
            ta, tb = np.median(pa[:, 2:].sum(1)), np.median(pb[:, 2:].sum(1))
            print(f"{'TOTAL (+recommend)':>18} {ta:9.2f} {tb:9.2f} {tb / ta:6.2f}")
    for r, tag in ((a, "A"), (b, "B")):
        if r["iter"] is not None:
            w = warm_rows(r["iter"], k, r["starts"])
            if w.shape[0] == 0:
                print(f"iter wall-clock {tag}: too few warm iterations "
                      f"(n={r['iter'].shape[0]} <= --warm-after {k})")
                continue
            print(f"iter wall-clock {tag}: median {np.median(w[:, 2]):.1f}s  "
                  f"p90 {np.percentile(w[:, 2], 90):.1f}s  n_iters {len(r['iter'])}")
    for r, tag in ((a, "A"), (b, "B")):
        if r["gap_pct"] is not None:
            g = r["gap_pct"]
            print(f"rec-HV gap {tag}: last-5 mean {np.mean(g[-5:]):.3f}%  "
                  f"min {np.min(g):.3f}%  final {g[-1]:.3f}%")


if __name__ == "__main__":
    main()
