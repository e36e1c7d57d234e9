"""Plot campaign evidence dirs: HV trajectories + per-phase timings.

Usage: python benchmarks/plot_evidence.py DIR [DIR ...] [--out OUT.png]

Each DIR is a BO-loop log dir (observed_hypervolumes.txt, phase_seconds.txt,
iteration_seconds.txt, optionally hypervolumes.txt with the reference 6-tuple
rows). Produces a 3-panel PNG: observed HV, recommendation-HV gap to optimal
(when tracked), and iteration wall-clock with the per-phase stack.
"""

from __future__ import annotations

import argparse
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

PHASES = ("setup", "train", "pareto", "cond", "acq", "recommend")


def load(d):
    out = {"name": os.path.basename(os.path.normpath(d))}
    f = os.path.join(d, "observed_hypervolumes.txt")
    out["observed"] = np.atleast_1d(np.loadtxt(f)) if os.path.exists(f) else None
    f = os.path.join(d, "hypervolumes.txt")
    if os.path.exists(f) and os.path.getsize(f) > 0:
        m = np.atleast_2d(np.loadtxt(f))
        out["rec_hv"], out["opt_hv"] = m[:, 0], m[:, 1]
    else:
        out["rec_hv"] = out["opt_hv"] = None
    f = os.path.join(d, "iteration_seconds.txt")
    out["iter_s"] = np.atleast_2d(np.loadtxt(f)) if os.path.exists(f) else None
    f = os.path.join(d, "phase_seconds.txt")
    out["phase_s"] = np.atleast_2d(np.loadtxt(f)) if os.path.exists(f) else None
    f = os.path.join(d, "setup_breakdown.txt")
    # columns: it n fetch host ship other (bo/loop.py setup attribution)
    out["setup_b"] = np.atleast_2d(np.loadtxt(f)) if os.path.exists(f) else None
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dirs", nargs="+")
    ap.add_argument("--out", default="evidence.png")
    args = ap.parse_args()

    runs = [load(d) for d in args.dirs]
    fig, axes = plt.subplots(1, 3, figsize=(15, 4.2))

    ax = axes[0]
    for r in runs:
        if r["observed"] is not None:
            ax.plot(r["observed"], label=r["name"])
    ax.set_title("observed HV (feasible top-fidelity evals)")
    ax.set_xlabel("BO iteration")
    ax.legend(fontsize=7)

    ax = axes[1]
    for r in runs:
        if r["rec_hv"] is not None:
            gap = 100.0 * (r["opt_hv"] - r["rec_hv"]) / np.abs(r["opt_hv"])
            ax.plot(gap, label=r["name"])
    ax.set_yscale("log")
    ax.set_title("recommendation HV gap to optimal (%)")
    ax.set_xlabel("BO iteration")
    ax.legend(fontsize=7)

    ax = axes[2]
    for r in runs:
        if r["iter_s"] is not None:
            ax.plot(r["iter_s"][:, 1], r["iter_s"][:, 2], ".-", label=r["name"])
    ax.set_title("iteration wall-clock vs n")
    ax.set_xlabel("n (training rows)")
    ax.set_ylabel("seconds")
    ax.legend(fontsize=7)

    fig.tight_layout()
    fig.savefig(args.out, dpi=130)
    print(f"wrote {args.out}")

    # optional second figure: setup-phase attribution (fetch/host/ship/other)
    with_b = [r for r in runs if r.get("setup_b") is not None]
    if with_b:
        fig2, axs = plt.subplots(1, len(with_b), figsize=(5 * len(with_b), 4), squeeze=False)
        labels = ("warm-start fetch", "host init", "ship-out", "other")
        for ax, r in zip(axs[0], with_b):
            b = r["setup_b"]
            bottom = np.zeros(b.shape[0])
            for j, lab in enumerate(labels):
                ax.bar(b[:, 0], b[:, 2 + j], bottom=bottom, label=lab, width=1.0)
                bottom += b[:, 2 + j]
            ax.set_title(f"setup breakdown — {r['name']}", fontsize=9)
            ax.set_xlabel("BO iteration")
            ax.set_ylabel("seconds")
            ax.legend(fontsize=7)
        out2 = os.path.splitext(args.out)[0] + "_setup.png"
        fig2.tight_layout()
        fig2.savefig(out2, dpi=130)
        print(f"wrote {out2}")


if __name__ == "__main__":
    main()
