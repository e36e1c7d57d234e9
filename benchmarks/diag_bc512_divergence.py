"""Diagnose the m=512 phase-2 training divergence (bc512 r5 campaign).

Facts from the campaign log (/tmp/r5_bc512.log): phase-2 neg-ELBO at
iteration 3/4/5 ends at 3.1e6 / 2.0e6 / 2.9e10 (was NaN pre-jitter-floors)
on STANDARDIZED y — so this is optimization instability, not raw output
scale. This script rebuilds the exact iteration-5 fit (x from the evidence
dir + the toy initial draw, ys re-evaluated, same standardization and seed
stream shape) and trains with per-chunk summaries of every parameter group,
to name the coordinate that runs away.

Run CPU-f32 to mimic the TPU dtype: python benchmarks/diag_bc512_divergence.py
(forces jax_platforms=cpu; pass --f64 to compare the f64 landscape).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SEED = 7


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--whitened", action="store_true",
                    help="whitened parameterization: the KL loses its K^-1 "
                    "(the suspected stiffness source at near-duplicate "
                    "inducing rows)")
    ap.add_argument("--whitened-init", default="match",
                    choices=("match", "prior"),
                    help="'match' = exact conversion of the reference init "
                    "(|m_w| ~ 285 at singular K); 'prior' = q(u)=N(0,Kzz)")
    ap.add_argument("--n-init", type=int, default=490)
    ap.add_argument("--epochs1", type=int, default=1000)
    ap.add_argument("--epochs2", type=int, default=4000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--lr2", type=float, default=0.001)
    ap.add_argument(
        "--evidence", default="benchmarks/evidence/branin_currin_512_r5"
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mobocmf_tpu.bo.loop import _standardize
    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.models import mfdgp as M
    from mobocmf_tpu.test_functions import synthetic as S

    # reproduce the campaign's data: initial draw + evaluated points
    x0 = np.random.default_rng(SEED).uniform(size=(args.n_init, 2))
    n_high = args.n_init // 4
    fid0 = np.concatenate(
        [np.zeros(args.n_init - n_high), np.ones(n_high)]
    ).astype(int)
    x_new = np.loadtxt(os.path.join(args.evidence, "points_evaluated.txt"))
    fid_new = np.loadtxt(
        os.path.join(args.evidence, "fidelities_evaluated.txt")
    ).astype(int).reshape(-1)
    x = np.vstack([x0, np.atleast_2d(x_new)])
    fid = np.concatenate([fid0, fid_new])
    fns = {
        "branin": [S.branin_scaled_low, S.branin_scaled],
        "currin": [S.currin_low, S.currin],
        "disk": [S.disk_constraint, S.disk_constraint],
    }
    names = list(fns)
    ys = {}
    for name in names:
        y = np.empty(len(x))
        for f in (0, 1):
            sel = fid == f
            y[sel] = np.asarray(fns[name][f](x[sel])).reshape(-1)
        ys[name], _, _ = _standardize(y)

    dtype = jnp.float64 if args.f64 else jnp.float32
    xj = jnp.asarray(x, dtype=dtype)
    fj = jnp.asarray(fid, dtype=jnp.int32)
    models = [
        M.init_mfdgp(
            jax.random.key(i), xj, jnp.asarray(ys[n_][:, None], dtype=dtype),
            fj, 2, whitened=args.whitened, whitened_init=args.whitened_init,
        )
        for i, n_ in enumerate(names)
    ]
    sp, sc, config = trainer.stack_models(models)
    ys_arr = jnp.stack([jnp.asarray(ys[n_], dtype=dtype) for n_ in names])
    nm = len(names)

    def describe(sp, tag):
        import jax.nn as jnn

        for ell in (0, 1):
            k = sp.layers[ell].kernel
            parts = []
            for kk, vv in k.items():
                if isinstance(vv, dict):
                    for k2, v2 in vv.items():
                        a = jnn.softplus(np.asarray(v2, dtype=np.float64))
                        parts.append(f"{kk}.{k2.replace('raw_', '')}=[{a.min():.3g},{a.max():.3g}]")
                else:
                    a = jnn.softplus(np.asarray(vv, dtype=np.float64))
                    parts.append(f"{kk.replace('raw_', '')}=[{a.min():.3g},{a.max():.3g}]")
            v = sp.layers[ell].variational
            m_ = np.asarray(v.mean)
            c_ = np.asarray(v.chol_raw)
            parts.append(f"|m|max={np.abs(m_).max():.3g} |Ls|max={np.abs(c_).max():.3g}")
            print(f"  {tag} L{ell}: " + " ".join(parts))
        noi = []
        for i in range(nm):
            lo = np.asarray(sc.noise_lower)[i]
            up = np.asarray(sc.noise_upper)[i]
            raw = np.asarray(sp.raw_noises)[i]
            noi.append(lo + (up - lo) / (1 + np.exp(-raw.astype(np.float64))))
        print(f"  {tag} noises={np.array2string(np.asarray(noi), precision=3)}")
        sys.stdout.flush()

    key = jax.random.key(1234)
    describe(sp, "init")
    for phase, (epochs, lr, mk) in enumerate(
        [(args.epochs1, 0.003, "fix_variational_hypers"),
         (args.epochs2, args.lr2, "all_free")]
    ):
        opt_states = None
        done = 0
        while done < epochs:
            sz = min(args.chunk, epochs - done)
            keys = jax.random.split(jax.random.fold_in(key, phase * 1000 + done), nm)
            sp, opt_states, lg = trainer.train_phase_stacked_carry_jit(
                sp, sc, config, xj, ys_arr, fj, keys, sz, lr, mk,
                xj.shape[0], None, None, opt_states,
            )
            done += sz
            loss = np.asarray(lg.loss, dtype=np.float64).sum(0)
            print(f"phase{phase + 1} @{done}: loss first/min/last "
                  f"{loss[0]:.4g}/{loss.min():.4g}/{loss[-1]:.4g}")
            describe(sp, f"p{phase + 1}@{done}")


if __name__ == "__main__":
    main()
