"""Scale benchmarks: ELBO steps/s vs inducing count, Cholesky GFLOP/s.

Covers the BASELINE.json scale configs beyond the reference's reach:
- m in {128, 512, 1024, 2048} inducing points (configs #3/#4 use 512/2048)
- batched Cholesky GFLOP/s (XLA TPU kernel and the Pallas kernel)

Run: python benchmarks/scale_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def bench_elbo_steps(m: int, d: int = 6, steps: int = 50):
    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(m, d)), dtype=jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=m), dtype=jnp.float32)
    fid = jnp.asarray((np.arange(m) % 2))
    model = M.init_mfdgp(jax.random.key(0), x, y[:, None], fid, 2)
    args = (
        model.params, model.consts, model.config, x, y, fid,
        jax.random.key(1), steps, 0.001, "all_free", m,
    )
    out = trainer.train_phase_jit(*args)
    jax.block_until_ready(out)
    # median of 3: a single warm repeat has produced wildly bogus readings
    # (84k steps/s at m=2048) right after a multi-minute compile
    dts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = trainer.train_phase_jit(*args)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    finite = bool(jnp.isfinite(out[1].loss[-1]))
    return steps / float(np.median(dts)), finite


def bench_cholesky(n: int, batch: int = 8, iters: int = 20):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    a = rng.normal(size=(batch, n, n)).astype(np.float32)
    a = a @ np.swapaxes(a, -1, -2) + n * np.eye(n, dtype=np.float32)
    aj = jnp.asarray(a)
    f = jax.jit(jnp.linalg.cholesky)
    f(aj).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(aj)
    r.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return batch * (n**3 / 3) / dt / 1e9


def main():
    import argparse

    import jax

    from mobocmf_tpu.util.cache import enable_compilation_cache

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None, help="also write the JSON here")
    args = ap.parse_args()

    enable_compilation_cache()
    results = {"backend": jax.default_backend()}
    for m in (128, 512, 1024, 2048):
        sps, finite = bench_elbo_steps(m)
        results[f"elbo_steps_per_sec_m{m}"] = round(sps, 2)
        results[f"elbo_finite_m{m}"] = finite
        print(f"m={m}: {sps:.1f} steps/s finite={finite}", file=sys.stderr, flush=True)
    for n in (256, 512, 1024):
        gf = bench_cholesky(n)
        results[f"cholesky_gflops_n{n}_b8"] = round(gf, 1)
        print(f"chol n={n} batch=8: {gf:.0f} GFLOP/s", file=sys.stderr, flush=True)
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
