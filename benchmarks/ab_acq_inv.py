"""A/B the explicit-inverse acquisition states (MOBOCMF_ACQ_INV) on TPU.

The flag is read at import (acquisition/jesmoc.py), so each arm runs in its
own process:

    python benchmarks/ab_acq_inv.py                 # exact triangular solves
    MOBOCMF_ACQ_INV=1 python benchmarks/ab_acq_inv.py   # L^{-1} matmuls

Builds the full-settings acquisition workload (4 blackboxes uncond + cond,
m = the 128-row bucket, 2 fidelities) and times the fused all-fidelity
optimizer warm (median of 5). Decide the default from the two medians and
record the result in BASELINE.md / jesmoc.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.acquisition import jesmoc as J
    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.models import mfdgp as M
    from mobocmf_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()
    print(f"backend={jax.default_backend()} ACQ_INV_SOLVES={J.ACQ_INV_SOLVES}",
          file=sys.stderr, flush=True)

    n, d = 128, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(n, d)), dtype=jnp.float32)
    fid = jnp.asarray(rng.integers(0, 2, size=(n,)), dtype=jnp.int32)
    mk = lambda i: M.init_mfdgp(
        jax.random.key(i), x,
        jnp.asarray(rng.normal(size=(n, 1)), dtype=jnp.float32), fid, 2,
    )
    su_p, su_c, cfg = trainer.stack_models([mk(0), mk(1), mk(2), mk(3)])
    sc_p, sc_c, _ = trainer.stack_models([mk(4), mk(5), mk(6), mk(7)])

    def run(key):
        xs, vals = J.optimize_coupled_jes_all_fidelities(
            su_p, su_c, sc_p, sc_c, cfg, key, d, 5, 200, 200
        )
        jax.block_until_ready((xs, vals))
        return xs, vals

    run(jax.random.key(0))  # compile
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        xs, vals = run(jax.random.key(i))
        ts.append(time.perf_counter() - t0)
    print(
        f"fused acq program warm: median {np.median(ts)*1e3:.1f} ms "
        f"(runs: {[round(t*1e3, 1) for t in ts]}), "
        f"values finite={bool(np.isfinite(np.asarray(vals)).all())}"
    )


if __name__ == "__main__":
    main()
