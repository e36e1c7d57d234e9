"""Probe the BO-iteration setup phase: where do the seconds go?

Times, on the ambient backend (TPU under the driver):
  1. bare tunnel dispatch latency (tiny eager op, median of 20)
  2. init_mfdgp per model (CPU-backend math + one device_put ship-out)
  3. the device_put ship-out alone (re-put of a finished model)
  4. fitter construction + initialize_mfdgp x4 (the loop's 'setup' phase)

Run on an IDLE box; any concurrent load on the 1-core host inflates all rows.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
    from mobocmf_tpu.models import mfdgp as M

    rng = np.random.default_rng(0)
    n, d = 24, 2
    x = jnp.asarray(rng.uniform(size=(n, d)), dtype=jnp.float32)
    y = jnp.asarray(rng.normal(size=(n, 1)), dtype=jnp.float32)
    fid = jnp.asarray((np.arange(n) % 2))

    # 1. dispatch latency
    a = jnp.ones((8,))
    jax.block_until_ready(a + 1)
    ts = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(a + 1)
        ts.append(time.perf_counter() - t0)
    print(f"eager dispatch latency: median {np.median(ts)*1e3:.1f} ms")

    # 2. init_mfdgp
    for trial in range(3):
        t0 = time.perf_counter()
        model = M.init_mfdgp(jax.random.key(trial), x, y, fid, 2)
        jax.block_until_ready(model.params)
        print(f"init_mfdgp (trial {trial}): {time.perf_counter()-t0:.3f} s")

    # 3. ship-out alone
    dev = jax.devices()[0]
    host_params = jax.device_get(model.params)
    nleaves = len(jax.tree.leaves(model.params))
    for trial in range(3):
        t0 = time.perf_counter()
        out = jax.device_put(host_params, dev)
        jax.block_until_ready(out)
        print(
            f"device_put params ({nleaves} leaves, trial {trial}): "
            f"{time.perf_counter()-t0:.3f} s"
        )

    # 4. full setup phase
    for trial in range(2):
        t0 = time.perf_counter()
        fitter = BlackBoxMFDGPFitter(2, batch_size=n, pad_data=True, seed=trial)
        for i in range(4):
            fitter.initialize_mfdgp(
                x, y, fid, f"bb{i}", threshold_constraint=0.0,
                is_constraint=(i >= 2),
            )
        print(f"setup (fitter + 4x initialize_mfdgp, trial {trial}): "
              f"{time.perf_counter()-t0:.3f} s")


if __name__ == "__main__":
    main()
