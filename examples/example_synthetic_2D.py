"""Fast 2-D smoke version of the JESMOCMF pipeline.

Mirror of /root/reference/examples/example_synthetic/example_synthetic_2D.py:
fake blackboxes sampled from the MFDGP prior, 2 objectives + 2 constraints,
tiny epoch counts (10/20 unconditioned, 10 conditioned), checkpoint
round-trips of the trained fitters, acquisition evaluation on a 25x25 grid.

Run: python examples/example_synthetic_2D.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.util.cache import enable_compilation_cache
    enable_compilation_cache()
    from mobocmf_tpu.acquisition.jesmoc import JESMOC_MFDGP
    from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
    from mobocmf_tpu.sampling import rff
    from mobocmf_tpu.util import checkpoint
    from mobocmf_tpu.util.profiling import phase_report, phase_timer
    from mobocmf_tpu.util.util import standardize_outputs

    np.random.seed(0)
    num_fidelities = 2
    n_low, n_high = 10, 5
    num_epochs_1, num_epochs_2, num_epochs_cond = 10, 20, 10

    keys = jax.random.split(jax.random.key(0), 4)
    samples = [rff.sample_prior(k, 2, 2) for k in keys]

    x_low = np.random.uniform(size=(n_low, 2))
    x_high = np.random.uniform(size=(n_high, 2))
    x = jnp.asarray(np.vstack([x_high, x_low]))
    fid = jnp.asarray(np.concatenate([np.ones(n_high), np.zeros(n_low)]).astype(int))

    names = ["obj1", "obj2", "con1", "con2"]
    ys, thresholds = {}, {}
    for name, s in zip(names, samples):
        y_low = np.asarray(rff.eval_sample(s, jnp.asarray(x_low), layer=0))
        y_high = np.asarray(rff.eval_sample(s, jnp.asarray(x_high), layer=1))
        y_low_s, y_high_s, mean, std = standardize_outputs(y_low, y_high)
        ys[name] = jnp.asarray(np.concatenate([y_high_s, y_low_s]))
        thresholds[name] = (0.0 - mean) / std

    fitter = BlackBoxMFDGPFitter(
        num_fidelities, batch_size=x.shape[0],
        num_epochs_1=num_epochs_1, num_epochs_2=num_epochs_2,
        opt_grid_size=50, pareto_set_size=10,
    )
    fitter.initialize_mfdgp(x, ys["obj1"][:, None], fid, "obj1")
    fitter.initialize_mfdgp(x, ys["obj2"][:, None], fid, "obj2")
    fitter.initialize_mfdgp(
        x, ys["con1"][:, None], fid, "con1",
        threshold_constraint=thresholds["con1"], is_constraint=True,
    )
    fitter.initialize_mfdgp(
        x, ys["con2"][:, None], fid, "con2",
        threshold_constraint=thresholds["con2"], is_constraint=True,
    )

    # unconditioned training + checkpoint round trip
    with phase_timer("train_uncond"):
        fitter.train_mfdgps()
    checkpoint.save_fitter("/tmp/mobocmf_tpu_ckpt_uncond", fitter)
    fitter = checkpoint.restore_fitter("/tmp/mobocmf_tpu_ckpt_uncond")
    print("checkpoint round-trip (unconditioned) OK")

    # Pareto sampling + conditioned training
    cond = fitter.copy_uncond()
    with phase_timer("pareto_sampling"):
        solution = cond.sample_and_store_pareto_solution()
    print("pareto points:", solution.num_valid)
    cond.num_epochs_2 = num_epochs_cond
    with phase_timer("train_conditioned"):
        cond.train_conditioned_mfdgps()
    checkpoint.save_fitter("/tmp/mobocmf_tpu_ckpt_cond", cond)
    cond = checkpoint.restore_fitter("/tmp/mobocmf_tpu_ckpt_cond")
    print("checkpoint round-trip (conditioned) OK")

    # acquisition surfaces on a 25x25 grid
    g = np.linspace(0, 1, 25)
    xx, yy = np.meshgrid(g, g)
    grid = jnp.asarray(np.vstack([xx.ravel(), yy.ravel()]).T)

    jes = JESMOC_MFDGP(model=fitter, num_fidelities=num_fidelities, model_cond=cond)
    for f in range(num_fidelities):
        for name in names:
            jes.add_blackbox(f, name, is_constraint=name.startswith("con"))
    for f in range(num_fidelities):
        for name in names:
            acq = jes.decoupled_acq(grid, f, name, is_constraint=name.startswith("con"))
            print(f"acq {name} f={f}: max={float(jnp.max(acq)):.4f}")
        coupled = jes.coupled_acq(grid, f)
        print(f"coupled f={f}: max={float(jnp.max(coupled)):.4f}")

    print("phase report:", phase_report())


if __name__ == "__main__":
    main()
