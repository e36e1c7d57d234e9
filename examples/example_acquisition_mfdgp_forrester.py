"""Forrester 1-D 2-fidelity MFDGP fit + JES acquisition demo.

Mirror of /root/reference/examples/example_acquisition_mfdgp_forrester/
example_acquisition_mfdgp_forrester.py: fit an MFDGP to the Forrester pair,
sample a Pareto solution (single objective here — the Pareto "front" is the
minimum), train the conditioned model and plot predictive means/stds and the
per-fidelity JES acquisition.

Run: python examples/example_acquisition_mfdgp_forrester.py [--fast]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--fast", action="store_true", help="tiny epoch counts")
    parser.add_argument("--plot", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from mobocmf_tpu.acquisition.jesmoc import JESMOC_MFDGP
    from mobocmf_tpu.fit.fitter import BlackBoxMFDGPFitter
    from mobocmf_tpu.test_functions.synthetic import forrester_mf0, forrester_mf1
    from mobocmf_tpu.util.util import standardize_outputs

    np.random.seed(0)

    num_fidelities = 2
    n_low, n_high = 12, 6
    x_low = np.random.uniform(size=(n_low, 1))
    x_high = np.random.uniform(size=(n_high, 1))
    y_low = forrester_mf0(x_low).reshape(-1)
    y_high = forrester_mf1(x_high).reshape(-1)
    y_low_s, y_high_s, y_mean, y_std = standardize_outputs(y_low, y_high)

    x = jnp.asarray(np.vstack([x_high, x_low]))
    y = jnp.asarray(np.concatenate([y_high_s, y_low_s]))
    fid = jnp.asarray(np.concatenate([np.ones(n_high), np.zeros(n_low)]).astype(int))

    epochs = (10, 20, 10) if args.fast else (800, 1500, 1500)
    fitter = BlackBoxMFDGPFitter(
        num_fidelities, batch_size=x.shape[0],
        num_epochs_1=epochs[0], num_epochs_2=epochs[1],
        opt_grid_size=100, pareto_set_size=10,
    )
    fitter.initialize_mfdgp(x, y[:, None], fid, "obj1", is_constraint=False)
    fitter.train_mfdgps()

    cond = fitter.copy_uncond()
    cond.sample_and_store_pareto_solution()
    cond.num_epochs_2 = epochs[2]
    cond.train_conditioned_mfdgps()

    jes = JESMOC_MFDGP(model=fitter, num_fidelities=num_fidelities, model_cond=cond)
    jes.add_blackbox(0, "obj1", cost_evaluation=1.0)
    jes.add_blackbox(1, "obj1", cost_evaluation=10.0)

    grid = jnp.linspace(0.0, 1.0, 200)[:, None]
    from mobocmf_tpu.models import mfdgp as M

    model = fitter.get_model("obj1")
    mu0, var0 = M.predict_for_acquisition(model.params, model.consts, model.config, grid, 0)
    mu1, var1 = M.predict_for_acquisition(model.params, model.consts, model.config, grid, 1)
    acq0 = jes.decoupled_acq(grid, 0, "obj1", is_constraint=False)
    acq1 = jes.decoupled_acq(grid, 1, "obj1", is_constraint=False)
    x_next, f_next = jes.get_nextpoint_coupled(iteration=0, verbose=True)
    print("next evaluation:", np.asarray(x_next), "fidelity", f_next)

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        g = np.asarray(grid).ravel()
        fig, axes = plt.subplots(3, 1, figsize=(8, 10), sharex=True)
        for ax, (mu, var, name, truth) in zip(
            axes[:2],
            [
                (mu0, var0, "low fidelity", forrester_mf0),
                (mu1, var1, "high fidelity", forrester_mf1),
            ],
        ):
            m = np.asarray(mu) * y_std + y_mean
            s = np.sqrt(np.asarray(var)) * y_std
            ax.plot(g, truth(g[:, None]).ravel(), "k--", label="truth")
            ax.plot(g, m, "b", label="pred mean")
            ax.fill_between(g, m - 2 * s, m + 2 * s, alpha=0.2)
            ax.set_title(name)
            ax.legend()
        axes[2].plot(g, np.asarray(acq0), label="JES f=0")
        axes[2].plot(g, np.asarray(acq1), label="JES f=1")
        axes[2].axvline(float(x_next[0]), color="r", ls=":")
        axes[2].set_title("acquisition")
        axes[2].legend()
        fig.savefig("forrester_jes.png", dpi=120)
        print("saved forrester_jes.png")


if __name__ == "__main__":
    main()
