"""Forrester 1-D 2-fidelity MFDGP fit + JES acquisition demo.

Mirror of /root/reference/examples/example_acquisition_mfdgp_forrester/
example_acquisition_mfdgp_forrester.py: fit an MFDGP to the Forrester pair,
sample a Pareto solution (single objective here — the Pareto "front" is the
minimum), train the conditioned model, pickle-round-trip the fitter and the
acquisition mid-pipeline (reference :116-118, 137-139), and plot both the
UNCONDITIONED and CONDITIONED predictive means/stds with the Pareto sample
marked, plus the per-fidelity JES acquisition (reference :157-417).

Run: python examples/example_acquisition_mfdgp_forrester.py [--fast] [--plot]
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

    # pickle round-trip of the trained fitter mid-pipeline (reference :116-118)
    import tempfile

    from mobocmf_tpu.util.util import read_pickle, save_pickle

    with tempfile.TemporaryDirectory() as tmp:
        save_pickle(tmp, "fitter.pkl", fitter)
        fitter = read_pickle(tmp, "fitter.pkl")
    print("fitter pickle round-trip OK")

    cond = fitter.copy_uncond()
    cond.sample_and_store_pareto_solution()
    cond.num_epochs_2 = epochs[2]
    cond.train_conditioned_mfdgps()

    jes = JESMOC_MFDGP(model=fitter, num_fidelities=num_fidelities, model_cond=cond)
    jes.add_blackbox(0, "obj1", cost_evaluation=1.0)
    jes.add_blackbox(1, "obj1", cost_evaluation=10.0)

    # pickle round-trip of the whole acquisition object (reference :137-139)
    with tempfile.TemporaryDirectory() as tmp:
        save_pickle(tmp, "jesmoc.pkl", jes)
        jes = read_pickle(tmp, "jesmoc.pkl")
    print("jesmoc pickle round-trip OK")

    grid = jnp.linspace(0.0, 1.0, 200)[:, None]
    from mobocmf_tpu.models import mfdgp as M

    model = fitter.get_model("obj1")
    model_c = cond.get_model("obj1")

    def moments(m_, f):
        mu, var = M.predict_for_acquisition_jit(m_.params, m_.consts, m_.config, grid, f)
        return np.asarray(mu) * y_std + y_mean, np.sqrt(np.asarray(var)) * y_std

    acq0 = jes.decoupled_acq(grid, 0, "obj1", is_constraint=False)
    acq1 = jes.decoupled_acq(grid, 1, "obj1", is_constraint=False)
    x_next, f_next = jes.get_nextpoint_coupled(iteration=0, verbose=True)
    print("next evaluation:", np.asarray(x_next), "fidelity", f_next)

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        g = np.asarray(grid).ravel()
        pset = np.asarray(jes.pareto_set).ravel()
        pfront = np.asarray(jes.pareto_front).ravel() * y_std + y_mean
        fig, axes = plt.subplots(3, 1, figsize=(8, 12), sharex=True)
        for ax, f, name, truth, data_x, data_y in [
            (axes[0], 0, "low fidelity", forrester_mf0, x_low, y_low),
            (axes[1], 1, "high fidelity", forrester_mf1, x_high, y_high),
        ]:
            mu_u, sd_u = moments(model, f)
            mu_c, sd_c = moments(model_c, f)
            ax.plot(g, truth(g[:, None]).ravel(), "k--", label="truth")
            ax.plot(g, mu_u, "b", label="unconditioned mean")
            ax.fill_between(g, mu_u - 2 * sd_u, mu_u + 2 * sd_u, alpha=0.2, color="b")
            ax.plot(g, mu_c, "g", label="conditioned mean")
            ax.fill_between(g, mu_c - 2 * sd_c, mu_c + 2 * sd_c, alpha=0.15, color="g")
            ax.plot(data_x.ravel(), data_y, "ko", ms=5, label="data")
            if f == 1:
                ax.plot(pset, pfront, "r*", ms=12, label="pareto sample")
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
