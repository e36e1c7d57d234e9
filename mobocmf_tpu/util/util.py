"""General utilities (parity with /root/reference/mobocmf/util/util.py)."""

from __future__ import annotations

import os
import pickle

import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def create_path(folder: str):
    if not os.path.exists(folder):
        os.makedirs(folder)


def save_pickle(folder: str, filename: str, content):
    create_path(folder)
    with open(os.path.join(folder, filename), "wb") as fw:
        pickle.dump(content, fw)


def read_pickle(folder: str, filename: str):
    with open(os.path.join(folder, filename), "rb") as fr:
        return pickle.load(fr)


def triu_indices(n: int, offset: int = 0):
    return jnp.triu_indices(n, k=offset)


def compute_dist(x: Array) -> Array:
    """Squared distance matrix (reference util.py:32-33)."""
    sq = jnp.sum(x**2, 1, keepdims=True)
    return sq - 2.0 * x @ x.T + sq.T


def preprocess_outputs(*args):
    """Identity standardization (reference util.py:36-51 hard-codes mean 0 /
    std 1 with the note 'do not standardize the outputs. Otherwise linear
    dependencies are broken')."""
    y_mean, y_std = 0.0, 1.0
    y_train = [jnp.asarray((np.asarray(y) - y_mean) / y_std, dtype=jnp.float64) for y in args]
    y_train.extend([y_mean, y_std])
    return y_train[:]


def preprocess_outputs_two_fidelities(y_low, y_high):
    y_mean, y_std = 0.0, 1.0
    return (
        jnp.asarray((np.asarray(y_low) - y_mean) / y_std, dtype=jnp.float64),
        jnp.asarray((np.asarray(y_high) - y_mean) / y_std, dtype=jnp.float64),
        y_mean,
        y_std,
    )


def standardize_outputs(y_low, y_high):
    """The ACTUAL standardization the examples apply locally
    (example_synthetic_2D.py:75-88): shared mean/std across fidelities."""
    stacked = np.vstack([np.asarray(y_high).reshape(-1, 1), np.asarray(y_low).reshape(-1, 1)])
    y_mean, y_std = float(stacked.mean()), float(stacked.std())
    return (
        (np.asarray(y_low) - y_mean) / y_std,
        (np.asarray(y_high) - y_mean) / y_std,
        y_mean,
        y_std,
    )


def reset_random_state(seed: int):
    np.random.seed(seed)
