"""Multi-device sharding helpers.

The reference is single-process CPU (SURVEY.md section 2.2); the TPU-native
scale axes are:
- 'dp'  — data/grid points: ELBO minibatch rows and the MOOP candidate grid
          (the dominant axis: the grid is 1000*d^2 points, moop.py:232);
- 'bb'  — blackboxes: stacked objective+constraint models (EP-analog).

Everything is GSPMD-style: inputs carry NamedShardings, XLA inserts the
collectives (the data-term reduction becomes a psum over 'dp').
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jnp.ndarray


def make_mesh(
    n_devices: Optional[int] = None, bb: int = 1, axis_names=("bb", "dp")
) -> Mesh:
    """Mesh over (bb, dp) with dp = n_devices / bb."""
    n = n_devices or len(jax.devices())
    assert n % bb == 0, f"{n} devices not divisible by bb={bb}"
    devices = mesh_utils.create_device_mesh((bb, n // bb))
    return Mesh(devices, axis_names)


def shard_rows(mesh: Mesh, x: Array, axis: str = "dp") -> Array:
    """Put a (N, ...) array with rows sharded over `axis`, padding N up."""
    n_shards = mesh.shape[axis]
    n = x.shape[0]
    pad = (-n) % n_shards
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def sharded_grid_eval(
    fns: Sequence[Callable[[Array], Array]], grid: Array, mesh: Optional[Mesh]
) -> np.ndarray:
    """Evaluate callables over a large grid, rows sharded across the mesh.

    This is the hot MOOP path (grid of 1000*d^2 points x (num_obj + num_con)
    RFF evaluations). Returns a (len(fns), N) numpy array."""
    n = grid.shape[0]

    def call(f, g):
        eval_jit = getattr(f, "eval_jit", None)
        return eval_jit(g) if eval_jit is not None else jax.jit(f)(g)

    if mesh is None:
        return np.stack([np.asarray(call(f, grid)) for f in fns])
    grid_sh = shard_rows(mesh, jnp.asarray(grid))
    return np.stack([np.asarray(call(f, grid_sh))[:n] for f in fns])


def shard_inducing(mesh: Mesh, params, consts, axis: str = "dp", stacked: bool = True):
    """Inducing-dimension tensor parallelism (SURVEY.md section 2.2 TP row).

    Shards every per-layer quantity that carries the inducing axis m over the
    mesh axis: z_x rows, variational means, and variational Cholesky rows.
    Under GSPMD the Gram construction and the Knm / feature matmuls then run
    sharded over m (XLA inserts the collectives); the m x m Cholesky and
    triangular solves are gathered by XLA (no distributed Cholesky in XLA) —
    worthwhile only at the >= 2048-inducing scale configs where the Gram and
    cross-covariance work dominates.

    `stacked`: params carry a leading blackbox axis (fit.trainer.stack_models).
    Kernel params and noises stay replicated. Returns (params, consts).
    """
    lead = (None,) if stacked else ()

    def put(a, *spec):
        return jax.device_put(a, NamedSharding(mesh, P(*spec)))

    new_layers = []
    for lp in params.layers:
        var = lp.variational._replace(
            mean=put(lp.variational.mean, *lead, axis),
            chol_raw=put(lp.variational.chol_raw, *lead, axis, None),
        )
        new_layers.append(lp._replace(variational=var))
    params = params._replace(layers=tuple(new_layers))
    consts = consts._replace(
        z_x=tuple(put(z, axis, None) for z in consts.z_x)
    )
    return params, consts
