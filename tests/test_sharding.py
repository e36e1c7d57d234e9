"""Multi-device (8 virtual CPU) sharding tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobocmf_tpu.parallel.sharding import make_mesh, replicate, shard_rows, sharded_grid_eval

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_make_mesh_shapes():
    mesh = make_mesh(8, bb=2)
    assert mesh.shape["bb"] == 2 and mesh.shape["dp"] == 4


def test_shard_rows_pads_and_shards():
    mesh = make_mesh(8, bb=1)
    x = jnp.asarray(np.arange(30, dtype=np.float64).reshape(10, 3))
    xs = shard_rows(mesh, x)
    assert xs.shape[0] % 8 == 0
    np.testing.assert_array_equal(np.asarray(xs)[:10], np.asarray(x))


def test_sharded_grid_eval_matches_unsharded():
    mesh = make_mesh(8, bb=1)
    grid = jnp.asarray(np.random.default_rng(0).uniform(size=(37, 2)))

    fns = [lambda x: jnp.sin(3 * x[:, 0]) + x[:, 1], lambda x: jnp.prod(x, axis=1)]
    got = sharded_grid_eval(fns, grid, mesh)
    want = sharded_grid_eval(fns, grid, None)
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_sharded_moop_matches_unsharded():
    from mobocmf_tpu.moop.moop import MOOP

    mesh = make_mesh(8, bb=1)

    def f1(x):
        return (x[:, 0] - 0.3) ** 2 + x[:, 1] ** 2

    def f2(x):
        return (x[:, 0] - 0.7) ** 2 + x[:, 1] ** 2

    def c1(x):
        return 0.6 - x[:, 1]

    inputs = np.random.default_rng(1).uniform(size=(4, 2))
    kwargs = dict(input_dim=2, grid_size=100, pareto_set_size=8, feasible_values=np.zeros(1))
    sol_m, _, _ = MOOP([f1, f2], [c1], mesh=mesh, **kwargs).compute_pareto_solution_from_samples(
        inputs, jax.random.key(0)
    )
    sol_0, _, _ = MOOP([f1, f2], [c1], **kwargs).compute_pareto_solution_from_samples(
        inputs, jax.random.key(0)
    )
    np.testing.assert_allclose(
        np.asarray(sol_m.pareto_front), np.asarray(sol_0.pareto_front), rtol=1e-10
    )


def test_stacked_training_on_bb_mesh():
    """Stacked blackbox training with params sharded over the 'bb' axis."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.models import mfdgp as M

    mesh = make_mesh(8, bb=2)
    rng = np.random.default_rng(2)
    n, d = 8, 2
    x = jnp.asarray(rng.uniform(size=(n, d)))
    fid = jnp.asarray(np.arange(n) % 2)
    models = [
        M.init_mfdgp(jax.random.key(i), x, jnp.asarray(rng.normal(size=(n, 1))), fid, 2)
        for i in range(2)
    ]
    sp, sc, config = trainer.stack_models(models)
    shard_bb = NamedSharding(mesh, P("bb"))
    sp = jax.tree.map(lambda a: jax.device_put(a, shard_bb), sp)
    ys = jnp.stack([jnp.asarray(rng.normal(size=n)) for _ in range(2)])
    keys = jax.random.split(jax.random.key(3), 2)
    out, logs = trainer.train_phase_stacked_jit(
        sp, sc, config, x, ys, fid, keys, 3, 0.003, "all_free", n
    )
    assert np.all(np.isfinite(np.asarray(logs.loss)))


def test_inducing_dim_tp_matches_replicated():
    """Inducing-dimension TP (SURVEY 2.2 TP row): a stacked training step with
    z/variational state sharded over 'dp' must produce the same loss and
    params as the replicated run. m is divisible by the mesh (256 here; the
    scale configs use 2048 — same program, bigger shapes)."""
    from mobocmf_tpu.fit import trainer
    from mobocmf_tpu.models import mfdgp as M
    from mobocmf_tpu.parallel.sharding import shard_inducing

    mesh = make_mesh(8, bb=1)
    m, d = 256, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(m, d)))
    y0 = jnp.asarray(np.sin(3 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=m))
    y1 = jnp.asarray(np.cos(2 * np.asarray(x)[:, 1]) + 0.1 * rng.normal(size=m))
    fid = jnp.asarray((np.arange(m) % 2))

    models = [
        M.init_mfdgp(jax.random.key(i), x, y[:, None], fid, 2)
        for i, y in enumerate([y0, y1])
    ]
    sp, sc, config = trainer.stack_models(models)
    ys = jnp.stack([y0, y1])
    keys = jax.random.split(jax.random.key(7), 2)
    new_p, logs = trainer.train_phase_stacked_jit(
        sp, sc, config, x, ys, fid, keys, 1, 0.001, "all_free", m
    )
    loss_repl = np.asarray(logs.loss)

    sp_sh, sc_sh = shard_inducing(mesh, sp, sc)
    x_sh = jax.device_put(x, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("dp", None)))
    new_p_sh, logs_sh = trainer.train_phase_stacked_jit(
        sp_sh, sc_sh, config, x_sh, ys, fid, keys, 1, 0.001, "all_free", m
    )
    loss_sh = np.asarray(logs_sh.loss)

    # sharded reductions reorder float ops; differences are O(1e-9) in f64
    np.testing.assert_allclose(loss_sh, loss_repl, rtol=1e-9)
    # post-Adam params: the eps=1e-8 denominator amplifies reduction-order
    # rounding for leaves with near-zero second moments, so the per-param
    # tolerance is looser than the loss one (observed worst case ~5e-5
    # relative at ~1e-3 magnitude with the multi-RHS state solve partitioned
    # over the mesh; bound = 2x that)
    for a, b in zip(jax.tree.leaves(new_p), jax.tree.leaves(new_p_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-8)
