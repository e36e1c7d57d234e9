"""Constrained multi-objective optimization over sampled functions (MOOP).

Re-design of /root/reference/mobocmf/util/moop.py. The pipeline is identical —
uniform grid + training inputs, feasibility filter, per-objective SLSQP polish,
Pareto cull, min-max summary — but the hot parts (grid evaluation of the RFF
samples, dominance cull, greedy summary) run on device with static shapes and
masks, while the d-dimensional SLSQP polish stays on host (scipy) fed by
jit-compiled values and jax.grad gradients, preserving the reference's
accept/verify/retry logic (moop.py:72-139).

Masking replaces the reference's dynamic filtering: infeasible grid rows keep
their slot with valid=False instead of being removed, which keeps every device
computation statically shaped (jit/pjit friendly).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


class NotFeasiblePoints(ValueError):
    pass


class ParetoSolution(NamedTuple):
    pareto_set: Array  # (P, d)
    pareto_front: Array  # (P, k)
    mask: Array  # (P,) bool — valid rows (padding repeats row 0)
    num_valid: int


# ---------------------------------------------------------------------------
# Device kernels
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("chunk",))
def pareto_front_mask(pts: Array, valid: Array, chunk: int = 128) -> Array:
    """Non-dominated mask among valid rows (minimization).

    Matches the reference cull (moop.py:141-168) including its
    first-of-duplicates tie-break: row i is kept iff no valid j dominates it
    (all <= and any <) and no earlier valid j equals it exactly.
    Chunked O(n^2) dominance — a masked reduction instead of the reference's
    data-dependent loop, so it jits and shards.
    """
    n, k = pts.shape
    big = jnp.asarray(jnp.finfo(pts.dtype).max, dtype=pts.dtype)
    # invalid rows can never dominate: push them to +inf
    pts_dom = jnp.where(valid[:, None], pts, big)
    idx = jnp.arange(n)

    pad = (-n) % chunk
    pts_padded = jnp.concatenate([pts, jnp.full((pad, k), big, dtype=pts.dtype)])
    idx_padded = jnp.concatenate([idx, jnp.full((pad,), n, dtype=idx.dtype)])
    nchunks = (n + pad) // chunk

    def body(_, inp):
        cand, cand_idx = inp  # (chunk, k), (chunk,)
        le = jnp.all(pts_dom[None, :, :] <= cand[:, None, :], axis=-1)  # (chunk, n)
        lt = jnp.any(pts_dom[None, :, :] < cand[:, None, :], axis=-1)
        eq = jnp.all(pts_dom[None, :, :] == cand[:, None, :], axis=-1)
        not_self = idx[None, :] != cand_idx[:, None]
        dominated = jnp.any(le & lt & not_self, axis=1)
        dup_earlier = jnp.any(eq & (idx[None, :] < cand_idx[:, None]), axis=1)
        return None, dominated | dup_earlier

    _, dom = jax.lax.scan(
        body,
        None,
        (
            pts_padded.reshape(nchunks, chunk, k),
            idx_padded.reshape(nchunks, chunk),
        ),
    )
    dom = dom.reshape(-1)[:n]
    return valid & ~dom


@partial(jax.jit, static_argnames=("size",))
def summarize_pareto(
    pareto_set: Array, pareto_front: Array, mask: Array, size: int
) -> ParetoSolution:
    """Min-max summary in objective space (reference moop.py:187-219).

    Seeds with each objective's argmin, then greedily adds the point farthest
    (in front-space distance) from the chosen set. Runs on the full masked
    arrays; selected indices gather the output. If fewer than `size` valid
    pareto points exist the extras duplicate already-chosen points and are
    flagged invalid in the output mask.
    """
    n, k = pareto_front.shape
    dtype = pareto_front.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype=dtype)
    front_masked = jnp.where(mask[:, None], pareto_front, big)

    d2 = (
        jnp.sum(pareto_front**2, 1, keepdims=True)
        - 2.0 * pareto_front @ pareto_front.T
        + jnp.sum(pareto_front**2, 1, keepdims=True).T
    )
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))

    chosen = jnp.zeros((size,), dtype=jnp.int32)
    chosen_mask = jnp.zeros((n,), dtype=bool)

    def seed_body(i, carry):
        chosen, chosen_mask = carry
        j = jnp.argmin(front_masked[:, i]).astype(jnp.int32)
        chosen = chosen.at[i].set(j)
        chosen_mask = chosen_mask.at[j].set(True)
        return chosen, chosen_mask

    chosen, chosen_mask = jax.lax.fori_loop(0, min(k, size), seed_body, (chosen, chosen_mask))

    def greedy_body(i, carry):
        chosen, chosen_mask = carry
        # min distance from each candidate to the chosen set
        min_d = jnp.min(jnp.where(chosen_mask[:, None], dist, big), axis=0)
        # candidates: valid pareto points not yet chosen
        cand_score = jnp.where(mask & ~chosen_mask, min_d, -1.0)
        j = jnp.argmax(cand_score).astype(jnp.int32)
        chosen = chosen.at[i].set(j)
        chosen_mask = chosen_mask.at[j].set(True)
        return chosen, chosen_mask

    chosen, chosen_mask = jax.lax.fori_loop(min(k, size), size, greedy_body, (chosen, chosen_mask))

    num_valid_total = jnp.sum(mask)
    out_valid = jnp.arange(size) < jnp.minimum(num_valid_total, size)
    return (
        pareto_set[chosen],
        pareto_front[chosen],
        out_valid,
    )


# ---------------------------------------------------------------------------
# MOOP driver
# ---------------------------------------------------------------------------


class MOOP:
    """Constrained MOO over sampled functions on [0,1]^d.

    samples_objs / samples_cons: JAX-traceable callables f(x: (N,d)) -> (N,)
    (e.g. partial(rff.eval_sample, sample)). `grid_size` and
    `feasible_values` follow the reference's conventions (the fitter passes
    grid_size = opt_grid_size * d and feasible_values = -thresholds,
    blackbox_mfdgp_fitter.py:197-202).
    """

    def __init__(
        self,
        samples_objs: Sequence[Callable],
        samples_cons: Sequence[Callable],
        input_dim: int,
        grid_size: int = 1000,
        pareto_set_size: Optional[int] = None,
        feasible_values=0.0,
        min_distance_between_points: float = 1e-6,
        use_slsqp_polish: bool = True,
        mesh=None,
    ):
        self.samples_objs = list(samples_objs)
        self.samples_cons = list(samples_cons)
        self.input_dim = input_dim
        self.grid_size = grid_size
        self.pareto_set_size = pareto_set_size
        self.min_distance_between_points = min_distance_between_points
        if not isinstance(feasible_values, np.ndarray):
            feasible_values = np.ones(max(len(self.samples_cons), 1)) * feasible_values
        self.feasible_values = np.asarray(feasible_values, dtype=float)
        self.use_slsqp_polish = use_slsqp_polish
        self.mesh = mesh  # optional jax.sharding.Mesh: shards grid evals over 'dp'

        # jitted evaluators (+ scalar grads for the polish step)
        self._objs_jit = [jax.jit(f) for f in self.samples_objs]
        self._cons_jit = [jax.jit(f) for f in self.samples_cons]
        self._obj_grads = [
            jax.jit(jax.grad(lambda x, f=f: f(x[None, :])[0])) for f in self.samples_objs
        ]
        self._con_grads = [
            jax.jit(jax.grad(lambda x, f=f: f(x[None, :])[0])) for f in self.samples_cons
        ]

    # -- feasibility ---------------------------------------------------------

    def _feasible_mask(self, cons_evals: np.ndarray, allow_negative: bool):
        """Reference find_feasible_grid (moop.py:38-70), mask-based."""
        feas = np.all(cons_evals >= self.feasible_values[:, None], axis=0)
        if feas.any():
            return feas
        if not allow_negative:
            return None
        viol = np.minimum(cons_evals - self.feasible_values[:, None], 0.0).sum(axis=0)
        nz = viol != 0
        if not nz.any():  # everything exactly on the boundary — all feasible
            return np.ones_like(feas)
        return viol == viol[nz].max()

    # -- SLSQP polish ---------------------------------------------------------

    def optimize_obj_globally(
        self, obj_idx: int, obj_evals: np.ndarray, feasible_mask: np.ndarray,
        grid: np.ndarray, constraint_tol: float = 1e-6,
    ) -> Optional[np.ndarray]:
        """Reference moop.py:72-139: SLSQP from the best feasible grid point,
        verify improvement + feasibility, retry once with tolerance."""
        import scipy.optimize as spo

        masked = np.where(feasible_mask, obj_evals, np.inf)
        best_idx = int(np.argmin(masked))
        best_val = float(masked[best_idx])
        x0 = grid[best_idx].copy()

        f = lambda x: float(self._objs_jit[obj_idx](jnp.asarray(x)[None, :])[0])
        f_prime = lambda x: np.asarray(self._obj_grads[obj_idx](jnp.asarray(x)), dtype=float)

        def make_g(tol):
            def g(x):
                xj = jnp.asarray(x)[None, :]
                return np.array(
                    [
                        float(cf(xj)[0]) - tol - fv
                        for cf, fv in zip(self._cons_jit, self.feasible_values)
                    ]
                )
            return g

        def g_prime(x):
            xj = jnp.asarray(x)
            return np.stack([np.asarray(cg(xj), dtype=float) for cg in self._con_grads])

        bounds = [(0.0, 1.0)] * self.input_dim
        for tol, accept_tol in ((0.0, 0.0), (constraint_tol, constraint_tol)):
            g = make_g(tol)
            try:
                opt_x = spo.fmin_slsqp(
                    f, x0.copy(), bounds=bounds, disp=0, fprime=f_prime,
                    f_ieqcons=g, fprime_ieqcons=g_prime,
                )
            except Exception:
                return None
            opt_x = np.clip(np.asarray(opt_x, dtype=float), 0.0, 1.0)
            if f(opt_x) < best_val and np.all(make_g(0.0)(opt_x) >= -accept_tol):
                return opt_x[None]
        return None

    # -- main entry ------------------------------------------------------------

    def compute_pareto_solution_from_samples(
        self, inputs, key: jax.Array, allow_negative_constraints: bool = False
    ):
        """Reference moop.py:221-286; returns (pareto_set, pareto_front, mask,
        samples_objs, samples_cons) or None when infeasible."""
        inputs = np.asarray(inputs, dtype=float)
        key_grid, _ = jax.random.split(key)
        rand = np.asarray(
            jax.random.uniform(
                key_grid, (self.input_dim * self.grid_size, self.input_dim)
            ),
            dtype=float,
        )
        grid = np.concatenate([rand, inputs], axis=0)
        grid_j = jnp.asarray(grid)

        from mobocmf_tpu.parallel.sharding import sharded_grid_eval

        cons_evals = (
            sharded_grid_eval(self.samples_cons, grid_j, self.mesh)
            if self._cons_jit
            else np.zeros((0, grid.shape[0]))
        )
        feasible = self._feasible_mask(cons_evals, allow_negative_constraints)
        if feasible is None:
            return None

        obj_evals = sharded_grid_eval(self.samples_objs, grid_j, self.mesh)

        # per-objective polish; append accepted optima to the grid
        if self.use_slsqp_polish:
            new_pts: List[np.ndarray] = []
            for i in range(len(self._objs_jit)):
                opt_x = self.optimize_obj_globally(i, obj_evals[i], feasible, grid)
                if opt_x is not None:
                    d = np.sqrt(((grid - opt_x) ** 2).sum(axis=1)).min()
                    if d > self.min_distance_between_points:
                        new_pts.append(opt_x)
            if new_pts:
                extra = np.concatenate(new_pts, axis=0)
                extra_j = jnp.asarray(extra)
                grid = np.concatenate([grid, extra], axis=0)
                grid_j = jnp.asarray(grid)
                obj_evals = np.concatenate(
                    [obj_evals, np.stack([np.asarray(of(extra_j)) for of in self._objs_jit])],
                    axis=1,
                )
                feasible = np.concatenate([feasible, np.ones(extra.shape[0], dtype=bool)])

        pts = jnp.asarray(obj_evals.T)
        mask = pareto_front_mask(pts, jnp.asarray(feasible))

        if self.pareto_set_size is not None:
            pset, pfront, out_mask = summarize_pareto(
                grid_j, pts, mask, self.pareto_set_size
            )
            num_valid = int(jnp.sum(out_mask))
        else:
            # dense output: compact on host (host-level API, not jitted)
            sel = np.asarray(mask)
            pset, pfront = grid_j[sel], pts[sel]
            out_mask = jnp.ones((int(sel.sum()),), dtype=bool)
            num_valid = int(sel.sum())

        solution = ParetoSolution(
            pareto_set=pset, pareto_front=pfront, mask=out_mask, num_valid=num_valid
        )
        return solution, self.samples_objs, self.samples_cons

    # -- classmethod parity helper --------------------------------------------

    @classmethod
    def compute_pareto_front(cls, pts) -> np.ndarray:
        """Boolean non-dominated mask (reference classmethod, moop.py:141-168)."""
        pts_j = jnp.asarray(np.asarray(pts, dtype=float))
        valid = jnp.ones((pts_j.shape[0],), dtype=bool)
        return np.asarray(pareto_front_mask(pts_j, valid))
