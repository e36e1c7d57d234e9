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

from functools import partial
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

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
) -> Tuple[Array, Array, Array]:
    """Min-max summary in objective space (reference moop.py:187-219).

    Returns ``(chosen_set (size, d), chosen_front (size, k), valid (size,))``
    — a plain tuple, not a :class:`ParetoSolution` (no ``num_valid`` scalar;
    this runs under ``jit`` where that count is a traced value).

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

    # Distances are computed candidate-to-CHOSEN only: (n, size) memory, not
    # the (n, n) matrix a 1000*d^2-point grid at d=10 turns into 40 GB.
    chosen = jnp.zeros((size,), dtype=jnp.int32)
    chosen_front = jnp.zeros((size, k), dtype=dtype)
    chosen_mask = jnp.zeros((n,), dtype=bool)

    def seed_body(i, carry):
        chosen, chosen_front, chosen_mask = carry
        j = jnp.argmin(front_masked[:, i]).astype(jnp.int32)
        chosen = chosen.at[i].set(j)
        chosen_front = chosen_front.at[i].set(pareto_front[j])
        chosen_mask = chosen_mask.at[j].set(True)
        return chosen, chosen_front, chosen_mask

    carry = jax.lax.fori_loop(
        0, min(k, size), seed_body, (chosen, chosen_front, chosen_mask)
    )

    sq_front = jnp.sum(pareto_front**2, 1, keepdims=True)  # (n, 1)

    def greedy_body(i, carry):
        chosen, chosen_front, chosen_mask = carry
        # squared distance candidate -> each chosen slot (expansion trick on
        # the MXU; HIGHEST precision so f32 cancellation cannot reorder the
        # greedy selection)
        d2 = (
            sq_front
            - 2.0
            * jnp.matmul(
                pareto_front, chosen_front.T, precision=jax.lax.Precision.HIGHEST
            )
            + jnp.sum(chosen_front**2, 1)[None, :]
        )  # (n, size)
        slot_valid = jnp.arange(size)[None, :] < i
        min_d = jnp.min(jnp.where(slot_valid, jnp.maximum(d2, 0.0), big), axis=1)
        # candidates: valid pareto points not yet chosen
        cand_score = jnp.where(mask & ~chosen_mask, min_d, -1.0)
        j = jnp.argmax(cand_score).astype(jnp.int32)
        chosen = chosen.at[i].set(j)
        chosen_front = chosen_front.at[i].set(pareto_front[j])
        chosen_mask = chosen_mask.at[j].set(True)
        return chosen, chosen_front, chosen_mask

    chosen, chosen_front, chosen_mask = jax.lax.fori_loop(
        min(k, size), size, greedy_body, carry
    )

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


class SampledFunction:
    """A function sample as (eval_fn, pytree) so jit caches survive resampling.

    `fn(tree, x)` must be a module-level JAX-traceable function; `tree` is the
    sample pytree. Closures (functools.partial over a fresh pytree) defeat
    jit's cache — every Pareto resampling retry would recompile everything.
    """

    _EVAL_CACHE: dict = {}
    _VG_CACHE: dict = {}

    def __init__(self, fn, tree):
        self.fn = fn
        self.tree = tree

    def __call__(self, x):
        return self.fn(self.tree, x)

    def eval_jit(self, x):
        if self.fn not in SampledFunction._EVAL_CACHE:
            SampledFunction._EVAL_CACHE[self.fn] = jax.jit(self.fn)
        return SampledFunction._EVAL_CACHE[self.fn](self.tree, x)

    def value_and_grad(self, x):
        if self.fn not in SampledFunction._VG_CACHE:
            fn = self.fn
            SampledFunction._VG_CACHE[self.fn] = jax.jit(
                jax.value_and_grad(lambda tree, xx: fn(tree, xx[None, :])[0], argnums=1)
            )
        return SampledFunction._VG_CACHE[self.fn](self.tree, x)


_SLSQP_FUSED_CACHE: dict = {}
_DEVICE_POLISH_CACHE: dict = {}


def _device_polish_factory(obj_fn, con_fns, input_dim: int, iters: int = 100):
    """On-device constrained polish: multi-start projected Adam on a penalty
    objective, with the reference's verify-improvement-and-feasibility accept
    logic folded into the same program (moop.py:72-139 semantics, no host
    SLSQP roundtrips). Cached per (obj_fn, con_fns) identity."""
    import optax

    def polish(obj_tree, con_trees, x0, best_val, feasible_values):
        # x0: (R, d) starts; returns (x_best (d,), improved&feasible flag)
        mu_pen = 1e6  # equilibrium violation ~ |grad|/(2 mu) << the 1e-6 accept tol

        def obj_at(x):
            return obj_fn(obj_tree, x[None, :])[0]

        def cons_at(x):
            if not con_fns:
                return jnp.zeros((0,), dtype=x.dtype)
            return jnp.stack(
                [f(t, x[None, :])[0] for f, t in zip(con_fns, con_trees)]
            )

        def loss(z):
            x = jax.nn.sigmoid(z)
            viol = jnp.maximum(feasible_values - cons_at(x), 0.0)
            return obj_at(x) + mu_pen * jnp.sum(viol**2)

        solver = optax.lbfgs()
        value_and_grad = optax.value_and_grad_from_state(loss)

        def run_one(x0_i):
            z0 = jnp.log(jnp.clip(x0_i, 1e-6, 1 - 1e-6)) - jnp.log1p(
                -jnp.clip(x0_i, 1e-6, 1 - 1e-6)
            )

            def step(carry, _):
                z, s = carry
                value, grad = value_and_grad(z, state=s)
                updates, s = solver.update(
                    grad, s, z, value=value, grad=grad, value_fn=loss
                )
                return (optax.apply_updates(z, updates), s), None

            (z, _), _ = jax.lax.scan(step, (z0, solver.init(z0)), None, length=iters)
            x = jnp.clip(jax.nn.sigmoid(z), 0.0, 1.0)
            val = obj_at(x)
            feas = jnp.all(cons_at(x) - feasible_values >= -1e-6)
            return x, val, feas

        xs, vals, feass = jax.vmap(run_one)(x0)
        score = jnp.where(feass, vals, jnp.inf)
        best = jnp.argmin(score)
        improved = (score[best] < best_val) & feass[best]
        return xs[best], improved

    return jax.jit(polish)


def _slsqp_fused_eval(obj, cons: Sequence, x, input_dim: int):
    """(obj value, obj grad, cons values, cons jacobian) for a single point in
    ONE cached jitted call returning ONE flat buffer. Host SLSQP makes many
    tiny calls; per-dispatch latency is small (~0.1 ms) but python+dispatch
    overhead and device->host transfers add up on the 1-core host, so
    f / f' / g / g' share a single dispatch and a single transfer."""
    key = (obj.fn, tuple(c.fn for c in cons))
    if key not in _SLSQP_FUSED_CACHE:
        obj_fn, con_fns = key

        def fused(obj_tree, con_trees, xx):
            def ov(xv):
                return obj_fn(obj_tree, xv[None, :])[0]

            def cv(xv):
                if not con_fns:
                    return jnp.zeros((0,), dtype=xv.dtype)
                return jnp.stack(
                    [f(t, xv[None, :])[0] for f, t in zip(con_fns, con_trees)]
                )

            v, g = jax.value_and_grad(ov)(xx)
            cvals = cv(xx)
            cjac = jax.jacfwd(cv)(xx)
            return jnp.concatenate(
                [v[None], g, cvals, cjac.reshape(-1)]
            )

        _SLSQP_FUSED_CACHE[key] = jax.jit(fused)
    flat = np.asarray(
        _SLSQP_FUSED_CACHE[key](obj.tree, tuple(c.tree for c in cons), x),
        dtype=float,
    )
    d, k = input_dim, len(cons)
    return (
        float(flat[0]),
        flat[1 : 1 + d],
        flat[1 + d : 1 + d + k],
        flat[1 + d + k :].reshape(k, d),
    )


class MOOP:
    """Constrained MOO over sampled functions on [0,1]^d.

    samples_objs / samples_cons: either `SampledFunction`s (preferred — jit
    caches survive resampling) or plain JAX-traceable callables
    f(x: (N,d)) -> (N,). `grid_size` and `feasible_values` follow the
    reference's conventions (the fitter passes grid_size = opt_grid_size * d
    and feasible_values = -thresholds, blackbox_mfdgp_fitter.py:197-202).
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
        polish: str = "slsqp",  # "slsqp" (reference semantics) | "device" | "none"
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
        self.polish = polish if use_slsqp_polish else "none"
        self.mesh = mesh  # optional jax.sharding.Mesh: shards grid evals over 'dp'

        # plain callables get wrapped so everything downstream sees the
        # SampledFunction interface (jit caches shared across MOOP instances)
        def wrap(f):
            if isinstance(f, SampledFunction):
                return f
            return SampledFunction(lambda _tree, x, f=f: f(x), None)

        self._objs = [wrap(f) for f in self.samples_objs]
        self._cons = [wrap(f) for f in self.samples_cons]

    # -- feasibility ---------------------------------------------------------

    def _feasible_mask(
        self, cons_evals: np.ndarray, allow_negative: bool, valid=None
    ):
        """Reference find_feasible_grid (moop.py:38-70), mask-based. `valid`
        excludes padded grid slots (bucketed shapes) from every branch."""
        if valid is None:
            valid = np.ones(cons_evals.shape[-1], dtype=bool)
        feas = np.all(cons_evals >= self.feasible_values[:, None], axis=0) & valid
        if feas.any():
            return feas
        if not allow_negative:
            return None
        viol = np.minimum(cons_evals - self.feasible_values[:, None], 0.0).sum(axis=0)
        nz = (viol != 0) & valid
        if not nz.any():  # everything exactly on the boundary — all feasible
            return valid.copy()
        return (viol == viol[nz].max()) & valid

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

        obj = self._objs[obj_idx]
        cache = {}

        def at(x):
            key = x.tobytes()
            if key not in cache:
                cache[key] = _slsqp_fused_eval(
                    obj, self._cons, jnp.asarray(x), self.input_dim
                )
            return cache[key]

        def f(x):
            return at(x)[0]

        def f_prime(x):
            return at(x)[1]

        def make_g(tol):
            def g(x):
                return at(x)[2] - tol - self.feasible_values
            return g

        def g_prime(x):
            return at(x)[3]

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

    def optimize_obj_globally_device(
        self, obj_idx: int, obj_evals: np.ndarray, feasible_mask: np.ndarray,
        grid: np.ndarray, key, num_starts: int = 5,
    ) -> Optional[np.ndarray]:
        """On-device polish (multi-start penalty Adam). Same accept semantics
        as the SLSQP path: returns the point only if it improves on the best
        feasible grid value and is feasible."""
        obj = self._objs[obj_idx]
        cache_key = (obj.fn, tuple(c.fn for c in self._cons), self.input_dim)
        if cache_key not in _DEVICE_POLISH_CACHE:
            _DEVICE_POLISH_CACHE[cache_key] = _device_polish_factory(
                obj.fn, tuple(c.fn for c in self._cons), self.input_dim
            )
        polish = _DEVICE_POLISH_CACHE[cache_key]

        masked = np.where(feasible_mask, obj_evals, np.inf)
        order = np.argsort(masked)[:num_starts]
        x0 = jnp.asarray(grid[order])
        best_val = float(masked[order[0]])
        con_trees = tuple(c.tree for c in self._cons)
        x_best, improved = polish(
            obj.tree, con_trees, x0, jnp.asarray(best_val),
            jnp.asarray(self.feasible_values, dtype=x0.dtype),
        )
        if bool(improved):
            return np.asarray(x_best, dtype=float)[None]
        return None

    # -- main entry ------------------------------------------------------------

    def compute_pareto_solution_from_samples(
        self, inputs, key: jax.Array, allow_negative_constraints: bool = False,
        inputs_valid=None,
    ):
        """Reference moop.py:221-286; returns (pareto_set, pareto_front, mask,
        samples_objs, samples_cons) or None when infeasible.

        inputs_valid: optional (len(inputs),) bool/0-1 mask — padded training
        rows (fit/bucketing.py) keep their grid slot for static shapes but are
        excluded from feasibility, polish starts, and the Pareto front."""
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
        grid_valid = np.ones(grid.shape[0], dtype=bool)
        if inputs_valid is not None:
            grid_valid[rand.shape[0]:] = np.asarray(inputs_valid, dtype=bool)

        from mobocmf_tpu.parallel.sharding import sharded_grid_eval

        cons_evals = (
            sharded_grid_eval(self._cons, grid_j, self.mesh)
            if self._cons
            else np.zeros((0, grid.shape[0]))
        )
        if not np.isfinite(cons_evals).all():
            # non-finite constraint samples cannot define feasibility
            print("[MOOP] non-finite constraint samples; resampling")
            return None
        feasible = self._feasible_mask(
            cons_evals, allow_negative_constraints, valid=grid_valid
        )
        if feasible is None:
            return None

        obj_evals = sharded_grid_eval(self._objs, grid_j, self.mesh)
        # drop grid rows where any objective sample is non-finite
        n_bad = int((~np.isfinite(obj_evals)).any(axis=0).sum())
        if n_bad:
            print(f"[MOOP] dropped {n_bad} grid rows with non-finite objective samples")
        feasible = feasible & np.isfinite(obj_evals).all(axis=0)
        if not feasible.any():
            return None

        # per-objective polish; append accepted optima to the grid. The
        # appended block has a FIXED size (one row per objective, rejected
        # slots masked infeasible) so every downstream program
        # (pareto_front_mask, summarize_pareto) keeps one shape per bucket —
        # a variable-length append recompiled them whenever the accepted
        # count changed between iterations.
        if self.polish != "none":
            n_obj = len(self._objs)
            extra = np.tile(grid[:1], (n_obj, 1))  # placeholder rows
            extra_valid = np.zeros(n_obj, dtype=bool)
            for i in range(n_obj):
                if self.polish == "device":
                    key, kp = jax.random.split(key)
                    opt_x = self.optimize_obj_globally_device(
                        i, obj_evals[i], feasible, grid, kp
                    )
                else:
                    opt_x = self.optimize_obj_globally(i, obj_evals[i], feasible, grid)
                if opt_x is not None:
                    d = np.sqrt(((grid - opt_x) ** 2).sum(axis=1)).min()
                    if d > self.min_distance_between_points:
                        extra[i] = np.asarray(opt_x).reshape(-1)
                        extra_valid[i] = True
            extra_j = jnp.asarray(extra)
            grid = np.concatenate([grid, extra], axis=0)
            grid_j = jnp.asarray(grid)
            obj_evals = np.concatenate(
                [obj_evals, np.stack([np.asarray(of.eval_jit(extra_j)) for of in self._objs])],
                axis=1,
            )
            feasible = np.concatenate([feasible, extra_valid])

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

        if num_valid == 0 or not bool(
            jnp.isfinite(jnp.where(out_mask[:, None], pfront, 0.0)).all()
        ):
            return None

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
