"""BlackBoxMFDGPFitter: the training + conditioning engine.

API-compatible re-design of /root/reference/mobocmf/util/blackbox_mfdgp_fitter.py.
Holds one functional MFDGP per blackbox (objectives + constraints sharing the
same x — coupled evaluation, like the reference asserts at :87-91), trains
them with the two-phase schedule, samples a Pareto solution through MOOP over
RFF pathwise samples, and retrains conditioned on it (theta/omega factors).

Differences from the reference (same semantics, TPU-first execution):
- models are stacked pytrees trained simultaneously under vmap, each phase a
  single jitted scan (the reference loops models & epochs in Python);
- copy_uncond is a trivial pytree copy (no deepcopy/eval-train dance);
- the Pareto solution carries an explicit validity mask (static shapes).
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mobocmf_tpu.fit import bucketing
from mobocmf_tpu.fit import conditioned as C
from mobocmf_tpu.fit import trainer
from mobocmf_tpu.models import mfdgp as M
from mobocmf_tpu.models.mfdgp import TL
from mobocmf_tpu.moop.moop import MOOP, NotFeasiblePoints, ParetoSolution, SampledFunction
from mobocmf_tpu.sampling import rff

Array = jnp.ndarray

MAX_TRIES_FOR_FEASIBLE_GRID = 50  # reference MFDGPHandler.MAX_TRIES_FOR_FEASIBLE_GRID


class BlackBoxMFDGPFitter:
    def __init__(
        self,
        num_fidelities: int,
        batch_size: int,
        lr_1: float = 0.003,
        lr_2: float = 0.001,
        num_epochs_1: int = 5000,
        num_epochs_2: int = 15000,
        pareto_set_size: int = 50,
        opt_grid_size: int = 1000,
        eps: float = 1e-8,
        decoupled_evals: bool = False,
        type_lengthscale: TL = TL.MEDIAN,
        seed: int = 0,
        whitened: bool = False,
        whitened_init: str = "match",
        pad_data: bool = False,
        polish: str = "slsqp",
        mesh=None,
    ):
        """pad_data: bucket the training rows to geometric sizes with masked
        far-away padding (fit/bucketing.py) so a growing BO campaign compiles
        the training/conditioning/acquisition programs O(log N) times instead
        of once per iteration. Padding also pads the inducing set (Z = x_train
        by construction) — a documented deviation from the reference's exact
        shapes, so it is opt-in."""
        self.num_obj = 0
        self.num_con = 0
        self.models_uncond_trained = False

        self.models_objs: Dict[str, M.MFDGPModel] = {}
        self.models_cons: Dict[str, M.MFDGPModel] = {}
        self.obj_names: List[str] = []
        self.con_names: List[str] = []
        self.thresholds_cons: List[float] = []

        self.x_train: Optional[Array] = None
        self.fidelities: Optional[Array] = None
        self.ys_objs: List[Array] = []
        self.ys_cons: List[Array] = []
        self.pad_data = pad_data
        # Pareto-sampling polish backend: "slsqp" = host scipy with fused
        # single-dispatch device evals (reference moop.py:72-139 semantics);
        # "device" = multi-start penalty L-BFGS fully on device (SURVEY §7.1's
        # TPU path — no host round trips); "none" disables polishing.
        self.polish = polish
        # optional jax.sharding.Mesh: Pareto-sampling grid evaluations (the
        # 1000*d^2-point hot axis, reference moop.py:232) shard over its 'dp'
        # axis via parallel.sharding.sharded_grid_eval
        self.mesh = mesh
        self.num_real: Optional[int] = None  # real rows (x_train may be padded)
        self.row_weights: Optional[Array] = None

        self.num_fidelities = num_fidelities
        self.batch_size = batch_size
        self.lr_1, self.lr_2 = lr_1, lr_2
        self.num_epochs_1, self.num_epochs_2 = num_epochs_1, num_epochs_2
        self.pareto_set_size = pareto_set_size
        self.opt_grid_size = opt_grid_size
        self.eps = eps
        self.decoupled_evals = decoupled_evals
        self.type_lengthscale = type_lengthscale
        self.whitened = whitened
        self.whitened_init = whitened_init
        self.key = jax.random.key(seed)
        self._x_np: Optional[np.ndarray] = None

        self.pareto_solution: Optional[ParetoSolution] = None
        self.samples_objs = None
        self.samples_cons = None

    # -- setup -----------------------------------------------------------------

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def initialize_mfdgp(
        self,
        x_train,
        y_train,
        fidelities,
        blackbox_name: str,
        threshold_constraint: float = 0.0,
        is_constraint: bool = False,
        previously_trained_model: Optional[M.MFDGPModel] = None,
        init_params_to_prior_and_fix_them: bool = False,
        use_only_highest_fidelity: bool = False,
    ):
        # All setup array prep happens on HOST (numpy): per-op dispatch is
        # cheap (~0.1 ms, benchmarks/probe_setup.py) but the aggregate
        # python+dispatch overhead of many tiny eager ops dominated
        # BO-iteration setup on the 1-core host. Device arrays are created
        # once per fitter, in one transfer.
        x_np = np.asarray(x_train)
        y_np = np.asarray(y_train, dtype=x_np.dtype).reshape(-1)
        f_np = np.asarray(fidelities).reshape(-1).astype(np.int32)
        n_real = x_np.shape[0]
        if self.pad_data:
            target = bucketing.next_bucket(n_real)
            x_np, f_np, w_np = bucketing.pad_inputs_np(x_np, f_np, target)
            y_np = bucketing.pad_rows_np(y_np, target)
        else:
            w_np = np.ones((n_real,), dtype=x_np.dtype)
        x_train, y_train = x_np, y_np[:, None]
        fidelities = f_np
        if self.x_train is None:
            self._x_np = x_np
            self.x_train = jnp.asarray(x_np)
            self.fidelities = jnp.asarray(f_np)
            self.num_real = n_real
            self.row_weights = jnp.asarray(w_np)
        else:
            assert np.array_equal(self._x_np, x_np), (
                "The inputs for this new mfdgp do not match previous models; "
                "coupled evaluation only (reference :87-91)."
            )
        model = M.init_mfdgp(
            self._next_key(), x_train, y_train, fidelities, self.num_fidelities,
            type_lengthscale=self.type_lengthscale,
            use_only_highest_fidelity=use_only_highest_fidelity,
            previously_trained=previously_trained_model,
            whitened=self.whitened,
            whitened_init=self.whitened_init,
            init_params_to_prior_and_fix_them=init_params_to_prior_and_fix_them,
        )
        if is_constraint:
            self.models_cons[blackbox_name] = model
            self.con_names.append(blackbox_name)
            self.ys_cons.append(y_train.reshape(-1))
            self.thresholds_cons.append(float(threshold_constraint))
            self.num_con += 1
        else:
            self.models_objs[blackbox_name] = model
            self.obj_names.append(blackbox_name)
            self.ys_objs.append(y_train.reshape(-1))
            self.num_obj += 1

    # -- unconditioned training ---------------------------------------------------

    def _effective_batch_size(self) -> int:
        """Full-batch intent (batch_size >= real rows) covers padded rows too,
        so the whole padded epoch stays one batch."""
        n = self.x_train.shape[0]
        if self.batch_size >= self.num_real:
            return n
        return self.batch_size

    def _train_group(self, entries, label):
        """entries: list of (name, is_constraint, y). All blackboxes share x
        and shapes, so objectives AND constraints stack into ONE vmapped
        pytree — one jitted scan trains everything simultaneously (the
        reference trains each model sequentially, :134-152; round 1 still ran
        two sequential groups)."""
        models = [
            self.models_cons[n] if is_con else self.models_objs[n]
            for n, is_con, _ in entries
        ]
        sp, sc, config = trainer.stack_models(models)
        ys_arr = jnp.stack([y for _, _, y in entries])
        nm = len(models)
        fid = self.fidelities
        num_data = jnp.asarray(self.num_real, dtype=self.x_train.dtype)

        for phase, (epochs, lr, mask_kind) in enumerate(
            [
                (self.num_epochs_1, self.lr_1, "fix_variational_hypers"),
                (self.num_epochs_2, self.lr_2, "all_free"),
            ]
        ):
            if epochs == 0:
                continue
            sp, logs = trainer.train_phase_stacked_chunked(
                sp, sc, config, self.x_train, ys_arr, fid, self._next_key(),
                nm, epochs, lr, mask_kind, self._effective_batch_size(),
                self.row_weights, num_data,
            )
            print(
                f"[{label}] phase {phase + 1}: epochs={epochs} "
                f"first/last neg-ELBO "
                f"{np.asarray(logs.loss)[:, 0].sum():.4f} / "
                f"{np.asarray(logs.loss)[:, -1].sum():.4f}"
            )
            sys.stdout.flush()

        # Fail fast on non-finite trained parameters: a NaN model makes every
        # downstream RFF sample NaN, which turns the feasibility retry loop
        # (sample_and_store_pareto_solution, reference retry-forever
        # semantics) into an INFINITE spin — observed in the r5
        # branin_currin_512 campaign before the safe_cholesky relative-jitter
        # floors landed. A loud error + the queue's resume-safe retry beats
        # a silently hung campaign.
        if not all(
            bool(jnp.all(jnp.isfinite(leaf))) for leaf in jax.tree.leaves(sp)
        ):
            raise RuntimeError(
                f"[{label}] unconditioned training produced non-finite "
                "parameters (f32 numerical escape; check safe_cholesky "
                "escalation and output scaling)"
            )

        per_model = trainer.unstack_params(sp, nm)
        for (n, is_con, _), p in zip(entries, per_model):
            d = self.models_cons if is_con else self.models_objs
            d[n] = d[n]._replace(params=p)

    def train_mfdgps(self):
        """Two-phase schedule (reference :154-176), all blackboxes at once."""
        entries = [
            (n, False, y) for n, y in zip(self.obj_names, self.ys_objs)
        ] + [(n, True, y) for n, y in zip(self.con_names, self.ys_cons)]
        if entries:
            self._train_group(entries, "ALL")
        self.models_uncond_trained = True

    # -- Pareto sampling -----------------------------------------------------------

    def _sample_models(self, names, models_dict):
        """Vmapped pathwise sampling over the (same-shaped) blackbox models."""
        models = [models_dict[n] for n in names]
        if len(models) == 1:
            m = models[0]
            return [rff.sample_posterior_jit(self._next_key(), m.params, m.consts, m.config)]
        sp, sc, config = trainer.stack_models(models)
        return rff.sample_posterior_stacked(
            self._next_key(), sp, sc, config, len(models)
        )

    def _sample_and_store_pareto_solution(self):
        l_samples_objs = self._sample_models(self.obj_names, self.models_objs)
        obj_fns = [SampledFunction(rff.eval_sample_fn, s) for s in l_samples_objs]
        self.pareto_tries = getattr(self, "pareto_tries", 0)

        global_optimizer = None
        for try_idx in range(MAX_TRIES_FOR_FEASIBLE_GRID):
            if try_idx > 0 and try_idx % 10 == 0:
                # NaN-defense beyond the reference: objective samples are drawn
                # once outside this loop (:181-186); if they are degenerate the
                # retry loop would spin forever, so refresh them occasionally
                l_samples_objs = self._sample_models(self.obj_names, self.models_objs)
                obj_fns = [SampledFunction(rff.eval_sample_fn, s) for s in l_samples_objs]
            l_samples_cons = (
                self._sample_models(self.con_names, self.models_cons)
                if self.con_names
                else []
            )
            con_fns = [SampledFunction(rff.eval_sample_fn, s) for s in l_samples_cons]

            global_optimizer = MOOP(
                obj_fns,
                con_fns,
                input_dim=self.x_train.shape[1],
                grid_size=self.opt_grid_size * self.x_train.shape[1],
                pareto_set_size=self.pareto_set_size,
                feasible_values=-1.0 * np.asarray(self.thresholds_cons),
                polish=self.polish,
                mesh=self.mesh,
            )
            self.pareto_tries += 1
            res = global_optimizer.compute_pareto_solution_from_samples(
                self.x_train, self._next_key(),
                inputs_valid=np.asarray(self.row_weights) > 0,
            )
            if res is not None:
                self.pareto_solution, _, _ = res
                self.samples_objs = l_samples_objs
                self.samples_cons = l_samples_cons
                return self.pareto_solution
            if (try_idx + 1) % 5 == 0:
                print(
                    f"[pareto] no feasible grid after {try_idx + 1} "
                    "constraint resamples; retrying"
                )
                sys.stdout.flush()
        self.pareto_tries += 1
        res = global_optimizer.compute_pareto_solution_from_samples(
            self.x_train, self._next_key(), allow_negative_constraints=True,
            inputs_valid=np.asarray(self.row_weights) > 0,
        )
        if res is not None:
            self.pareto_solution, _, _ = res
            self.samples_objs = l_samples_objs
            self.samples_cons = l_samples_cons
            return self.pareto_solution
        raise NotFeasiblePoints(
            "[ERROR] No feasible points were found in the constraint space! "
            f"# tries: {MAX_TRIES_FOR_FEASIBLE_GRID}."
        )

    def sample_and_store_pareto_solution(self):
        """Retry-forever wrapper (reference :219-225).

        self.pareto_tries records the MOOP attempts this call consumed
        (1 = first draw worked); the BO loop writes it to the evidence dir
        (pareto_resamples.txt) so phase-time variance is attributable from
        committed artifacts."""
        self.pareto_tries = 0
        while True:
            try:
                return self._sample_and_store_pareto_solution()
            except NotFeasiblePoints:
                print("Not feasible solution found, trying another time!")
                sys.stdout.flush()

    @property
    def pareto_set(self):
        return self.pareto_solution.pareto_set

    @property
    def pareto_front(self):
        return self.pareto_solution.pareto_front

    # -- conditioned training -------------------------------------------------------

    def train_conditioned_mfdgps(self):
        assert self.pareto_solution is not None, "sample a Pareto solution first"
        obj_models = [self.models_objs[n] for n in self.obj_names]
        con_models = [self.models_cons[n] for n in self.con_names]
        op, oc, config = trainer.stack_models(obj_models)
        if con_models:
            cp, cc, _ = trainer.stack_models(con_models)
        else:
            # explicit EMPTY stacked pytrees (leading axis 0): the conditioned
            # trainer vmaps over them, producing zero gradients/updates by
            # construction — no aliased placeholders
            cp = jax.tree.map(lambda a: a[:0], op)
            cc = M.MFDGPConsts(
                z_x=oc.z_x,
                acq_eps=oc.acq_eps[:0],
                noise_lower=oc.noise_lower[:0],
                noise_upper=oc.noise_upper[:0],
            )

        dtype = self.x_train.dtype
        data = C.ConditionedData(
            x=self.x_train,
            ys_obj=jnp.stack(self.ys_objs),
            ys_con=jnp.stack(self.ys_cons) if self.ys_cons else jnp.zeros((0, self.x_train.shape[0]), dtype=dtype),
            fidelities=self.fidelities,
            pareto_set=self.pareto_solution.pareto_set,
            pareto_front=self.pareto_solution.pareto_front,
            front_mask=self.pareto_solution.mask,
            thresholds=jnp.asarray(self.thresholds_cons, dtype=dtype),
            row_weights=self.row_weights,
        )
        op, cp, losses = C.train_conditioned_chunked(
            op, cp, oc, cc, config, data, self._next_key(),
            self.num_epochs_2, self.lr_2, self.eps, self._effective_batch_size(),
        )
        print(
            f"[COND] iters={self.num_epochs_2} first/last loss "
            f"{float(losses[0]):.4f} / {float(losses[-1]):.4f}"
        )
        sys.stdout.flush()
        for n, p in zip(self.obj_names, trainer.unstack_params(op, len(self.obj_names))):
            self.models_objs[n] = self.models_objs[n]._replace(params=p)
        if self.con_names:
            for n, p in zip(
                self.con_names, trainer.unstack_params(cp, len(self.con_names))
            ):
                self.models_cons[n] = self.models_cons[n]._replace(params=p)

    # -- misc -------------------------------------------------------------------------

    def copy_uncond(self) -> "BlackBoxMFDGPFitter":
        """Functional snapshot (replaces the reference's deepcopy dance :370-397).

        jax arrays are immutable and every trainer is functional (new param
        arrays, never in-place, nothing donates buffers), so the snapshot
        SHARES the current leaves — no device copies: per-leaf jnp.array
        round trips over the TPU tunnel cost ~2 s per snapshot."""
        import copy as _copy

        new = _copy.copy(self)
        new.models_objs = dict(self.models_objs)
        new.models_cons = dict(self.models_cons)
        new.obj_names = list(self.obj_names)
        new.con_names = list(self.con_names)
        new.ys_objs = list(self.ys_objs)
        new.ys_cons = list(self.ys_cons)
        new.thresholds_cons = list(self.thresholds_cons)
        return new

    def get_model(self, name: str, is_constraint: bool = False) -> M.MFDGPModel:
        if is_constraint:
            return self.models_cons[name]
        return self.models_objs[name]
