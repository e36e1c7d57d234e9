"""HLO op-count budgets for the hot training-step programs.

Step time on this workload is HLO-count/latency bound (small matrices,
CLAUDE.md), so redundant factorizations/solves regress wall-clock directly
but are invisible to value-based tests. These budgets pin the round-3
hoisting work:

- safe_cholesky's custom_vmap keeps escalation a true branch (1 executed
  Cholesky per kernel matrix; the 2 rescue attempts sit in an untaken
  conditional branch);
- LayerState carries the solved variational quantities, shared by the
  predictive / KL / chain;
- the conditioned loss factors each model's inducing chain once for its
  batch + Pareto-front + omega terms, objectives and constraints merged
  into one batched computation.

Counts are of LAPACK custom calls in the XLA:CPU lowering (tests run on
CPU), which maps 1:1 to cholesky/triangular_solve HLOs; budgets are upper
bounds with slack 0 — if a JAX upgrade changes lowering granularity,
re-derive the budgets rather than deleting the test.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mobocmf_tpu.fit import conditioned as C
from mobocmf_tpu.fit import trainer as T
from mobocmf_tpu.models import mfdgp as M


def _count(txt: str, target: str) -> int:
    return len(re.findall(rf'custom_call_target="{target}', txt))


@pytest.fixture(scope="module")
def problem():
    n, d = 32, 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(n, d)), dtype=jnp.float32)
    fid = jnp.asarray(rng.integers(0, 2, size=(n,)), dtype=jnp.int32)
    mk = lambda i: M.init_mfdgp(
        jax.random.key(i),
        x,
        jnp.asarray(rng.normal(size=(n, 1)), dtype=jnp.float32),
        fid,
        2,
    )
    return n, d, x, fid, mk


def test_training_step_factorization_budget(problem):
    n, d, x, fid, mk = problem
    sp, sc, cfg = T.stack_models([mk(0), mk(1), mk(2)])
    ys = jnp.stack([jnp.zeros((n,), jnp.float32)] * 3)
    keys = jax.random.split(jax.random.key(9), 3)
    txt = (
        T.train_phase_stacked_jit.lower(
            sp, sc, cfg, x, ys, fid, keys, 1, 0.003, "all_free", n
        )
        .compile()
        .as_text()
    )
    # 2 layers x (1 happy-path + 2 untaken rescue) = 6 potrf IN THE PROGRAM;
    # exactly 2 execute per step. 12+ means the custom_vmap branch collapsed
    # back to select_n (every escalation attempt executing every step).
    assert _count(txt, "lapack_spotrf") <= 6
    # fwd: 2 state concat-solves + 1 chain solve + 2 kzx solves; bwd roughly
    # doubles. 19+ indicates the predictive/KL stopped sharing the hoisted
    # w_mean/w_ls solves.
    assert _count(txt, "lapack_strsm") <= 18


def test_conditioned_step_factorization_budget(problem):
    n, d, x, fid, mk = problem
    p = 10
    rng = np.random.default_rng(1)
    op, oc, cfg = T.stack_models([mk(0), mk(1)])
    cp, cc, _ = T.stack_models([mk(5), mk(6)])
    data = C.ConditionedData(
        x=x,
        ys_obj=jnp.zeros((2, n), jnp.float32),
        ys_con=jnp.zeros((2, n), jnp.float32),
        fidelities=fid,
        pareto_set=jnp.asarray(rng.uniform(size=(p, d)), dtype=jnp.float32),
        pareto_front=jnp.asarray(rng.normal(size=(p, 2)), dtype=jnp.float32),
        front_mask=jnp.ones((p,), dtype=bool),
        thresholds=jnp.zeros((2,), dtype=jnp.float32),
    )

    def step(ps, key):
        return C.conditioned_loss(
            ps[0], ps[1], oc, cc, cfg, data, key, 1e-8,
            jnp.arange(n), jnp.ones((n,), jnp.float32),
        )

    txt = (
        jax.jit(jax.value_and_grad(step))
        .lower((op, cp), jax.random.key(0))
        .compile()
        .as_text()
    )
    # ONE merged obj+con states computation: 2 layers x 3 attempts = 6 in the
    # program, 2 executed. 12 = obj/con split again; 18+ = per-term
    # recomputation (the pre-hoist state: 3 state computations per model).
    assert _count(txt, "lapack_spotrf") <= 6
    assert _count(txt, "lapack_strsm") <= 42


def _hlo_computations(txt: str):
    """Parse HLO text into {computation_name: body_text}."""
    comps = {}
    cur, buf = None, []
    for line in txt.splitlines():
        m = re.match(r"^(?:ENTRY )?%?([\w\.\-]+) (?:\([^)]*\) -> .*)?\{", line)
        if m:
            cur, buf = m.group(1), []
        elif cur is not None:
            if line.startswith("}"):
                comps[cur] = "\n".join(buf)
                cur = None
            else:
                buf.append(line)
    return comps


def _transitive_calls(comps, roots):
    """All computations reachable from `roots` via any %name reference."""
    names = set(comps)
    seen, stack = set(), list(roots)
    while stack:
        c = stack.pop()
        if c in seen or c not in comps:
            continue
        seen.add(c)
        for ref in re.findall(r"%([\w\.\-]+)", comps[c]):
            if ref in names and ref not in seen:
                stack.append(ref)
    return seen


def test_fused_acquisition_cholesky_hoisted_out_of_lbfgs(problem):
    """The fused all-fidelity acquisition program factors every inducing
    chain ONCE, outside the L-BFGS while loops (round-3 redesign; 5.9 s vs
    ~19 s late-campaign acq phase). A plain op count cannot catch a hoist
    regression — a while body is traced once in the program text — so this
    asserts no while-loop body (transitively) contains a Cholesky. Solves
    against the test inputs (k_zx) legitimately stay inside the loop.
    """
    from mobocmf_tpu.acquisition import jesmoc

    n, d, x, fid, mk = problem
    up, uc, cfg = T.stack_models([mk(0), mk(1)])
    cp, cc, _ = T.stack_models([mk(5), mk(6)])
    txt = (
        jesmoc.optimize_coupled_jes_all_fidelities.lower(
            up, uc, cp, cc, cfg, jax.random.key(0), d,
            num_restarts=2, raw_samples=16, maxiter=10,
        )
        .compile()
        .as_text()
    )
    # 2 groups x 2 layers x (1 happy + 2 untaken rescue) = 12 in the program
    assert _count(txt, "lapack_spotrf") <= 12
    comps = _hlo_computations(txt)
    bodies = re.findall(r"body=%?([\w\.\-]+)", txt)
    assert bodies, "no while loops found — L-BFGS lowering changed; re-derive"
    inside = _transitive_calls(comps, bodies)
    offenders = [c for c in inside if "lapack_spotrf" in comps.get(c, "")]
    assert not offenders, (
        f"Cholesky factorization inside L-BFGS while body: {offenders} — "
        "the inducing-chain states are being recomputed every iteration"
    )
