"""TPU step-time A/B for the train+cond HLO-count levers (VERDICT r4 item 6).

train+cond is 21.2 s of the 38.95 s warm BO iteration at m=128 and is
HLO-count/latency bound (~276 us/step, CLAUDE.md). Two exactly-equivalent
variants exist behind env flags (equivalence pinned by
tests/test_trainer_variants.py and test_conditioned.py):

- MOBOCMF_FLAT_ADAM=1   — optax.flatten: one raveled Adam update instead of
                          ~14 per-leaf updates per step;
- MOBOCMF_FUSED_COND=1  — conditioned loss evaluates ONE forward per model
                          over [batch; X*; x_tilde] instead of three.

Run with no args: spawns one subprocess per variant (env is read at call
time inside the trainers; a fresh process per variant keeps jit caches and
env consistent), measures sustained steps/s of the stacked unconditioned
phase and the conditioned phase at the bench shapes (m=128 bucket, 4
blackboxes: 2 obj + 2 con), and writes benchmarks/ab_step_time_results.json.

Timing protocol: each phase runs once to compile+warm, then is re-run and
timed; rates are steps/s of the timed run. Valid only on an idle box
(CLAUDE.md timing hygiene).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# fused_cond defaulted ON after the CPU-lowering preview (-37% HLO, -60%
# dots); every variant pins BOTH flags explicitly so the A/B stays
# well-defined regardless of defaults.
VARIANTS = {
    "base": {"MOBOCMF_FLAT_ADAM": "0", "MOBOCMF_FUSED_COND": "0"},
    "flat_adam": {"MOBOCMF_FLAT_ADAM": "1", "MOBOCMF_FUSED_COND": "0"},
    "fused_cond": {"MOBOCMF_FLAT_ADAM": "0", "MOBOCMF_FUSED_COND": "1"},
    "both": {"MOBOCMF_FLAT_ADAM": "1", "MOBOCMF_FUSED_COND": "1"},
}

N = int(os.environ.get("MOBOCMF_AB_N", "128"))  # rows == inducing (bench bucket)
D = 2
P = 50           # pareto-set rows
# long enough to amortize dispatch, short enough to be quick (override for
# CPU smoke tests)
EPOCHS = int(os.environ.get("MOBOCMF_AB_EPOCHS", "2000"))


def run_one() -> dict:
    import jax

    # MOBOCMF_AB_CPU=1 forces the CPU backend (inherited by subprocess
    # children — the JAX_PLATFORMS env var is ignored in this image, and a
    # stray child grabbing the TPU would collide with the evidence queue).
    if os.environ.get("MOBOCMF_AB_CPU", "0") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from mobocmf_tpu.fit import conditioned as C
    from mobocmf_tpu.fit import trainer as T
    from mobocmf_tpu.models import mfdgp as M
    from mobocmf_tpu.util.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(N, D)), dtype=jnp.float32)
    fid = jnp.asarray((np.arange(N) % 2).astype(np.int32))
    ys = rng.normal(size=(4, N)).astype(np.float32)
    models = [
        M.init_mfdgp(jax.random.key(i), x, jnp.asarray(y[:, None]), fid, 2)
        for i, y in enumerate(ys)
    ]
    sp, sc, config = T.stack_models(models)
    ys_j = jnp.asarray(ys)
    key = jax.random.key(7)

    def uncond():
        p, logs = T.train_phase_stacked_chunked(
            sp, sc, config, x, ys_j, fid, key, 4, EPOCHS, 0.003,
            "all_free", N,
        )
        jax.block_until_ready(jax.tree.leaves(p)[0])
        return logs

    uncond()  # compile + warm
    t0 = time.perf_counter()
    uncond()
    dt_u = time.perf_counter() - t0

    op, oc, _ = T.stack_models(models[:2])
    cp, cc, _ = T.stack_models(models[2:])
    data = C.ConditionedData(
        x=x,
        ys_obj=ys_j[:2],
        ys_con=ys_j[2:],
        fidelities=fid,
        pareto_set=jnp.asarray(rng.uniform(size=(P, D)), dtype=jnp.float32),
        pareto_front=jnp.asarray(rng.normal(size=(P, 2)), dtype=jnp.float32),
        front_mask=jnp.ones(P, dtype=bool),
        thresholds=jnp.zeros(2, dtype=jnp.float32),
    )

    def cond():
        o2, c2, losses = C.train_conditioned_chunked(
            op, cp, oc, cc, config, data, key, EPOCHS, 0.001, 1e-8, N,
        )
        jax.block_until_ready(losses)

    cond()  # compile + warm
    t0 = time.perf_counter()
    cond()
    dt_c = time.perf_counter() - t0

    return {
        "backend": jax.devices()[0].platform,
        "uncond_steps_per_s": EPOCHS / dt_u,
        "cond_steps_per_s": EPOCHS / dt_c,
        "uncond_us_per_step": 1e6 * dt_u / EPOCHS,
        "cond_us_per_step": 1e6 * dt_c / EPOCHS,
        "flags": {
            k: os.environ.get(k, "0")
            for k in ("MOBOCMF_FLAT_ADAM", "MOBOCMF_FUSED_COND")
        },
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(json.dumps(run_one()))
        return
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    results = {}
    for name, env in VARIANTS.items():
        # The child is invoked by absolute script path, so sys.path[0] is
        # benchmarks/, not the repo root — put the root on PYTHONPATH or the
        # mobocmf_tpu import fails (bit the round-5 queue run).
        child_env = dict(os.environ, **env)
        child_env["PYTHONPATH"] = repo + os.pathsep + child_env.get("PYTHONPATH", "")
        out = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--one"],
            env=child_env, capture_output=True, text=True,
            cwd=os.path.dirname(here),
        )
        line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else ""
        try:
            results[name] = json.loads(line)
        except json.JSONDecodeError:
            results[name] = {"error": out.stderr[-2000:]}
        print(name, "->", results[name], flush=True)
    path = os.path.join(here, "ab_step_time_results.json")
    with open(path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", path)
    if all("error" not in r for r in results.values()):
        b = results["base"]
        for name in ("flat_adam", "fused_cond", "both"):
            r = results[name]
            print(
                f"{name}: uncond x{b['uncond_us_per_step'] / r['uncond_us_per_step']:.3f} "
                f"cond x{b['cond_us_per_step'] / r['cond_us_per_step']:.3f} "
                f"(us/step {r['uncond_us_per_step']:.0f}/{r['cond_us_per_step']:.0f} "
                f"vs base {b['uncond_us_per_step']:.0f}/{b['cond_us_per_step']:.0f})"
            )


if __name__ == "__main__":
    main()
