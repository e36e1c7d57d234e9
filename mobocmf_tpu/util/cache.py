"""Persistent XLA compilation cache.

The BO loop compiles a handful of large programs (training scans, RFF
samplers, acquisition optimizers) whose shapes repeat across iterations and
processes; over a remote-TPU tunnel a cold compile costs minutes. Enabling
the JAX persistent cache amortizes that to the first run.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "MOBOCMF_TPU_CACHE", os.path.expanduser("~/.cache/mobocmf_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
