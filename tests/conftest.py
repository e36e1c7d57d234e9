"""Test config: CPU backend with 8 virtual devices, float64 enabled.

Parity tests run in f64 on CPU (the reference is CPU/f64); multi-device
sharding tests use the 8 virtual CPU devices.
"""

import os

# Force CPU for tests even when the session default is a TPU platform (axon).
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# XLA:CPU's LLVM JIT adds hundreds of mappings per loaded executable; the
# full suite crosses the default vm.max_map_count (65530) around test ~85,
# after which mmap fails and LLVM SIGSEGVs inside backend_compile_and_load
# (measured: the crash vanishes and the process reaches >70k maps once the
# limit is raised). Best-effort raise — this container runs as root.
try:
    with open("/proc/sys/vm/max_map_count", "r+") as _fh:
        if int(_fh.read().strip() or 0) < 1048576:
            _fh.seek(0)
            _fh.write("1048576")
except OSError:
    pass

import jax  # noqa: E402

# The env var alone is not enough when a TPU PJRT plugin (axon) is preloaded.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (test-specific dir, separate from the TPU
# cache). Two reasons: (a) compiles dominate suite wall-clock (~25 min cold
# vs ~5 min warm on the 1-core host); (b) XLA:CPU's in-process LLVM JIT has
# crashed (SIGSEGV inside backend_compile_and_load) when ~100 heavy test
# compilations accumulate in one pytest process — cache hits skip LLVM
# entirely on warm runs.
from mobocmf_tpu.util.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(
    os.environ.get("MOBOCMF_TPU_TEST_CACHE", os.path.expanduser("~/.cache/mobocmf_tpu_xla_tests"))
)
