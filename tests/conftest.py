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

import jax  # noqa: E402

# The env var alone is not enough when a TPU PJRT plugin (axon) is preloaded.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
