"""Test harness: CPU backend with 8 virtual devices, float64 enabled.

Must run before any jax import (hence env vars here, at conftest import
time).  The engine is device-agnostic; tests validate numerics on CPU and
multi-chip sharding on the virtual device mesh, per SURVEY.md section 4.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS from the environment; the
# config update below is authoritative.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
