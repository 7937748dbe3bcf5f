"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Mirrors the reference's CPU-only test strategy (reference `testing/` runs on
CPU in float64); multi-chip sharding is exercised via
``--xla_force_host_platform_device_count=8`` as recommended for JAX.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

# The suite is compile-bound (many small jitted samplers, one per shape);
# a persistent compilation cache makes repeat runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
