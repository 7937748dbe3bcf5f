"""Test configuration: force the CPU backend with 8 virtual devices.

Mirrors the reference's CPU-only float64 test strategy; multi-chip
sharding is exercised on a virtual 8-device CPU mesh. NOTE: this
environment pre-imports jax via sitecustomize (TPU tunnel), so
`jax.config.update` — not environment variables — is the only effective
way to select the backend.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
