"""Test configuration: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run anywhere (the SURVEY §4 strategy: mesh
emulation via xla_force_host_platform_device_count)."""
import os

# The environment presets JAX_PLATFORMS=axon (the TPU tunnel) — force CPU for
# tests, before jax initializes.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
