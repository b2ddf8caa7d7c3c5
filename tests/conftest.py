"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Mirrors the reference's headless test tier (SURVEY.md §4: RadientTest runs the
full engine with a null GPU device); here "null device" = the CPU backend, and
the 8 virtual devices let sharding/multi-chip tests run without TPU hardware.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
