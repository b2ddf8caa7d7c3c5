"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Mirrors the reference's headless test tier (SURVEY.md §4: RadientTest runs the
full engine with a null GPU device); here "null device" = the CPU backend, and
the 8 virtual devices let sharding/multi-chip tests run without TPU hardware.
"""
import os

# NOTE: this image pins JAX_PLATFORMS=axon (the TPU tunnel) and merges it into
# the platform list, so the env var alone does not exclude the TPU — the
# explicit config.update below is what actually forces CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running CPU tests (large shapes / many compiles)")
