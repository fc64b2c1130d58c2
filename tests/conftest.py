"""Test configuration: CPU-only JAX with 8 virtual devices.

Must set env vars before jax initializes (SURVEY.md §4.3): the fake-device
trick lets every shard_map/ppermute/mesh code path run in CI with no TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)
