"""Test configuration: force an 8-device virtual CPU mesh so all sharding
logic is exercised without TPUs (SURVEY.md §4 implication)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
