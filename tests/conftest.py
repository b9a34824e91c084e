"""Test configuration: force an 8-device virtual CPU mesh so all sharding
logic is exercised without TPUs (SURVEY.md §4 implication).

Note: the environment's sitecustomize imports jax and pins the axon TPU
platform before this file runs, so plain env vars are too late — we update
the jax config directly (backends are initialised lazily at first use).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
