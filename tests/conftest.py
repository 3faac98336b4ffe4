"""Test config: run everything on CPU with 8 virtual devices.

This is the standard JAX trick for testing pjit/sharding without a TPU pod
(SURVEY.md §4): the env vars must be set before jax initializes its
backends, hence this module-level assignment in conftest.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
