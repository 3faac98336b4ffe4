"""Test config: run everything on CPU with 8 virtual devices.

This is the standard JAX trick for testing pjit/sharding without a TPU pod
(SURVEY.md §4).  Two subtleties of this environment:

* the axon sitecustomize imports jax at interpreter startup with
  ``JAX_PLATFORMS=axon``, so the platform must be overridden via
  ``jax.config`` (env vars are read before conftest runs);
* ``XLA_FLAGS`` is still honored at (lazy) backend init, so setting it
  here is early enough for the 8-device CPU fleet.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: the suite is compile-dominated on a
# 1-core host; warm runs skip recompiling unchanged programs.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_TEST_CACHE_DIR",
                                     "/tmp/jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass
