"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding tests use an 8-device CPU mesh
(xla_force_host_platform_device_count); single-chip physics tests run on one
of those CPU devices.  The benchmark (bench.py) runs on real TPU hardware.

NOTE: this environment pre-sets jax_platforms to "axon,cpu" (the tunneled
TPU), so the JAX_PLATFORMS env var alone is not enough -- we override the
config value after import, before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
