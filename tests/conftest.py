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


def force_tiled_interpret(monkeypatch):
    """Force every tiled-kernel pallas_call into interpret mode (CPU).

    Shared by test_pallas_tiled.py and test_halo_tiled.py (both route
    through titan_tpu.ops.pallas_tiled.pl.pallas_call -- the distributed
    path builds its per-shard calls via make_tiled_call in that module);
    __graft_entry__.dryrun_multichip carries its own inline copy because
    the driver runs it outside pytest.
    """
    import jax.experimental.pallas as pl
    orig = pl.pallas_call

    def interp(*a, **k):
        k["interpret"] = True
        k.pop("compiler_params", None)
        return orig(*a, **k)

    monkeypatch.setattr("titan_tpu.ops.pallas_tiled.pl.pallas_call", interp)
