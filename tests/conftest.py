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
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Suite tiering: `pytest -m smoke` is the <10-min set (parity + one
# representative per subsystem); the full suite (~2 h on this one-core box,
# measured round 3: 1:55:43 for 546 tests) stays the pre-commit gate.
# Smoke membership is by module, with per-test opt-out via @pytest.mark.slow
# (a slow-marked test inside a smoke module is excluded from -m smoke).
# ---------------------------------------------------------------------------
_SMOKE_MODULES = {
    "test_vec",            # C1 math primitives
    "test_simple",         # end-to-end basic sim
    "test_parity",         # independent f64 oracle (the north star)
    "test_forces",         # force kernels
    "test_integrators",    # Euler/Verlet/RK2
    "test_constraints",    # planes/balls/local slots
    "test_builders",       # lattice/beam/cube emission order
    "test_control",        # control plane / breakpoints
    "test_compaction",     # dynamic topology
    "test_checkpoint",     # checkpoint/resume
    "test_stl",            # STL import
    "test_native",         # C++ fast paths
    "test_viewer",         # renderer
    "test_api_surface",    # sim.h parity surface
    "test_rl",             # RL env API
    "test_topology_edit",  # incremental structural edits
    "test_smoke_kernels",  # one interpret-mode rep per Pallas kernel path
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast representative set (pytest -m smoke)")
    config.addinivalue_line(
        "markers", "slow: excluded from the smoke set even in smoke modules")


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SMOKE_MODULES and item.get_closest_marker("slow") is None:
            item.add_marker(pytest.mark.smoke)


def _map_count() -> int:
    """Number of memory mappings of this process (Linux), else 0."""
    try:
        with open(f"/proc/{os.getpid()}/maps") as f:
            return sum(1 for _ in f)
    except OSError:
        return 0


@pytest.fixture(autouse=True)
def _mmap_guard():
    """Clear jax caches when the process nears the kernel mmap limit.

    Every test builds fresh jitted closures; jax's global executable
    cache keeps them (and their LLVM-JIT code mappings) alive for the
    life of the process.  Measured: ~2,000 mappings per adjoint rollout
    test, and at vm.max_map_count (65,530 default) a failed mmap inside
    XLA:CPU's JIT is a SEGFAULT or a hang mid-compile -- the full suite
    died exactly there (~65,100 maps) after ~160 heavy tests, always at
    whichever compile crossed the line.  jax.clear_caches() reclaims
    essentially everything (5,515 -> 555 measured) and costs nothing
    here because each test compiles fresh programs anyway."""
    yield
    if _map_count() > 30_000:
        import gc

        jax.clear_caches()
        gc.collect()


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
