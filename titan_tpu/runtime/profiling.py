"""Throughput counters and profiler hooks.

The reference has no profiling beyond a render-rate counter (SURVEY.md
section 5.1).  Here: steps/sec and spring-updates/sec measurement over any
simulation, plus a context manager around jax.profiler for TPU traces.
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class ThroughputReport:
    steps: int
    wall_s: float
    n_springs: int
    n_masses: int

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.wall_s

    @property
    def spring_updates_per_sec(self) -> float:
        return self.n_springs * self.steps_per_sec

    @property
    def mass_updates_per_sec(self) -> float:
        return self.n_masses * self.steps_per_sec

    def __str__(self):
        return (f"{self.steps} steps in {self.wall_s:.3f}s: "
                f"{self.steps_per_sec:,.0f} steps/s, "
                f"{self.spring_updates_per_sec:,.0f} spring-updates/s")


def measure_throughput(sim, steps: int = 1000,
                       warmup_steps: int = 100) -> ThroughputReport:
    """Time ``steps`` simulation steps on a (paused or un-started) sim.

    Runs outside the control plane on a private state copy, so the
    simulation's own clock/breakpoints are unaffected.
    """
    from ..ops.step import build_chunk_fn

    if sim._state is None:
        sim._T = getattr(sim, "_T", 0.0)
        sim._marshal()
    chunk = build_chunk_fn(sim._shape)
    state = sim._state
    state = chunk(state, jnp.int32(warmup_steps))
    float(jax.device_get(state.t))  # sync (block_until_ready unreliable on axon)
    t0 = time.perf_counter()
    state = chunk(state, jnp.int32(steps))
    float(jax.device_get(state.t))
    wall = time.perf_counter() - t0
    return ThroughputReport(steps=steps, wall_s=wall,
                            n_springs=sim._store.n_springs,
                            n_masses=sim._store.n_masses)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/titan_tpu_trace"):
    """jax.profiler trace around a block; view with TensorBoard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
