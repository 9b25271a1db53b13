"""Differentiable simulation: gradients through the physics.

The CUDA reference cannot do this at all; here it falls out of the
architecture -- the step function is pure jnp, so ``jax.grad`` flows through
springs, contact penalties, friction, actuation, and the integrators.  Use
cases: trajectory optimization, system identification (fit k/damping to
observations), policy gradients through the simulator.

    shape, state = scene(sim)               # from an un-started Simulation
    final = rollout(shape, state, 1000)     # differentiable
    loss = some_fn(final.masses.pos)
    grads = jax.grad(loss_fn)(params)

Notes:
- Uses ``lax.scan`` over the XLA step (the Pallas kernels define no VJP).
- The Euler velocity clamp and contact/friction selects are piecewise
  differentiable (sub-gradients at the switch points), like any
  penalty-based differentiable simulator.
- Memory: reverse-mode keeps residuals per step; ``checkpoint_every``
  inserts jax.checkpoint rematerialization so long rollouts fit in HBM.
"""

from __future__ import annotations

import functools as _functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .ops.step import build_step_fn
from .runtime.logging import get_logger
from .state import SceneShape, SimState, xla_only_shape

# Fused-adjoint rollout (ops/adjoint.py): BOTH passes run VMEM Pallas
# kernels -- measured 8,101 fwd+bwd steps/s at the 1M-spring bench scene
# on one v5e (12.8x fast_rollout's XLA-recompute backward, gradients
# matching the XLA path to ~3e-7 relative).  Envelope and the
# differentiable-input set are documented in ops/adjoint.py; scenes
# outside it use fast_rollout below.
from .ops.adjoint import (adjoint_reject_reason, adjoint_rollout,  # noqa: F401
                          adjoint_supported)
# Tiled fused adjoint (ops/adjoint_tiled.py): the same hand-derived
# transpose applied per halo'd window of the grid-tiled kernel, for
# beyond-VMEM scenes (100^3 and up).  grad_rollout below routes
# VMEM-adjoint -> tiled-adjoint -> fast_rollout automatically.
from .ops.adjoint_tiled import (tiled_adjoint_reject_reason,  # noqa: F401
                                tiled_adjoint_rollout,
                                tiled_adjoint_supported)


def scene(sim) -> Tuple[SceneShape, SimState]:
    """Marshal an un-started Simulation into (static shape, state pytree)."""
    sim._T = getattr(sim, "_T", 0.0) or 0.0
    sim._marshal()
    return sim._shape, sim._state


def rollout(shape: SceneShape, state: SimState, n_steps: int,
            checkpoint_every: Optional[int] = None) -> SimState:
    """Run n_steps (static) differentiably; returns the final state."""
    step = build_step_fn(xla_only_shape(shape))

    if checkpoint_every:
        if n_steps % checkpoint_every:
            raise ValueError(f"n_steps={n_steps} not divisible by "
                             f"checkpoint_every={checkpoint_every}")
        inner = jax.checkpoint(
            lambda s, _: (_scan_steps(step, s, checkpoint_every), None))
        state, _ = jax.lax.scan(inner, state,
                                None, length=n_steps // checkpoint_every)
        return state
    return _scan_steps(step, state, n_steps)


def _scan_steps(step, state: SimState, n: int) -> SimState:
    out, _ = jax.lax.scan(lambda s, _: (step(s), None), state, None, length=n)
    return out


def fast_rollout(shape: SceneShape, state: SimState, n_steps: int,
                 segment: Optional[int] = None) -> SimState:
    """Differentiable rollout whose PRIMAL runs the fast chunk path.

    ``rollout`` scans the XLA step, so the forward pass pays the ~5x
    XLA-vs-kernel gap even when only the loss needs gradients.  Here each
    ``segment``-step block is a jax.custom_vjp whose forward is the fused
    chunk (VMEM Pallas kernel on TPU) and whose backward RECOMPUTES the
    segment through the XLA step and differentiates that -- gradient
    checkpointing with a faster primal.  Residual memory is one state per
    segment (like checkpoint_every), and the backward pass costs the same
    as ``rollout``'s; the net win is the forward fraction of fwd+bwd plus
    every use where the same rollout also serves non-differentiated
    consumers.

    Caveat (standard for mixed-path checkpointing): the backward pass
    linearizes the XLA recomputation, whose primal differs from the
    kernel's by f32 op-ordering ulps; gradients equal ``rollout``'s to the
    same tolerance the kernel-vs-XLA equivalence suite pins for values.

    Measured cost at the 1M-spring bench scene (v5e, 200 steps,
    segment=50): forward-only fast_rollout 6.5k steps/s (short-horizon,
    dispatch-bound), fwd+bwd 739 steps/s with the fast primal vs 686
    through the pure-XLA rollout -- the backward recompute dominates
    either way, so differentiating costs ~70x the kernel's forward-only
    throughput at this scale.  Use gradient horizons in the hundreds of
    steps (docs/GUIDE.md BPTT guidance) and fast_rollout when the same
    rollout also serves non-differentiated consumers.
    """
    seg = segment or n_steps
    if n_steps % seg:
        raise ValueError(f"n_steps={n_steps} not divisible by segment={seg}")
    seg_fn = _fast_segment(shape, seg)
    if n_steps == seg:
        return seg_fn(state)
    out, _ = jax.lax.scan(lambda s, _: (seg_fn(s), None), state, None,
                          length=n_steps // seg)
    return out


def grad_rollout(shape: SceneShape, state: SimState, n_steps: int,
                 segment: Optional[int] = None, mesh=None,
                 axis: str = "shard") -> SimState:
    """The best differentiable rollout for the scene: the fused VMEM
    adjoint when the scene is inside its envelope (ops/adjoint.py --
    measured 12.8-37.6x fast_rollout's gradients), else the grid-TILED
    adjoint for beyond-VMEM scenes (ops/adjoint_tiled.py -- both passes
    stay in tiled Pallas kernels), else ``fast_rollout`` with a one-line
    warning naming the failed envelope condition (the loud-fallback
    convention of ops/step.build_chunk_fn).

    With ``mesh``, the DISTRIBUTED adjoint (parallel/halo_adjoint.py)
    shards both passes across the mesh's ``axis`` devices; scenes its
    envelope rejects fall through to the single-device FUSED adjoints
    with the same one-line warning convention (their memory behavior is
    predictable -- a too-big scene dies with a clean RESOURCE_EXHAUSTED
    at staging).  A meshed scene outside every fused envelope RAISES
    instead of silently attempting fast_rollout on one device: the
    XLA-recompute backward's padded residuals can OOM the chip long
    after the warning scrolled by (measured 44.9 GB on a 60^3 glue
    scene, docs/PERFORMANCE.md), and a scene the user explicitly asked
    to distribute is exactly the kind that won't fit."""
    rd = None
    if mesh is not None:
        from .parallel.halo_adjoint import (halo_adjoint_reject_reason,
                                            halo_adjoint_rollout)
        rd = halo_adjoint_reject_reason(shape, mesh.shape[axis])
        if rd is None:
            return halo_adjoint_rollout(shape, state, mesh, n_steps,
                                        segment=segment, axis=axis)
        get_logger().warning(
            "grad_rollout: scene outside the distributed adjoint "
            "envelope (%s); running the single-device adjoint", rd)
    r = adjoint_reject_reason(shape)
    if r is None:
        return adjoint_rollout(shape, state, n_steps, segment=segment)
    rt = tiled_adjoint_reject_reason(shape)
    if rt is None:
        return tiled_adjoint_rollout(shape, state, n_steps,
                                     segment=segment)
    if mesh is not None:
        raise RuntimeError(
            "grad_rollout: scene requested a mesh but is outside every "
            f"fused adjoint envelope (distributed: {rd}; VMEM: {r}; "
            f"tiled: {rt}). Refusing the implicit single-device "
            "XLA-recompute fallback -- its padded per-step residuals "
            "can OOM the chip on scenes this large.  Run without mesh= "
            "to opt into fast_rollout explicitly if the scene fits one "
            "device.")
    get_logger().warning(
        "grad_rollout: scene outside the fused adjoint envelopes "
        "(VMEM: %s; tiled: %s); falling back to fast_rollout's "
        "XLA-recompute backward (~10-40x slower gradients)", r, rt)
    return fast_rollout(shape, state, n_steps, segment=segment)


def _fast_segment(shape: SceneShape, seg: int):
    """custom_vjp segment: fused-chunk primal, XLA-recompute backward
    (the shared engine of fast_rollout / fast_trajectory).  Cached per
    (shape, seg) so repeated rollout calls on the same scene reuse one
    traced/compiled program (same rationale as ops/adjoint.py's
    _adjoint_segment).  Every build-time hook that changes the kernel the
    primal chunk bakes in (TITAN_FMATH / TITAN_ABLATE for the VMEM
    kernel, pallas_tiled.CARRY_MODE for the tiled one, plus the
    monkeypatchable pallas_tiled._tile_size and pl.pallas_call bindings
    that tests/graft-dryrun patch) joins the cache key so same-process
    A/Bs and patched tests are never served a stale chunk (functions
    key by identity; every patch installs a fresh object)."""
    import os as _os

    from jax.experimental import pallas as _pl

    from .ops import pallas_tiled as _pt
    return _fast_segment_cached(shape, seg,
                                _os.environ.get("TITAN_FMATH", ""),
                                _os.environ.get("TITAN_ABLATE", ""),
                                _pt.CARRY_MODE, _pt._tile_size,
                                _pl.pallas_call)


@_functools.lru_cache(maxsize=32)
def _fast_segment_cached(shape: SceneShape, seg: int, _fmath: str,
                         _ablate: str, _carry: str, _tile, _pcall):
    from .ops.step import build_chunk_fn
    chunk = build_chunk_fn(shape)
    step = build_step_fn(xla_only_shape(shape))

    @jax.custom_vjp
    def seg_fn(s):
        return chunk(s, jnp.int32(seg))

    def seg_fwd(s):
        return seg_fn(s), s

    def seg_bwd(s0, ct):
        _, vjp = jax.vjp(lambda s: _scan_steps(step, s, seg), s0)
        return vjp(ct)

    seg_fn.defvjp(seg_fwd, seg_bwd)
    return seg_fn


def fast_trajectory(shape: SceneShape, state: SimState, n_steps: int,
                    every: int = 1):
    """``trajectory`` with the fast primal: positions sampled every
    ``every`` steps, each inter-sample block a ``_fast_segment`` (fused
    chunk forward, XLA-recompute backward).  Same caveat as
    ``fast_rollout``; residual memory is one state per sample."""
    if n_steps % every:
        raise ValueError(f"n_steps={n_steps} not divisible by every={every}")
    seg_fn = _fast_segment(shape, every)

    def body(s, _):
        s = seg_fn(s)
        return s, s.masses.pos

    final, traj = jax.lax.scan(body, state, None, length=n_steps // every)
    return final, traj


def trajectory(shape: SceneShape, state: SimState, n_steps: int,
               every: int = 1):
    """Differentiable rollout that also returns stacked positions
    [n_steps//every, 3, N]."""
    step = build_step_fn(xla_only_shape(shape))

    def body(s, _):
        for _i in range(every):
            s = step(s)
        return s, s.masses.pos

    if n_steps % every:
        raise ValueError(f"n_steps={n_steps} not divisible by every={every}")
    final, traj = jax.lax.scan(body, state, None, length=n_steps // every)
    return final, traj
