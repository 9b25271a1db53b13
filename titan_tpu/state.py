"""Device-resident simulation state: one pytree of SoA arrays.

This replaces the reference's entire entity/marshalling machinery: the
``CUDA_MASS``/``CUDA_SPRING`` AoS mirror structs (mass.h:89-126,
spring.h:77-97), per-object cudaMalloc + pointer tables (sim.cu:933-1041), and
the device pointer graph (springs referencing masses by device pointer,
spring.h:83-84).  Masses are rows of ``[3, N]`` component-major arrays;
springs reference masses by int32 index; "deleted" entities are rows with
``valid=False`` (the reference's soft-delete flag, mass.h:120, which here
doubles as the padding mask that satisfies XLA's static-shape requirement).

Layout note: vectors are stored component-major ``[3, N]`` (not ``[N, 3]``)
so that the long axis lands on TPU vector lanes and per-component gathers are
1-D gathers over a contiguous row.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig


def _pytree_dataclass(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_pytree_dataclass
@dataclasses.dataclass
class MassState:
    """Per-mass state arrays; N is the padded mass capacity.

    Mirrors CUDA_MASS (reference mass.h:89-126) minus the pointer plumbing.
    ``extern_force`` is the *persistent* user force (see
    SimConfig.persistent_extern_force); the per-step magnet accumulation the
    reference also stored there is recomputed functionally each step.
    """

    pos: jax.Array          # [3, N]
    vel: jax.Array          # [3, N]
    acc: jax.Array          # [3, N] (carried for Verlet + acceleration())
    extern_force: jax.Array  # [3, N]
    m: jax.Array            # [N]
    T: jax.Array            # [N] per-mass local time (reference mass.h:23)
    fixed: jax.Array        # [N] bool (reference LOCAL_CONSTRAINTS.fixed)
    valid: jax.Array        # [N] bool soft-delete / padding mask
    drag: jax.Array         # [N] drag coefficient (reference setDrag)
    # Magnet properties (reference mass.h:27-31)
    mag_rad: jax.Array      # [N] shell radius
    mag_stiffness: jax.Array  # [N] shell spring constant
    mag_maxf: jax.Array     # [N] max pull force
    mag_scale: jax.Array    # [N] susceptibility scale factor


@_pytree_dataclass
@dataclasses.dataclass
class SpringState:
    """Per-spring state arrays; S is the padded spring capacity.

    Mirrors CUDA_SPRING (reference spring.h:77-97) with endpoint indices in
    place of device pointers.  ``rest`` is mutable *state* (ACTUATED_* springs
    integrate it on device, reference sim.cu:1173-1181).
    """

    left: jax.Array    # [S] int32 index into mass arrays
    right: jax.Array   # [S] int32
    valid: jax.Array   # [S] bool
    k: jax.Array       # [S]
    rest: jax.Array    # [S]
    damping: jax.Array  # [S]
    type: jax.Array    # [S] int8 (SpringType codes, config.py)
    omega: jax.Array   # [S] breathing frequency
    l_max: jax.Array   # [S] actuator max length
    l_min: jax.Array   # [S] actuator min length
    rate: jax.Array    # [S] actuator expansion rate [m/s]


@_pytree_dataclass
@dataclasses.dataclass
class GlobalConstraints:
    """Global contact planes and balls (reference CUDA_GLOBAL_CONSTRAINTS,
    object.h:171-177; applied per mass per step at sim.cu:1303-1309).

    Counts are static (len of arrays); arrays sized exactly.
    """

    plane_normal: jax.Array  # [P, 3] unit normals
    plane_offset: jax.Array  # [P]
    plane_fk: jax.Array      # [P] kinetic friction coeff
    plane_fs: jax.Array      # [P] static friction coeff
    ball_center: jax.Array   # [B, 3]
    ball_radius: jax.Array   # [B]


@_pytree_dataclass
@dataclasses.dataclass
class LocalConstraints:
    """Per-mass local constraint slots (reference CUDA_LOCAL_CONSTRAINTS,
    object.h:203-220; applied at sim.cu:1311-1326).

    Fixed per-type capacities (C*, usually 0) with per-mass counts; a slot j
    is active iff j < count.  Capacities are part of the static scene shape;
    scenes without local constraints trace no constraint code at all.
    """

    cp_normal: jax.Array   # [N, Ccp, 3] contact planes
    cp_offset: jax.Array   # [N, Ccp]
    cp_fk: jax.Array       # [N, Ccp]
    cp_fs: jax.Array       # [N, Ccp]
    cp_count: jax.Array    # [N] int32
    ball_center: jax.Array  # [N, Cb, 3]
    ball_radius: jax.Array  # [N, Cb]
    ball_count: jax.Array   # [N] int32
    pl_normal: jax.Array   # [N, Cpl, 3] constraint planes
    pl_friction: jax.Array  # [N, Cpl]
    pl_count: jax.Array    # [N] int32
    dir_tangent: jax.Array  # [N, Cd, 3] direction constraints
    dir_friction: jax.Array  # [N, Cd]
    dir_count: jax.Array   # [N] int32


@_pytree_dataclass
@dataclasses.dataclass
class StencilState:
    """Offset-bucketed ("stencil") spring families: the TPU-native hot path.

    Observation: in a lattice, each of the 13 spring families connects mass n
    to mass n + delta_f for a CONSTANT index offset delta_f (reference
    object.cu:250-291 with index order k + j*nz + i*ny*nz), and no mass has
    two springs of the same family.  For such springs the endpoint gather is
    a lane rotation (jnp.roll) and the force scatter is the inverse rotation
    -- no gather/scatter at all, pure VPU stencil work.  Measured on one TPU
    v5e chip this is ~485x faster than the index-gather path at the 1M-spring
    benchmark config.

    Springs are bucketed by delta at marshal time; any spring that doesn't
    fit a family (irregular topology, duplicate (delta, left) pairs, rare
    offsets) stays in the general SpringState remainder.  All arrays are
    [F, N] indexed by (family, left-mass index); ``mask`` marks where a
    spring actually exists.  ``rest`` is mutable state (actuators).
    """

    mask: jax.Array     # [F, N] bool
    k: jax.Array        # [F, N]
    rest: jax.Array     # [F, N]
    damping: jax.Array  # [F, N]
    type: jax.Array     # [F, N] int8
    omega: jax.Array    # [F, N]
    l_max: jax.Array    # [F, N]
    l_min: jax.Array    # [F, N]
    rate: jax.Array     # [F, N]


@_pytree_dataclass
@dataclasses.dataclass
class Topology:
    """Precomputed spring->mass incidence for gather-mode force accumulation.

    For mass n, ``inc_idx[n, d]`` is a spring index (S = padding -> zero row)
    and ``inc_sign[n, d]`` is +1 if n is the spring's right endpoint, -1 if
    left (reference applies +f to right, -f to left, sim.cu:1189-1196).
    """

    inc_idx: jax.Array   # [N, D] int32 in [0, S]
    inc_sign: jax.Array  # [N, D] dtype matching state, in {+1, -1, 0}
    # For SEGMENT mode: permutation sorting concat(right, left) by mass id.
    seg_perm: jax.Array  # [2S] int32
    seg_ids: jax.Array   # [2S] int32 sorted segment ids


@_pytree_dataclass
@dataclasses.dataclass
class SimState:
    """The full simulation state: everything the step function reads/writes."""

    t: jax.Array            # [] sim time (breathing springs read it)
    dt: jax.Array           # [] timestep (mutable at pause without retrace)
    g: jax.Array            # [3] global acceleration
    masses: MassState
    springs: SpringState    # remainder (non-stencil) springs
    stencil: StencilState
    gcon: GlobalConstraints
    lcon: LocalConstraints
    topo: Topology


@dataclasses.dataclass(frozen=True)
class SceneShape:
    """Static (hashable) scene descriptor that keys the traced step function."""

    n_masses: int       # padded N
    n_springs: int      # padded S (remainder springs only)
    max_degree: int     # D (incidence degree of the remainder topology)
    stencil_deltas: tuple  # static index offsets, one per stencil family
    has_remainder: bool    # any springs outside the stencil families
    n_planes: int
    n_balls: int
    plane_friction: tuple  # per-plane static flag: any friction coeff set
    cap_cp: int         # local constraint capacities
    cap_ball: int
    cap_pl: int
    cap_dir: int
    has_magnets: bool
    has_drag: bool
    has_breathing: bool  # any ACTIVE_*/ACTUATED_* springs
    has_actuated: bool   # any ACTUATED_* springs (rest length mutates)
    has_damping: bool    # any spring with damping != 0 (skips vel gathers)
    all_valid: bool      # no soft-deleted masses (skips valid-mask work)
    config: SimConfig
    # Cell-binned magnet neighbors (ops/magnets.py): () = exact masked
    # pairwise; (A, C) = bin-table height / per-cell capacity.  Chosen at
    # marshal from config.magnet_binned_threshold.
    magnet_binned: tuple = ()
    # Dense-grid Pallas magnet kernel (ops/magnets_grid.py): set at marshal
    # for large binned scenes on f32; only honored on TPU by ops/step, and
    # cleared by the AD / vmap / auto-SPMD paths (no Pallas there).
    magnet_grid: bool = False
    # Receiver compaction for the binned magnet pass (ops/magnets.py):
    # 0 = receiver-dense (every valid mass computes its magnet force --
    # the reference semantics, and REQUIRED for exactness whenever any
    # mass has mag_rad != 0, because shell contact can reach a plain
    # mass that drifts inside a fat source's radius).  > 0 = the padded
    # capacity of the static receiver set {valid & mag_maxf != 0}, exact
    # when every mag_rad == 0 (shell force is then impossible: the
    # intersection depth dist - (rad_r + rad_s) = dist >= 0), set at
    # marshal for scenes where attractors are sparse in a big lattice --
    # the binned pass is receiver-gather bound (~9 bin-row gathers per
    # receiver), so compacting 1M receivers to a few thousand is the
    # difference between ~1 s and ~ms per force pass.
    magnet_receivers: int = 0
    # max |right - left| over remainder springs (0 if none): the halo-exchange
    # multi-chip path (parallel/halo.py) can evaluate remainder springs
    # locally iff this span fits inside its halo window.
    remainder_span: int = 0
    # Per-field "uniform within every stencil family" flags for
    # (k, rest, damping, type, omega).  Regular lattices are uniform in all
    # five; the tiled Pallas kernel then passes one scalar per family via
    # SMEM instead of streaming an [F, N] array from HBM every step (k's
    # embedded existence mask travels as one packed int32 bitmask per mass).
    stencil_uniform: tuple = (False, False, False, False, False)


def xla_only_shape(shape: "SceneShape") -> "SceneShape":
    """Shape variant with Pallas-backed sub-paths disabled.

    The AD (diff.py), vmap (parallel/batched.py) and automatic-SPMD
    (parallel/sharded.py) paths re-trace the XLA step; a pallas_call inside
    would break reverse-mode AD and the SPMD partitioner, so those paths
    build their step from this cleared shape.
    """
    if not shape.magnet_grid:
        return shape
    return dataclasses.replace(shape, magnet_grid=False)


def pad_to(n: int, mult: int = 128) -> int:
    """Round up to a TPU-lane-friendly multiple (min tile lane dim = 128)."""
    return max(mult, ((n + mult - 1) // mult) * mult)


def device_put_state(state: SimState, sharding: Any = None) -> SimState:
    if sharding is None:
        return jax.device_put(state)
    return jax.device_put(state, sharding)


def state_to_numpy(state: SimState) -> SimState:
    """Fetch the whole state to host numpy (single D2H transfer per leaf)."""
    return jax.tree_util.tree_map(np.asarray, jax.device_get(state))
