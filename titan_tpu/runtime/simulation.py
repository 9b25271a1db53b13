"""The simulation control plane: the reference's ``titan::Simulation`` API
(sim.h:38-122) rebuilt without threads-and-busy-wait races.

Architecture (vs reference L4, SURVEY.md):
- The reference runs a dedicated GPU thread that launches two kernels per dt
  and spin-waits on unsynchronized static bools (sim.cu:36-40, 1704-1841).
  Here a single worker thread dispatches *chunks* of steps as one jitted
  ``lax.fori_loop`` call; JAX dispatch is asynchronous, so the device runs
  ahead while the host sleeps on proper condition variables.  One
  ``Simulation`` per process is NOT required (the reference's static members
  force that; we have no statics).
- State lives on device as an immutable pytree snapshot per chunk boundary;
  ``getAll()`` from any thread grabs a consistent snapshot (the reference
  reads device memory mid-kernel -- torn reads it tolerates by luck).
- Breakpoints are a heap of stop times.  The worker sizes each chunk to land
  exactly on the next breakpoint (reference: per-step check at sim.cu:1707).
  A breakpoint inserted *while a chunk is in flight* takes effect at the next
  chunk boundary, i.e. it may be overshot by at most
  ``config.max_chunk_steps * dt`` sim-seconds (default 0.1 s); set
  breakpoints while paused for exact stops.
"""

from __future__ import annotations

import dataclasses
import heapq
import math
import time
import threading
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import builders
from ..config import (ACTUATED_CONTRACT, ACTUATED_EXPAND, PASSIVE_SOFT,
                      PASSIVE_STIFF, SimConfig, ScatterMode)
from ..containers import Beam, Container, Cube, Lattice, RobotLink
from ..entities import HandleSeq, Mass, Spring
from ..ops import build_chunk_fn
from ..state import (GlobalConstraints, LocalConstraints, MassState,
                     SceneShape, SimState, SpringState, StencilState,
                     Topology, pad_to)
from ..store import HostStore
from ..vec import Vec
from .incremental import EditJournal, _pad_rows, apply_structural_edits
from .logging import get_logger

# step-function cache: one compiled chunk fn per static scene shape
_CHUNK_CACHE: Dict[SceneShape, object] = {}

# distributed chunk cache: one program per (shape, mesh, axis, path).
# Without it every mesh re-place (e.g. an incremental topology edit's
# chunk rebuild) would mint a fresh jit wrapper = a full retrace + axon
# compile per edit cycle.  Mega env hooks and the (monkeypatchable)
# pallas_call join the key so A/Bs and interpret-mode tests are never
# served a chunk built under a different execution mode.
_DIST_CHUNK_CACHE: Dict[tuple, object] = {}


class SimulationDivergedError(RuntimeError):
    """Raised (check_finite=True) when the state contains NaN/Inf."""


def _chunk_for(shape: SceneShape):
    fn = _CHUNK_CACHE.get(shape)
    if fn is None:
        fn = build_chunk_fn(shape)
        _CHUNK_CACHE[shape] = fn
    return fn


# ---------------------------------------------------------------------------
# Fused edit-surgery programs (round 5, VERDICT item 4): the topology-edit
# steady state was dispatch-bound -- a ~35-op eager chain of per-field
# .at[].set / gather programs at ~10-15 ms tunnel latency each (measured
# 0.70 s/cycle at 100^3, scripts/tpu_topo_edit_bench.py).  Each helper
# below folds one surgery group into ONE jitted program; together with the
# _pad_rows shape-stabilized index arrays the steady state is a handful of
# cache-hit dispatches instead of dozens.
# ---------------------------------------------------------------------------

@jax.jit
def _jit_push_mass_rows(m: MassState, idx, vals):
    """Scatter every mass field of the given rows in one program.
    ``vals``: dict of host-converted row payloads keyed by field."""
    return dataclasses.replace(
        m,
        pos=m.pos.at[:, idx].set(vals["pos"]),
        vel=m.vel.at[:, idx].set(vals["vel"]),
        acc=m.acc.at[:, idx].set(vals["acc"]),
        extern_force=m.extern_force.at[:, idx].set(vals["extern_force"]),
        m=m.m.at[idx].set(vals["m"]),
        T=m.T.at[idx].set(vals["T"]),
        fixed=m.fixed.at[idx].set(vals["fixed"]),
        valid=m.valid.at[idx].set(vals["valid"]),
        drag=m.drag.at[idx].set(vals["drag"]),
        mag_rad=m.mag_rad.at[idx].set(vals["mag_rad"]),
        mag_stiffness=m.mag_stiffness.at[idx].set(vals["mag_stiffness"]),
        mag_maxf=m.mag_maxf.at[idx].set(vals["mag_maxf"]),
        mag_scale=m.mag_scale.at[idx].set(vals["mag_scale"]),
    )


@jax.jit
def _jit_push_spring_fields(tree, rows, vals):
    """Scatter the 8 per-spring param planes of one subsystem (stencil:
    rows = (fi, sl); remainder: rows = (ri,)) in one program."""
    updates = {f: getattr(tree, f).at[rows].set(vals[f]) for f in vals}
    return dataclasses.replace(tree, **updates)


@jax.jit
def _jit_refresh_mass_gather(m: MassState, ti):
    """One program gathering the device-evolving fields of given rows."""
    return m.pos[:, ti], m.vel[:, ti], m.acc[:, ti], m.T[ti]


def _dist_chunk_for(shape: SceneShape, mesh, axis: str, kind: str,
                    state=None):
    import os as _os

    from jax.experimental import pallas as _pl
    key = (shape, mesh, axis, kind,
           _os.environ.get("TITAN_MEGA", "1"),
           _os.environ.get("TITAN_MEGA_SEG", ""),
           _os.environ.get("TITAN_DIST_MEGA", ""),
           _pl.pallas_call)
    fn = _DIST_CHUNK_CACHE.get(key)
    if fn is None:
        if kind == "halo_tiled":
            from ..parallel.halo_tiled import build_halo_tiled_chunk
            fn = build_halo_tiled_chunk(shape, mesh, axis)
        elif kind == "halo":
            from ..parallel.halo import build_halo_chunk
            # make(state) only reads the pytree STRUCTURE (sharding spec
            # derivation), which is a function of shape -- cacheable
            fn = build_halo_chunk(shape, mesh, axis)(state)
        else:
            from ..parallel.sharded import build_sharded_chunk
            fn = build_sharded_chunk(shape, mesh, axis)
        _DIST_CHUNK_CACHE[key] = fn
    return fn


class Simulation:
    """TPU-native mass-spring simulation with the reference's control API."""

    def __init__(self, config: Optional[SimConfig] = None):
        self.config = config or SimConfig()
        self._store = HostStore(dtype=self.config.host_store_dtype)
        self.containers = []
        self._planes = []  # (unit normal [3], offset, fk, fs)
        self._balls = []   # (center [3], radius)
        self._dt = 0.0001                       # reference default, sim.cu:78
        self._global_acc = np.array([0.0, 0.0, -9.81])  # sim.cu:86
        self._T = 0.0
        self._steps = 0
        self._bpts = []
        self._lock = threading.RLock()
        self._cv = threading.Condition(self._lock)
        self._running = False
        self._started = False
        self._ended = False
        self._structure_dirty = False
        self._gen = 0        # compaction generation (see entities handles)
        self._remaps = []    # per generation: (mass old->new, spring old->new)
        self._state: Optional[SimState] = None
        self._diverged_at: Optional[float] = None
        self._shape: Optional[SceneShape] = None
        # incremental topology-edit bookkeeping (runtime/incremental.py):
        # paused-time edit journal + marshal-time placement mirrors
        self._journal: Optional[EditJournal] = None
        self._n_marshaled = 0      # device-resident real mass rows
        self._s_marshaled = 0      # springs covered by _sp_family/_sp_slot
        self._rem_count = 0        # live remainder spring count
        self._rem_left = np.zeros(0, np.int64)   # remainder slot -> endpoint
        self._rem_right = np.zeros(0, np.int64)
        self._st_mask = np.zeros((0, 0), bool)   # host stencil-mask mirror
        self._fam_scalars = {}     # uniform-field family scalars (or None)
        self._chunk = None
        self._rate: Optional[float] = None   # measured steps/s of _chunk
        self._timed_chunks = 0               # dispatches since _chunk built
        self._worker: Optional[threading.Thread] = None

    # ------------------------------------------------------------------ guards
    def _check_not_ended(self, msg="Cannot modify simulation after the end of the simulation."):
        if self._ended:
            raise RuntimeError("The simulation has ended. " + msg)

    def _check_can_edit(self):
        self._check_not_ended()
        if self._started and self._running:
            raise RuntimeError("The simulation is running. Stop the simulation to make changes.")

    # ------------------------------------------------------------ entity lists
    @property
    def masses(self):
        return HandleSeq(self, Mass, lambda: self._store.n_masses)

    @property
    def springs(self):
        return HandleSeq(self, Spring, lambda: self._store.n_springs)

    def getMassByIndex(self, i: int) -> Mass:
        assert 0 <= i < self._store.n_masses
        return Mass(self, i)

    def getSpringByIndex(self, i: int) -> Spring:
        assert 0 <= i < self._store.n_springs
        return Spring(self, i)

    def getContainerByIndex(self, i: int) -> Container:
        return self.containers[i]

    # ------------------------------------------------------------------ create
    def createMass(self, pos=None) -> Mass:
        """Reference sim.cu:274-290.  No-arg form uses the default Mass()
        (m = 1.0, origin, mass.cu:8-19); positional form Mass(pos) (m = 0.1,
        mass.h:18)."""
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        if pos is None:
            i = self._store.add_mass((0.0, 0.0, 0.0), m=1.0)
        else:
            i = self._store.add_mass(_np3(pos), m=0.1)
        if self._started:
            self._structure_dirty = True
        return Mass(self, i)

    def createSpring(self, m1: Optional[Mass] = None,
                     m2: Optional[Mass] = None) -> Spring:
        """Reference sim.cu:325-345; two-mass form sets rest = distance."""
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        if m1 is None or m2 is None:
            i = self._store.add_spring()
        else:
            # rest = CURRENT endpoint distance: refresh just those two
            # rows from the device (the store may be stale while paused)
            if self._started:
                self._refresh_mass_rows(
                    np.array([m1._i, m2._i]),
                    skip=self._journal.m_written if self._journal else None)
            d = self._store.pos[m2._i] - self._store.pos[m1._i]
            rest = math.sqrt(float(np.dot(d, d)))
            i = self._store.add_spring(m1._i, m2._i, k=10000.0, rest=rest)
        if self._started:
            self._structure_dirty = True
        return Spring(self, i)

    # ------------------------------------------------------------------ delete
    def deleteMass(self, m: Mass) -> None:
        """Soft delete: the valid flag is the reference's own mechanism
        (mass.h:120, invalidate kernel sim.cu:343-351); springs with an
        invalid endpoint exert no force (sim.cu:1163)."""
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        self._store.valid[m._i] = False
        self._touch_mass(m._i)
        if self._started:
            self._structure_dirty = True

    def deleteSpring(self, s: Spring) -> None:
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        self._store.s_valid[s._i] = False
        self._touch_spring(s._i)
        if self._started:
            self._structure_dirty = True

    def deleteContainer(self, c: Container) -> None:
        """Reference sim.cu:416-564 (bulk invalidate + compaction)."""
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        self._store.valid[c._mass_idx] = False
        self._store.s_valid[c._spring_idx] = False
        self._touch_mass(c._mass_idx)
        self._touch_spring(c._spring_idx)
        if c in self.containers:
            self.containers.remove(c)
        if self._started:
            self._structure_dirty = True

    # -------------------------------------------------------------- containers
    def createContainer(self) -> Container:
        self._check_not_ended("New objects cannot be created.")
        c = Container(self)
        self.containers.append(c)
        return c

    def _register_built(self, c: Container) -> Container:
        if self._started:
            self._structure_dirty = True
        # per-container default palette (beyond-reference nicety): each
        # container gets a distinct render color, cycling; rows the
        # builder already colored keep their value.  Host-side graphics
        # data only -- never staged to the device.
        if len(c._mass_idx):
            rows = c._mass_idx
            col = self._store.color[rows]
            default = np.asarray(HostStore.DEFAULT_COLOR)
            untouched = np.all(col == default, axis=1)
            if untouched.any():
                self._store.color[rows[untouched]] = _CONTAINER_PALETTE[
                    len(self.containers) % len(_CONTAINER_PALETTE)]
        self.containers.append(c)
        return c

    def createCube(self, center, side_length: float = 1.0) -> Cube:
        self._check_not_ended("New objects cannot be created.")
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        return self._register_built(Cube(self, center, side_length))

    def createLattice(self, center, dims, nx: int = 10, ny: int = 10,
                      nz: int = 10) -> Lattice:
        self._check_not_ended("New objects cannot be created.")
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        return self._register_built(Lattice(self, center, dims, nx, ny, nz))

    def createBeam(self, center, dims, nx: int = 10, ny: int = 10,
                   nz: int = 10) -> Beam:
        self._check_not_ended("New objects cannot be created.")
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        return self._register_built(Beam(self, center, dims, nx, ny, nz))

    def createRobotLink(self, pos1, pos2, mass: float, max_exp_length: float,
                        min_exp_length: float, expansion_rate: float,
                        k: float, magnetic_force: float,
                        radius: float = 0.015) -> RobotLink:
        self._check_not_ended("New objects cannot be created.")
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        return self._register_built(RobotLink(
            self, pos1, pos2, mass, max_exp_length, min_exp_length,
            expansion_rate, k, magnetic_force, radius))

    def importFromSTL(self, path: str, density: float = 10.0,
                      num_rays: int = 5) -> Container:
        """Reference sim.cu:2085-2151; implementation in titan_tpu.stl."""
        self._check_not_ended("Cannot import new STL objects")
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        from ..stl import import_from_stl
        return self._register_built(import_from_stl(self, path, density, num_rays))

    # ------------------------------------------------------- global constraints
    def createPlane(self, abc, d: float, friction_k: float = 0.0,
                    friction_s: float = 0.0) -> None:
        """Half-space constraint ax+by+cz < d (reference sim.cu:2251-2276).
        Note the reference's argument order is (K, S) for the friction
        overload (sim.h:64)."""
        self._check_not_ended("New objects cannot be created.")
        n = _np3(abc)
        n = n / math.sqrt(float(np.dot(n, n)))
        self._planes.append((n, float(d), float(friction_k), float(friction_s)))
        if self._started:
            self._structure_dirty = True
            if self._journal is not None:
                self._journal.gcon_dirty = True

    def createBall(self, center, r: float) -> None:
        """Reference sim.cu:2278-2288."""
        self._check_not_ended("New constraints cannot be added.")
        self._balls.append((_np3(center), float(r)))
        if self._started:
            self._structure_dirty = True
            if self._journal is not None:
                self._journal.gcon_dirty = True

    def clearConstraints(self) -> None:
        """Clears global constraints only (reference sim.cu:2290-2293)."""
        self._planes.clear()
        self._balls.clear()
        if self._started:
            self._structure_dirty = True
            if self._journal is not None:
                self._journal.gcon_dirty = True

    # ------------------------------------------------------------- bulk setters
    def setAllSpringConstantValues(self, k: float) -> None:
        """Host-side only until set/setAll, like the reference (sim.cu:769-777)."""
        self._check_not_ended()
        self._store.k[: self._store.n_springs] = k
        self._journal_bulk()

    def defaultRestLengths(self) -> None:
        self._check_not_ended()
        st = self._store
        s = st.n_springs
        attached = (st.left[:s] >= 0) & (st.right[:s] >= 0)
        if attached.all():
            # common case, in-place (no 3x [S,3] temporaries at 100^3)
            from .. import builders
            st.rest[:s] = builders.rest_lengths(
                st.pos, st.left[:s], st.right[:s])
            self._journal_bulk("rest")
            return
        li = np.where(attached, st.left[:s], 0)
        ri = np.where(attached, st.right[:s], 0)
        d = st.pos[ri] - st.pos[li]
        st.rest[:s] = np.where(
            attached, np.sqrt(np.sum(d * d, axis=1)), st.rest[:s])
        self._journal_bulk("rest")

    def setAllMassValues(self, m: float) -> None:
        """NOTE: the reference *adds* m to every mass (sim.cu:789-796)."""
        self._check_not_ended()
        self._store.m[: self._store.n_masses] += m
        self._journal_bulk("m")

    def setTimeStep(self, delta_t: float) -> None:
        """Live: the reference reads dt from a member each step (sim.cu:798-808)."""
        self._check_not_ended()
        if delta_t <= 0:
            raise RuntimeError("Cannot set time step to negative or zero value.")
        with self._lock:
            self._dt = float(delta_t)
            if self._state is not None:
                self._state = dataclasses.replace(
                    self._state,
                    dt=jnp.asarray(delta_t, dtype=self.config.np_dtype))

    def getTimeStep(self) -> float:
        return self._dt

    def setGlobalAcceleration(self, global_acc) -> None:
        """Reference sim.cu:2334-2340 (throws while running)."""
        if self._running:
            raise RuntimeError("The simulation is running. The global force "
                               "parameter cannot be changed during runtime")
        self._global_acc = _np3(global_acc)
        if self._state is not None:
            self._state = dataclasses.replace(
                self._state,
                g=jnp.asarray(self._global_acc, dtype=self.config.np_dtype))

    # ------------------------------------------------------------- marshalling
    def _marshal(self) -> None:
        """Build the device state pytree from the host store (replaces
        toArray/massToArray/springToArray, reference sim.cu:940-1041).

        Springs are split into roll-based stencil families (regular topology,
        the TPU hot path -- see StencilState) and a general gather/segment
        remainder; host index maps (_sp_family/_sp_slot) record where each
        spring landed so readback and pushes can find it."""
        st, cfg = self._store, self.config
        if cfg.compact_threshold:
            n, s = st.n_masses, st.n_springs
            # structural holes (culled STL lattice sites) are index geometry,
            # not garbage: they never count toward the dead fraction and
            # store.compact preserves them
            dead_m = int(np.count_nonzero(~st.valid[:n] & ~st.hole[:n]))
            dead_s = s - int(np.count_nonzero(st.s_valid[:s]))
            if ((n and dead_m / n >= cfg.compact_threshold)
                    or (s and dead_s / s >= cfg.compact_threshold)):
                self._compact_store()
        dt = cfg.np_dtype
        n, s = st.n_masses, st.n_springs
        N = pad_to(n)

        # ---- spring partition: stencil families vs remainder
        attached_all = (st.left[:s] >= 0) & (st.right[:s] >= 0)
        placeable = st.s_valid[:s] & attached_all
        if cfg.use_stencil:
            families, rem_idx = builders.build_stencil_groups(
                st.left[:s], st.right[:s], placeable, n,
                max_families=cfg.stencil_max_families,
                min_count=cfg.stencil_min_count)
        else:
            families, rem_idx = [], np.flatnonzero(placeable)
        deltas = tuple(int(d) for d, _, _ in families)
        s_rem = int(rem_idx.shape[0])
        S = pad_to(max(s_rem, 1))

        # host map: where did spring i land?
        self._sp_family = np.full(s, -1, dtype=np.int32)
        self._sp_slot = np.full(s, -1, dtype=np.int64)
        for fi, (_, sidx, lpos) in enumerate(families):
            self._sp_family[sidx] = fi
            self._sp_slot[sidx] = lpos
        self._sp_slot[rem_idx] = np.arange(s_rem)

        # ---- static shape (feature flags shared with the incremental
        # topology-edit path, runtime/incremental.py)
        caps = _local_caps(st)
        flags = _feature_flags(st, cfg)
        max_deg, rem_span = _remainder_degree_span(st, rem_idx, n)
        shape = SceneShape(
            n_masses=N, n_springs=S, max_degree=max_deg,
            stencil_deltas=deltas, has_remainder=s_rem > 0,
            n_planes=len(self._planes), n_balls=len(self._balls),
            plane_friction=tuple(bool(p[2] or p[3]) for p in self._planes),
            cap_cp=caps[0], cap_ball=caps[1], cap_pl=caps[2], cap_dir=caps[3],
            config=cfg,
            remainder_span=rem_span,
            **flags,
        )

        def vec3(a):  # host [cap,3] f64 -> device [3,N] cfg-dtype
            out = np.zeros((3, N), dtype=dt)
            out[:, :n] = a[:n].T
            return jnp.asarray(out)

        def sc(a, fill=0.0, dtype=None):
            out = np.full(N, fill, dtype=dtype or dt)
            out[:n] = a[:n]
            return jnp.asarray(out)

        masses = MassState(
            pos=vec3(st.pos), vel=vec3(st.vel), acc=vec3(st.acc),
            extern_force=vec3(st.extern_force),
            m=sc(st.m, fill=1.0), T=sc(st.T),
            fixed=sc(st.fixed, fill=False, dtype=bool),
            valid=sc(st.valid, fill=False, dtype=bool),
            drag=sc(st.drag),
            mag_rad=sc(st.mag_rad), mag_stiffness=sc(st.mag_stiffness),
            mag_maxf=sc(st.mag_maxf), mag_scale=sc(st.mag_scale),
        )

        # ---- remainder springs (general gather/segment path); the builder
        # is shared with the incremental topology-edit path, which rebuilds
        # ONLY this (small) subsystem when irregular springs change
        springs, topo, rem_left, rem_right = _build_remainder_states(
            st, rem_idx, N, S, shape.max_degree, dt, cfg)

        # ---- stencil families
        F = len(families)
        host_fields = {"k": st.k, "rest": st.rest, "damping": st.damping,
                       "type": st.s_type, "omega": st.omega,
                       "l_max": st.l_max, "l_min": st.l_min, "rate": st.rate}
        field_dt = {"type": np.int8}

        def fam_uniform(field):
            # uniform within every family (values may differ across
            # families), compared in the DEVICE dtype: f64 geometric rest
            # lengths differ by an ulp across lattice sites but cast to
            # identical f32 values, and the device arrays are what the
            # kernels actually read
            fdt = field_dt.get(field, dt)
            for _, sidx, _ in families:
                vals = host_fields[field][sidx].astype(fdt)
                if vals.size and not np.all(vals == vals[0]):
                    return False
            return True

        uniform = {f: fam_uniform(f) for f in host_fields}
        shape = dataclasses.replace(shape, stencil_uniform=tuple(
            uniform[f] for f in ("k", "rest", "damping", "type", "omega")))

        mask_np = np.zeros((F, N), dtype=bool)
        for fi, (_, _, lpos) in enumerate(families):
            mask_np[fi, lpos] = True
        mask_dev = jnp.asarray(mask_np)
        stencil_arrays = {"mask": mask_dev}
        fam_scalar_mirror = {}
        for f, host in host_fields.items():
            fdt = field_dt.get(f, dt)
            if uniform[f]:
                # one scalar per family: expand ON DEVICE -- at 100^3 this
                # cuts ~400 MB of host staging + tunnel upload per marshal
                # to a handful of scalars (the dominant setup cost)
                scalars = np.array(
                    [host[sidx[0]] if len(sidx) else 0 for _, sidx, _
                     in families], dtype=fdt)
                fam_scalar_mirror[f] = scalars
                stencil_arrays[f] = jnp.where(
                    mask_dev, jnp.asarray(scalars)[:, None],
                    jnp.zeros((), fdt))
            else:
                arr = np.zeros((F, N), dtype=fdt)
                for fi, (_, sidx, lpos) in enumerate(families):
                    arr[fi, lpos] = host[sidx]
                stencil_arrays[f] = jnp.asarray(arr)
        stencil = StencilState(**stencil_arrays)

        gcon = _build_gcon(self._planes, self._balls, dt)

        lcon = _marshal_local(st, N, shape, dt)

        self._shape = shape
        self._state = SimState(
            t=jnp.asarray(self._T, dtype=dt),
            dt=jnp.asarray(self._dt, dtype=dt),
            g=jnp.asarray(self._global_acc, dtype=dt),
            masses=masses, springs=springs, stencil=stencil,
            gcon=gcon, lcon=lcon, topo=topo,
        )
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            self._place_distributed(shape, mesh)
        else:
            self._chunk = _chunk_for(shape)
        # a fresh chunk fn (possibly a different path/scene cost) must be
        # re-probed before long dispatches (worker loop, max_chunk_seconds)
        self._rate = None
        self._timed_chunks = 0
        # mirrors + fresh journal for the incremental topology-edit path
        # (runtime/incremental.py)
        self._n_marshaled = n
        self._s_marshaled = s
        self._rem_count = s_rem
        self._rem_left, self._rem_right = rem_left, rem_right
        self._st_mask = mask_np
        self._fam_scalars = {
            f: fam_scalar_mirror.get(f) for f in
            ("k", "rest", "damping", "type", "omega")}
        self._journal = EditJournal()
        self._structure_dirty = False
        get_logger().debug("marshalled scene shape: %s", shape)

    def _place_distributed(self, shape: SceneShape, mesh) -> None:
        """Shard state + chunk over the mesh chosen by distribute().

        Beyond-VMEM scenes in the distributed-tiled envelope run the
        grid-tiled Pallas kernel per shard (parallel/halo_tiled.py -- the
        single-device kernel's measured ~10x over XLA at 100^3, with only
        pos/vel halo ppermutes per step); other scenes prefer the explicit
        halo-exchange path (~3x the automatic partitioner on an 8-device
        mesh, docs/PERFORMANCE.md); scenes outside both envelopes fall
        back to XLA's automatic SPMD.  Re-marshal (feature flips, topology
        edits) re-places automatically."""
        from ..ops.pallas_step import pallas_supported
        from ..parallel.halo import halo_reject_reason, place
        from ..parallel.halo_tiled import halo_tiled_reject_reason
        from ..parallel.sharded import shard_state
        axis = self._mesh_axis
        ht_reason = halo_tiled_reject_reason(shape, mesh.shape[axis])
        if ht_reason is None and not pallas_supported(shape):
            # scenes beyond the VMEM kernel: per-shard tiled Pallas kernel
            # (the envelope rule is conservative -- smaller scenes keep the
            # XLA halo path, whose per-step cost at small blocks is known)
            self._state = place(self._state, mesh, axis)
            self._chunk = _dist_chunk_for(shape, mesh, axis, "halo_tiled")
            get_logger().info(
                "distributed over %d devices via the per-shard tiled "
                "Pallas kernel", mesh.devices.size)
            return
        reason = halo_reject_reason(shape, mesh.shape[axis])
        if reason is None:
            self._state = place(self._state, mesh, axis)
            self._chunk = _dist_chunk_for(shape, mesh, axis, "halo",
                                          state=self._state)
            path = "halo"
        else:
            # the automatic partitioner is a measured ~3.1x step-rate cliff
            # vs the halo path (docs/PERFORMANCE.md) -- warn, naming the
            # failed envelope condition (VERDICT r2 weak #4)
            get_logger().warning(
                "scene is outside the halo-exchange envelope; using "
                "XLA's automatic SPMD partitioner (~3x slower per "
                "step): %s", reason)
            self._state = shard_state(self._state, mesh, axis)
            self._chunk = _dist_chunk_for(shape, mesh, axis, "sharded")
            path = "sharded"
        get_logger().info("distributed over %d devices via %s path",
                          mesh.devices.size, path)

    def distribute(self, mesh=None, axis: str = "shard") -> None:
        """Run this simulation block-sharded across a device mesh.

        The reference is single-GPU by construction (SURVEY.md section
        5.8); here the SAME control-plane API (start/wait/get/set) drives a
        scene split over every chip of a TPU slice: per-step communication
        is the halo exchange / XLA collectives, host readback gathers
        transparently.  Call before start() (or at a pause followed by a
        topology edit; the next re-marshal re-places).  With no argument,
        a 1-D mesh over all visible devices is used.
        """
        self._check_not_ended()
        if mesh is None:
            from ..parallel.mesh import make_mesh
            mesh = make_mesh((axis,))
        self._mesh = mesh
        self._mesh_axis = axis
        if self._state is not None and self._shape is not None:
            self._place_distributed(self._shape, mesh)
            self._rate = None
            self._timed_chunks = 0

    # ----------------------------------------------------------------- control
    def start(self) -> None:
        """Marshal the scene and launch the worker (reference sim.cu:1547-1591)."""
        self._check_not_ended("Cannot call sim.start() after the end of the simulation.")
        if self._store.n_masses == 0:
            raise RuntimeError("No masses have been added. Please add masses "
                               "before starting the simulation.")
        if self._dt <= 0:
            raise RuntimeError("Simulation timestep is invalid. Please choose "
                               "a positive non-zero value.")
        self._T = 0.0
        self._marshal()
        get_logger().info(
            "start: %d masses, %d springs (%d stencil families, remainder=%s"
            "), %d planes, %d balls",
            self._store.n_masses, self._store.n_springs,
            len(self._shape.stencil_deltas), self._shape.has_remainder,
            self._shape.n_planes, self._shape.n_balls)
        self._started = True
        self._running = True
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="titan-tpu-worker")
        self._worker.start()

    def _run(self) -> None:
        """Worker loop: chunked on-device stepping toward breakpoints.

        Determinism note: the reference's GPU thread free-runs from start()
        and pause(t) races it (whoever passes t first wins; tolerable there
        because the GPU advances slowly in wall-clock terms).  A TPU chunk
        advances 0.1 sim-seconds per millisecond, so free-running would make
        every pause overshoot nondeterministically.  Instead the worker only
        steps toward *pending breakpoints*: sim time advances exactly to
        what the host asked for (wait/pause/waitUntil all set breakpoints)
        and every observed time is exact and reproducible.
        """
        prev_state = None
        while True:
            with self._cv:
                while not self._ended and not (self._running and self._bpts):
                    self._cv.wait()
                if self._ended:
                    self._cv.notify_all()
                    return
                nxt = self._bpts[0]
                if nxt <= self._T + 1e-12:
                    heapq.heappop(self._bpts)
                    self._running = False
                    self._cv.notify_all()
                    continue
                dt = self._dt
                n = int(math.ceil((nxt - self._T) / dt - 1e-9))
                n = max(1, min(n, self.config.max_chunk_steps))
                # wall-time cap: the tunneled-TPU runtime kills single
                # dispatches past ~1 min (config.max_chunk_seconds).  A
                # fresh chunk fn runs two probe-sized dispatches first
                # (the first one carries compile time and is not timed);
                # the learned rate then sizes every dispatch, re-measured
                # periodically for drift.
                if self._rate is None:
                    n = min(n, self.config.probe_chunk_steps)
                else:
                    n = min(n, max(1, int(self._rate
                                          * self.config.max_chunk_seconds)))
                measure = (self._timed_chunks == 1
                           or self._timed_chunks % 64 == 0) \
                    and self._timed_chunks > 0
                state, chunk = self._state, self._chunk
            if measure:
                # drain in-flight dispatches BEFORE starting the timer --
                # otherwise the timed window absorbs the previous chunk's
                # device execution (on axon, dispatch 0's window includes
                # the 70-550 s session cold start, collapsing the learned
                # rate to ~0 and shattering the next 64 dispatches into
                # single steps).  Hard sync via device_get:
                # block_until_ready is unreliable on axon (CLAUDE.md).
                jax.device_get(state.t)
            t0 = time.perf_counter()
            new_state = chunk(state, jnp.int32(n))
            if measure:
                # dispatch 0 (compile + cold start) is deliberately never
                # timed
                jax.device_get(new_state.t)
                r = n / max(time.perf_counter() - t0, 1e-6)
                self._rate = r if self._rate is None \
                    else 0.5 * self._rate + 0.5 * r
            self._timed_chunks += 1
            if self.config.check_finite:
                ok = bool(jax.device_get(
                    jnp.isfinite(new_state.masses.pos).all()
                    & jnp.isfinite(new_state.masses.vel).all()))
                if not ok:
                    with self._cv:
                        self._running = False
                        self._diverged_at = self._T + n * dt
                        self._cv.notify_all()
                    return
            if prev_state is not None:
                # bound dispatch pipelining to ~2 chunks in flight
                jax.block_until_ready(prev_state.t)
            prev_state = state
            with self._cv:
                # setTimeStep may have fired while this chunk was in flight:
                # its dt update to self._state would be clobbered by this
                # writeback (the chunk output embeds the dt it ran with), so
                # re-stamp.  _T accounting uses the local dt the chunk
                # actually ran with, which stays correct either way.
                if self._dt != dt:
                    new_state = dataclasses.replace(
                        new_state,
                        dt=jnp.asarray(self._dt, dtype=self.config.np_dtype))
                self._state = new_state
                self._T += n * dt
                self._steps += n
                self._cv.notify_all()

    def setBreakpoint(self, time: float) -> None:
        """Reference sim.cu:814-820 (here with an actual mutex)."""
        self._check_not_ended("Cannot set breakpoints after the end of the simulation run.")
        with self._cv:
            heapq.heappush(self._bpts, float(time))
            self._cv.notify_all()

    def pause(self, t: float) -> None:
        """Pause at sim time t, blocking the caller (reference sim.cu:1843-1850)."""
        self._check_not_ended("Control functions cannot be called.")
        self.setBreakpoint(t)
        self.waitForEvent()

    def resume(self) -> None:
        """Reference sim.cu:1684-1702; re-marshals if the scene changed."""
        self._check_not_ended("Cannot resume the simulation.")
        if not self._started:
            raise RuntimeError("The simulation has not started. You cannot "
                               "resume a simulation before calling sim.start().")
        if self._diverged_at is not None:
            raise SimulationDivergedError(
                f"simulation state contains NaN/Inf at t <= {self._diverged_at}"
                "; cannot resume")
        if self._store.n_masses == 0:
            raise RuntimeError("No masses have been added.")
        if self._structure_dirty:
            # incremental row-level apply when possible; full re-marshal
            # (pull-everything first) otherwise -- runtime/incremental.py
            path = apply_structural_edits(self)
            get_logger().debug("resume: structural edits applied via %s "
                               "path", path)
        with self._cv:
            self._running = True
            self._cv.notify_all()

    def wait(self, t: float) -> None:
        """Block the host for t sim-seconds (reference sim.cu:1852-1861).

        Deviation (deliberate): the reference merely spins the host while the
        GPU keeps free-running, so the state observed after wait() depends on
        wall-clock timing.  Here wait() parks the simulation at exactly
        time()+t via a breakpoint, making every get() after a wait()
        deterministic; the reference tests' own ``wait -> getAll -> resume``
        pattern then samples exact times.  If the sim is already paused this
        returns immediately, like the reference.
        """
        self._check_not_ended("Control functions cannot be called.")
        with self._cv:
            if not self._running:
                return
            target = self._T + t
        self.pause(target)

    def waitUntil(self, t: float) -> None:
        """Park at sim time t (same deterministic semantics as wait())."""
        self._check_not_ended("Control functions cannot be called.")
        with self._cv:
            if not self._running or self._T > t:
                return
        self.pause(t)

    def waitForEvent(self) -> None:
        self._check_not_ended("Control functions cannot be called.")
        with self._cv:
            self._cv.wait_for(lambda: not self._running)
        if self._diverged_at is not None:
            raise SimulationDivergedError(
                f"simulation state contains NaN/Inf at t <= {self._diverged_at}")

    def stop(self, t: Optional[float] = None) -> None:
        """Stop and free (reference sim.cu:1517-1545)."""
        if self._running:
            self.setBreakpoint(self.time() if t is None else t)
            self.waitForEvent()
        with self._cv:
            self._ended = True
            self._cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=30)
        self._state = None
        self._chunk = None

    def reset(self) -> None:
        """Back to a fresh pre-start simulation (reference sim.cu:102-129)."""
        with self._cv:
            self._ended = True
            self._cv.notify_all()
        if self._worker is not None:
            self._worker.join(timeout=30)
        self.__init__(self.config)

    def time(self) -> float:
        with self._lock:
            return self._T

    def running(self) -> bool:
        return self._running

    # ---- viewer camera (reference GRAPHICS-only API, sim.h:124-128);
    # consumed by runtime/viewer.Recorder.export_html's initial view
    def setViewport(self, camera_position, target_location, up_vector) -> None:
        """Reference sim.cu:1636-1648 (GRAPHICS builds)."""
        if self._running:
            raise RuntimeError("The simulation is running. Cannot modify "
                               "viewport during simulation run.")
        self._camera = (_np3(camera_position), _np3(target_location),
                        _np3(up_vector))

    def getProjectionMatrix(self) -> np.ndarray:
        """The current model-view-projection matrix (reference sim.h:128,
        graphics.cpp::getProjection): perspective 45 deg FOV, 4:3 aspect,
        near 0.01 / far 200, looking from the setViewport camera.  Returns
        a [4, 4] row-major numpy array (the reference returns a glm::mat4;
        same matrix, column-major there)."""
        cam, look, up = getattr(self, "_camera",
                                (np.array([15.0, 15.0, 7.0]),
                                 np.array([0.0, 0.0, 2.0]),
                                 np.array([0.0, 0.0, 1.0])))
        fovy, aspect, near, far = math.radians(45.0), 4.0 / 3.0, 0.01, 200.0
        f = 1.0 / math.tan(fovy / 2)
        proj = np.zeros((4, 4))
        proj[0, 0] = f / aspect
        proj[1, 1] = f
        proj[2, 2] = (far + near) / (near - far)
        proj[2, 3] = 2 * far * near / (near - far)
        proj[3, 2] = -1.0
        fwd = look - cam
        fwd = fwd / np.linalg.norm(fwd)
        s = np.cross(fwd, up / np.linalg.norm(up))
        s = s / np.linalg.norm(s)
        u = np.cross(s, fwd)
        view = np.eye(4)
        view[0, :3], view[0, 3] = s, -np.dot(s, cam)
        view[1, :3], view[1, 3] = u, -np.dot(u, cam)
        view[2, :3], view[2, 3] = -fwd, np.dot(fwd, cam)
        return proj @ view

    def moveViewport(self, displacement) -> None:
        """Reference sim.cu:1651-1661."""
        if self._running:
            raise RuntimeError("The simulation is running. Cannot modify "
                               "viewport during simulation run.")
        cam, look, up = getattr(self, "_camera",
                                (np.array([15.0, 15.0, 7.0]),
                                 np.array([0.0, 0.0, 2.0]),
                                 np.array([0.0, 0.0, 1.0])))
        self._camera = (cam + _np3(displacement), look, up)

    def fps(self) -> float:
        """Render-rate counter (reference sim.cu:1201-1214).  Rendering is
        decoupled here (runtime/viewer.Recorder); with no attached recorder
        this returns -1.0 like the reference's no-frames case."""
        rec = getattr(self, "_recorder", None)
        return rec.fps() if rec is not None else -1.0

    def printPositions(self) -> None:
        self._check_not_ended("You cannot view parameters of the simulation "
                              "after it has been stopped.")
        st = self._store
        for i in range(st.n_masses):
            print(f"{i}: ({st.pos[i, 0]}, {st.pos[i, 1]}, {st.pos[i, 2]})")

    def printSprings(self) -> None:
        """Debug dump of spring endpoints + rest (reference printSprings,
        sim.cu:2317-2332; its host branch prints only a header -- endpoint
        + rest matches its device-branch printSpring kernel, and is more
        useful than nothing)."""
        self._check_not_ended("You cannot view parameters of the simulation "
                              "after it has been stopped.")
        st = self._store
        for i in range(st.n_springs):
            print(f"{i}: ({st.left[i]}, {st.right[i]}) rest {st.rest[i]}")

    # --------------------------------------------------------------- get / set
    def _snapshot(self) -> SimState:
        with self._lock:
            state = self._state
        if state is None:
            raise RuntimeError("Simulation not started.")
        return state

    def getAll(self) -> None:
        """Device -> host readback of all mass state (+ spring rest lengths).

        Reference getAll/massFromArray (sim.cu:643-654, 1094-1116); the
        reference's springFromArray is an acknowledged no-op (sim.cu:1118) so
        actuated rest lengths never reach the host there -- here they do.
        """
        if not self._started or self._state is None:
            return
        state = self._snapshot()
        st = self._store
        # rows created since the last (re)marshal have no device values
        # yet (they are pushed at the next resume) -- pull only marshaled
        # rows so fresh creates keep their host values
        n = min(st.n_masses, self._n_marshaled)
        m_state, rem_rest, st_rest = jax.device_get(
            (state.masses, state.springs.rest, state.stencil.rest))
        st.pos[:n] = np.asarray(m_state.pos)[:, :n].T
        st.vel[:n] = np.asarray(m_state.vel)[:, :n].T
        st.acc[:n] = np.asarray(m_state.acc)[:, :n].T
        st.extern_force[:n] = np.asarray(m_state.extern_force)[:, :n].T
        st.m[:n] = np.asarray(m_state.m)[:n]
        st.T[:n] = np.asarray(m_state.T)[:n]
        st.valid[:n] = np.asarray(m_state.valid)[:n]
        self._pull_rest_into_store(np.asarray(rem_rest), np.asarray(st_rest))

    def _pull_rest_into_store(self, rem_rest: np.ndarray,
                              st_rest: np.ndarray) -> None:
        """Reassemble host spring rest lengths from the stencil/remainder
        split using the marshal-time index maps."""
        st = self._store
        s = min(st.n_springs, self._s_marshaled)
        fam, slot = self._sp_family[:s], self._sp_slot[:s]
        in_st = fam >= 0
        if np.any(in_st):
            st.rest[:s][in_st] = st_rest[fam[in_st], slot[in_st]]
        in_rem = (fam < 0) & (slot >= 0)
        if np.any(in_rem):
            st.rest[:s][in_rem] = rem_rest[slot[in_rem]]

    def setAll(self) -> None:
        """Host -> device push of everything (reference setAll, sim.cu:720-765)."""
        if not self._started or self._state is None:
            return
        if self._running:
            raise RuntimeError("The simulation is running. Stop the simulation to make changes.")
        with self._cv:
            if self._structure_dirty:
                # structural edits no longer pull the device state at edit
                # time; replicate the old edit-time sync here, keeping
                # every journaled row (round-3 behavior: the store was
                # synced before the edits, so setAll pushed live values
                # for untouched rows)
                self._sync_full_preserving_edits()
            self._marshal()

    def get(self, obj) -> None:
        """Per-object readback (reference sim.cu:589-654).  get(Spring) pulls
        only the rest length, matching spring.cu:10-14."""
        if not self._started or self._state is None:
            return
        if isinstance(obj, Mass):
            self._pull_masses(np.array([obj._i]))
        elif isinstance(obj, Spring):
            self._pull_springs_rest(np.array([obj._i]))
        elif isinstance(obj, Container):
            self._pull_masses(obj._mass_idx)
            if len(obj._spring_idx):
                self._pull_springs_rest(obj._spring_idx)
        else:
            raise TypeError(type(obj))

    def _pull_springs_rest(self, idx: np.ndarray) -> None:
        """Pull CURRENT device rest lengths for the given spring rows.

        Gathers on device and transfers only |idx| floats (the stencil
        rest plane alone is ~55 MB at 100^3; a readback of it for a
        one-spring edit would dominate the edit cost)."""
        j = self._journal
        if j is not None and j.store_fresh:
            return
        idx = np.asarray(idx, dtype=np.int64)
        idx = idx[idx < self._s_marshaled]
        if not len(idx):
            return
        state = self._snapshot()
        st = self._store
        fam, slot = self._sp_family[idx], self._sp_slot[idx]
        in_st = fam >= 0
        if np.any(in_st):
            # power-of-two padded gathers keep the programs shape-stable
            # across edit bursts (see incremental._pad_rows)
            k = int(in_st.sum())
            vals = jax.device_get(state.stencil.rest[
                jnp.asarray(_pad_rows(fam[in_st])),
                jnp.asarray(_pad_rows(slot[in_st]))])
            st.rest[idx[in_st]] = np.asarray(vals)[:k]
        in_rem = (fam < 0) & (slot >= 0)
        if np.any(in_rem):
            k = int(in_rem.sum())
            vals = jax.device_get(
                state.springs.rest[jnp.asarray(_pad_rows(slot[in_rem]))])
            st.rest[idx[in_rem]] = np.asarray(vals)[:k]

    def _pull_masses(self, idx: np.ndarray) -> None:
        state = self._snapshot()
        st = self._store
        m = state.masses
        pos, vel, acc, ext, mm, mT = jax.device_get(
            (m.pos, m.vel, m.acc, m.extern_force, m.m, m.T))
        st.pos[idx] = np.asarray(pos)[:, idx].T
        st.vel[idx] = np.asarray(vel)[:, idx].T
        st.acc[idx] = np.asarray(acc)[:, idx].T
        st.extern_force[idx] = np.asarray(ext)[:, idx].T
        st.m[idx] = np.asarray(mm)[idx]
        st.T[idx] = np.asarray(mT)[idx]

    def set(self, obj) -> None:
        """Per-object host -> device push (reference sim.cu:604-765).  Only
        the object's own rows are written; everything else keeps its device
        value (so un-get() host staleness can't clobber live state)."""
        if not self._started or self._state is None:
            return
        if self._running:
            raise RuntimeError("The simulation is running. Stop the simulation to make changes.")
        if self._structure_dirty:
            # the apply at resume (incremental or full) pushes journaled
            # rows from the store -- record them instead of pushing now
            if isinstance(obj, Mass):
                self._touch_mass(obj._i)
            elif isinstance(obj, Spring):
                self._touch_spring(obj._i)
            elif isinstance(obj, Container):
                self._touch_mass(obj._mass_idx)
                self._touch_spring(obj._spring_idx)
            else:
                raise TypeError(type(obj))
            return
        if isinstance(obj, Mass):
            self._push_masses(np.array([obj._i]))
        elif isinstance(obj, Spring):
            self._push_springs(np.array([obj._i]))
        elif isinstance(obj, Container):
            self._push_masses(obj._mass_idx)
            self._push_springs(obj._spring_idx)
        else:
            raise TypeError(type(obj))

    def _push_masses(self, idx: np.ndarray) -> None:
        if len(idx) == 0:
            return
        st, dt = self._store, self.config.np_dtype
        # feature flips the current trace can't express -> re-marshal
        needs_magnets = bool(np.any(st.mag_maxf[idx] != 0.0)
                             or np.any(st.mag_rad[idx] != 0.0))
        needs_drag = bool(np.any(st.drag[idx] != 0.0))
        recv_overflow = False
        if self._shape.magnet_receivers:
            # compacted-receiver trace (SceneShape.magnet_receivers): a push
            # can break its static preconditions -- any nonzero shell radius
            # (shell contact then reaches plain masses: receiver-dense
            # required) or more attractors than the padded capacity.  Only
            # the PUSHED rows can introduce either (marshal guaranteed the
            # rest), so the full-store attractor recount runs only when a
            # pushed row actually carries an attractor flag -- a plain
            # pos/vel push of one mass stays O(|idx|), not O(N).
            if bool(np.any(st.mag_rad[idx] != 0.0)):
                recv_overflow = True
            elif bool(np.any(st.valid[idx] & (st.mag_maxf[idx] != 0.0))):
                nm = self._store.n_masses
                recv_overflow = (
                    int(np.count_nonzero(st.valid[:nm]
                                         & (st.mag_maxf[:nm] != 0.0)))
                    > self._shape.magnet_receivers)
        if ((needs_magnets and not self._shape.has_magnets)
                or (needs_drag and not self._shape.has_drag)
                or recv_overflow):
            if getattr(self, "_mesh", None) is not None:
                # sharded state: re-placement goes through marshal
                self._remarshal_preserving_store_rows(
                    mass_idx=idx, spring_idx=None)
                return
            # every feature's backing arrays are already staged: flip the
            # static flags + retrace, then push the rows (round 4; the
            # round-3 path re-staged the whole scene here)
            self._upgrade_shape()
        with self._cv:
            m = self._state.masses
            m = dataclasses.replace(
                m,
                pos=m.pos.at[:, idx].set(st.pos[idx].T.astype(dt)),
                vel=m.vel.at[:, idx].set(st.vel[idx].T.astype(dt)),
                extern_force=m.extern_force.at[:, idx].set(
                    st.extern_force[idx].T.astype(dt)),
                m=m.m.at[idx].set(st.m[idx].astype(dt)),
                fixed=m.fixed.at[idx].set(st.fixed[idx]),
                valid=m.valid.at[idx].set(st.valid[idx]),
                drag=m.drag.at[idx].set(st.drag[idx].astype(dt)),
                mag_rad=m.mag_rad.at[idx].set(st.mag_rad[idx].astype(dt)),
                mag_stiffness=m.mag_stiffness.at[idx].set(
                    st.mag_stiffness[idx].astype(dt)),
                mag_maxf=m.mag_maxf.at[idx].set(st.mag_maxf[idx].astype(dt)),
                mag_scale=m.mag_scale.at[idx].set(st.mag_scale[idx].astype(dt)),
            )
            self._state = dataclasses.replace(self._state, masses=m)

    def _push_springs(self, idx: np.ndarray,
                      _incremental: bool = False) -> None:
        """Push the 8 per-spring param fields of the given rows.

        ``_incremental=True`` (runtime/incremental.py) skips the feature
        and uniformity checks: the caller has already recomputed the
        shape from the full store."""
        if len(idx) == 0:
            return
        st, dt = self._store, self.config.np_dtype
        if not _incremental:
            # a pushed spring may enable features the current trace lacks
            # (e.g. RobotLink.expand() flips a passive spring to ACTUATED
            # on a scene traced with has_breathing=False, or addDamping()
            # puts nonzero damping on a has_damping=False trace whose step
            # skips damping math entirely) -> flip the flags + retrace
            needs_breathing = bool(np.any(
                (st.s_type[idx] != PASSIVE_SOFT)
                & (st.s_type[idx] != PASSIVE_STIFF)))
            needs_actuated = bool(np.any(
                (st.s_type[idx] == ACTUATED_EXPAND)
                | (st.s_type[idx] == ACTUATED_CONTRACT)))
            needs_damping = bool(np.any(st.damping[idx] != 0.0))
            if ((needs_breathing and not self._shape.has_breathing)
                    or (needs_actuated and not self._shape.has_actuated)
                    or (needs_damping and not self._shape.has_damping)):
                if getattr(self, "_mesh", None) is not None:
                    self._remarshal_preserving_store_rows(
                        mass_idx=None, spring_idx=idx)
                    return
                self._upgrade_shape()
            if self._check_uniform_break(idx):
                return  # handled by a full re-marshal (mesh case)
        fam, slot = self._sp_family[idx], self._sp_slot[idx]
        in_st = fam >= 0
        in_rem = (fam < 0) & (slot >= 0)
        fields = [("k", "k"), ("rest", "rest"), ("damping", "damping"),
                  ("type", "s_type"), ("omega", "omega"), ("l_max", "l_max"),
                  ("l_min", "l_min"), ("rate", "rate")]
        with self._cv:
            if np.any(in_st):
                stc = self._state.stencil
                # power-of-two padded rows: shape-stable scatter programs
                # (each distinct length is a fresh axon compile); one fused
                # program for all 8 field planes
                fi, sl, si = (_pad_rows(fam[in_st]), _pad_rows(slot[in_st]),
                              _pad_rows(idx[in_st]))
                vals = {dev_f: getattr(st, host_f)[si].astype(
                            getattr(stc, dev_f).dtype)
                        for dev_f, host_f in fields}
                stc = _jit_push_spring_fields(stc, (fi, sl), vals)
                self._state = dataclasses.replace(self._state, stencil=stc)
            if np.any(in_rem):
                sp = self._state.springs
                ri, si = _pad_rows(slot[in_rem]), _pad_rows(idx[in_rem])
                vals = {dev_f: getattr(st, host_f)[si].astype(
                            getattr(sp, dev_f).dtype)
                        for dev_f, host_f in fields}
                sp = _jit_push_spring_fields(sp, (ri,), vals)
                self._state = dataclasses.replace(self._state, springs=sp)

    def _check_uniform_break(self, idx: np.ndarray) -> bool:
        """A pushed stencil spring whose params differ from its family
        scalar breaks the family-uniform specialization: the tiled kernel
        reads ONE SMEM scalar per uniform family (taken from the family's
        first masked lane, ops/pallas_tiled.py::prep_flat_inputs), so a
        per-slot push would silently not take effect there.  Demote the
        broken fields to windowed (dense arrays already hold correct
        values) and retrace.  Returns True if a full re-marshal handled
        it instead (sharded state)."""
        shape = self._shape
        if shape is None or not any(shape.stencil_uniform):
            return False
        fam = self._sp_family[idx]
        in_st = fam >= 0
        if not np.any(in_st):
            return False
        st, dt = self._store, self.config.np_dtype
        fis = fam[in_st]
        rows = np.asarray(idx)[in_st]
        uniform = list(shape.stencil_uniform)
        changed = False
        for uf_i, f in enumerate(("k", "rest", "damping", "type", "omega")):
            if not uniform[uf_i]:
                continue
            scal = self._fam_scalars.get(f)
            if scal is None:
                continue
            host_f = "s_type" if f == "type" else f
            fdt = np.int8 if f == "type" else dt
            vals = getattr(st, host_f)[rows].astype(fdt)
            if np.any(vals != scal[fis]):
                uniform[uf_i] = False
                changed = True
        if not changed:
            return False
        if getattr(self, "_mesh", None) is not None:
            self._remarshal_preserving_store_rows(mass_idx=None,
                                                  spring_idx=idx)
            return True
        self._shape = dataclasses.replace(
            self._shape, stencil_uniform=tuple(uniform))
        self._fam_scalars = {
            f: (self._fam_scalars.get(f) if uniform[i_] else None)
            for i_, f in enumerate(("k", "rest", "damping", "type",
                                    "omega"))}
        self._chunk = _chunk_for(self._shape)
        self._rate = None
        self._timed_chunks = 0
        return False

    def _sync_full_preserving_edits(self) -> None:
        """Pull the FULL live device state into the host store without
        clobbering any journaled paused-time edit (the fallback-side twin
        of the incremental apply's per-row refresh).

        Per-field rules: ``valid``/``m``/``extern_force`` of touched rows
        always come from the store (host-authoritative; the device copy
        is just the last push), ``pos``/``vel``/``T`` only where the user
        actually wrote them, ``rest`` for written rows, and whole fields
        a bulk write owns (journal.skip_pull) are kept entirely."""
        if not self._started or self._state is None:
            return
        j = self._journal
        if j is None:
            self.getAll()
            return
        if j.store_fresh:
            return  # already synced (e.g. right before a compact())
        st = self._store
        saved = []
        for f in j.skip_pull:
            saved.append((f, slice(None), getattr(st, f).copy()))
        rows = j.mass_rows(self._n_marshaled)
        if len(rows):
            for f in ("valid", "m", "extern_force"):
                saved.append((f, rows, getattr(st, f)[rows].copy()))
        for f in ("pos", "vel", "T", "m", "extern_force"):
            wr = j.written_rows(f)
            wr = wr[wr < self._n_marshaled]
            if len(wr):
                saved.append((f, wr, getattr(st, f)[wr].copy()))
        wr = j.rest_written_rows()
        wr = wr[wr < self._s_marshaled]
        if len(wr):
            saved.append(("rest", wr, st.rest[wr].copy()))
        self.getAll()
        for f, rows_, vals in saved:
            getattr(st, f)[rows_] = vals
        j.store_fresh = True

    def _push_mass_rows_full(self, idx: np.ndarray) -> None:
        """Push EVERY mass-store field of the given rows to the device
        (incremental topology apply: new rows + touched rows whose
        evolving fields were refreshed first).  Unlike _push_masses this
        includes acc and T and skips the feature-flip checks -- the
        caller has already recomputed the shape."""
        st, dt = self._store, self.config.np_dtype
        idx = _pad_rows(np.asarray(idx, dtype=np.int64))
        vals = {
            "pos": st.pos[idx].T.astype(dt),
            "vel": st.vel[idx].T.astype(dt),
            "acc": st.acc[idx].T.astype(dt),
            "extern_force": st.extern_force[idx].T.astype(dt),
            "m": st.m[idx].astype(dt),
            "T": st.T[idx].astype(dt),
            "fixed": st.fixed[idx],
            "valid": st.valid[idx],
            "drag": st.drag[idx].astype(dt),
            "mag_rad": st.mag_rad[idx].astype(dt),
            "mag_stiffness": st.mag_stiffness[idx].astype(dt),
            "mag_maxf": st.mag_maxf[idx].astype(dt),
            "mag_scale": st.mag_scale[idx].astype(dt),
        }
        # one fused scatter program (13 eager dispatches otherwise)
        m = _jit_push_mass_rows(self._state.masses, idx, vals)
        self._state = dataclasses.replace(self._state, masses=m)

    def _upgrade_shape(self) -> None:
        """Recompute the feature flags of the static shape from the host
        store (parameters are host-authoritative) and retrace the chunk.

        This replaces the round-3 full pull + re-marshal for set() calls
        that enable a feature the current trace lacks: every feature's
        backing arrays are ALWAYS staged (mag_*/drag/omega/... travel in
        MassState/StencilState/SpringState regardless of flags), so a
        flag flip needs only a retrace -- a compile-cache hit in steady
        state -- never a re-stage."""
        flags = _feature_flags(self._store, self.config)
        new_shape = dataclasses.replace(self._shape, **flags)
        if new_shape != self._shape:
            self._shape = new_shape
            self._chunk = _chunk_for(new_shape)
            self._rate = None
            self._timed_chunks = 0

    def _remarshal_preserving_store_rows(self, mass_idx, spring_idx) -> None:
        """set() needed a feature the current trace lacks (breathing springs,
        magnets, drag): pull live device state into the store WITHOUT
        clobbering the user's just-edited rows, then re-marshal."""
        st = self._store
        saved = {}
        if spring_idx is not None:
            for f in ("k", "rest", "damping", "s_type", "omega", "l_max",
                      "l_min", "rate"):
                saved[("s", f)] = getattr(st, f)[spring_idx].copy()
        if mass_idx is not None:
            for f in ("pos", "vel", "extern_force", "m", "fixed", "drag",
                      "mag_rad", "mag_stiffness", "mag_maxf", "mag_scale"):
                saved[("m", f)] = getattr(st, f)[mass_idx].copy()
        self.getAll()
        for (kind, f), vals in saved.items():
            getattr(st, f)[spring_idx if kind == "s" else mass_idx] = vals
        with self._cv:
            self._marshal()

    # -------------------------------------------------------------- compaction
    def compact(self) -> None:
        """Physically remove soft-deleted masses/springs and remap
        containers/handles (reference invalidate + thrust::remove,
        sim.cu:343-414).  Runs automatically at re-marshal when the dead
        fraction exceeds ``config.compact_threshold``; callable explicitly
        at a pause.  Handles to surviving entities keep working; handles to
        compacted entities raise on next use."""
        self._check_can_edit()
        self._sync_store_before_structural_edit()
        # compaction rearranges store rows: sync the live device state in
        # first (preserving journaled edits), then mark the journal
        # store-fresh so the full re-marshal at resume doesn't pull again
        # through now-stale index maps
        self._sync_full_preserving_edits()
        self._compact_store()
        if self._started:
            self._structure_dirty = True
            if self._journal is not None:
                self._journal.force_full = True
                self._journal.store_fresh = True

    def _compact_store(self) -> None:
        mass_remap, spring_remap = self._store.compact()
        if (mass_remap >= 0).all() and (spring_remap >= 0).all():
            return  # nothing was dropped; no generation bump needed
        self._remaps.append((mass_remap, spring_remap))
        self._gen += 1
        for c in self.containers:
            mi = c._mass_idx
            mi = mass_remap[mi[mi < len(mass_remap)]]
            c._mass_idx = mi[mi >= 0]
            si = c._spring_idx
            si = spring_remap[si[si < len(spring_remap)]]
            c._spring_idx = si[si >= 0]
        self._env_gravity_delta = None  # stale per-row data, if any
        get_logger().debug("compacted store to %d masses / %d springs",
                           self._store.n_masses, self._store.n_springs)

    def _translate_index(self, gen: int, i: int, kind: str) -> int:
        """Translate a handle's row index from generation ``gen`` to now."""
        sel = 0 if kind == "mass" else 1
        for remap in self._remaps[gen:]:
            if i < 0:
                return -1
            table = remap[sel]
            i = int(table[i]) if i < len(table) else i
        return i

    # ------------------------------------------------------------ struct edits
    def _mark_structure_dirty(self, mass_index: Optional[int] = None) -> None:
        """A local-constraint record changed (entities.addConstraint /
        clearConstraints); journal it for the incremental lcon rebuild."""
        if self._started:
            self._sync_store_before_structural_edit()
            self._structure_dirty = True
            j = self._journal
            if j is not None:
                j.lcon_dirty = True
                if mass_index is not None:
                    j.touched_m.add(int(mass_index))

    def _sync_store_before_structural_edit(self) -> None:
        """Guard: structural edits require a paused (or unstarted) sim.

        Round 4: the full device pull that used to live here is gone --
        edits are journaled and applied incrementally at the next
        resume() (runtime/incremental.py); the fallback full re-marshal
        pulls the live state then, preserving every journaled row."""
        if (self._started and self._state is not None and self._running):
            raise RuntimeError("The simulation is running. Stop the "
                               "simulation to make changes.")

    # -- journal recording (no-ops before start) ------------------------------
    def _touch_mass(self, rows, field: Optional[str] = None) -> None:
        j = self._journal
        if j is None or not self._started:
            return
        if np.isscalar(rows) or isinstance(rows, (int, np.integer)):
            j.touched_m.add(int(rows))
            if field is not None and field in j.m_written:
                j.m_written[field].append(np.array([int(rows)], np.int64))
        else:
            rows = np.asarray(rows)
            j.m_arrays.append(rows)
            if field is not None and field in j.m_written:
                j.m_written[field].append(rows)

    def _touch_spring(self, rows, rest: bool = False) -> None:
        j = self._journal
        if j is None or not self._started:
            return
        if np.isscalar(rows) or isinstance(rows, (int, np.integer)):
            j.touched_s.add(int(rows))
            if rest:
                j.s_rest_written.append(np.array([int(rows)], np.int64))
        else:
            rows = np.asarray(rows)
            j.s_arrays.append(rows)
            if rest:
                j.s_rest_written.append(rows)

    def _journal_bulk(self, *skip_pull_fields: str) -> None:
        """A whole-store write: incremental apply can't express it."""
        j = self._journal
        if j is None or not self._started:
            return
        j.bulk = True
        j.skip_pull.update(skip_pull_fields)

    def _refresh_mass_rows(self, idx, skip=None) -> None:
        """Pull the device-evolving fields (pos/vel/acc/T) of the given
        EXISTING rows into the host store, honoring per-field user-write
        skips (a row whose pos the user just wrote keeps the write)."""
        if not self._started or self._state is None:
            return
        j = self._journal
        if j is not None and j.store_fresh:
            return  # store already holds live state (e.g. post-compact)
        idx = np.asarray(idx, dtype=np.int64)
        idx = idx[idx < self._n_marshaled]
        if not len(idx):
            return
        state = self._snapshot()
        k = len(idx)
        ti = jnp.asarray(_pad_rows(idx))   # shape-stable gather program
        # one fused gather program + one readback (4 dispatches otherwise)
        pos, vel, acc, T = jax.device_get(
            _jit_refresh_mass_gather(state.masses, ti))
        st = self._store
        for f, dev in (("pos", np.asarray(pos)[:, :k].T),
                       ("vel", np.asarray(vel)[:, :k].T),
                       ("T", np.asarray(T)[:k])):
            keep = None
            if skip is not None and skip.get(f):
                wr = np.concatenate(
                    [np.asarray(a, np.int64).ravel() for a in skip[f]])
                keep = np.isin(idx, wr)
            if keep is None or not keep.any():
                getattr(st, f)[idx] = dev
            else:
                getattr(st, f)[idx[~keep]] = dev[~keep]
        st.acc[idx] = np.asarray(acc)[:, :k].T


def _np3(v) -> np.ndarray:
    if isinstance(v, Vec):
        return v.numpy()
    return np.asarray(v, dtype=np.float64).reshape(3)


# distinct hues for per-container default colors (_register_built)
_CONTAINER_PALETTE = np.array([
    (0.96, 0.35, 0.32), (0.36, 0.65, 0.96), (0.42, 0.82, 0.47),
    (0.98, 0.77, 0.33), (0.73, 0.52, 0.94), (0.40, 0.85, 0.83),
    (0.95, 0.55, 0.77), (0.80, 0.80, 0.50),
])


def _feature_flags(st: HostStore, cfg: SimConfig) -> dict:
    """SceneShape feature flags computed from the host store.

    All inputs are host-authoritative: spring/mass PARAMETERS (k, type,
    damping, mag_*, drag) and validity are only ever edited host-side
    (the device mutates pos/vel/acc/T and actuated REST, none of which
    feed a flag), so these flags are correct even while the device state
    has advanced.  Shared by _marshal and the incremental topology-edit
    path (runtime/incremental.py) so both compute identical shapes."""
    n, s = st.n_masses, st.n_springs
    has_breathing = bool(np.any(
        (st.s_type[:s] != PASSIVE_SOFT) & (st.s_type[:s] != PASSIVE_STIFF)))
    has_actuated = bool(np.any(
        (st.s_type[:s] == ACTUATED_EXPAND)
        | (st.s_type[:s] == ACTUATED_CONTRACT)))
    has_magnets = bool(np.any(st.mag_maxf[:n] != 0.0)
                       or np.any(st.mag_rad[:n] != 0.0))
    n_magnetic = int(np.count_nonzero(
        st.valid[:n] & ((st.mag_maxf[:n] != 0) | (st.mag_rad[:n] != 0)
                        | (st.mag_scale[:n] != 0)
                        | (st.mag_stiffness[:n] != 0))))
    magnet_binned = ()
    magnet_grid = False
    magnet_receivers = 0
    if has_magnets and n_magnetic >= cfg.magnet_binned_threshold:
        # the bin table holds every VALID mass (all are shell-contact
        # sources, matching the reference OG's insert-everything,
        # sim.cu:842), so it is sized by the valid count, not the
        # magnetic count
        n_valid_cnt = int(np.count_nonzero(st.valid[:n]))
        magnet_binned = (pad_to(max(n_valid_cnt, 1), 8),
                         cfg.magnet_cell_cap)
        # receiver compaction (state.py SceneShape.magnet_receivers):
        # EXACT only when no mass has a shell radius -- shell contact
        # on a zero-param receiver is then impossible and the receiver
        # set is statically {valid & mag_maxf != 0}.  Engaged when
        # those attractors are sparse (< 1/4 of the scene): the binned
        # pass is receiver-gather bound, so this is the difference
        # between ~1 s and ~ms per force pass at 1M masses.
        n_recv = int(np.count_nonzero(st.valid[:n]
                                      & (st.mag_maxf[:n] != 0.0)))
        if (not np.any(st.mag_rad[:n] != 0.0)
                and n_recv < n_valid_cnt // 4):
            magnet_receivers = pad_to(max(n_recv, 1), 8)
        # use_pallas=False must keep the whole step Pallas-free (the
        # flag's documented purpose is an XLA-only escape hatch);
        # compacted-receiver scenes prefer binned+compaction (the grid
        # kernel's per-slot compute scans every SOURCE slot, wasted
        # when almost nothing receives)
        magnet_grid = (cfg.use_pallas
                       and magnet_receivers == 0
                       and n_magnetic >= cfg.magnet_grid_threshold
                       and cfg.dtype == "float32"
                       and cfg.magnet_cell_cap % 8 == 0)
    return dict(
        has_magnets=has_magnets, magnet_binned=magnet_binned,
        magnet_grid=magnet_grid, magnet_receivers=magnet_receivers,
        has_drag=bool(np.any(st.drag[:n] != 0.0)),
        has_breathing=has_breathing, has_actuated=has_actuated,
        has_damping=bool(np.any(st.damping[:s] != 0.0)),
        # all_valid = no soft-deleted REAL masses; padding slots are
        # already excluded by the stencil mask / remainder valid flags
        all_valid=bool(np.all(st.valid[:n])),
    )


def _remainder_degree_span(st: HostStore, rem_idx: np.ndarray, n: int):
    """(max vertex degree, max index span) over the remainder springs."""
    if rem_idx.shape[0]:
        ids = np.concatenate([st.right[rem_idx], st.left[rem_idx]])
        max_deg = int(np.bincount(ids, minlength=n).max())
        rem_span = int(np.max(np.abs(st.right[rem_idx] - st.left[rem_idx])))
    else:
        max_deg = 1
        rem_span = 0
    return max(max_deg, 1), rem_span


def _build_remainder_states(st: HostStore, rem_idx: np.ndarray, N: int,
                            S: int, max_degree: int, dt,
                            cfg: SimConfig):
    """Device SpringState + Topology for the remainder springs (the
    general gather/segment path).  Shared by _marshal and the incremental
    topology-edit rebuild so both produce bitwise-identical staging."""
    s_rem = int(rem_idx.shape[0])

    def ssc(a, fill=0.0, dtype=None):
        out = np.full(S, fill, dtype=dtype or dt)
        out[:s_rem] = a[rem_idx]
        return jnp.asarray(out)

    left = np.zeros(S, dtype=np.int32)
    right = np.zeros(S, dtype=np.int32)
    left[:s_rem] = st.left[rem_idx]
    right[:s_rem] = st.right[rem_idx]
    s_valid = np.zeros(S, dtype=bool)
    s_valid[:s_rem] = True  # rem_idx already filtered to valid+attached

    springs = SpringState(
        left=jnp.asarray(left), right=jnp.asarray(right),
        valid=jnp.asarray(s_valid),
        k=ssc(st.k), rest=ssc(st.rest), damping=ssc(st.damping),
        type=ssc(st.s_type, dtype=np.int8),
        omega=ssc(st.omega), l_max=ssc(st.l_max), l_min=ssc(st.l_min),
        rate=ssc(st.rate),
    )

    if s_rem and cfg.scatter == ScatterMode.GATHER:
        inc_idx, inc_sign = builders.build_incidence(
            left[:s_rem], right[:s_rem], N, S)
        if inc_idx.shape[1] < max_degree:
            padc = max_degree - inc_idx.shape[1]
            inc_idx = np.pad(inc_idx, ((0, 0), (0, padc)),
                             constant_values=S)
            inc_sign = np.pad(inc_sign, ((0, 0), (0, padc)))
        seg_perm = np.zeros(2, dtype=np.int32)
        seg_ids = np.zeros(2, dtype=np.int32)
    elif s_rem:
        perm, ids = builders.build_segment_sort(left, right)
        seg_perm, seg_ids = perm, ids
        inc_idx = np.zeros((1, 1), dtype=np.int32)
        inc_sign = np.zeros((1, 1))
    else:
        inc_idx = np.full((N, 1), S, dtype=np.int32)
        inc_sign = np.zeros((N, 1))
        seg_perm = np.zeros(2, dtype=np.int32)
        seg_ids = np.zeros(2, dtype=np.int32)
    topo = Topology(
        inc_idx=jnp.asarray(inc_idx),
        inc_sign=jnp.asarray(inc_sign.astype(dt)),
        seg_perm=jnp.asarray(seg_perm), seg_ids=jnp.asarray(seg_ids),
    )
    return springs, topo, left.astype(np.int64), right.astype(np.int64)


def _build_gcon(planes, balls, dt) -> GlobalConstraints:
    """Global plane/ball constraint arrays (tiny; rebuilt whole on edit)."""
    P, B = len(planes), len(balls)
    return GlobalConstraints(
        plane_normal=jnp.asarray(
            np.array([p[0] for p in planes], dtype=dt).reshape(P, 3)),
        plane_offset=jnp.asarray(np.array([p[1] for p in planes], dtype=dt)),
        plane_fk=jnp.asarray(np.array([p[2] for p in planes], dtype=dt)),
        plane_fs=jnp.asarray(np.array([p[3] for p in planes], dtype=dt)),
        ball_center=jnp.asarray(
            np.array([b[0] for b in balls], dtype=dt).reshape(B, 3)),
        ball_radius=jnp.asarray(np.array([b[1] for b in balls], dtype=dt)),
    )


def _local_caps(st: HostStore):
    cap_cp = cap_ball = cap_pl = cap_dir = 0
    for rec in st.local.values():
        cap_cp = max(cap_cp, len(rec.contact_planes))
        cap_ball = max(cap_ball, len(rec.balls))
        cap_pl = max(cap_pl, len(rec.constraint_planes))
        cap_dir = max(cap_dir, len(rec.directions))
    return cap_cp, cap_ball, cap_pl, cap_dir


def _marshal_local(st: HostStore, N: int, shape: SceneShape, dt) -> LocalConstraints:
    cp, cb, cpl, cd = shape.cap_cp, shape.cap_ball, shape.cap_pl, shape.cap_dir
    lc = LocalConstraints(
        cp_normal=np.zeros((N, cp, 3), dtype=dt),
        cp_offset=np.zeros((N, cp), dtype=dt),
        cp_fk=np.zeros((N, cp), dtype=dt),
        cp_fs=np.zeros((N, cp), dtype=dt),
        cp_count=np.zeros(N, dtype=np.int32),
        ball_center=np.zeros((N, cb, 3), dtype=dt),
        ball_radius=np.zeros((N, cb), dtype=dt),
        ball_count=np.zeros(N, dtype=np.int32),
        pl_normal=np.zeros((N, cpl, 3), dtype=dt),
        pl_friction=np.zeros((N, cpl), dtype=dt),
        pl_count=np.zeros(N, dtype=np.int32),
        dir_tangent=np.zeros((N, cd, 3), dtype=dt),
        dir_friction=np.zeros((N, cd), dtype=dt),
        dir_count=np.zeros(N, dtype=np.int32),
    )
    for i, rec in st.local.items():
        if not st.valid[i]:
            continue
        for j, cp_rec in enumerate(rec.contact_planes):
            # (normal, offset) from Mass.addConstraint (reference surface,
            # frictionless) or (normal, offset, fk, fs) from
            # parallel.flat.set_env_plane (per-env plane sweeps)
            lc.cp_normal[i, j] = cp_rec[0]
            lc.cp_offset[i, j] = cp_rec[1]
            if len(cp_rec) > 2:
                lc.cp_fk[i, j] = cp_rec[2]
                lc.cp_fs[i, j] = cp_rec[3]
        lc.cp_count[i] = len(rec.contact_planes)
        for j, (c, r) in enumerate(rec.balls):
            lc.ball_center[i, j] = c
            lc.ball_radius[i, j] = r
        lc.ball_count[i] = len(rec.balls)
        for j, (nrm, fr) in enumerate(rec.constraint_planes):
            lc.pl_normal[i, j] = nrm
            lc.pl_friction[i, j] = fr
        lc.pl_count[i] = len(rec.constraint_planes)
        for j, (tg, fr) in enumerate(rec.directions):
            lc.dir_tangent[i, j] = tg
            lc.dir_friction[i, j] = fr
        lc.dir_count[i] = len(rec.directions)
    return jax.tree_util.tree_map(jnp.asarray, lc)
