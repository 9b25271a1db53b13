"""An independent, naive numpy transcription of the reference CUDA kernel
semantics (computeSpringForces sim.cu:1157-1200 + massForcesAndUpdate
sim.cu:1285-1367 + constraint applyForce methods object.cu:46-144), used as
a trajectory-parity oracle for the TPU implementation.

Deliberately written entity-at-a-time (loops, no vectorization tricks) so it
shares no code or structure with titan_tpu's vectorized/stencil ops: any
agreement between the two is evidence of correctness, not of shared bugs.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np

NORMAL = 20000.0


@dataclasses.dataclass
class RefScene:
    pos: np.ndarray          # [n, 3]
    vel: np.ndarray          # [n, 3]
    m: np.ndarray            # [n]
    fixed: np.ndarray        # [n] bool
    extern_force: np.ndarray  # [n, 3] persistent user force
    drag: np.ndarray         # [n]
    left: np.ndarray         # [s]
    right: np.ndarray        # [s]
    k: np.ndarray            # [s]
    rest: np.ndarray         # [s]
    damping: np.ndarray      # [s]
    s_type: np.ndarray       # [s]
    omega: np.ndarray        # [s]
    l_max: np.ndarray        # [s]
    l_min: np.ndarray        # [s]
    rate: np.ndarray         # [s]
    planes: List[Tuple[np.ndarray, float, float, float]] = None
    balls: List[Tuple[np.ndarray, float]] = None
    g: np.ndarray = None     # [3]
    velocity_clamp: bool = True
    integrator: str = "euler"
    acc: np.ndarray = None   # [n, 3] (Verlet carry; zeros at start)


def _forces(sc: "RefScene", dt: float, t: float) -> np.ndarray:
    """Spring pass + mass-force accumulation (no integration)."""
    n = sc.pos.shape[0]
    force = np.zeros((n, 3))

    # --- spring pass (sim.cu:1157-1200)
    for i in range(sc.left.shape[0]):
        l, r = sc.left[i], sc.right[i]
        d = sc.pos[r] - sc.pos[l]
        ln = np.sqrt(d @ d)
        if ln == 0:
            continue
        u = d / ln
        scale = 1.0
        st = sc.s_type[i]
        if st == 2:      # ACTIVE_CONTRACT_THEN_EXPAND
            scale = 1 - 0.2 * np.sin(sc.omega[i] * t)
        elif st == 3:    # ACTIVE_EXPAND_THEN_CONTRACT
            scale = 1 + 0.2 * np.sin(sc.omega[i] * t)
        elif st == 4:    # ACTUATED_EXPAND
            if sc.rest[i] < sc.l_max[i]:
                sc.rest[i] += sc.rate[i] * dt
        elif st == 5:    # ACTUATED_CONTRACT
            if sc.rest[i] > sc.l_min[i]:
                sc.rest[i] -= sc.rate[i] * dt
        f = sc.k[i] * (sc.rest[i] * scale - ln) * u
        f = f + ((sc.vel[l] - sc.vel[r]) @ u) * sc.damping[i] * u
        if not sc.fixed[r]:
            force[r] += f
        if not sc.fixed[l]:
            force[l] -= f

    # --- mass pass forces (sim.cu:1285-1333)
    for i in range(n):
        if sc.fixed[i]:
            continue
        force[i] += sc.m[i] * sc.g
        force[i] += sc.extern_force[i]
        for (pn, off, fk, fs) in sc.planes:
            disp = sc.pos[i] @ pn - off
            fn_mag = force[i] @ pn
            f_n = fn_mag * pn
            if disp < 0 and (fs > 0 or fk > 0):
                v_perp = sc.vel[i] - (sc.vel[i] @ pn) * pn
                vn = np.sqrt(v_perp @ v_perp)
                if vn > 1e-16:
                    force[i] -= v_perp * (fk * np.abs(fn_mag) / vn)
                else:
                    f_perp = force[i] - f_n
                    if fs * np.abs(fn_mag) > np.sqrt(f_perp @ f_perp):
                        force[i] -= f_perp
            if disp < 0:
                force[i] += -disp * NORMAL * pn
        for (c, rad) in sc.balls:
            d = sc.pos[i] - c
            dist = np.sqrt(d @ d)
            if 0 < dist <= rad:
                force[i] += NORMAL * d / dist
        vn = np.sqrt(sc.vel[i] @ sc.vel[i])
        if vn != 0.0:
            force[i] += -sc.drag[i] * vn * sc.vel[i]
    return force


def step(sc: RefScene, dt: float, t: float) -> None:
    """One step, mutating the scene; dispatches on sc.integrator
    (sim.cu:1335-1363 + the RK2 double pass sim.cu:1778-1799)."""
    n = sc.pos.shape[0]
    if sc.acc is None:
        sc.acc = np.zeros((n, 3))
    if sc.integrator == "rk2":
        # pass 1: half-step predictor; rest mutation runs at full dt both
        # passes (reference quirk)
        f1 = _forces(sc, dt, t)
        bpos, bvel = sc.pos.copy(), sc.vel.copy()
        for i in range(n):
            if sc.fixed[i]:
                continue
            acc = f1[i] / sc.m[i]
            sc.pos[i] = bpos[i] + 0.5 * bvel[i] * dt
            sc.vel[i] = bvel[i] + 0.5 * acc * dt
            sc.acc[i] = acc
        f2 = _forces(sc, dt, t + 0.5 * dt)
        for i in range(n):
            if sc.fixed[i]:
                continue
            acc = f2[i] / sc.m[i]
            sc.pos[i] = bpos[i] + sc.vel[i] * dt
            sc.vel[i] = bvel[i] + acc * dt
            sc.acc[i] = acc
        return
    force = _forces(sc, dt, t)
    for i in range(n):
        if sc.fixed[i]:
            continue
        if sc.integrator == "verlet":
            new_acc = force[i] / sc.m[i]
            sc.vel[i] = sc.vel[i] + 0.5 * (sc.acc[i] + new_acc) * dt
            sc.acc[i] = new_acc
            sc.pos[i] = sc.pos[i] + sc.vel[i] * dt + 0.5 * new_acc * dt * dt
        else:
            acc = force[i] / sc.m[i]
            sc.acc[i] = acc
            sc.vel[i] = sc.vel[i] + acc * dt
            if sc.velocity_clamp:
                vn = np.sqrt(sc.vel[i] @ sc.vel[i])
                if vn > 1:
                    sc.vel[i] = sc.vel[i] / vn
            sc.pos[i] = sc.pos[i] + sc.vel[i] * dt


def from_simulation(sim) -> RefScene:
    """Extract a RefScene from an un-started titan_tpu Simulation."""
    st = sim._store
    n, s = st.n_masses, st.n_springs
    return RefScene(
        pos=st.pos[:n].copy(), vel=st.vel[:n].copy(), m=st.m[:n].copy(),
        fixed=st.fixed[:n].copy(), extern_force=st.extern_force[:n].copy(),
        drag=st.drag[:n].copy(),
        left=st.left[:s].copy(), right=st.right[:s].copy(),
        k=st.k[:s].copy(), rest=st.rest[:s].copy(),
        damping=st.damping[:s].copy(), s_type=st.s_type[:s].copy(),
        omega=st.omega[:s].copy(), l_max=st.l_max[:s].copy(),
        l_min=st.l_min[:s].copy(), rate=st.rate[:s].copy(),
        planes=[(p[0].copy(), p[1], p[2], p[3]) for p in sim._planes],
        balls=[(b[0].copy(), b[1]) for b in sim._balls],
        g=sim._global_acc.copy(),
        velocity_clamp=sim.config.velocity_clamp,
        integrator=sim.config.integrator.value,
        acc=np.zeros((n, 3)),
    )
