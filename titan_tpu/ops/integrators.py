"""Time integration schemes, replicating reference semantics exactly.

Reference: the #ifdef RK2 / #elif VERLET / #else branches of
massForcesAndUpdate (sim.cu:1335-1363) and the RK2 double-pass step loop
(sim.cu:1778-1799).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def euler(
    pos: jax.Array, vel: jax.Array, f: jax.Array, m: jax.Array,
    dt: jax.Array, velocity_clamp: bool,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Semi-implicit Euler with the reference's unit-speed clamp.

    Reference (sim.cu:1355-1362):
      acc = f/m; vel += acc*dt
      if |vel| > 1: vel /= |vel|      (speed capped at exactly 1 m/s)
      pos += vel*dt
    """
    acc = f / m
    vel = vel + acc * dt
    if velocity_clamp:
        sq = jnp.sum(vel * vel, axis=0)
        vn = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))  # grad-safe at |v| = 0
        vel = jnp.where((sq > 0) & (vn > 1.0), vel / vn, vel)
    pos = pos + vel * dt
    return pos, vel, acc


def verlet(
    pos: jax.Array, vel: jax.Array, acc_prev: jax.Array, f: jax.Array,
    m: jax.Array, dt: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """The reference's 'Verlet' scheme (sim.cu:1350-1354):
      vel += 0.5 (acc_prev + f/m) dt
      acc  = f/m
      pos += vel dt + 0.5 acc dt^2
    (velocity-Verlet-shaped, with the force evaluated once per step)."""
    new_acc = f / m
    vel = vel + 0.5 * (acc_prev + new_acc) * dt
    pos = pos + vel * dt + 0.5 * new_acc * dt * dt
    return pos, vel, new_acc


def rk2_half(
    pos: jax.Array, vel: jax.Array, f: jax.Array, m: jax.Array, dt: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RK2 first pass (sim.cu:1336-1343): midpoint predictor.
      acc = f/m; backup (pos, vel); pos += 0.5 vel dt; vel += 0.5 acc dt
    Returns (pos_half, vel_half, acc); caller keeps the backups."""
    acc = f / m
    pos_h = pos + 0.5 * vel * dt
    vel_h = vel + 0.5 * acc * dt
    return pos_h, vel_h, acc


def rk2_full(
    backup_pos: jax.Array, backup_vel: jax.Array,
    vel_half: jax.Array, f_half: jax.Array, m: jax.Array, dt: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """RK2 second pass (sim.cu:1344-1349): corrector from the backups.
      acc = f_half/m; pos = backup_pos + vel_half dt; vel = backup_vel + acc dt
    """
    acc = f_half / m
    pos = backup_pos + vel_half * dt
    vel = backup_vel + acc * dt
    return pos, vel, acc
