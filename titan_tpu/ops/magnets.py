"""Cell-binned magnet neighbor structure: the TPU-native occupancy grid.

The reference rebuilds a fixed 256x256 2-D occupancy grid every step
(initializeOG/recomputeOG, sim.cu:822-932) and scans the 3x3 cell
neighborhood per mass (computeExternalMagnetForcesOG, sim.cu:1250-1281)
with atomicAdd accumulation; cells hold at most 128 masses and overflow is
printf-and-continue (sim.cu:850-859).

TPU-native replacement (no atomics, no pointer grid):
  1. cell id per mass on a 2-D grid with cell_size = the interaction
     cutoff (0.14 m), so the 3x3 window provably covers every pair within
     the cutoff -- EXACT physics, unlike the reference's 0.04 m cells whose
     3x3 window misses pairs beyond 0.08-0.12 m (an acknowledged
     approximation there);
  2. one argsort by cell id -> masses of a cell are contiguous;
  3. compact candidate bins [A, C] of mass DATA (A = padded count of
     magnetic masses, so "active cells" can never overflow; C = per-cell
     capacity, config.magnet_cell_cap, reference analog 128) built with
     dropping scatters -- a mass beyond C stops acting as a source but
     still receives, exactly the reference's overflow semantics;
  4. a dense cell -> bin-row table (one scatter + one gather; binary
     search measured 5x the entire force budget on TPU);
  5. dense masked pairwise: each sorted mass (receiver, no padding, no
     gather) against its cell's 3x3 candidate slabs fetched as
     C-contiguous row-slab gathers; chunked over receivers to bound VMEM;
     deterministic (one output lane per mass).

Cost per step: one argsort over N + O(N * 9C) pair evaluations, vs O(N^2)
for the masked-pairwise path (ops/forces.magnet_forces).  The crossover is
around a few thousand magnetic masses; ops/step picks the path from the
static scene shape (SceneShape.magnet_binned).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..state import MassState

# grid geometry: cell = cutoff so the 3x3 window covers the interaction
# radius exactly; 256 cells of 0.14 m span +-17.9 m (the reference's grid
# spans +-5.12 m); coordinates outside are clipped into the edge cells,
# which only costs spurious far candidates whose force is 0 by the cutoff.
GRID_DIM = 256


def cell_ids(pos: jax.Array, valid: jax.Array, cutoff: float) -> jax.Array:
    """Flat 2-D cell id per mass; invalid masses get an out-of-grid
    sentinel (> any real cell, so they sort last and never match a
    neighborhood lookup)."""
    G = GRID_DIM
    sentinel = jnp.int32(G * G + 7)
    cx = jnp.clip(jnp.floor(pos[0] / cutoff).astype(jnp.int32) + G // 2,
                  0, G - 1)
    cy = jnp.clip(jnp.floor(pos[1] / cutoff).astype(jnp.int32) + G // 2,
                  0, G - 1)
    return jnp.where(valid, cx * G + cy, sentinel)


def magnet_receiver_idx(masses: MassState, receivers: int) -> jax.Array:
    """The compacted receiver index set (top-``receivers`` by the flag
    ``valid & mag_maxf != 0``); [R] int32.  Chunk-constant -- hoist to
    chunk entry rather than paying the top_k over N every step."""
    flag = masses.valid & (masses.mag_maxf != 0.0)
    _, ridx = jax.lax.top_k(flag.astype(jnp.int32), receivers)
    return ridx.astype(jnp.int32)


def binned_magnet_forces(masses: MassState, cutoff: float,
                         n_cells: int, cell_cap: int,
                         chunk_cells: int = 512,
                         receivers: int = 0,
                         ridx: jax.Array | None = None) -> jax.Array:
    """Magnet forces via the cell-binned neighbor structure; [3, N].

    Physics identical to ops/forces.magnet_forces (reference
    computeExternalMagnetForce, sim.cu:1223-1241) for scenes whose per-cell
    occupancy is <= cell_cap; beyond that, excess masses in a cell stop
    acting as sources but still receive (the reference's own overflow
    semantics: absent from the grid, still scanning it).

    ``n_cells`` (static) must be >= the number of VALID masses (every valid
    mass is binned as a source; see below); it is the bin-table height A.
    ``cell_cap`` is C.

    ``receivers`` > 0 compacts the receiver side to the top-``receivers``
    masses by the flag ``valid & (mag_maxf != 0)`` -- EXACT only when no
    mass has mag_rad != 0 (SceneShape.magnet_receivers documents why: with
    all shell radii zero, the intersection depth is dist >= 0 and the
    attract term needs the receiver's own mag_maxf, so every other mass
    provably receives zero).  The pass is receiver-gather bound (9 bin-row
    gathers per receiver), so compacting 1M receivers to a few thousand
    attractors cuts the force pass from ~1 s to ~ms on a v5e.
    """
    pos = masses.pos                                       # [3, N]
    n = pos.shape[1]

    bins, tbl, cell = build_source_bins(
        pos, masses.valid, masses.mag_rad, masses.mag_scale, cutoff,
        n_cells, cell_cap)

    if receivers:
        if ridx is None:
            # callers stepping in a loop should hoist this to chunk entry
            # (magnet_receiver_idx): the top_k over N is chunk-constant
            ridx = magnet_receiver_idx(masses, receivers)
        flag = masses.valid[ridx] & (masses.mag_maxf[ridx] != 0.0)
        rows9 = neighborhood_rows(tbl, cell[ridx], n_cells)   # [R, 9]
        f_r = receiver_forces(bins, rows9, cutoff, n, pos[:, ridx],
                              masses.mag_rad[ridx],
                              masses.mag_stiffness[ridx],
                              masses.mag_maxf[ridx], ridx, chunk_cells)
        # top_k padding beyond the true attractor count picks unflagged
        # indices; mask them (an INVALID mass can carry nonzero params)
        f_r = jnp.where(flag, f_r, 0.0)
        return jnp.zeros((3, n), pos.dtype).at[:, ridx].set(f_r)

    # receivers are the masses in ORIGINAL order -- dense, no slot padding,
    # and (round-3 continued) no gathers: receiver order is irrelevant to
    # the per-receiver candidate sweep, so the old cell-sorted receiver
    # staging (four [N]-row gathers in + one [N]-row unsort scatter out)
    # was pure overhead on the TPU's row-count-bound gathers
    rows9 = neighborhood_rows(tbl, cell, n_cells)          # [N, 9]
    iota = jnp.arange(n, dtype=jnp.int32)
    f = receiver_forces(bins, rows9, cutoff, n, pos, masses.mag_rad,
                        masses.mag_stiffness, masses.mag_maxf, iota,
                        chunk_cells)
    return jnp.where(masses.valid, f, 0.0)


def build_source_bins(pos, valid, mag_rad, mag_scale, cutoff: float,
                      n_cells: int, cell_cap: int):
    """Build the binned SOURCE structure over the full mass set.

    Returns ``(bins, tbl, cell)``: the [A+1, 6, C] candidate table
    (x, y, z, rad, scale, id-as-float; row A = trash, empty slots hold
    a far-away sentinel position so every pair test fails on distance),
    the dense [G*G] cell -> bin-row table (A = empty cell), and each
    mass's cell id (receiver lookups index ``tbl`` with it).

    ALL valid masses are binned as sources, not just ones with nonzero
    magnet params: a zero-param mass still exerts shell contact force on
    a receiver whose shell radius overlaps it (its rad_j merely adds 0 to
    the intersection depth) -- matching ops/forces.magnet_forces
    (src_valid = masses.valid) and the reference occupancy grid, which
    inserts every mass (sim.cu:842).

    Measured TPU traps shaped this (docs/PERFORMANCE.md): per-element XLA
    gathers at [A, 9C] scale were 4.7x SLOWER than the O(N^2) pairwise
    pass; slot-padded receivers ([A, C, 9C] pair tensor) wasted C x the
    compute on empty slots; and (round-3 continued, 1M-mass breakdown)
    staging the six field rows in CELL-SORTED order cost eight [N]-row
    gathers = ~150 of the ~170 ms compact pass -- the sort itself is only
    ~4 ms.  The table is therefore scattered in ORIGINAL mass order (the
    same in-layout trick as ops/magnets_grid.py): lax.sort carries the
    index as a second operand (no csort gather), per-mass (bin row, slot)
    come back to original order via two cheap scatters, and the field
    stack needs no reordering at all.  Like the reference, a mass beyond
    the cell cap stops acting as a SOURCE but still receives forces (it
    is absent from the grid but still scans it, sim.cu:1250-1281).
    """
    n = pos.shape[1]
    G = GRID_DIM
    sentinel = jnp.int32(G * G + 7)                        # > any real cell
    cell = cell_ids(pos, valid, cutoff)                    # [N]

    iota = jnp.arange(n, dtype=jnp.int32)
    # one stable two-operand sort: sorted cells AND the permutation,
    # without the cell[order] gather
    csort, order = jax.lax.sort((cell, iota), num_keys=1, is_stable=True)
    first = jnp.concatenate([jnp.ones(1, bool),
                             csort[1:] != csort[:-1]])     # segment starts
    seg_id = jnp.cumsum(first.astype(jnp.int32)) - 1       # [N] 0..K-1
    seg_start = jax.lax.cummax(jnp.where(first, iota, 0))  # start pos of seg
    rank = iota - seg_start                                # slot within cell

    msort = csort != sentinel
    A, C = n_cells, cell_cap
    # invalid masses route to A+1: out of bounds of BOTH the [A] acell
    # scatter and the [A+1, 6, C] bins scatter, so mode="drop" removes
    # them entirely.  (A alone is the TRASH row of bins -- in bounds! --
    # and routing invalid masses there polluted it: a receiver with any
    # empty neighbor cell reads row A, and a DELETED magnet's stale
    # fields in it exerted real force.  Regression-pinned in
    # tests/test_magnets_binned.py::test_deleted_mass_never_pollutes_trash_row.)
    aidx = jnp.where(msort, seg_id, A + 1)
    acell = jnp.full(A, sentinel, jnp.int32).at[aidx].set(csort, mode="drop")

    # 9-neighborhood lookup via a dense cell -> bin-row table: one
    # A-element scatter + one gather per receiver row.  (A binary search
    # here -- jnp.searchsorted -- costs ~17 gather rounds and measured ~5x
    # the whole pairwise-force budget on TPU.)
    tbl = jnp.full(G * G, A, jnp.int32).at[acell].set(
        jnp.arange(A, dtype=jnp.int32), mode="drop")       # sentinel drops

    # each mass's flat slot base in the [A+1, 6, C] table, routed OOB for
    # invalid masses AND over-cap ranks (rank >= C would otherwise bleed
    # into the next field's slots in flat addressing), then unsorted to
    # original mass order with ONE scatter.  (int32 flat addressing bounds
    # the table at (A+1)*6*C < 2^31, i.e. ~22M valid masses -- the [A,6,C]
    # table itself hits HBM limits far earlier.)
    size = (A + 1) * 6 * C
    assert size < 2 ** 31, "bins table exceeds int32 flat addressing"
    base_s = jnp.where(msort & (rank < C), aidx * (6 * C) + rank, size)
    base_o = jnp.full(n, size, jnp.int32).at[order].set(base_s)

    FAR = jnp.asarray(1e9, pos.dtype)
    # ONE [A+1, 6, C] table (x, y, z, rad, scale, id-as-float) so each
    # receiver needs a single row-slab gather instead of six; fields stay
    # in original mass order (zero gathers), written by SIX flat
    # per-field element scatters -- measured 1.75x the row-windowed
    # two-index scatter at 1M masses on a v5e (134 -> 76 ms; scatters,
    # like gathers, are element-count bound on TPU)
    fields = jnp.stack([pos[0], pos[1], pos[2], mag_rad, mag_scale,
                        iota.astype(pos.dtype)])           # [6, N]
    fill = jnp.asarray([FAR, FAR, FAR, 0.0, 0.0, n], pos.dtype)
    flat = jnp.broadcast_to(fill[None, :, None], (A + 1, 6, C)).reshape(-1)
    for f in range(6):
        flat = flat.at[base_o + f * C].set(fields[f], mode="drop")
    return flat.reshape(A + 1, 6, C), tbl, cell


def neighborhood_rows(tbl: jax.Array, rcell: jax.Array,
                      n_cells: int) -> jax.Array:
    """3x3-neighborhood bin rows per receiver cell id; [R, 9].

    Out-of-grid neighbor ids and the invalid-mass cell sentinel map to the
    trash row A = ``n_cells``.  The flat-id +-1 wrap at grid x-edges only
    introduces far-away candidates that the distance test rejects (cells
    are cutoff-sized).
    """
    G = GRID_DIM
    A = n_cells
    shifts = jnp.asarray([dx * G + dy for dx in (-1, 0, 1)
                          for dy in (-1, 0, 1)], jnp.int32)
    ncell = rcell[:, None] + shifts[None, :]               # [R, 9]
    ok = (ncell >= 0) & (ncell < G * G) & (rcell < G * G)[:, None]
    return jnp.where(ok, tbl[jnp.clip(ncell, 0, G * G - 1)], A)


def receiver_forces(bins: jax.Array, rows9: jax.Array, cutoff: float,
                    n_total: int, rpos, rrad, rstiff, rmaxf, rid,
                    chunk_cells: int = 512) -> jax.Array:
    """Force on each of R receivers from the binned source structure; [3, R].

    ``bins`` is the [A+1, 6, C] candidate table and ``rows9`` [R, 9] each
    receiver's 3x3-neighborhood bin rows (row A = the empty trash row).
    Receivers are arbitrary -- the single-device path passes the cell-sorted
    masses; the halo multi-chip path passes its local index block against a
    globally built ``bins``.  ``rid`` are global mass ids for the
    self-pair exclusion; ``n_total`` the global mass count.
    """
    A = bins.shape[0] - 1
    C = bins.shape[2]
    n = n_total
    FAR = jnp.asarray(1e9, rpos.dtype)
    R = rpos.shape[1]
    B = chunk_cells                                        # receivers/chunk
    n_chunks = (R + B - 1) // B
    Rp = n_chunks * B
    spos_c = jnp.pad(rpos, ((0, 0), (0, Rp - R)),
                     constant_values=FAR).reshape(3, n_chunks, B)
    srad_c = jnp.pad(rrad, (0, Rp - R)).reshape(n_chunks, B)
    sstiff_c = jnp.pad(rstiff, (0, Rp - R)).reshape(n_chunks, B)
    smaxf_c = jnp.pad(rmaxf, (0, Rp - R)).reshape(n_chunks, B)
    sid_c = jnp.pad(rid, (0, Rp - R),
                    constant_values=n).reshape(n_chunks, B)
    rows_c = jnp.pad(rows9, ((0, Rp - R), (0, 0)),
                     constant_values=A).reshape(n_chunks, B, 9)

    def chunk_forces(carry, xs):
        # (bin-table formulation; the round-3 slab-gather variant was
        # measured 3.8-5.8x slower and removed -- docs/PERFORMANCE.md)
        rpos = xs[0]                                       # [3, B]
        rrad, rstiff, rmaxf, rid, rows = xs[1:]            # [B], [B, 9]
        cand = jnp.take(bins, rows, axis=0)                # [B, 9, 6, C]
        cand = cand.transpose(0, 2, 1, 3).reshape(-1, 6, 9 * C)
        cpos = cand[:, 0:3].transpose(1, 0, 2)             # [3, B, 9C]
        crad = cand[:, 3]                                  # [B, 9C]
        cscale = cand[:, 4]
        cid = cand[:, 5].astype(jnp.int32)
        diff = rpos[..., None] - cpos                      # [3, B, 9C]
        dist2 = jnp.sum(diff * diff, axis=0)
        pos_d = (dist2 > 0) & (dist2 < FAR)
        dist = jnp.where(pos_d, jnp.sqrt(jnp.where(pos_d, dist2, 1.0)), FAR)
        safe = jnp.where(pos_d, dist, 1.0)
        pair_ok = ((dist < cutoff)
                   & (rid[:, None] != cid)
                   & (rid[:, None] < n) & (cid < n))
        inter = dist - (rrad[:, None] + crad)
        shell = jnp.where(inter < 0,
                          jnp.abs(inter) * rstiff[:, None], 0.0)
        attract = (cscale * rmaxf[:, None]
                   / jnp.maximum(dist2, 1e-12))
        coeff = jnp.where(pair_ok, (shell - attract) / safe, 0.0)
        f_r = jnp.sum(diff * coeff[None], axis=2)          # [3, B]
        return carry, f_r

    _, f_chunks = jax.lax.scan(
        chunk_forces, 0,
        (spos_c.transpose(1, 0, 2), srad_c, sstiff_c, smaxf_c, sid_c,
         rows_c))                                          # [nc, 3, B]
    return f_chunks.transpose(1, 0, 2).reshape(3, Rp)[:, :R]
