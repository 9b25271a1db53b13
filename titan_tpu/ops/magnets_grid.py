"""Dense occupancy-grid magnet kernel: the Pallas answer to the gather wall.

The cell-binned XLA path (ops/magnets.py) pays a candidate slab gather per
receiver ([N, 9] bin rows); at small caps the gather is row-latency bound
(5-6 GB/s at 192 B rows, ~14 of 19.5 ms at 50k masses -- the round-2
numbers in docs/PERFORMANCE.md).  This module removes the gather entirely
by making the occupancy grid DENSE, the same way the reference does
(sim.cu:822-932 keeps a dense 256x256 cell grid), but processed the TPU
way:

  1. XLA setup: cell id + in-cell rank (one argsort, shared machinery with
     the binned path), then ONE flat element-scatter fills the dense slot
     table DIRECTLY in kernel layout [C, 8, G, G] -- fields pos xyz, shell
     rad, susceptibility scale, shell stiffness, max pull force, VALID
     flag; empty slots stay all-zero and are rejected by the flag.  (The
     first cut scattered [N, 8] rows into [G*G*C, 8] with a FAR-position
     sentinel fill and transposed afterward: the 67 MB fill + major-layout
     transpose cost 16 ms at 50k -- as much as the whole binned path.
     The in-layout element scatter + zero fill costs ~1 ms.)  The scatter
     runs on the ORIGINAL mass order (slot indices are unsorted via one
     int scatter), which kills both a [7, N] row gather here and the
     unsort scatter on the way out.
  2. Pallas kernel: the grid [C, 8, G, G] streams through VMEM in x-row
     blocks (sequential block DMAs at HBM bandwidth -- zero gathers); the
     3x3 cell neighborhood is built in-VMEM from the two adjacent blocks
     (x) and lane rolls (y).  Slot loops are OCCUPANCY-ADAPTIVE: per-block
     max cell occupancy is prefetched to SMEM and bounds both the receiver
     and candidate slot loops, so compute scales with the real occupancy
     (~4-16 slots) instead of C^2 -- the cap only sizes the table.
  3. Per-slot forces come back to masses by one slot-index gather.

Edge semantics need NO masks: cells are cutoff-sized, so only the 9 true
neighbor cells can contain an in-range pair, and every spurious candidate
a wrap or clamp introduces (y lane-roll wrap, x block clamp at the grid
boundary) is provably rejected by the exact `dist < cutoff` gate -- the
same argument that makes the binned path's flat-id neighbor wrap
(ops/magnets.py `acell + shifts`) physically harmless.

Overflow parity: a cell holding more than C masses cannot be represented
in the dense table, so the whole computation falls back to the exact
binned path via `lax.cond` the moment ANY cell overflows (the binned path
keeps over-cap masses as receivers, reference semantics sim.cu:850-859).
The fallback is runtime-dynamic, costs nothing when it doesn't fire, and
keeps this path semantically identical to `binned_magnet_forces` for
every scene.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..state import MassState
from .magnets import GRID_DIM, binned_magnet_forces, cell_ids

_BX = 8          # grid x-rows per kernel block (f32 sublane tile)
_RC = 8          # receiver slots per inner chunk


def _grid_kernel(cell_cap: int, cutoff: float):
    """Kernel body: 3x3 neighborhood sweep over one x-block of the grid."""
    C = cell_cap

    def kernel(occ_ref, occ3_ref, prev_ref, cur_ref, next_ref, out_ref,
               cand_ref):
        i = pl.program_id(0)
        out_ref[:] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(occ_ref[i] > 0)
        def _compute():
            cur = cur_ref[:]                       # [C, 8, BX, G]
            # candidate blocks for the three x-offsets: rows shift across
            # block boundaries using the adjacent blocks' edge rows (the
            # clamped edge blocks contribute distance-rejected cells only)
            xm1 = jnp.concatenate(
                [prev_ref[:, :, _BX - 1:, :], cur[:, :, :_BX - 1, :]],
                axis=2)
            xp1 = jnp.concatenate(
                [cur[:, :, 1:, :], next_ref[:, :, :1, :]], axis=2)

            n_rc = (occ_ref[i] + _RC - 1) // _RC
            n_c2 = occ3_ref[i]

            def pair_sweep(_):
                # receivers (chunks of _RC slots) x candidates (slots of
                # the current shift's cand_ref), both loops bounded by the
                # prefetched occupancy; physics =
                # computeExternalMagnetForce (sim.cu:1223-1241),
                # arithmetic matching binned_magnet_forces term for term
                def rc_body(rc, _):
                    base = rc * _RC
                    rslab = cur_ref[pl.ds(base, _RC)]   # [RC, 8, BX, G]
                    rpos = rslab[:, 0:3]
                    rrad = rslab[:, 3]
                    rstiff = rslab[:, 5]
                    rmaxf = rslab[:, 6]
                    acc = out_ref[pl.ds(base, _RC)]     # [RC, 3, BX, G]

                    def c2_body(c2, acc):
                        c = cand_ref[pl.ds(c2, 1)]      # [1, 8, BX, G]
                        cpos = c[0, 0:3]                # [3, BX, G]
                        crad = c[0, 3]
                        cscale = c[0, 4]
                        cval = c[0, 7]                  # 1.0 = occupied
                        diff = rpos - cpos[None]        # [RC, 3, BX, G]
                        dist2 = jnp.sum(diff * diff, axis=1)
                        dist = jnp.sqrt(dist2)
                        safe = jnp.where(dist > 0, dist, 1.0)
                        inter = dist - (rrad + crad[None])
                        shell = jnp.where(inter < 0,
                                          jnp.abs(inter) * rstiff, 0.0)
                        attract = (cscale[None] * rmaxf
                                   / jnp.maximum(dist2, 1e-12))
                        coeff = jnp.where(dist < cutoff,
                                          (shell - attract) / safe,
                                          0.0) * cval[None]
                        return acc + diff * coeff[:, None]

                    acc = jax.lax.fori_loop(0, n_c2, c2_body, acc)
                    out_ref[pl.ds(base, _RC)] = acc
                    return 0

                jax.lax.fori_loop(0, n_rc, rc_body, 0)

            for cand_x in (xm1, cur, xp1):
                for dy in (-1, 0, 1):
                    cand_ref[:] = (pltpu.roll(cand_x, (-dy) % GRID_DIM, 3)
                                   if dy else cand_x)
                    pair_sweep(None)

    return kernel


@functools.partial(jax.jit, static_argnums=(1, 2, 3, 4))
def grid_magnet_forces(masses: MassState, cutoff: float,
                       n_cells: int, cell_cap: int,
                       interpret: bool = False) -> jax.Array:
    """Magnet forces via the dense-grid Pallas kernel; [3, N].

    Physics identical to `binned_magnet_forces` (and to the exact pairwise
    pass within the cell cap); scenes where any cell overflows ``cell_cap``
    run the binned path instead, selected at runtime by `lax.cond`.
    ``n_cells`` is only used by that fallback.
    """
    pos = masses.pos                               # [3, N]
    n = pos.shape[1]
    G, C = GRID_DIM, cell_cap
    nx = G // _BX
    sentinel = jnp.int32(G * G + 7)

    # --- shared binning setup (ops/magnets.cell_ids) ---
    cell = cell_ids(pos, masses.valid, cutoff)

    order = jnp.argsort(cell)
    csort = cell[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    first = jnp.concatenate([jnp.ones(1, bool), csort[1:] != csort[:-1]])
    seg_start = jax.lax.cummax(jnp.where(first, iota, 0))
    rank = iota - seg_start

    msort = csort != sentinel
    in_grid = msort & (rank < C)
    n_over = jnp.sum(msort & ~in_grid)

    def grid_branch(_):
        slot_sorted = jnp.where(in_grid, csort * C + rank, G * G * C)
        # slot per ORIGINAL mass: one int scatter instead of gathering the
        # 7 field rows into sorted order (and unsorting forces afterward)
        slot = (jnp.zeros(n, jnp.int32)
                .at[order].set(slot_sorted, unique_indices=True))   # [N]
        fields = jnp.stack([pos[0], pos[1], pos[2], masses.mag_rad,
                            masses.mag_scale, masses.mag_stiffness,
                            masses.mag_maxf,
                            jnp.ones_like(masses.mag_rad)])         # [8, N]
        # scatter straight into the kernel layout [C, 8, G, G]: for mass i
        # in (cell, rank), element (rank, f, cx, cy) lives at flat index
        # rank*8*G*G + f*G*G + cell; out-of-grid masses hit the dump
        # element past the end
        cell_of = slot // C
        rank_of = slot % C
        # out-of-grid masses get an out-of-bounds index and are DROPPED;
        # every in-bounds index is unique, which lets XLA skip the
        # serialized duplicate-handling scatter lowering
        base = jnp.where(slot < G * G * C,
                         rank_of * (8 * G * G) + cell_of, C * 8 * G * G)
        idx = base[:, None] + jnp.arange(8, dtype=jnp.int32)[None] * (G * G)
        flat = (jnp.zeros(C * 8 * G * G, pos.dtype)
                .at[idx.reshape(-1)].set(fields.T.reshape(-1),
                                         mode="drop",
                                         unique_indices=True))
        ktab = flat.reshape(C, 8, G, G)

        # per-block max occupancy (0 = no masses in the block's x-rows);
        # occ3 additionally covers the two neighbor blocks, bounding the
        # candidate slot loop
        blk = jnp.where(in_grid, csort // (G * _BX), nx)
        occ = jnp.zeros(nx + 1, jnp.int32).at[blk].max(rank + 1)[:nx]
        occ3 = jnp.maximum(occ, jnp.maximum(
            jnp.concatenate([occ[:1], occ[:-1]]),
            jnp.concatenate([occ[1:], occ[-1:]])))

        spec = lambda f: pl.BlockSpec((C, 8, _BX, G),
                                      lambda i, a, b: (0, 0, f(i), 0))
        out = pl.pallas_call(
            _grid_kernel(C, cutoff),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nx,),
                in_specs=[
                    spec(lambda i: jnp.maximum(i - 1, 0)),
                    spec(lambda i: i),
                    spec(lambda i: jnp.minimum(i + 1, nx - 1)),
                ],
                out_specs=pl.BlockSpec((C, 3, _BX, G),
                                       lambda i, a, b: (0, 0, i, 0)),
                scratch_shapes=[pltpu.VMEM((C, 8, _BX, G), pos.dtype)],
            ),
            out_shape=jax.ShapeDtypeStruct((C, 3, G, G), pos.dtype),
            compiler_params=None if interpret else pltpu.CompilerParams(
                # 3 in + 1 out block double-buffered + cand scratch + the
                # x-shifted candidate temporaries
                vmem_limit_bytes=4 * _BX * G * C * (8 * 7 + 3 * 2) * 4
                + 24 * 1024 * 1024),
            interpret=interpret,
        )(occ, occ3, ktab, ktab, ktab)

        # force f of mass i lives at out[rank, f, cx, cy] -- gather the
        # three components per mass straight from the kernel layout (an
        # element gather beats transposing the 25 MB output first)
        fbase = jnp.where(slot < G * G * C,
                          rank_of * (3 * G * G) + cell_of, C * 3 * G * G)
        fidx = fbase[None, :] + jnp.arange(
            3, dtype=jnp.int32)[:, None] * (G * G)                  # [3, N]
        fflat = jnp.concatenate([out.reshape(-1),
                                 jnp.zeros((1,), pos.dtype)])
        return fflat[fidx]                                          # [3, N]

    def binned_branch(_):
        return binned_magnet_forces(masses, cutoff, n_cells, cell_cap)

    return jax.lax.cond(n_over == 0, grid_branch, binned_branch, None)
