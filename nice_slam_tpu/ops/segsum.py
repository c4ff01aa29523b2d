"""Sorted-segment scatter-add: the grid-gradient kernel.

The mapping step's dominant cost in round 1 (62% of the ~22 ms step,
PERF.md) was XLA's lowering of the grid-gradient scatter-add
``zeros((V, C)).at[idx].add(contribs)``: a sort followed by a *serialized*
segmented-reduce loop (3-5 ms per grid per iteration).  The reference pays
the equivalent cost inside CUDA grid_sample's backward
(src/conv_onet/models/decoder.py:168-175).

This module re-implements the scatter as:

  1. sort the (index, value) pairs by voxel index (XLA sort, ~0.3 ms);
  2. a Pallas kernel that reduces each sorted run to ONE (index, sum) pair.
     TPU grid iterations run sequentially on the core, so a VMEM/SMEM carry
     threads partial segments across tile boundaries; within a tile the
     per-segment sums are one (TILE x TILE) one-hot matmul on the MXU
     (exact: 0/1 weights, f32 accumulate);
  3. one scatter with *globally unique* indices — every voxel's run
     completes exactly once, and unused emit slots get unique filler rows
     past the real grid — which XLA lowers as a fully parallel store
     instead of the serialized reduce loop.

Numerics: per-voxel sums are true sums of contributions in sorted order
(matmul accumulation + at most one carry add per crossed tile boundary) —
no prefix-sum differencing, so no catastrophic cancellation.

Layout note: Mosaic requires the last two block dims to be (8k, 128k) or
span the full array, so the kernel consumes SUB=8 tiles per grid step —
index blocks are (SUB, TILE), value blocks (SUB*TILE, C) — and loops over
the subtiles in-kernel with the carry in scratch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256
SUB = 8  # subtiles per grid step (Mosaic sublane alignment)

# The kernel keeps all index math in int32; filler rows extend past V by
# one slot per (tile, rank), so V + num_tiles*(TILE+1) must stay in int32.
MAX_VOXELS = 2 ** 30


def _segsum_kernel(V: int, C: int, sidx_ref, svals_ref,
                   emit_vals_ref, emit_idx_ref,
                   carry_sum_ref, carry_idx_ref):
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_idx_ref[0] = -1
        carry_sum_ref[:] = jnp.zeros_like(carry_sum_ref)

    # constants hoisted out of the subtile loop
    iota_i = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    tri = (iota_i <= iota_c).astype(jnp.float32)    # tri[i, r] = i <= r
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)

    def subtile(j, _):
        tile_no = t * SUB + j
        idx = sidx_ref[pl.ds(j, 1), :]              # (1, TILE) int32, sorted
        vals = svals_ref[pl.ds(j * TILE, TILE), :]  # (TILE, C) f32

        # segment structure within the tile: rank = number of segment starts
        # at or before each position (position 0 is rank 0 by construction).
        # cumsum is not lowerable in Mosaic — use an exact 0/1 triangular
        # matmul on the MXU instead (sums <= TILE, exact in f32)
        prev = jnp.concatenate([idx[:, :1], idx[:, :-1]], axis=1)
        is_new = (idx != prev).astype(jnp.float32)  # is_new[0, 0] == 0
        rank = jnp.dot(is_new, tri,
                       preferred_element_type=jnp.float32).astype(jnp.int32)
        last_rank = jnp.max(rank)                   # rank is nondecreasing

        # per-rank sums: one-hot (rank_r x pos_i) matmul on the MXU (exact)
        rank_eq = rank == iota_i                    # (TILE_r, TILE_i) bool
        W = rank_eq.astype(jnp.float32)
        # HIGHEST: the TPU's default f32 matmul precision truncates the
        # operands to bf16, which would round the *values* being summed
        seg_sum = jnp.dot(W, vals, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)

        # per-rank absolute voxel index, column layout (all positions of a
        # rank share one index; -1 where the rank is empty)
        seg_idx = jnp.max(jnp.where(rank_eq, idx, -1), axis=1,
                          keepdims=True)            # (TILE, 1) int32

        carry_idx0 = carry_idx_ref[0]               # SMEM scalar
        carry_vec = carry_sum_ref[0:1, 0:C]         # (1, C)
        first_tile = tile_no == 0
        idx_first = jnp.min(idx)                    # == idx[0, 0] (sorted)
        idx_last = jnp.max(idx)                     # == idx[0, TILE-1]
        cont = jnp.logical_not(first_tile) & (idx_first == carry_idx0)

        complete = r_iota < last_rank               # last segment -> carry
        filler_base = V + 1 + tile_no * (TILE + 1)

        add0 = jnp.where((r_iota == 0) & cont, carry_vec, 0.0)
        base = j * (TILE + 1)
        out_vals = jnp.concatenate([seg_sum + add0, carry_vec], axis=0)
        emit_vals_ref[pl.ds(base, TILE + 1), :] = out_vals

        # index column: completed in-tile segments keep their voxel index,
        # everything else gets a unique filler row; the carry slot (row
        # TILE) emits the previous tile's carry iff this tile starts a
        # different segment
        emit_c = jnp.logical_not(first_tile) & (idx_first != carry_idx0)
        in_tile_idx = jnp.where(complete, seg_idx, filler_base + r_iota)
        carry_slot = jnp.where(emit_c, carry_idx0, filler_base + TILE)
        out_idx = jnp.concatenate(
            [in_tile_idx, jnp.broadcast_to(carry_slot, (1, 1))], axis=0)
        emit_idx_ref[pl.ds(base, TILE + 1), :] = out_idx

        # new carry = the tile's (incomplete) last segment: one masked
        # (1, TILE) x (TILE, C) matvec (exact 0/1 weights)
        seg_mask = (rank == last_rank)              # (1, TILE) over positions
        last_sum = jnp.dot(seg_mask.astype(jnp.float32), vals,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # (1, C)
        last_sum = last_sum + jnp.where(cont & (last_rank == 0),
                                        carry_vec, 0.0)
        carry_sum_ref[0:1, 0:C] = last_sum
        carry_idx_ref[0] = idx_last
        return 0

    jax.lax.fori_loop(0, SUB, subtile, 0)


@functools.partial(jax.jit, static_argnames=("V", "interpret"))
def sorted_segment_scatter(
    flat_idx: jnp.ndarray, contribs: jnp.ndarray, V: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Equivalent of ``zeros((V, C)).at[flat_idx].add(contribs)``.

    Args:
        flat_idx: (M,) int32 target rows (need not be sorted or unique).
        contribs: (M, C) float32 values to accumulate.
        V: number of output rows (static).
        interpret: run the Pallas kernel in interpreter mode (CPU tests).

    Returns:
        (V, C) accumulated array.
    """
    M, C = contribs.shape
    assert V < MAX_VOXELS and C <= 128

    order = jnp.argsort(flat_idx)
    sidx = jnp.take(flat_idx, order).astype(jnp.int32)
    svals = jnp.take(contribs, order, axis=0)

    # pad to a SUB*TILE multiple plus at least one full sentinel tile, so
    # the final real segment always completes inside the kernel (sentinel
    # idx = V is strictly greater than every real index)
    num_tiles = ((M + TILE) // (SUB * TILE) + 1) * SUB
    pad = num_tiles * TILE - M
    sidx = jnp.concatenate([sidx, jnp.full((pad,), V, jnp.int32)])
    svals = jnp.concatenate([svals, jnp.zeros((pad, C), svals.dtype)])

    emit_vals, emit_idx = pl.pallas_call(
        functools.partial(_segsum_kernel, V, C),
        grid=(num_tiles // SUB,),
        in_specs=[
            pl.BlockSpec((SUB, TILE), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB * TILE, C), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((SUB * (TILE + 1), C), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SUB * (TILE + 1), 1), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles * (TILE + 1), C), svals.dtype),
            jax.ShapeDtypeStruct((num_tiles * (TILE + 1), 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((8, 128), svals.dtype),
            pltpu.SMEM((1,), jnp.int32),
        ],
        interpret=interpret,
    )(sidx.reshape(num_tiles, TILE), svals)

    # every emitted index is globally unique: each voxel's sorted run
    # completes exactly once, and filler rows are disjoint per (tile, slot)
    buf = jnp.zeros((V + 1 + num_tiles * (TILE + 1), C), svals.dtype)
    buf = buf.at[emit_idx.reshape(-1)].set(
        emit_vals.reshape(-1, C), unique_indices=True
    )
    return buf[:V]
