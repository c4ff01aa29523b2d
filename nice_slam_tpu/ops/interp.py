"""Trilinear feature-grid interpolation — the framework's hottest op.

The reference runs this through CUDA ``F.grid_sample`` on grids stored as
``[1, C, Z, Y, X]`` (reference: src/conv_onet/models/decoder.py:168-175,
grid allocation with the x/z axis swap at src/NICE_SLAM.py:213-250).  Here
grids are stored channels-last ``(Nx, Ny, Nz, C)`` so the 8 corner lookups
become flat XLA gathers whose innermost (lane) dimension is the feature
channel — TPU-friendly — and the weighted corner combine fuses with the
decoder's first matmul.

Numerics match ``grid_sample(mode='bilinear', padding_mode='border',
align_corners=True)``: continuous index u = (p+1)/2*(S-1), clamped to
[0, S-1] (border), floor/ceil corners, trilinear weights.  Gradients flow
to both the grid (scatter-add, handled by XLA's gather transpose) and the
query points (zero outside the border, like torch's clamp).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Grid-gradient strategy (see _trilinear_bwd):
#   block (default) - ONE N-row scatter of (8C)-wide per-cell blocks at the
#                     cell base index + 8 dense shifted adds.  The TPU's
#                     XLA scatter lowering is a serialized per-row loop
#                     (~13 ns/row, trace-verified round 2), so cutting rows
#                     8x beats it >2x; the shifted adds are bandwidth-cheap.
#   xla             - plain 8N-row scatter-add (the round-1 path)
# (A Pallas sorted-segment kernel was built, measured 5x slower in-context
# — Mosaic's ~10 us/grid-step overhead dwarfs the work — and deleted in
# round 3; the negative result lives in PERF.md.)
# NICE_SLAM_TPU_SEGSUM=0 additionally disables the custom VJP entirely
# (plain autodiff, debug only).
# NICE_SLAM_TPU_DGRAD_BF16=0 keeps the block scatter's contribution
# buffer in f32 (default 1: bf16 halves the scatter + fold HBM bytes —
# the dominant mapping cost; grid gradients feed Adam, which normalizes
# per-parameter scale, and the quality A/B on the synthetic orbit showed
# no ATE/recon movement — see PERF.md).
_SEGSUM_MODE = os.environ.get("NICE_SLAM_TPU_SEGSUM", "auto")
_DGRAD_MODE = os.environ.get("NICE_SLAM_TPU_DGRAD", "block")
_DGRAD_BF16 = os.environ.get("NICE_SLAM_TPU_DGRAD_BF16", "1") == "1"
# Small grids (<= this many cells, e.g. the 2 m-voxel coarse grid) take
# the one-hot-matmul dgrid instead of the scatter: the scatter's ~13 ns/row
# loop is independent of grid size, while the dense contraction is MXU
# work proportional to V (NICE_SLAM_TPU_DGRAD=matmul forces it everywhere,
# =block with VMAX=0 disables it).
_MATMUL_V_MAX = int(os.environ.get("NICE_SLAM_TPU_DGRAD_MATMUL_VMAX", "4096"))
# Measurement-only knob (0 = off): cap the block scatter's row count to
# isolate its in-context cost — see _dgrid_block_scatter.
_ROWS_CAP = int(os.environ.get("NICE_SLAM_TPU_DGRAD_ROWS_CAP", "0"))


def _trilinear_corners(grid_shape, p_nor):
    """Shared index/weight computation: clamped continuous index, corner
    integer indices and the fractional lerp weights."""
    nx, ny, nz, _ = grid_shape
    sizes = jnp.array([nx, ny, nz], dtype=p_nor.dtype)
    raw = (p_nor + 1.0) * 0.5 * (sizes - 1.0)
    u = jnp.clip(raw, 0.0, sizes - 1.0)
    i0 = jnp.floor(u)
    frac = u - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1], jnp.int32))
    # derivative mask of the border clamp (matches jnp.clip's vjp,
    # including the 0.5 averaging convention at exact ties)
    strict = ((raw > 0.0) & (raw < sizes - 1.0)).astype(p_nor.dtype)
    tie = ((raw == 0.0) | (raw == sizes - 1.0)).astype(p_nor.dtype)
    live = strict + 0.5 * tie
    dudp = 0.5 * (sizes - 1.0) * live  # du/dp_nor per axis
    return u, i0, i1, frac, dudp


def _corner_weights(frac):
    """The 8 trilinear weights in corner order (x, y, z) bit-encoded
    (bit0 -> x=1, bit1 -> y=1, bit2 -> z=1) and their gradients wrt frac."""
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    wx = [(1 - fx), fx]
    wy = [(1 - fy), fy]
    wz = [(1 - fz), fz]
    dwx = [-jnp.ones_like(fx), jnp.ones_like(fx)]
    weights = []
    dweights = []
    for c in range(8):
        bx, by, bz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        weights.append(wx[bx] * wy[by] * wz[bz])
        dweights.append((
            dwx[bx] * wy[by] * wz[bz],          # d/dfx
            wx[bx] * dwx[by] * wz[bz],          # d/dfy
            wx[bx] * wy[by] * dwx[bz],          # d/dfz
        ))
    return weights, dweights


def _corner_flat_indices(grid_shape, i0, i1):
    _, ny, nz, _ = grid_shape
    idxs = []
    for c in range(8):
        ix = jnp.where((c & 1) == 1, i1[:, 0], i0[:, 0])
        iy = jnp.where(((c >> 1) & 1) == 1, i1[:, 1], i0[:, 1])
        iz = jnp.where(((c >> 2) & 1) == 1, i1[:, 2], i0[:, 2])
        idxs.append((ix * ny + iy) * nz + iz)
    return idxs


def trilinear_interp(grid: jnp.ndarray, p_nor: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly interpolate a channels-last 3D feature grid.

    Routes through the custom-VJP variant on ALL backends; its default
    grid-gradient strategy is the cell-block scatter with a bf16
    contribution buffer (_dgrid_block_scatter — the resolution of the
    round-1 finding that XLA's native scatter-add lowering ate 62% of the
    mapping step; strategies + history in the module header and PERF.md).
    NICE_SLAM_TPU_SEGSUM=0 restores plain autodiff for debugging.

    Args:
        grid: (Nx, Ny, Nz, C) feature volume.
        p_nor: (N, 3) query points normalized to [-1, 1] (x, y, z order).

    Returns:
        (N, C) interpolated features.
    """
    if _SEGSUM_MODE != "0":
        return trilinear_interp_explicit_vjp(grid, p_nor)
    return _trilinear_impl(grid, p_nor)


@jax.custom_vjp
def trilinear_interp_explicit_vjp(grid: jnp.ndarray,
                                  p_nor: jnp.ndarray) -> jnp.ndarray:
    """Variant with a hand-written backward (grad-exact vs autodiff; see
    tests): the grid cotangent is accumulated by the cell-block scatter
    (default) or a plain 8N-row scatter-add.  Carries no optimization
    barrier, so pose-only differentiation (the tracker) still
    dead-code-eliminates the whole grid-gradient branch."""
    return _trilinear_impl(grid, p_nor)


def _trilinear_impl(grid: jnp.ndarray, p_nor: jnp.ndarray) -> jnp.ndarray:
    nx, ny, nz, C = grid.shape
    sizes = jnp.array([nx, ny, nz], dtype=p_nor.dtype)

    # align_corners=True mapping + border clamp.
    u = (p_nor + 1.0) * 0.5 * (sizes - 1.0)
    u = jnp.clip(u, 0.0, sizes - 1.0)

    i0 = jnp.floor(u)
    frac = u - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.array([nx - 1, ny - 1, nz - 1], dtype=jnp.int32))

    flat = grid.reshape(-1, C)

    def corner(ix, iy, iz):
        idx = (ix * ny + iy) * nz + iz
        return jnp.take(flat, idx, axis=0)

    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    gx0, gy0, gz0 = i0[:, 0], i0[:, 1], i0[:, 2]
    gx1, gy1, gz1 = i1[:, 0], i1[:, 1], i1[:, 2]

    c000 = corner(gx0, gy0, gz0)
    c001 = corner(gx0, gy0, gz1)
    c010 = corner(gx0, gy1, gz0)
    c011 = corner(gx0, gy1, gz1)
    c100 = corner(gx1, gy0, gz0)
    c101 = corner(gx1, gy0, gz1)
    c110 = corner(gx1, gy1, gz0)
    c111 = corner(gx1, gy1, gz1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def _trilinear_fwd(grid, p_nor):
    return _trilinear_impl(grid, p_nor), (grid, p_nor)


def _dgrid_block_scatter(grid_shape, dtype, i0, weights, g):
    """dgrid via ONE cell-base scatter of (8C)-wide blocks + 8 shifted adds.

    All 8 corner targets of a point share its cell-base flat index plus a
    fixed offset (bx*ny*nz + by*nz + bz).  The border clamp (i1 = i0) only
    occurs where frac = 0, i.e. where the +1-corner weights are identically
    zero.  The invariant the fold relies on: only an x-axis clamp overflows
    the flat index past V, into the maxoff pad region no slice reads; a
    clamped +y/+z corner's offset wraps into a REAL row of a neighboring
    cell — which is exact only because its weight is identically 0.0 there
    (frac = 0 at the clamp), so the wrapped row receives a zero.
    """
    nx, ny, nz, C = grid_shape
    V = nx * ny * nz
    offs = [(c & 1) * ny * nz + ((c >> 1) & 1) * nz + ((c >> 2) & 1)
            for c in range(8)]
    maxoff = max(offs)
    base = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
    # the contribution buffer may be held in bf16: the scatter row-loop is
    # partially byte-bound and the fold reads the whole (V, 8C) buffer, so
    # halving the bytes halves the dominant mapping cost (the row sums see
    # at most ~tens of collisions; bf16's 0.4% relative error is far below
    # the gradient noise of 1000-ray minibatches)
    buf_dtype = jnp.bfloat16 if (_DGRAD_BF16 and dtype == jnp.float32) else dtype
    contribs8 = jnp.concatenate(
        [w[:, None] * g for w in weights], axis=1).astype(buf_dtype)
    if _ROWS_CAP and base.shape[0] > _ROWS_CAP:
        # MEASUREMENT ONLY (numerically wrong): scatter just the first K
        # rows, preserving the op structure — isolates the per-row scatter
        # cost inside the real mapping step (PERF.md r3 floor analysis).
        base = base[:_ROWS_CAP]
        contribs8 = contribs8[:_ROWS_CAP]
    A = jnp.zeros((maxoff + V, 8 * C), buf_dtype).at[base + maxoff].add(contribs8)
    out = jnp.zeros((V, C), dtype)
    for c, off in enumerate(offs):
        out = out + jax.lax.dynamic_slice(
            A, (maxoff - off, c * C), (V, C)).astype(dtype)
    return out.reshape(grid_shape)


def _dgrid_block_matmul(grid_shape, dtype, i0, weights, g):
    """dgrid for SMALL grids: the cell-base block reduction as a one-hot
    matmul on the MXU instead of an XLA scatter.

    The TPU scatter lowering is a serialized ~13 ns/row loop INDEPENDENT
    of the target grid's size (PERF.md r2), so the coarse grid (~1k cells
    at 2 m voxels) pays the same ~0.6 ms per 48k-row scatter as the 178k-row
    fine grid.  For V small enough, computing A = onehot(base)^T @ contribs8
    is a dense (N x Vp x 8C) contraction — MXU work plus one small output,
    chunked over N so the materialized one-hot stays VMEM-sized.  The fold
    (8 shifted adds) is identical to the scatter variant's.
    """
    nx, ny, nz, C = grid_shape
    V = nx * ny * nz
    offs = [(c & 1) * ny * nz + ((c >> 1) & 1) * nz + ((c >> 2) & 1)
            for c in range(8)]
    maxoff = max(offs)
    base = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
    buf_dtype = jnp.bfloat16 if (_DGRAD_BF16 and dtype == jnp.float32) else dtype
    contribs8 = jnp.concatenate(
        [w[:, None] * g for w in weights], axis=1).astype(buf_dtype)
    Vp = maxoff + V
    n = base.shape[0]
    # pad N to a chunk multiple; padded rows point at a throwaway column
    chunk = 2048
    n_pad = (-n) % chunk
    if n_pad:
        base = jnp.concatenate([base, jnp.full((n_pad,), -1, jnp.int32)])
        contribs8 = jnp.concatenate(
            [contribs8, jnp.zeros((n_pad, contribs8.shape[1]), buf_dtype)])
    ids = (base + maxoff).reshape(-1, chunk)
    cb = contribs8.reshape(-1, chunk, contribs8.shape[1])

    # bf16 mode: native MXU bf16 x bf16 -> f32 accumulate.  f32 (exactness)
    # mode: DEFAULT precision would silently truncate operands to bf16 —
    # request HIGHEST (the grad-exactness contract of DGRAD_BF16=0).
    prec = (None if buf_dtype == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)

    def step(acc, args):
        idx, cc = args
        onehot = (idx[:, None] == jnp.arange(Vp)[None, :]).astype(buf_dtype)
        acc = acc + jax.lax.dot_general(
            onehot, cc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        return acc, None

    A0 = jnp.zeros((Vp, contribs8.shape[1]), jnp.float32)
    A, _ = jax.lax.scan(step, A0, (ids, cb))
    A = A.astype(buf_dtype)
    out = jnp.zeros((V, C), dtype)
    for c, off in enumerate(offs):
        out = out + jax.lax.dynamic_slice(
            A, (maxoff - off, c * C), (V, C)).astype(dtype)
    return out.reshape(grid_shape)


def _dgrid_scatter(grid_shape, dtype, flat_idx, contribs):
    """Accumulate (8N, C) corner contributions into the flat grid
    (the 'xla' strategy)."""
    nx, ny, nz, C = grid_shape
    V = nx * ny * nz
    dflat = jnp.zeros((V, C), dtype).at[flat_idx].add(contribs)
    return dflat.reshape(grid_shape)


def _trilinear_bwd(res, g):
    """Backward: dgrid via the cell-block scatter (default), dp via corner
    re-gather."""
    grid, p_nor = res
    nx, ny, nz, C = grid.shape
    n = p_nor.shape[0]
    _, i0, i1, frac, dudp = _trilinear_corners(grid.shape, p_nor)
    weights, dweights = _corner_weights(frac)
    idxs = _corner_flat_indices(grid.shape, i0, i1)

    if _DGRAD_MODE == "block":
        if nx * ny * nz <= _MATMUL_V_MAX:
            dgrid = _dgrid_block_matmul(grid.shape, grid.dtype, i0,
                                        weights, g)
        else:
            dgrid = _dgrid_block_scatter(grid.shape, grid.dtype, i0,
                                         weights, g)
    elif _DGRAD_MODE == "matmul":
        dgrid = _dgrid_block_matmul(grid.shape, grid.dtype, i0, weights, g)
    elif _DGRAD_MODE == "none":
        # MEASUREMENT ONLY: zero grid gradient (numerically wrong) — the
        # A/B that isolates the dgrid scatter's share of the mapping step
        # (PERF.md r3 scatter-floor analysis).  Never set in production.
        dgrid = jnp.zeros(grid.shape, grid.dtype)
    else:
        contribs = jnp.concatenate([w[:, None] * g for w in weights], axis=0)
        flat_idx = jnp.concatenate(idxs, axis=0)
        dgrid = _dgrid_scatter(grid.shape, grid.dtype, flat_idx, contribs)

    # ---- dp: sum_k (g . c_k) * dw_k/dfrac * du/dp ----
    flat = grid.reshape(-1, C)
    gdotc = [jnp.sum(jnp.take(flat, idx, axis=0) * g, axis=-1)
             for idx in idxs]  # 8 x (N,)
    dfx = sum(gc * dw[0] for gc, dw in zip(gdotc, dweights))
    dfy = sum(gc * dw[1] for gc, dw in zip(gdotc, dweights))
    dfz = sum(gc * dw[2] for gc, dw in zip(gdotc, dweights))
    dp = jnp.stack([dfx, dfy, dfz], axis=-1) * dudp
    return dgrid, dp.astype(p_nor.dtype)


trilinear_interp_explicit_vjp.defvjp(_trilinear_fwd, _trilinear_bwd)


def bilinear_sample_2d(
    img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Bilinearly sample a 2D image at pixel coords (u=x, v=y), zero padding.

    Matches cv2.remap(INTER_LINEAR) with the default constant-0 border —
    used by frustum feature selection (reference: src/Mapper.py:131-137).

    Args:
        img: (H, W) array.
        u, v: (N,) float pixel coordinates.
    Returns:
        (N,) sampled values (0 outside the image).
    """
    H, W = img.shape
    x0 = jnp.floor(u)
    y0 = jnp.floor(v)
    fx = u - x0
    fy = v - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def tap(xi, yi, w):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        val = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid, val, 0.0) * w

    return (
        tap(x0i, y0i, (1 - fx) * (1 - fy))
        + tap(x0i + 1, y0i, fx * (1 - fy))
        + tap(x0i, y0i + 1, (1 - fx) * fy)
        + tap(x0i + 1, y0i + 1, fx * fy)
    )


def sample_grid_feature(
    grid: jnp.ndarray, p_world: jnp.ndarray, bound: jnp.ndarray
) -> jnp.ndarray:
    """World-space points -> interpolated grid features.

    Equivalent to the reference decoder's ``sample_grid_feature``
    (src/conv_onet/models/decoder.py:168-175): normalize into the scene
    AABB, then border-clamped trilinear lookup.

    Args:
        grid: (Nx, Ny, Nz, C) dense array, or a spatially sharded
            ``parallel.grid_sharding.ShardedGrid`` (x-slabs over a device
            mesh) — the dispatch makes every consumer (tracker, renderer,
            mapper, mesher) sharding-transparent.
        p_world: (N, 3) world coordinates.
        bound: (3, 2) scene AABB this grid spans.
    """
    from nice_slam_tpu.ops.geometry import normalize_3d_coordinate

    if not isinstance(grid, jnp.ndarray) and hasattr(grid, "slabs"):
        from nice_slam_tpu.parallel.grid_sharding import (
            sharded_sample_grid_feature,
        )

        return sharded_sample_grid_feature(grid, p_world, bound, grid.mesh)
    p_nor = normalize_3d_coordinate(p_world, bound)
    return trilinear_interp(grid, p_nor)
