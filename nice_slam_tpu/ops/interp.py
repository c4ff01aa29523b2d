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

import jax
import jax.numpy as jnp


def trilinear_interp(grid: jnp.ndarray, p_nor: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly interpolate a channels-last 3D feature grid.

    Args:
        grid: (Nx, Ny, Nz, C) feature volume.
        p_nor: (N, 3) query points normalized to [-1, 1] (x, y, z order).

    Returns:
        (N, C) interpolated features.
    """
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
        grid: (Nx, Ny, Nz, C).
        p_world: (N, 3) world coordinates.
        bound: (3, 2) scene AABB this grid spans.
    """
    from nice_slam_tpu.ops.geometry import normalize_3d_coordinate

    p_nor = normalize_3d_coordinate(p_world, bound)
    return trilinear_interp(grid, p_nor)
