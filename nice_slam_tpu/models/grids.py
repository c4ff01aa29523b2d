"""Hierarchical feature-grid allocation.

Parity with reference grid_init (src/NICE_SLAM.py:192-250) and load_bound
(src/NICE_SLAM.py:137-157):

  * the scene bound's upper corner is rounded up so the extent is divisible
    by ``grid_len.bound_divisible``;
  * per-level voxel sizes come from ``grid_len.{coarse,middle,fine,color}``;
  * the coarse grid spans ``bound * coarse_bound_enlarge`` (both corners
    scaled — an extrapolation region, reference :216-224);
  * init is N(0, std) with std 1e-4 for the fine grid and 1e-2 elsewhere.

Storage layout: channels-last ``(Nx, Ny, Nz, C)`` (the reference's
``[1, C, Z, Y, X]`` axis-swapped torch layout exists only to satisfy
``F.grid_sample``; here the natural x/y/z-major layout feeds the gather
kernel directly — see ops/interp.py).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GRID_INIT_STD = {"grid_coarse": 0.01, "grid_middle": 0.01, "grid_fine": 1e-4,
                 "grid_color": 0.01}


def round_bound(bound: np.ndarray, bound_divisible: float, scale: float = 1.0) -> np.ndarray:
    """Scale the configured bound and round its extent up to a multiple of
    ``bound_divisible`` (reference: src/NICE_SLAM.py:144-150)."""
    b = np.asarray(bound, dtype=np.float64) * scale
    ext = b[:, 1] - b[:, 0]
    b[:, 1] = (np.floor(ext / bound_divisible).astype(np.int64) + 1) * bound_divisible + b[:, 0]
    return b.astype(np.float32)


def grid_shapes(
    bound: np.ndarray,
    grid_len: Dict[str, float],
    coarse: bool,
    coarse_bound_enlarge: float,
) -> Dict[str, Tuple[int, int, int]]:
    """Integer (Nx, Ny, Nz) voxel counts per level (truncating division,
    matching reference :219,:227,:235,:243)."""
    xyz_len = np.asarray(bound[:, 1] - bound[:, 0], dtype=np.float64)
    shapes: Dict[str, Tuple[int, int, int]] = {}
    if coarse:
        s = (xyz_len * coarse_bound_enlarge / grid_len["coarse"]).astype(np.int64)
        shapes["grid_coarse"] = tuple(int(v) for v in s)
    for name in ("middle", "fine", "color"):
        s = (xyz_len / grid_len[name]).astype(np.int64)
        shapes["grid_" + name] = tuple(int(v) for v in s)
    return shapes


def init_grids(
    key: jax.Array,
    shapes: Dict[str, Tuple[int, int, int]],
    c_dim: int,
    dtype=jnp.float32,
) -> Dict[str, jnp.ndarray]:
    """Allocate and normal-initialize the feature volumes."""
    grids = {}
    keys = jax.random.split(key, len(shapes))
    for k, (name, shp) in zip(keys, sorted(shapes.items())):
        std = GRID_INIT_STD[name]
        grids[name] = std * jax.random.normal(k, (*shp, c_dim), dtype=dtype)
    return grids
