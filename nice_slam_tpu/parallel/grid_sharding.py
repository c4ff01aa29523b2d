"""Spatially sharded feature-grid store: scenes beyond one chip's HBM.

The hierarchical grids are the only SLAM state that grows with scene
volume (a 50 m corridor at fine/color resolution is several GB of f32
features — past a single chip).  This module shards each grid into
x-axis SLABS over the device mesh with a one-plane halo, so

  * every device stores ``1/D`` of each grid (+ one x-plane),
  * any world-space query is answered by exactly ONE device (the owner
    of its cell's base x-plane; the +1 corner lives in the halo), and
  * a single ``psum`` over the mesh assembles the full (N, C) feature
    batch — the decoders then run replicated on that small activation.

This is the distributed-data-structure counterpart of the reference's
single-GPU grids (src/conv_onet/models/decoder.py:168-175 samples one
resident tensor; the reference has no multi-GPU story).  The TPU design
follows the scaling-book recipe: pick a mesh axis, shard the big tensor,
let collectives ride ICI (`shard_map` + `psum`; the halo is materialized
at build time, so steady-state queries need no neighbor exchange).

Exactness: the local interpolation reuses the SAME corner/weight math as
the dense path (ops/interp._trilinear_corners/_corner_weights), each
point's 8-corner sum is computed entirely on its owner device, and the
psum adds that one value to zeros — results are bit-identical to the
dense `sample_grid_feature`.

Build -> query:

    sharded = shard_scene_grids(state.grids, mesh)      # host, once
    feats = sharded_sample_grid_feature(                 # inside jit
        sharded["grid_fine"], p_world, state.bound, mesh)
    raw = sharded_eval_points(spec, state, sharded, pts, stage, mesh)
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nice_slam_tpu.ops.interp import _corner_weights, _trilinear_corners

AXIS = "dp"  # reuse the data-parallel mesh axis (parallel/sharding.make_mesh)


class ShardedGrid(NamedTuple):
    """One grid as x-slabs: ``slabs[d]`` holds global x-planes
    ``[d*planes, d*planes + planes]`` (inclusive halo), edge-padded past
    ``nx - 1``.  ``slabs`` is placed with axis 0 sharded over the mesh."""

    slabs: jnp.ndarray           # (D, planes + 1, ny, nz, C)
    shape: Tuple[int, int, int, int]  # the original (nx, ny, nz, C)
    planes: int                  # owned x-planes per device


def shard_grid(grid: jnp.ndarray, mesh: Mesh) -> ShardedGrid:
    """Slice a dense (nx, ny, nz, C) grid into per-device x-slabs."""
    nx, ny, nz, C = grid.shape
    D = mesh.size
    planes = max(1, -(-(nx - 1) // D))  # ceil; >= 1 plane per device
    # edge-pad so every slab can take `planes + 1` planes
    pad = planes * D + 1 - nx
    if pad > 0:
        grid = jnp.concatenate(
            [grid, jnp.repeat(grid[-1:], pad, axis=0)], axis=0
        )
    slabs = jnp.stack(
        [jax.lax.dynamic_slice_in_dim(grid, d * planes, planes + 1, axis=0)
         for d in range(D)]
    )
    slabs = jax.device_put(slabs, NamedSharding(mesh, P(AXIS)))
    return ShardedGrid(slabs=slabs, shape=(nx, ny, nz, C), planes=planes)


def shard_scene_grids(
    grids: Dict[str, jnp.ndarray], mesh: Mesh
) -> Dict[str, ShardedGrid]:
    return {name: shard_grid(g, mesh) for name, g in grids.items()}


def _local_interp(slab, p_nor, shape, planes, D):
    """Per-device body: answer the queries whose cell base x-plane this
    device owns; zero elsewhere.  ``slab`` is (1, planes+1, ny, nz, C)."""
    slab = slab[0]
    nx, ny, nz, C = shape
    d = jax.lax.axis_index(AXIS)
    _, i0, i1, frac, _ = _trilinear_corners(shape, p_nor)
    weights, _ = _corner_weights(frac)

    owner = jnp.minimum(i0[:, 0] // planes, D - 1)
    own = owner == d
    lo = d * planes
    li0x = jnp.clip(i0[:, 0] - lo, 0, planes)
    li1x = jnp.clip(i1[:, 0] - lo, 0, planes)

    flat = slab.reshape(-1, C)
    out = jnp.zeros((p_nor.shape[0], C), slab.dtype)
    for c in range(8):
        ix = jnp.where((c & 1) == 1, li1x, li0x)
        iy = jnp.where(((c >> 1) & 1) == 1, i1[:, 1], i0[:, 1])
        iz = jnp.where(((c >> 2) & 1) == 1, i1[:, 2], i0[:, 2])
        vals = jnp.take(flat, (ix * ny + iy) * nz + iz, axis=0)
        out = out + weights[c][:, None] * vals
    out = jnp.where(own[:, None], out, 0.0)
    return jax.lax.psum(out, AXIS)


def sharded_trilinear_interp(
    sharded: ShardedGrid, p_nor: jnp.ndarray, mesh: Mesh
) -> jnp.ndarray:
    """Distributed equivalent of ops.interp.trilinear_interp."""
    from jax.experimental.shard_map import shard_map

    D = mesh.size
    body = functools.partial(
        _local_interp, shape=sharded.shape, planes=sharded.planes, D=D
    )
    return shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS), P()),
        out_specs=P(),
    )(sharded.slabs, p_nor)


def sharded_sample_grid_feature(
    sharded: ShardedGrid, p_world: jnp.ndarray, bound: jnp.ndarray,
    mesh: Mesh,
) -> jnp.ndarray:
    """Distributed equivalent of ops.interp.sample_grid_feature."""
    from nice_slam_tpu.ops.geometry import normalize_3d_coordinate

    p_nor = normalize_3d_coordinate(p_world, bound)
    return sharded_trilinear_interp(sharded, p_nor, mesh)


def sharded_eval_points(
    spec,
    state,
    sharded_grids: Dict[str, ShardedGrid],
    p: jnp.ndarray,
    stage: str,
    mesh: Mesh,
) -> jnp.ndarray:
    """models.scene.eval_points with every grid lookup answered by the
    sharded store (decoders replicated — they are a few hundred KB)."""
    from nice_slam_tpu.models.scene import eval_points

    def sample_fn(grid, p_world, bound):
        # `grid` arrives as the ShardedGrid placed in the grids dict
        return sharded_sample_grid_feature(grid, p_world, bound, mesh)

    return eval_points(
        spec, state._replace(grids=dict(sharded_grids)), p, stage,
        sample_fn=sample_fn,
    )


def unshard_grid_grad(
    slab_grads: jnp.ndarray, shape: Tuple[int, int, int, int], planes: int
) -> jnp.ndarray:
    """Reassemble a dense (nx, ny, nz, C) gradient from per-slab gradients.

    The sharded store is differentiable (autodiff through ``shard_map``
    yields per-slab cotangents, sharded like the slabs); global x-plane
    ``d*planes`` is stored both as slab ``d``'s base plane and slab
    ``d-1``'s halo, so duplicated planes ACCUMULATE (each held a disjoint
    subset of the corner contributions).  Edge-padding planes past
    ``nx - 1`` are never read with nonzero weight -> their cotangents are
    identically zero and fold harmlessly onto the clamped edge.
    """
    D = slab_grads.shape[0]
    nx, ny, nz, C = shape
    padded = jnp.zeros((planes * D + 1, ny, nz, C), slab_grads.dtype)
    for d in range(D):
        padded = jax.lax.dynamic_update_slice_in_dim(
            padded,
            jax.lax.dynamic_slice_in_dim(padded, d * planes, planes + 1, 0)
            + slab_grads[d],
            d * planes, axis=0,
        )
    dense = padded[:nx]
    # fold the (zero) pad-plane cotangents onto the edge plane
    if planes * D + 1 > nx:
        dense = dense.at[nx - 1].add(jnp.sum(padded[nx:], axis=0))
    return dense


def per_device_bytes(sharded_grids: Dict[str, ShardedGrid]) -> int:
    """Feature bytes RESIDENT per device (the memory-scaling claim)."""
    total = 0
    for sg in sharded_grids.values():
        total += int(np.prod(sg.slabs.shape[1:])) * sg.slabs.dtype.itemsize
    return total
