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
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nice_slam_tpu.ops.interp import _corner_weights, _trilinear_corners

AXIS = "dp"  # reuse the data-parallel mesh axis (parallel/sharding.make_mesh)


@jax.tree_util.register_pytree_node_class
class ShardedGrid:
    """One grid as x-slabs: ``slabs[d]`` holds global x-planes
    ``[d*planes, d*planes + planes]`` (inclusive halo), edge-padded past
    ``nx - 1``.  ``slabs`` is placed with axis 0 sharded over the mesh.

    Registered as a pytree with ``shape``/``planes``/``mesh`` as STATIC aux
    data, so a ShardedGrid can ride through jit/grad/scan while the corner
    index math stays static-shaped; carrying the mesh lets
    ``ops.interp.sample_grid_feature`` dispatch on the grid type, which
    makes EVERY consumer (tracker, renderer, mapper, mesher, visualizer)
    sharding-transparent."""

    def __init__(self, slabs: jnp.ndarray,
                 shape: Tuple[int, int, int, int], planes: int,
                 mesh: Mesh = None):
        self.slabs = slabs            # (D, planes + 1, ny, nz, C)
        self.shape = tuple(shape)     # the original (nx, ny, nz, C)
        self.planes = int(planes)     # owned x-planes per device
        self.mesh = mesh

    def tree_flatten(self):
        return (self.slabs,), (self.shape, self.planes, self.mesh)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    def _replace(self, slabs):
        return ShardedGrid(slabs, self.shape, self.planes, self.mesh)


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
    return ShardedGrid(slabs=slabs, shape=(nx, ny, nz, C), planes=planes,
                       mesh=mesh)


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


def fold_halo_grads(slab_grads: jnp.ndarray) -> jnp.ndarray:
    """Make both stored copies of each shared x-plane see its TOTAL gradient.

    Global plane ``d*planes`` exists as slab ``d``'s base plane 0 and slab
    ``d-1``'s halo; each copy accumulates only its own points' corner
    contributions.  Summing the two partials into BOTH copies keeps the
    duplicated planes bitwise-consistent under any elementwise optimizer
    (identical grads + identical moments -> identical updates), so no
    post-update halo refresh is ever needed.  On a sharded (D, ...) array
    the cross-slab slices lower to one collective-permute each over ICI.
    """
    total = slab_grads[1:, 0] + slab_grads[:-1, -1]
    slab_grads = slab_grads.at[1:, 0].set(total)
    return slab_grads.at[:-1, -1].set(total)


def make_grid_sharded_map_step(mesh: Mesh, spec, stage: str, rcfg,
                               w_color: float = 0.2, lr: float = 0.01):
    """Full mapping train step on a SPATIALLY SHARDED scene.

    Each device holds 1/D of every feature grid; the forward answers every
    grid lookup from the sharded store (one psum per lookup), the backward
    produces per-slab gradients, a halo fold (two collective-permutes per
    grid) totals the shared planes, and per-slab Adam updates everything
    locally.  Grid memory per device is 1/D of the scene — the scaling
    axis the reference lacks entirely (SURVEY §2.2).

    Returns (step, shard_grids, init_adam):
        step(sharded_grids, state, adam, rays_o, rays_d, gt_d, gt_c)
            -> (new_sharded_grids, new_adam, loss)   [jitted]
        shard_grids(dense_grids) -> {name: ShardedGrid}
        init_adam(sharded_grids) -> adam state
    """
    import functools as _ft

    from nice_slam_tpu.ops.render import render_batch_ray
    from nice_slam_tpu.slam.optim import group_adam_update, init_group_adam

    def shard_grids(grids: Dict[str, jnp.ndarray]) -> Dict[str, ShardedGrid]:
        return shard_scene_grids(grids, mesh)

    def init_adam(sharded_grids):
        return init_group_adam({"grids": {
            k: sg.slabs for k, sg in sharded_grids.items()}})

    @_ft.partial(jax.jit, static_argnames=())
    def step(sharded_grids, state, adam, rays_o, rays_d, gt_d, gt_c):
        sample_fn = lambda g, p, b: sharded_sample_grid_feature(g, p, b, mesh)

        def loss_fn(slab_tree):
            grids = {k: sharded_grids[k]._replace(slab_tree[k])
                     for k in slab_tree}
            depth, _, color = render_batch_ray(
                spec, state._replace(grids=grids), rays_o, rays_d, stage,
                gt_depth=gt_d, rcfg=rcfg, sample_fn=sample_fn,
            )
            mask = gt_d > 0
            loss = jnp.sum(jnp.where(mask, jnp.abs(gt_d - depth), 0.0))
            if stage == "color":
                loss = loss + w_color * jnp.sum(jnp.abs(gt_c - color))
            return loss

        slab_tree = {k: sg.slabs for k, sg in sharded_grids.items()}
        loss, grads = jax.value_and_grad(loss_fn)(slab_tree)
        grads = {k: fold_halo_grads(g) for k, g in grads.items()}
        new_p, new_adam = group_adam_update(
            {"grids": slab_tree}, {"grids": grads}, adam,
            {"grids": jnp.asarray(lr, jnp.float32)}, {"grids": True},
        )
        new_grids = {k: sharded_grids[k]._replace(new_p["grids"][k])
                     for k in sharded_grids}
        return new_grids, new_adam, loss

    return step, shard_grids, init_adam


def mask_to_slabs(mask: jnp.ndarray, planes: int, D: int) -> jnp.ndarray:
    """Slice a dense per-node boolean/float mask (nx, ny, nz) into the slab
    layout (D, planes+1, ny, nz) — same slicing as shard_grid, traceable
    inside jit (frustum gradient masks shard with the slabs; the shared
    halo planes get identical mask values by construction, preserving the
    duplicated-plane consistency invariant)."""
    nx = mask.shape[0]
    pad = planes * D + 1 - nx
    if pad > 0:
        mask = jnp.concatenate(
            [mask, jnp.repeat(mask[-1:], pad, axis=0)], axis=0)
    return jnp.stack(
        [jax.lax.dynamic_slice_in_dim(mask, d * planes, planes + 1, axis=0)
         for d in range(D)]
    )


def dense_grids(grids: Dict) -> Dict:
    """Materialize any ShardedGrid values as dense arrays (checkpoint and
    export boundary; everything on the compute path stays sharded)."""
    return {k: unshard_grid(g) if isinstance(g, ShardedGrid) else g
            for k, g in grids.items()}


def spatial_sharding_mesh(grids: Dict, cfg_env: Dict = None) -> Mesh:
    """The engage knob (VERDICT r2 next #2): returns the mesh to spatially
    shard the scene grids over, or None.

    ``NICE_SLAM_TPU_SPATIAL`` = '1' force on | '0' force off | 'auto'
    (default): engage when >1 device is visible AND the dense grids exceed
    ``NICE_SLAM_TPU_HBM_BUDGET_GB`` (default 4.0) — i.e. exactly when a
    scene is outgrowing one chip's HBM headroom."""
    import os as _os

    mode = _os.environ.get("NICE_SLAM_TPU_SPATIAL", "auto")
    if mode == "0":
        return None
    if jax.device_count() < 2:
        return None
    if mode != "1":  # auto
        budget = float(_os.environ.get("NICE_SLAM_TPU_HBM_BUDGET_GB", "4.0"))
        total = sum(
            int(np.prod(np.asarray(g.shape))) * g.dtype.itemsize
            for g in grids.values())
        if total <= budget * (1 << 30):
            return None
    from nice_slam_tpu.parallel.sharding import make_mesh

    return make_mesh()


def maybe_shard_state(state, verbose: bool = False):
    """Engage spatial grid sharding on a SceneState per the env/auto knob;
    returns (state', mesh-or-None)."""
    mesh = spatial_sharding_mesh(state.grids) if state.grids else None
    if mesh is None:
        return state, None
    sharded = shard_scene_grids(state.grids, mesh)
    if verbose:
        print(f"INFO: spatial grid sharding engaged over {mesh.size} devices"
              f" ({per_device_bytes(sharded) / 2**20:.0f} MiB grid features"
              f" per device)")
    return state._replace(grids=sharded), mesh


def unshard_grid(sharded: ShardedGrid) -> jnp.ndarray:
    """Dense (nx, ny, nz, C) grid from a consistent sharded store (base
    planes concatenated + the last slab's halo plane, pad dropped)."""
    D = sharded.slabs.shape[0]
    nx = sharded.shape[0]
    base = sharded.slabs[:, :-1].reshape((-1,) + sharded.slabs.shape[2:])
    full = jnp.concatenate([base, sharded.slabs[-1:, -1]], axis=0)
    return full[:nx]


def per_device_bytes(sharded_grids: Dict[str, ShardedGrid]) -> int:
    """Feature bytes RESIDENT per device (the memory-scaling claim)."""
    total = 0
    for sg in sharded_grids.values():
        total += int(np.prod(sg.slabs.shape[1:])) * sg.slabs.dtype.itemsize
    return total
