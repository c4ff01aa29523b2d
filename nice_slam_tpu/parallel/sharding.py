"""Ray-batch data parallelism over an ICI device mesh.

The reference has no multi-device story at all (single ``cuda:0`` for both
loops — SURVEY.md §2.2); its only concurrency is the tracker/mapper task
split.  This module adds the TPU-native scaling axis the workload actually
has: mapping/tracking rays are embarrassingly parallel, so the batch is
sharded over a 1-D ``dp`` mesh while the scene pytree stays replicated;
XLA inserts the gradient ``psum`` over ICI from the sharding annotations
alone.

Scaling shape: per-step compute is O(rays x samples x decoder_flops) and
the only cross-chip traffic is the gradient reduction of the (small)
decoder params + touched grid gathers — ideal weak scaling for larger ray
budgets (higher fidelity mapping) or multi-camera rigs.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nice_slam_tpu.models.scene import SceneSpec, SceneState
from nice_slam_tpu.ops.geometry import ray_aabb_far
from nice_slam_tpu.ops.render import RenderConfig, render_batch_ray
from nice_slam_tpu.slam.optim import (
    GroupAdamState,
    group_adam_update,
    init_group_adam,
)


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D data-parallel mesh over the available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def sharded_ray_loss(
    spec: SceneSpec,
    state: SceneState,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    gt_color: jnp.ndarray,
    stage: str,
    rcfg: RenderConfig,
    w_color_loss: float,
) -> jnp.ndarray:
    """Mapping loss over a (sharded) ray batch — the same masked-sum loss as
    the single-chip mapper (slam/mapper.py), written purely over rays so the
    batch dimension can be partitioned."""
    t_exit = jax.lax.stop_gradient(ray_aabb_far(rays_o, rays_d, state.bound))
    inside = t_exit >= gt_depth
    depth, _, color = render_batch_ray(
        spec, state, rays_o, rays_d, stage, gt_depth=gt_depth, rcfg=rcfg
    )
    depth_mask = (gt_depth > 0) & inside
    loss = jnp.sum(jnp.where(depth_mask, jnp.abs(gt_depth - depth), 0.0))
    if stage == "color":
        loss = loss + w_color_loss * jnp.sum(
            jnp.where(inside[:, None], jnp.abs(gt_color - color), 0.0)
        )
    return loss


def make_sharded_map_step(
    mesh: Mesh,
    spec: SceneSpec,
    stage: str,
    rcfg: RenderConfig,
    lr: float = 0.01,
    w_color_loss: float = 0.2,
):
    """Build a jitted multi-chip mapping train step.

    Rays are sharded over ``dp``; the scene state and optimizer state are
    replicated.  Returns (step_fn, shard_batch_fn, replicate_fn).
    """
    ray_sharding = NamedSharding(mesh, P("dp"))
    rep_sharding = NamedSharding(mesh, P())

    def trainable(state: SceneState) -> Dict[str, Any]:
        groups: Dict[str, Any] = {}
        if spec.nice:
            groups["grid_middle"] = state.grids["grid_middle"]
            groups["grid_fine"] = state.grids["grid_fine"]
            groups["grid_color"] = state.grids["grid_color"]
            groups["dec_color"] = state.decoders["color"]
        else:
            groups["dec"] = state.decoders
        return groups

    def merge(state: SceneState, groups: Dict[str, Any]) -> SceneState:
        if spec.nice:
            grids = dict(state.grids)
            for k in ("grid_middle", "grid_fine", "grid_color"):
                grids[k] = groups[k]
            decoders = dict(state.decoders)
            decoders["color"] = groups["dec_color"]
            return state._replace(grids=grids, decoders=decoders)
        return state._replace(decoders=groups["dec"])

    def step(state, adam, rays_o, rays_d, gt_depth, gt_color):
        groups = trainable(state)

        def loss_fn(g):
            return sharded_ray_loss(
                spec, merge(state, g), rays_o, rays_d, gt_depth, gt_color,
                stage, rcfg, w_color_loss,
            )

        loss, grads = jax.value_and_grad(loss_fn)(groups)
        lrs = {k: jnp.asarray(lr, jnp.float32) for k in groups}
        active = {k: True for k in groups}
        groups, adam = group_adam_update(groups, grads, adam, lrs, active)
        return merge(state, groups), adam, loss

    step_jit = jax.jit(
        step,
        in_shardings=(rep_sharding, rep_sharding, ray_sharding, ray_sharding,
                      ray_sharding, ray_sharding),
        out_shardings=(rep_sharding, rep_sharding, rep_sharding),
    )

    def shard_batch(*arrays):
        return tuple(jax.device_put(a, ray_sharding) for a in arrays)

    def replicate(tree):
        return jax.device_put(tree, rep_sharding)

    def init_adam(state: SceneState) -> GroupAdamState:
        return init_group_adam(trainable(state))

    return step_jit, shard_batch, replicate, init_adam
