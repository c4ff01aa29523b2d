"""Spatially sharded grid store (parallel/grid_sharding.py): exactness vs
the dense path on an 8-virtual-device mesh, and the per-device memory
scaling claim."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nice_slam_tpu.parallel.sharding import make_mesh

needs8 = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def _mesh():
    return make_mesh(8)


@needs8
def test_sharded_interp_matches_dense():
    from nice_slam_tpu.ops.interp import trilinear_interp
    from nice_slam_tpu.parallel.grid_sharding import (
        shard_grid,
        sharded_trilinear_interp,
    )

    mesh = _mesh()
    # nx deliberately NOT divisible by 8, plus an nx smaller than the mesh
    for nx in (29, 5):
        grid = jax.random.normal(jax.random.PRNGKey(0), (nx, 7, 6, 8))
        sharded = shard_grid(grid, mesh)
        p = jax.random.uniform(
            jax.random.PRNGKey(1), (257, 3), minval=-1.4, maxval=1.4
        )
        dense = trilinear_interp(grid, p)
        dist = sharded_trilinear_interp(sharded, p, mesh)
        np.testing.assert_allclose(np.asarray(dist), np.asarray(dense),
                                   atol=1e-6)


@needs8
def test_sharded_eval_points_matches_dense():
    """Full decoder forward with every grid lookup answered by the sharded
    store, for every NICE stage."""
    from nice_slam_tpu.models.scene import build_scene, eval_points
    from nice_slam_tpu.parallel.grid_sharding import (
        shard_scene_grids,
        sharded_eval_points,
    )

    cfg = {
        "dataset": "synthetic", "scale": 1, "occupancy": True, "coarse": True,
        "grid_len": {"coarse": 1.2, "middle": 0.6, "fine": 0.3,
                     "color": 0.3, "bound_divisible": 0.6},
        "model": {"c_dim": 8, "coarse_bound_enlarge": 2,
                  "pos_embedding_method": "fourier"},
        "data": {"dim": 3},
        "mapping": {"bound": [[-1.8, 1.8]] * 3},
        "cam": {},
    }
    spec, state = build_scene(cfg, nice=True, seed=3)
    mesh = _mesh()
    sharded = shard_scene_grids(state.grids, mesh)

    pts = jax.random.uniform(jax.random.PRNGKey(7), (256, 3),
                             minval=-2.0, maxval=2.0)
    for stage in ("coarse", "middle", "fine", "color"):
        dense = eval_points(spec, state, pts, stage)
        dist = sharded_eval_points(spec, state, sharded, pts, stage, mesh)
        np.testing.assert_allclose(
            np.asarray(dist), np.asarray(dense), atol=5e-5,
            err_msg=f"stage {stage}",
        )


@needs8
def test_sharded_store_memory_scales_down():
    """Each device holds ~1/D of the features (+ one halo plane)."""
    from nice_slam_tpu.parallel.grid_sharding import (
        per_device_bytes,
        shard_grid,
    )

    mesh = _mesh()
    grid = jnp.zeros((65, 32, 32, 16), jnp.float32)
    sharded = shard_grid(grid, mesh)
    dense_bytes = grid.size * 4
    per_dev = per_device_bytes({"g": sharded})
    # 1/8 of the planes + 1 halo plane = 9/65 of the dense grid
    assert per_dev <= dense_bytes // 8 + 32 * 32 * 16 * 4
    # and the slab array really is sharded over the mesh
    assert len(sharded.slabs.sharding.device_set) == 8


@needs8
def test_sharded_store_is_differentiable():
    """Autodiff through the sharded lookup: per-slab cotangents reassembled
    by unshard_grid_grad must equal the dense trilinear grid gradient —
    the enabling property for mapping (training) on a sharded scene."""
    from nice_slam_tpu.ops import interp as interp_mod
    from nice_slam_tpu.parallel.grid_sharding import (
        ShardedGrid,
        shard_grid,
        sharded_trilinear_interp,
        unshard_grid_grad,
    )

    mesh = _mesh()
    grid = jax.random.normal(jax.random.PRNGKey(4), (21, 6, 5, 8))
    sharded = shard_grid(grid, mesh)
    p = jax.random.uniform(jax.random.PRNGKey(5), (128, 3), minval=-1.3,
                           maxval=1.3)
    cot = jax.random.normal(jax.random.PRNGKey(6), (128, 8))

    def sharded_loss(slabs):
        s = ShardedGrid(slabs=slabs, shape=sharded.shape,
                        planes=sharded.planes)
        return jnp.sum(sharded_trilinear_interp(s, p, mesh) * cot)

    slab_grads = jax.grad(sharded_loss)(sharded.slabs)
    dense_from_slabs = unshard_grid_grad(slab_grads, sharded.shape,
                                         sharded.planes)

    dense_grad = jax.grad(lambda g: jnp.sum(
        interp_mod._trilinear_impl(g, p) * cot))(grid)
    np.testing.assert_allclose(np.asarray(dense_from_slabs),
                               np.asarray(dense_grad), atol=1e-5)
