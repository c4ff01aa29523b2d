"""Multi-chip sharding: 8-virtual-device mesh over the real mapping path."""

import argparse
import os

import jax
import numpy as np
import pytest

from nice_slam_tpu.config import load_config

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_sharded_map_step_runs_and_is_finite():
    from nice_slam_tpu.models.scene import build_scene
    from nice_slam_tpu.ops.render import RenderConfig
    from nice_slam_tpu.parallel.sharding import make_mesh, make_sharded_map_step

    cfg = {
        "scale": 1, "coarse": False, "occupancy": True,
        "grid_len": {"coarse": 2, "middle": 1.1, "fine": 0.55, "color": 0.55,
                     "bound_divisible": 1.1},
        "model": {"c_dim": 8, "coarse_bound_enlarge": 2,
                  "pos_embedding_method": "fourier"},
        "data": {"dim": 3},
        "mapping": {"bound": [[-2.2, 2.2]] * 3},
        "rendering": {"N_samples": 8, "N_surface": 4, "N_importance": 0,
                      "lindisp": False, "perturb": 0.0},
    }
    spec, state = build_scene(cfg, nice=True, seed=0)
    rcfg = RenderConfig.from_cfg(cfg)
    mesh = make_mesh(8)
    assert mesh.size == 8
    step, shard_batch, replicate, init_adam = make_sharded_map_step(
        mesh, spec, "color", rcfg
    )
    rng = np.random.default_rng(0)
    n = 64
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    args = shard_batch(
        np.zeros((n, 3), np.float32), dirs,
        np.full((n,), 1.5, np.float32), np.full((n, 3), 0.5, np.float32),
    )
    state_r = replicate(state)
    adam = replicate(init_adam(state_r))
    new_state, new_adam, loss = step(state_r, adam, *args)
    assert np.isfinite(float(loss))
    # gradients actually updated the replicated grids identically everywhere
    delta = float(np.abs(np.asarray(new_state.grids["grid_color"])
                         - np.asarray(state.grids["grid_color"])).max())
    assert delta > 0


def test_mapper_engages_mesh_in_slam(tmp_path):
    cfg = load_config(os.path.join(ROOT, "configs", "Synthetic", "box.yaml"),
                      os.path.join(ROOT, "configs", "nice_slam.yaml"))
    cfg["coarse"] = False
    cfg["verbose"] = False
    cfg["data"]["n_frames"] = 6
    cfg["data"]["output"] = str(tmp_path)
    cfg["cam"].update({"H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
                       "cx": 39.5, "cy": 29.5})
    cfg["tracking"].update({"pixels": 100, "iters": 4, "gt_camera": True})
    cfg["mapping"].update({"pixels": 320, "iters_first": 20, "iters": 10,
                           "every_frame": 5, "keyframe_every": 5,
                           "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6})
    cfg["rendering"].update({"N_samples": 8, "N_surface": 4})

    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)
    slam = NiceSLAM(cfg, args)
    assert slam.mapper.mesh is not None and slam.mapper.mesh.size == 8
    slam.run()
    assert slam.mapping_idx == 5
