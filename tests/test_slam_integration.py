"""End-to-end SLAM integration on the synthetic box scene (small + CPU).

Covers SURVEY.md §4's recommended integration pyramid: full
tracking+mapping runs in strict mode, checkpoint round-trip, mapping
convergence, and ATE sanity on known ground truth.
"""

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nice_slam_tpu.config import load_config

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def small_cfg(tmp, n_frames=6, gt_camera=True):
    cfg = load_config(
        os.path.join(ROOT, "configs", "Synthetic", "box.yaml"),
        os.path.join(ROOT, "configs", "nice_slam.yaml"),
    )
    cfg["coarse"] = False
    cfg["verbose"] = False
    cfg["data"]["n_frames"] = n_frames
    cfg["data"]["output"] = str(tmp)
    cfg["cam"].update({"H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
                       "cx": 39.5, "cy": 29.5})
    cfg["tracking"].update({"gt_camera": gt_camera, "pixels": 100, "iters": 6,
                            "ignore_edge_W": 4, "ignore_edge_H": 4})
    cfg["mapping"].update({"pixels": 300, "iters_first": 80, "iters": 30,
                           "every_frame": 5, "keyframe_every": 5,
                           "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6})
    cfg["rendering"].update({"N_samples": 12, "N_surface": 6})
    cfg["meshing"]["resolution"] = 48
    cfg["meshing"]["eval_rec"] = False
    return cfg


@pytest.fixture(scope="module")
def gt_run(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("slam_gt")
    cfg = small_cfg(tmp, n_frames=6, gt_camera=True)
    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)
    slam = NiceSLAM(cfg, args)
    slam.run()
    return slam


def test_mapping_converges(gt_run):
    slam = gt_run
    from nice_slam_tpu.ops.render import render_img

    _, color, depth, c2w = slam.frame_reader[0]
    d, _, c = render_img(
        slam.spec, slam.state, jnp.asarray(c2w), slam.H, slam.W,
        slam.cam["fx"], slam.cam["fy"], slam.cam["cx"], slam.cam["cy"],
        "color", gt_depth=jnp.asarray(depth), rcfg=slam.rcfg,
    )
    l1 = float(np.mean(np.abs(np.asarray(d) - depth)[depth > 0]))
    assert l1 < 0.15, f"mapped-frame depth L1 too high: {l1}"


def test_checkpoint_written_and_resumable(gt_run):
    slam = gt_run
    import glob

    from nice_slam_tpu.utils.logger import load_checkpoint

    ckpts = sorted(glob.glob(os.path.join(slam.output, "ckpts", "*.tar")))
    assert ckpts, "no checkpoint written at final frame"
    state, est, gt, kfs, idx = load_checkpoint(ckpts[-1], slam.spec, slam.state)
    assert idx == slam.n_img - 1
    np.testing.assert_allclose(est, slam.estimate_c2w_list, atol=1e-6)
    for name in slam.state.grids:
        np.testing.assert_allclose(
            np.asarray(state.grids[name]), np.asarray(slam.state.grids[name]),
            atol=1e-6,
        )
    # restored decoders produce identical outputs
    from nice_slam_tpu.models.scene import eval_points

    p = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (16, 3)),
                    jnp.float32)
    r1 = eval_points(slam.spec, slam.state, p, "color")
    r2 = eval_points(slam.spec, state, p, "color")
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-5)


def test_final_mesh_written(gt_run):
    slam = gt_run
    mesh_path = os.path.join(slam.output, "mesh", "final_mesh.ply")
    assert os.path.exists(mesh_path)
    from nice_slam_tpu.utils.meshlib import read_ply

    v, t, c = read_ply(mesh_path)
    assert len(v) > 100 and len(t) > 100
    assert c is not None  # colored mesh
    # vertices on/near the synthetic room walls (room is [-2, 2]^3)
    r = np.abs(v).max(axis=1)
    assert np.median(np.abs(r - 2.0)) < 0.25


def test_keyframes_admitted(gt_run):
    slam = gt_run
    # keyframe_every=5, frames 0..5 -> keyframes at 0 and 4 (n-2) and 5
    assert 0 in slam.keyframes.frame_ids
    assert len(slam.keyframes) >= 2


def test_tracked_run_ate(tmp_path):
    # real tracking (not gt_camera): ATE should stay small on the synthetic
    # orbit with const-speed init
    cfg = small_cfg(tmp_path, n_frames=8, gt_camera=False)
    cfg["data"]["n_frames"] = 8
    # slow orbit: per-frame motion within the tracker's 6-iteration Adam
    # step budget (lr 1e-3) once const-speed extrapolation absorbs the bulk
    cfg["data"]["orbit_radians"] = 0.15
    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)
    slam = NiceSLAM(cfg, args)
    slam.run()

    from nice_slam_tpu.tools.eval_ate import align

    gt = slam.gt_c2w_list[:8, :3, 3].T
    est = slam.estimate_c2w_list[:8, :3, 3].T
    _, _, err = align(est, gt)
    rmse = float(np.sqrt(np.mean(err**2)))
    # ~0.6 cm/frame motion; tracking should stay within a few cm
    assert rmse < 0.1, f"ATE RMSE {rmse} too high"
