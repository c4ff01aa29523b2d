"""Mode-coverage integration: iMAP*, coarse level, local BA (small, CPU)."""

import argparse
import os

import numpy as np
import pytest

from nice_slam_tpu.config import load_config

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _shrink(cfg, tmp, n_frames):
    cfg["verbose"] = False
    cfg["data"]["n_frames"] = n_frames
    cfg["data"]["output"] = str(tmp)
    cfg["cam"].update({"H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
                       "cx": 39.5, "cy": 29.5, "png_depth_scale": 1.0,
                       "crop_edge": 0})
    cfg["tracking"].update({"pixels": 100, "iters": 4, "ignore_edge_W": 4,
                            "ignore_edge_H": 4})
    cfg["mapping"].update({"pixels": 200, "iters_first": 40, "iters": 15,
                           "every_frame": 3, "keyframe_every": 2,
                           "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6,
                           "mapping_window_size": 4})
    cfg["rendering"]["N_samples"] = 8
    cfg["meshing"]["eval_rec"] = False
    cfg["dataset"] = "synthetic"
    return cfg


def test_imap_mode_end_to_end(tmp_path):
    cfg = load_config(os.path.join(ROOT, "configs", "imap.yaml"))
    cfg["data"] = {"dim": 3}
    cfg = _shrink(cfg, tmp_path, n_frames=5)
    cfg["scale"] = 1
    cfg["mapping"]["bound"] = [[-2.2, 2.2]] * 3
    cfg["mapping"]["marching_cubes_bound"] = [[-2.2, 2.2]] * 3
    cfg["rendering"].update({"N_surface": 0, "N_importance": 4})
    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=False, input_folder=None, output=None)
    slam = NiceSLAM(cfg, args)
    assert not slam.spec.nice
    assert slam.spec.occupancy is False
    slam.run()
    # system produced poses for every frame and a checkpoint
    assert slam.idx == 4
    assert np.isfinite(slam.estimate_c2w_list[:5]).all()
    assert os.path.exists(os.path.join(str(tmp_path), "ckpts", "00004.tar"))


def test_coarse_and_ba_end_to_end(tmp_path):
    cfg = load_config(os.path.join(ROOT, "configs", "Synthetic", "box.yaml"),
                      os.path.join(ROOT, "configs", "nice_slam.yaml"))
    cfg = _shrink(cfg, tmp_path, n_frames=14)
    cfg["coarse"] = True
    cfg["mapping"]["BA"] = True
    # keyframes are admitted at mapped frames only: map every 2nd frame and
    # admit every mapped frame so >4 keyframes exist and BA activates
    cfg["mapping"]["every_frame"] = 2
    cfg["mapping"]["keyframe_every"] = 2
    cfg["rendering"]["N_surface"] = 4
    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)
    slam = NiceSLAM(cfg, args)
    assert slam.coarse_mapper is not None
    assert "grid_coarse" in slam.state.grids
    slam.run()
    # BA became active (needs >4 keyframes)
    assert len(slam.keyframes) > 4
    assert np.isfinite(slam.estimate_c2w_list[:14]).all()
    err = np.abs(slam.estimate_c2w_list[:14, :3, 3]
                 - slam.gt_c2w_list[:14, :3, 3]).max()
    # sanity bound only: this orbit is deliberately faster than the
    # 4-iteration tracking budget, so the trajectory wanders ~1 m by
    # design and the exact value is window-selection-RNG-sensitive; the
    # quality gates live in test_slam_integration / test_quality_gates
    assert err < 1.3
