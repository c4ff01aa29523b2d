"""Checkpoint resume: restart a run from its last checkpoint and finish."""

import argparse
import os

import numpy as np

from nice_slam_tpu.config import load_config

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def _cfg(tmp, n_frames):
    cfg = load_config(os.path.join(ROOT, "configs", "Synthetic", "box.yaml"),
                      os.path.join(ROOT, "configs", "nice_slam.yaml"))
    cfg["coarse"] = False
    cfg["verbose"] = False
    cfg["data"]["n_frames"] = n_frames
    cfg["data"]["output"] = str(tmp)
    cfg["cam"].update({"H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
                       "cx": 39.5, "cy": 29.5})
    cfg["tracking"].update({"pixels": 100, "iters": 6, "ignore_edge_W": 4,
                            "ignore_edge_H": 4})
    cfg["mapping"].update({"pixels": 300, "iters_first": 80, "iters": 30,
                           "every_frame": 5, "keyframe_every": 5,
                           "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6})
    cfg["rendering"].update({"N_samples": 12, "N_surface": 6})
    cfg["meshing"]["resolution"] = 48
    return cfg


def test_resume_continues_run(tmp_path):
    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)

    # phase 1: run the first 6 frames (writes a final ckpt at frame 5)
    slam1 = NiceSLAM(_cfg(tmp_path, 6), args)
    slam1.run()
    est_prefix = slam1.estimate_c2w_list[:6].copy()

    # phase 2: a fresh system over the longer sequence resumes from the ckpt
    slam2 = NiceSLAM(_cfg(tmp_path, 10), args)
    start = slam2.resume()
    assert start == 6
    np.testing.assert_allclose(slam2.estimate_c2w_list[:6], est_prefix,
                               atol=1e-6)
    assert len(slam2.keyframes) == len(slam1.keyframes)
    # restored grids match the checkpointed state
    for name in slam1.state.grids:
        np.testing.assert_allclose(
            np.asarray(slam2.state.grids[name]),
            np.asarray(slam1.state.grids[name]), atol=1e-6,
        )

    slam2.run()
    assert slam2.idx == 9
    assert np.isfinite(slam2.estimate_c2w_list[:10]).all()
    # the pre-resume trajectory prefix is untouched by the continued run
    np.testing.assert_allclose(slam2.estimate_c2w_list[:6], est_prefix,
                               atol=1e-6)
