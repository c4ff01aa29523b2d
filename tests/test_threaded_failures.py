"""Threaded scheduler failure handling: a crashed mapper must surface an
error instead of deadlocking the tracker's poll loop (the reference hangs
— SURVEY.md §5.3)."""

import argparse
import os

import pytest

from nice_slam_tpu.config import load_config

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_mapper_crash_surfaces(tmp_path):
    cfg = load_config(os.path.join(ROOT, "configs", "Synthetic", "box.yaml"),
                      os.path.join(ROOT, "configs", "nice_slam.yaml"))
    cfg["coarse"] = False
    cfg["verbose"] = False
    cfg["sync_method"] = "loose"
    cfg["data"]["n_frames"] = 6
    cfg["data"]["output"] = str(tmp_path)
    cfg["cam"].update({"H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
                       "cx": 39.5, "cy": 29.5})
    cfg["tracking"].update({"pixels": 50, "iters": 2})
    cfg["mapping"].update({"pixels": 100, "iters_first": 4, "iters": 4,
                           "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6})
    cfg["rendering"].update({"N_samples": 4, "N_surface": 2})

    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)
    slam = NiceSLAM(cfg, args)

    def broken_map(*a, **kw):
        raise ValueError("injected mapper fault")

    slam.map_one = broken_map
    with pytest.raises(RuntimeError, match="SLAM thread failed"):
        slam.run()
