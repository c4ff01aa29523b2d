"""CLI surface smoke tests: run.py end-to-end in a subprocess, eval_ate CLI."""

import json
import os
import subprocess
import sys

import numpy as np
import yaml

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_run_py_cli_end_to_end(tmp_path):
    # a tiny scene config inheriting the synthetic base
    scene = {
        "inherit_from": "configs/Synthetic/box.yaml",
        "coarse": False,
        "verbose": False,
        "data": {"n_frames": 4, "output": str(tmp_path / "out"),
                 "input_folder": ""},
        "cam": {"H": 40, "W": 52, "fx": 40.0, "fy": 40.0, "cx": 25.5,
                "cy": 19.5, "png_depth_scale": 1.0, "crop_edge": 0},
        "tracking": {"pixels": 50, "iters": 2, "ignore_edge_W": 4,
                     "ignore_edge_H": 4},
        "mapping": {"pixels": 100, "iters_first": 6, "iters": 4,
                    "every_frame": 3, "keyframe_every": 3,
                    "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6},
        "rendering": {"N_samples": 4, "N_surface": 2},
        "meshing": {"resolution": 32, "eval_rec": False},
    }
    cfg_path = tmp_path / "scene.yaml"
    cfg_path.write_text(yaml.safe_dump(scene))

    env = dict(os.environ)
    env["NICE_SLAM_TPU_PLATFORM"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "run.py"), str(cfg_path)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out_dir = tmp_path / "out"
    assert (out_dir / "ckpts" / "00003.tar").exists()
    assert (out_dir / "timings.json").exists()
    assert (out_dir / "mesh" / "final_mesh.ply").exists()

    # eval_ate CLI consumes the run's checkpoint
    proc2 = subprocess.run(
        [sys.executable, "-m", "nice_slam_tpu.tools.eval_ate", str(cfg_path),
         "--output", str(out_dir)],
        cwd=ROOT, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc2.returncode == 0, proc2.stderr[-2000:]
    assert "absolute_translational_error.rmse" in proc2.stdout
    assert (out_dir / "eval_ate_plot.png").exists()
