"""Own-data prep tool (reference src/tools/prep_own_data.py parity)."""

import json
import os
import subprocess
import sys

import numpy as np
import yaml

from nice_slam_tpu.utils.meshlib import write_ply

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_prep_own_data_generates_config(tmp_path):
    scene = tmp_path / "myscan"
    (scene / "scene").mkdir(parents=True)
    # Open3D-style intrinsic.json: column-major 3x3 intrinsic_matrix
    intr = {
        "width": 640, "height": 480,
        "intrinsic_matrix": [600.0, 0, 0, 0, 601.0, 0, 319.5, 239.5, 1.0],
    }
    (scene / "intrinsic.json").write_text(json.dumps(intr))
    verts = np.array([[-1.0, -2.0, 0.0], [3.0, 1.0, 2.5], [0.0, 0.0, 1.0]],
                     np.float32)
    tris = np.array([[0, 1, 2]], np.int64)
    write_ply(str(scene / "scene" / "integrated.ply"), verts, tris)

    out_cfg = tmp_path / "own_scene.yaml"
    r = subprocess.run(
        [sys.executable, "-m", "nice_slam_tpu.tools.prep_own_data",
         "--ouput_config", str(out_cfg), "--scene_folder", str(scene)],
        cwd=ROOT, capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr

    cfg = yaml.safe_load(out_cfg.read_text())
    assert cfg["inherit_from"] == "configs/Own/own.yaml"
    cam = cfg["cam"]
    assert (cam["H"], cam["W"]) == (480, 640)
    assert (cam["fx"], cam["fy"]) == (600.0, 601.0)
    assert (cam["cx"], cam["cy"]) == (319.5, 239.5)
    # bound = mesh AABB +- 1 m
    np.testing.assert_allclose(cfg["mapping"]["bound"],
                               [[-2.0, 4.0], [-3.0, 2.0], [-1.0, 3.5]])
    assert cfg["mapping"]["marching_cubes_bound"] == cfg["mapping"]["bound"]
    assert cfg["data"]["input_folder"] == str(scene)
