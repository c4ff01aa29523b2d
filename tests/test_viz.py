"""Offline viewer: mesh replay rendering + video export."""

import numpy as np

from nice_slam_tpu.tools.viz import MeshRenderer, SLAMFrontend
from nice_slam_tpu.utils import meshlib


def _room_mesh(tmp_path):
    # simple closed box room surface via marching tets of a box SDF
    n = 24
    g = np.linspace(-1.5, 1.5, n).astype(np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    f = 1.0 - np.maximum.reduce([np.abs(X), np.abs(Y), np.abs(Z)])
    sp = 3.0 / (n - 1)
    v, t = meshlib.marching_cubes(f, 0.0, origin=(-1.5,) * 3,
                                  spacing=(sp,) * 3)
    colors = np.full((len(v), 3), 180, np.uint8)
    path = str(tmp_path / "room.ply")
    meshlib.write_ply(path, v, t, colors)
    return path


def test_mesh_renderer_produces_image(tmp_path):
    path = _room_mesh(tmp_path)
    v, t, c = meshlib.read_ply(path)
    r = MeshRenderer(v, t, c)
    c2w = np.eye(4, dtype=np.float32)  # camera at center looking -z
    img, depth = r.render(c2w, 60, 80, 60.0, 60.0, 39.5, 29.5)
    assert img.shape == (60, 80, 3)
    # looking at the wall 1m away from inside the box
    center_depth = depth[30, 40]
    assert abs(center_depth - 1.0) < 0.1
    assert (img[30, 40] < 255).any()  # shaded wall, not background


def test_frontend_replay_and_video(tmp_path):
    path = _room_mesh(tmp_path)
    fe = SLAMFrontend(str(tmp_path), init_pose=np.eye(4), save_rendering=True)
    fe.update_mesh(path)
    for i in range(3):
        c2w = np.eye(4, dtype=np.float32)
        c2w[0, 3] = 0.05 * i
        img = fe.update_pose(i, c2w)
        assert img is not None
    video = fe.finalize_video(str(tmp_path / "vis.mp4"), fps=5)
    assert video is not None
    import cv2

    cap = cv2.VideoCapture(video)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
