"""Offline viewer: mesh replay rendering + video export; per-iteration
residual-panel visualizer gating (reference src/Tracker.py:229-231,
src/Mapper.py:444-448, src/utils/Visualizer.py:24-107)."""

import argparse
import os

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


def test_per_iteration_vis_panels(tmp_path):
    """Panels must fire at iteration 0 and every vis_inside_freq INSIDE the
    optimization loops (round-1 regression: the caller passed iters-1, which
    is never divisible by the default inside_freq, so stock configs produced
    zero panels)."""
    from test_slam_integration import small_cfg

    cfg = small_cfg(tmp_path, n_frames=6, gt_camera=False)
    cfg["tracking"].update({"vis_freq": 5, "vis_inside_freq": 4})
    cfg["mapping"].update({"vis_freq": 5, "vis_inside_freq": 10})
    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)
    slam = NiceSLAM(cfg, args)
    slam.run()

    # tracking: 6 iters/frame, inside_freq 4 -> panels at iters 0 and 4
    for it in (0, 4):
        p = os.path.join(slam.output, "tracking_vis", f"00005_{it:04d}.jpg")
        assert os.path.exists(p), f"missing tracking panel {p}"
    # mapping: 30 iters/call, inside_freq 10 -> panels at iters 0, 10, 20
    for it in (0, 10, 20):
        p = os.path.join(slam.output, "mapping_vis", f"00005_{it:04d}.jpg")
        assert os.path.exists(p), f"missing mapping panel {p}"


def test_frontend_factory_fallback(tmp_path):
    """make_frontend returns the live Open3D window when the library is
    importable, else the offline raycast replay; online=True must raise
    where open3d is absent instead of silently degrading."""
    import pytest

    from nice_slam_tpu.tools.viz import SLAMFrontend, make_frontend

    fe = make_frontend(str(tmp_path), init_pose=np.eye(4))
    try:
        import open3d  # noqa: F401

        from nice_slam_tpu.tools.viz import O3DFrontend

        assert isinstance(fe, O3DFrontend)
    except ImportError:
        assert isinstance(fe, SLAMFrontend)
        with pytest.raises(ImportError):
            make_frontend(str(tmp_path), init_pose=np.eye(4), online=True)
    # offline can always be forced
    assert isinstance(
        make_frontend(str(tmp_path), init_pose=np.eye(4), online=False),
        SLAMFrontend,
    )


def test_web_frontend_serves_live_scene(tmp_path):
    """The browser viewer (tools/webviz.py) must serve the page, the
    state JSON and a mesh blob that decodes back to the PLY exactly —
    the headless-host interactive-viewer path (reference counterpart:
    the Open3D GUI, src/tools/viz.py:45-209)."""
    import json
    import struct
    import urllib.request

    import numpy as np
    import pytest

    from nice_slam_tpu.tools.viz import make_frontend
    from nice_slam_tpu.utils.meshlib import read_ply, write_ply

    # a tiny two-triangle mesh fixture
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32)
    tris = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    cols = np.array([[255, 0, 0]] * 4, np.uint8)
    ply = str(tmp_path / "m.ply")
    write_ply(ply, verts, tris, cols)

    gt = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
    fe = make_frontend(str(tmp_path), init_pose=np.eye(4), frontend="web",
                       port=0, gt_c2w_list=gt)
    try:
        # loopback bind by default — not exposed on all interfaces
        assert fe._server.server_address[0] == "127.0.0.1"
        base = f"http://localhost:{fe.port}"
        page = urllib.request.urlopen(base + "/").read().decode()
        assert "webgl" in page and "mesh.bin" in page

        fe.update_mesh(ply)
        for i in range(3):
            c2w = np.eye(4, dtype=np.float32)
            c2w[0, 3] = i * 0.1
            fe.update_pose(i, c2w)

        st = json.loads(urllib.request.urlopen(base + "/state").read())
        assert st["idx"] == 2 and st["mesh_version"] == 0
        assert len(st["est"]) == 3 and st["est"][2][0] == pytest.approx(0.2)
        assert len(st["gt"]) == 3
        assert len(st["frustum"]) == 16  # 8 wireframe edges as point pairs

        blob = urllib.request.urlopen(base + "/mesh.bin").read()
        nv, nt = struct.unpack_from("<II", blob, 0)
        assert (nv, nt) == (4, 2)
        v = np.frombuffer(blob, np.float32, nv * 3, 8).reshape(nv, 3)
        off = 8 + nv * 12
        c = np.frombuffer(blob, np.uint8, nv * 3, off).reshape(nv, 3)
        off2 = off + ((nv * 3 + 3) // 4) * 4
        t = np.frombuffer(blob, np.uint32, nt * 3, off2).reshape(nt, 3)
        rv, rt, rc = read_ply(ply)
        np.testing.assert_allclose(v, rv)
        assert (t == rt).all() and (c == rc).all()
    finally:
        fe.close()


def test_web_frontend_honors_near_and_warns_on_save_rendering(tmp_path):
    """`near` trims the trajectory start (reference src/tools/viz.py
    passes it through to the GUI); `save_rendering` is unsupported on the
    web frontend and must warn, not silently drop (ADVICE/VERDICT r4)."""
    import numpy as np
    import pytest

    from nice_slam_tpu.tools.viz import make_frontend

    with pytest.warns(UserWarning, match="save_rendering"):
        fe = make_frontend(str(tmp_path), init_pose=np.eye(4),
                           frontend="web", port=0, near=2,
                           save_rendering=True)
    try:
        for i in range(4):
            fe.update_pose(i, np.eye(4, dtype=np.float32))
        assert fe._idx == 3
        assert len(fe._est) == 2  # frames 0,1 < near are trimmed
    finally:
        fe.close()
