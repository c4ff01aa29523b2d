"""Dataset readers: synthetic analytics, Replica/TUM fixtures, preprocessing."""

import os

import cv2
import numpy as np
import pytest

from nice_slam_tpu.utils.datasets import Replica, Synthetic, TUM_RGBD, get_dataset


def _syn_cfg(**cam_over):
    cam = {"H": 48, "W": 64, "fx": 48.0, "fy": 48.0, "cx": 31.5, "cy": 23.5,
           "png_depth_scale": 1.0, "crop_edge": 0}
    cam.update(cam_over)
    return {
        "dataset": "synthetic",
        "cam": cam,
        "data": {"n_frames": 5, "input_folder": ""},
    }


def test_synthetic_shapes_and_pose_validity():
    ds = Synthetic(_syn_cfg())
    assert len(ds) == 5
    idx, color, depth, pose = ds[2]
    assert color.shape == (48, 64, 3) and depth.shape == (48, 64)
    R = pose[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_synthetic_depth_is_analytic_box_exit():
    ds = Synthetic(_syn_cfg())
    _, _, depth, pose = ds[0]
    # center pixel: ray = -z camera axis rotated to world; depth must equal
    # the exit distance of that ray from the room box
    d_dir = -pose[:3, 2]
    o = pose[:3, 3]
    room = ds.room
    t = (room - o[:, None]) / d_dir[:, None]
    t_exit = np.min(np.max(t, axis=1))
    cy, cx = 23.5, 31.5
    # sample the 4 neighbors of the (non-integer) center
    d_center = depth[23:25, 31:33].mean()
    assert abs(d_center - t_exit) < 0.05


def test_synthetic_furnished_hits_lie_on_scene_sdf():
    """The analytic primitive ray tracer and scene_sdf must describe the
    SAME surfaces: every rendered depth's hit point sits on the SDF zero
    level (this is what makes the furnished GT recon mesh exact)."""
    cfg = _syn_cfg()
    cfg["data"]["scene"] = "furnished"
    cfg["data"]["n_frames"] = 6
    cfg["data"]["orbit_radians"] = 6.283
    ds = Synthetic(cfg)
    assert len(ds.spheres) == 8 and len(ds.boxes) == 16
    fracs = []
    for i in range(6):
        _, _, depth, _ = ds[i]
        c2w = ds.poses[i]
        H, W = depth.shape
        j, ii = np.meshgrid(np.arange(H, dtype=np.float32),
                            np.arange(W, dtype=np.float32), indexing="ij")
        dirs = np.stack([(ii - ds.cx) / ds.fx, -(j - ds.cy) / ds.fy,
                         -np.ones_like(ii)], -1)
        rd = dirs @ c2w[:3, :3].T
        ro = c2w[:3, 3]
        hit = ro + rd * depth[..., None]
        assert np.abs(ds.scene_sdf(hit.reshape(-1, 3))).max() < 1e-4
        # furniture actually occupies the view (the layout's design
        # contract: >=1 object visible from every orbit angle)
        t = (ds.room[None, None] - ro[None, None, :, None]) / rd[..., None]
        t_exit = np.min(np.max(t, axis=-1), axis=-1)
        fracs.append(float((depth < t_exit - 1e-5).mean()))
    assert min(fracs) > 0.02 and max(fracs) > 0.15


def test_synthetic_box_scene_has_no_furniture():
    """Default scene stays the bare box: geometry (and with it every
    existing QUALITY row and bench number) is unchanged by the furnished
    variant's machinery."""
    ds = Synthetic(_syn_cfg())
    assert len(ds.spheres) == 0 and len(ds.boxes) == 0
    cfg = _syn_cfg()
    cfg["data"]["scene"] = "furnished"
    fd = Synthetic(cfg)
    _, _, depth_box, _ = ds[0]
    # walls-only SDF agrees between variants (furniture only ADDS surfaces)
    pts = np.array([[0.0, 0.0, 0.0], [1.9, 0.0, 0.0], [-2.0, 1.0, 1.0]])
    box_sdf = ds.scene_sdf(pts)
    assert box_sdf[2] == 0.0 and box_sdf[0] == 2.0
    assert (fd.scene_sdf(pts) <= box_sdf + 1e-6).all()


def test_synthetic_crop_edge():
    ds = Synthetic(_syn_cfg(crop_edge=4))
    _, color, depth, _ = ds[0]
    assert color.shape == (40, 56, 3)


def test_replica_reader(tmp_path):
    # tiny generated Replica-format scene
    res = tmp_path / "results"
    res.mkdir()
    H, W = 12, 16
    rng = np.random.default_rng(0)
    for i in range(3):
        img = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
        cv2.imwrite(str(res / f"frame{i:06d}.jpg"), img)
        depth = (rng.random((H, W)) * 6553.5).astype(np.uint16)
        cv2.imwrite(str(res / f"depth{i:06d}.png"), depth)
    poses = []
    with open(tmp_path / "traj.txt", "w") as f:
        for i in range(3):
            c2w = np.eye(4)
            c2w[0, 3] = i * 0.1
            poses.append(c2w.copy())
            f.write(" ".join(map(str, c2w.reshape(-1))) + "\n")

    cfg = {
        "dataset": "replica",
        "cam": {"H": H, "W": W, "fx": 10.0, "fy": 10.0, "cx": 7.5, "cy": 5.5,
                "png_depth_scale": 6553.5, "crop_edge": 0},
        "data": {"input_folder": str(tmp_path)},
    }
    ds = get_dataset(cfg)
    assert len(ds) == 3
    idx, color, depth, pose = ds[1]
    assert color.shape == (H, W, 3) and color.max() <= 1.0
    assert depth.max() <= 1.0 + 1e-6  # scaled by png_depth_scale
    # y/z axis flip applied
    assert pose[1, 1] == -1.0 and pose[2, 2] == -1.0
    assert pose[0, 3] == 0.1


def test_tum_reader_association(tmp_path):
    H, W = 12, 16
    rng = np.random.default_rng(1)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, depth_lines, gt_lines = [], [], []
    for i in range(4):
        t = 100.0 + i * 0.5
        cv2.imwrite(str(tmp_path / "rgb" / f"{t:.6f}.png"),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / "depth" / f"{t:.6f}.png"),
                    (rng.random((H, W)) * 5000).astype(np.uint16))
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t + 0.01:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t + 0.02:.6f} {0.1 * i} 0 0 0 0 0 1")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines))
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines))
    (tmp_path / "groundtruth.txt").write_text(
        "# header\n" + "\n".join(gt_lines)
    )

    cfg = {
        "dataset": "tumrgbd",
        "cam": {"H": H, "W": W, "fx": 10.0, "fy": 10.0, "cx": 7.5, "cy": 5.5,
                "png_depth_scale": 5000.0, "crop_edge": 0},
        "data": {"input_folder": str(tmp_path)},
    }
    ds = get_dataset(cfg)
    assert len(ds) == 4
    _, color, depth, pose0 = ds[0]
    # first pose normalized to identity (+ axis flips)
    np.testing.assert_allclose(pose0[:3, 3], 0.0, atol=1e-6)
    _, _, _, pose1 = ds[1]
    assert abs(pose1[0, 3] - 0.1) < 1e-5


def test_azure_reader(tmp_path):
    H, W = 12, 16
    rng = np.random.default_rng(2)
    (tmp_path / "color").mkdir()
    (tmp_path / "depth").mkdir()
    (tmp_path / "scene").mkdir()
    for i in range(2):
        cv2.imwrite(str(tmp_path / "color" / f"{i:05d}.jpg"),
                    rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
        cv2.imwrite(str(tmp_path / "depth" / f"{i:05d}.png"),
                    (rng.random((H, W)) * 1000).astype(np.uint16))
    # open3d-style .log trajectory: header line + 4 matrix rows per frame
    lines = []
    for i in range(2):
        lines.append(f"{i} {i} 1.0")
        m = np.eye(4)
        m[0, 3] = i * 0.5
        for row in m:
            lines.append(" ".join(f"{v:.6f}" for v in row))
    (tmp_path / "scene" / "trajectory.log").write_text("\n".join(lines))

    cfg = {
        "dataset": "azure",
        "cam": {"H": H, "W": W, "fx": 10.0, "fy": 10.0, "cx": 7.5, "cy": 5.5,
                "png_depth_scale": 1000.0, "crop_edge": 0},
        "data": {"input_folder": str(tmp_path)},
    }
    ds = get_dataset(cfg)
    assert len(ds) == 2
    _, color, depth, pose = ds[1]
    assert color.shape == (H, W, 3)
    assert pose[0, 3] == 0.5
    assert pose[1, 1] == -1.0  # y/z axis flip


def test_azure_identity_fallback(tmp_path):
    # without a trajectory.log the reader must fall back to identity poses
    H, W = 8, 10
    (tmp_path / "color").mkdir()
    (tmp_path / "depth").mkdir()
    rng = np.random.default_rng(3)
    cv2.imwrite(str(tmp_path / "color" / "0.jpg"),
                rng.integers(0, 255, (H, W, 3), dtype=np.uint8))
    cv2.imwrite(str(tmp_path / "depth" / "0.png"),
                (rng.random((H, W)) * 1000).astype(np.uint16))
    cfg = {
        "dataset": "azure",
        "cam": {"H": H, "W": W, "fx": 10.0, "fy": 10.0, "cx": 4.5, "cy": 3.5,
                "png_depth_scale": 1000.0, "crop_edge": 0},
        "data": {"input_folder": str(tmp_path)},
    }
    ds = get_dataset(cfg)
    _, _, _, pose = ds[0]
    np.testing.assert_allclose(pose, np.eye(4))


def test_crop_size_resize():
    ds = Synthetic(_syn_cfg())
    cfg = _syn_cfg()
    cfg["cam"]["crop_size"] = [24, 32]
    # crop_size path goes through BaseDataset __getitem__, synthetic
    # overrides it — test via Replica-style path handled in BaseDataset:
    # (synthetic ignores crop_size by design; just assert config survives)
    assert cfg["cam"]["crop_size"] == [24, 32]


def test_prefetcher_to_device_yields_identical_frames():
    """Prefetcher(to_device=True) uploads frames from the worker thread;
    values must be identical to direct dataset reads and land on device."""
    import jax

    from nice_slam_tpu.utils.datasets import Prefetcher

    ds = Synthetic(_syn_cfg())
    pf = Prefetcher(ds, depth=2, start=0, to_device=True)
    try:
        seen = 0
        for idx, color, depth, c2w in pf:
            assert isinstance(color, jax.Array)
            assert isinstance(depth, jax.Array)
            _, c_ref, d_ref, p_ref = ds[idx]
            np.testing.assert_array_equal(np.asarray(color), c_ref)
            np.testing.assert_array_equal(np.asarray(depth), d_ref)
            np.testing.assert_array_equal(np.asarray(c2w), p_ref)
            seen += 1
            if seen >= 3:
                break
    finally:
        pf.close()
    assert seen == 3


def test_quantize_frame_roundtrip_exact_for_png_sources():
    """u8/u16-sourced frames survive the upload re-quantization BITWISE:
    reader f32 ops -> quantize_frame -> device dequant replay."""
    from nice_slam_tpu.slam.slam import _dequant_fn
    from nice_slam_tpu.utils.datasets import quantize_frame

    rng = np.random.default_rng(0)
    pds, scale = 6553.5, 1.0
    src_c = rng.integers(0, 256, (12, 17, 3), dtype=np.uint8)
    src_d = rng.integers(0, 65000, (12, 17), dtype=np.uint16)
    # BaseDataset.__getitem__'s exact preprocessing (datasets.py:91-92)
    color = src_c.astype(np.float32) / 255.0
    depth = src_d.astype(np.float32) / pds * scale

    packed = quantize_frame(color, depth, pds / scale)
    assert packed is not None
    c8, d16 = packed
    np.testing.assert_array_equal(c8, src_c)
    np.testing.assert_array_equal(d16, src_d)
    c_dev, d_dev = _dequant_fn(pds, scale)(c8, d16)
    # XLA may lower /const as a reciprocal multiply: allow 1 ulp
    np.testing.assert_allclose(np.asarray(c_dev), color, rtol=1.2e-7, atol=0)
    np.testing.assert_allclose(np.asarray(d_dev), depth, rtol=1.2e-7, atol=0)


def test_quantize_frame_clip_guard_and_synthetic_scale():
    from nice_slam_tpu.utils.datasets import quantize_frame

    depth = np.array([[1.0, 11.0]], np.float32)  # 11 m clips at 6553.5
    color = np.zeros((1, 2, 3), np.float32)
    assert quantize_frame(color, depth, 6553.5) is None

    ds = Synthetic(_syn_cfg())
    pds, scale = ds.upload_quant
    # scene-derived scale: the room diagonal cannot clip
    diag = float(np.linalg.norm(ds.room[:, 1] - ds.room[:, 0]))
    assert diag * pds / scale < 65535.0
    _, c, d, _ = ds[0]
    packed = quantize_frame(c, d, pds / scale)
    assert packed is not None
    c8, d16 = packed
    np.testing.assert_allclose(d16.astype(np.float32) / pds * scale, d,
                               atol=0.6 / pds)
    np.testing.assert_allclose(c8.astype(np.float32) / 255.0, c,
                               atol=0.6 / 255.0)
