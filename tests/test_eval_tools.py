"""Evaluation tooling: ATE alignment, ICP, recon metrics, mesh culling."""

import numpy as np
import pytest

from nice_slam_tpu.tools.eval_ate import align, associate, evaluate_ate
from nice_slam_tpu.tools.eval_recon import (
    accuracy,
    completion,
    completion_ratio,
    icp_p2p,
)
from nice_slam_tpu.tools.cull_mesh import cull_mesh
from nice_slam_tpu.utils import meshlib


def _random_rot(seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def test_align_recovers_rigid_transform():
    rng = np.random.default_rng(0)
    traj = rng.normal(size=(3, 50))
    R = _random_rot(1)
    t = np.array([[1.0], [-2.0], [0.5]])
    moved = R @ traj + t
    rot, trans, err = align(moved, traj)
    np.testing.assert_allclose(err, 0.0, atol=1e-9)
    np.testing.assert_allclose(rot @ R, np.eye(3), atol=1e-9)


def test_evaluate_ate_known_error():
    n = 20
    rng = np.random.default_rng(2)
    gt = {i: rng.normal(size=3) for i in range(n)}
    est = {i: gt[i] + np.array([0.0, 0.0, 0.0]) for i in range(n)}
    res = evaluate_ate(gt, est)
    assert res["absolute_translational_error.rmse"] < 1e-9
    assert res["compared_pose_pairs"] == n


def test_associate_greedy_nearest():
    first = {0.0: [0], 1.0: [1], 2.0: [2]}
    second = {0.004: [0], 1.01: [1], 5.0: [2]}
    m = associate(first, second, max_difference=0.02)
    assert m == [(0.0, 0.004), (1.0, 1.01)]


def test_icp_recovers_small_offset():
    rng = np.random.default_rng(3)
    pts = rng.uniform(-1, 1, (2000, 3))
    offset = np.array([0.03, -0.02, 0.01])
    T = icp_p2p(pts + offset, pts, threshold=0.2)
    np.testing.assert_allclose(T[:3, 3], -offset, atol=5e-3)


def test_recon_metrics_identical_points():
    rng = np.random.default_rng(4)
    pts = rng.uniform(-1, 1, (5000, 3))
    assert accuracy(pts, pts) < 1e-9
    assert completion(pts, pts) < 1e-9
    assert completion_ratio(pts, pts) == 1.0


def test_recon_metrics_known_offset():
    rng = np.random.default_rng(5)
    gt = rng.uniform(-1, 1, (3000, 3))
    rec = gt + np.array([0.02, 0.0, 0.0])
    # NN may snap to a different (closer) source point in a dense cloud, so
    # the mean is bounded by, and close to, the shift magnitude
    assert 0.018 < accuracy(gt, rec) <= 0.02 + 1e-9
    assert completion_ratio(gt, rec, dist_th=0.05) == 1.0
    # a handful of dense-cloud points may have an unrelated neighbor
    # within the threshold
    assert completion_ratio(gt, rec, dist_th=0.01) < 0.01


def test_cull_mesh_drops_behind_camera():
    # two triangles: one in front of the camera (-z), one behind (+z)
    verts = np.array(
        [[0, 0, -2], [0.1, 0, -2], [0, 0.1, -2],
         [0, 0, 2], [0.1, 0, 2], [0, 0.1, 2]], np.float32
    )
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    pose = np.eye(4, dtype=np.float32)
    kept = cull_mesh(verts, faces, [pose], H=60, W=80, fx=60.0, fy=60.0,
                     cx=39.5, cy=29.5)
    assert len(kept) == 1
    assert (kept[0] == [0, 1, 2]).all()


def test_raycast_depth_l1_between_meshes():
    # two nested spheres: depth difference from a fixed camera ~ radius gap
    def sphere(r, n=36):
        g = np.linspace(-1.5, 1.5, n).astype(np.float32)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        f = r - np.sqrt(X**2 + Y**2 + Z**2)
        sp = 3.0 / (n - 1)
        return meshlib.marching_cubes(f, 0.0, origin=(-1.5,) * 3,
                                      spacing=(sp,) * 3)

    v1, t1 = sphere(1.0)
    v2, t2 = sphere(0.9)
    c1 = meshlib.MeshRaycaster(v1, t1)
    c2 = meshlib.MeshRaycaster(v2, t2)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -3.0
    d1 = c1.render_depth(c2w, 50, 50, 100.0, 100.0, 24.5, 24.5)
    d2 = c2.render_depth(c2w, 50, 50, 100.0, 100.0, 24.5, 24.5)
    hit = (d1 > 0) & (d2 > 0)
    assert hit.mean() > 0.5
    gap = np.mean(np.abs(d1 - d2)[hit])
    # oblique rays see a gap larger than the 0.1 radial difference
    assert 0.08 < gap < 0.3
