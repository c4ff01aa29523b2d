"""Unit tests for the L2 math core (closed-form / round-trip checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nice_slam_tpu.ops import geometry as G


def test_quat_rotation_identity():
    q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    R = G.quat_to_rotation(q)
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)


def test_quat_rotation_unnormalized_invariance():
    # The tracker optimizes raw quaternions; scaling must not change R.
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (8, 4))
    R1 = G.quat_to_rotation(q)
    R2 = G.quat_to_rotation(3.7 * q)
    np.testing.assert_allclose(np.asarray(R1), np.asarray(R2), atol=1e-5)


def test_quat_rotation_is_rotation():
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (16, 4))
    R = np.asarray(G.quat_to_rotation(q))
    for r in R:
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_pose_tensor_round_trip():
    key = jax.random.PRNGKey(2)
    for i in range(10):
        q = jax.random.normal(jax.random.fold_in(key, i), (4,))
        q = q / jnp.linalg.norm(q)
        t = jax.random.normal(jax.random.fold_in(key, 100 + i), (3,))
        tensor = jnp.concatenate([q, t])
        RT = G.pose_from_tensor(tensor)
        back = G.tensor_from_pose(RT)
        # quaternion is sign-ambiguous; canonicalize
        qb = np.asarray(back[:4])
        qa = np.asarray(q)
        if np.sign(qa[0]) != np.sign(qb[0]):
            qa = -qa
        np.testing.assert_allclose(qb, qa, atol=1e-5)
        np.testing.assert_allclose(np.asarray(back[4:]), np.asarray(t), atol=1e-5)


def test_rays_center_pixel_looks_minus_z():
    H, W, fx, fy, cx, cy = 100, 120, 100.0, 100.0, 59.5, 49.5
    c2w = jnp.eye(4)
    rays_o, rays_d = G.get_rays(H, W, fx, fy, cx, cy, c2w)
    # pixel at (cx, cy) should look along -z exactly
    d = np.asarray(rays_d[49, 59])  # j=49 (row ~ cy), i=59 (col ~ cx)
    np.testing.assert_allclose(d, [-0.005, 0.005, -1.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rays_o[0, 0]), [0, 0, 0], atol=1e-6)


def test_rays_rotated_by_pose():
    H, W, fx, fy, cx, cy = 10, 10, 10.0, 10.0, 4.5, 4.5
    # 90 degree rotation about y: camera -z maps to -x
    c2w = jnp.array(
        [[0.0, 0, 1, 2.0], [0, 1, 0, 3.0], [-1, 0, 0, 4.0], [0, 0, 0, 1]]
    )
    i = jnp.array([4.5])
    j = jnp.array([4.5])
    rays_o, rays_d = G.rays_from_uv(i, j, c2w, fx, fy, cx, cy)
    np.testing.assert_allclose(np.asarray(rays_d[0]), [-1.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(rays_o[0]), [2.0, 3.0, 4.0], atol=1e-6)


def test_ray_aabb_far_axis_aligned():
    bound = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
    rays_o = jnp.array([[0.0, 0.0, 0.0]])
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    far = G.ray_aabb_far(rays_o, rays_d, bound)
    assert float(far[0]) == pytest.approx(1.0, abs=1e-6)


def test_integrator_opaque_surface():
    # One fully opaque sample at z=2: depth == 2, var == 0, rgb == sample rgb.
    N, S = 4, 8
    z_vals = jnp.broadcast_to(jnp.linspace(1.0, 3.0, S), (N, S))
    raw = jnp.zeros((N, S, 4))
    raw = raw.at[:, :, 3].set(-1000.0)  # empty space: alpha ~ 0
    raw = raw.at[:, 4, 3].set(1000.0)  # huge occupancy logit -> alpha 1
    raw = raw.at[:, :, 0].set(0.25)
    rays_d = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (N, 1))
    depth, var, rgb, w = G.raw2outputs_nerf_color(raw, z_vals, rays_d, occupancy=True)
    z4 = float(z_vals[0, 4])
    np.testing.assert_allclose(np.asarray(depth), z4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(var), 0.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(rgb[:, 0]), 0.25, atol=1e-3)
    # weights sum to ~1 once an opaque surface is hit
    np.testing.assert_allclose(np.asarray(jnp.sum(w, -1)), 1.0, atol=1e-3)


def test_integrator_density_mode_transmittance():
    # Constant density sigma: alpha_i = 1-exp(-sigma*dist); check against
    # closed-form transmittance product.
    N, S = 1, 16
    sigma = 0.7
    z_vals = jnp.broadcast_to(jnp.linspace(0.1, 4.0, S), (N, S))
    raw = jnp.zeros((N, S, 4)).at[:, :, 3].set(sigma)
    rays_d = jnp.array([[0.0, 0.0, -1.0]])
    depth, var, rgb, w = G.raw2outputs_nerf_color(raw, z_vals, rays_d, occupancy=False)
    dists = np.diff(np.asarray(z_vals[0]))
    dists = np.append(dists, 1e10)
    alpha = 1 - np.exp(-sigma * dists)
    trans = np.cumprod(np.concatenate([[1.0], 1 - alpha + 1e-10]))[:-1]
    expect_w = alpha * trans
    np.testing.assert_allclose(np.asarray(w[0]), expect_w, rtol=1e-4)


def test_sample_pdf_concentrates_mass():
    # All weight in one bin -> all samples land inside that bin.
    key = jax.random.PRNGKey(0)
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 9), (2, 9))
    weights = jnp.zeros((2, 8)).at[:, 3].set(100.0)
    samples = G.sample_pdf(key, bins, weights, 32)
    s = np.asarray(samples)
    lo, hi = 3 / 8, 4 / 8
    frac_inside = np.mean((s >= lo - 1e-3) & (s <= hi + 1e-3))
    assert frac_inside > 0.95


def test_sample_pdf_det_uniform():
    key = jax.random.PRNGKey(0)
    bins = jnp.broadcast_to(jnp.linspace(0.0, 1.0, 5), (1, 5))
    weights = jnp.ones((1, 4))
    samples = G.sample_pdf(key, bins, weights, 5, det=True)
    np.testing.assert_allclose(
        np.asarray(samples[0]), np.linspace(0, 1, 5), atol=1e-5
    )


def test_normalize_3d_coordinate():
    bound = jnp.array([[0.0, 2.0], [-1.0, 3.0], [5.0, 9.0]])
    p = jnp.array([[0.0, -1.0, 5.0], [2.0, 3.0, 9.0], [1.0, 1.0, 7.0]])
    out = np.asarray(G.normalize_3d_coordinate(p, bound))
    np.testing.assert_allclose(out[0], [-1, -1, -1], atol=1e-6)
    np.testing.assert_allclose(out[1], [1, 1, 1], atol=1e-6)
    np.testing.assert_allclose(out[2], [0, 0, 0], atol=1e-6)


def test_sample_pixels_in_region():
    key = jax.random.PRNGKey(3)
    H, W = 60, 80
    depth = jnp.arange(H * W, dtype=jnp.float32).reshape(H, W)
    color = jnp.stack([depth] * 3, -1)
    i, j, d, c = G.sample_pixels(key, 10, 50, 20, 70, 500, depth, color)
    i = np.asarray(i)
    j = np.asarray(j)
    assert i.min() >= 20 and i.max() < 70
    assert j.min() >= 10 and j.max() < 50
    # gathered values must correspond to the sampled pixel coordinates
    np.testing.assert_allclose(np.asarray(d), j * W + i, atol=1e-4)
