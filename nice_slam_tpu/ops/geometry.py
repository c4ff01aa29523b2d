"""Pure-JAX geometry/math core (L2).

Functional equivalents of the reference math library (reference:
src/common.py), with behavior-parity on: camera rays, quaternion<->matrix
pose conversion (unnormalized-quaternion tolerant), the NeRF volume-rendering
integrator in both occupancy and density modes, hierarchical inverse-CDF
sampling, and scene-bound coordinate normalization.

Everything here is shape-static and jit/vmap/grad-safe.  Random pixel
selection takes an explicit PRNG key (JAX-functional) instead of global
torch RNG state.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Intrinsics
# ---------------------------------------------------------------------------

def as_intrinsics_matrix(intrinsics) -> np.ndarray:
    """3x3 pinhole K from (fx, fy, cx, cy). Reference: src/common.py:6-16."""
    fx, fy, cx, cy = intrinsics
    K = np.eye(3)
    K[0, 0] = fx
    K[1, 1] = fy
    K[0, 2] = cx
    K[1, 2] = cy
    return K


# ---------------------------------------------------------------------------
# Quaternion / pose conversions
# ---------------------------------------------------------------------------

def quat_to_rotation(quad: jnp.ndarray) -> jnp.ndarray:
    """Batched quaternion (w, x, y, z) -> rotation matrix, gradient-safe.

    Tolerates unnormalized quaternions via the 2/|q|^2 scaling — the tracker
    gradient-descends the raw 4-vector without renormalizing, so this must
    match the reference exactly (src/common.py:137-160).

    Args:
        quad: (B, 4) array.
    Returns:
        (B, 3, 3) rotation matrices.
    """
    qr, qi, qj, qk = quad[:, 0], quad[:, 1], quad[:, 2], quad[:, 3]
    two_s = 2.0 / jnp.sum(quad * quad, axis=-1)
    r00 = 1 - two_s * (qj**2 + qk**2)
    r01 = two_s * (qi * qj - qk * qr)
    r02 = two_s * (qi * qk + qj * qr)
    r10 = two_s * (qi * qj + qk * qr)
    r11 = 1 - two_s * (qi**2 + qk**2)
    r12 = two_s * (qj * qk - qi * qr)
    r20 = two_s * (qi * qk - qj * qr)
    r21 = two_s * (qj * qk + qi * qr)
    r22 = 1 - two_s * (qi**2 + qj**2)
    rows = jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )
    return rows


def pose_from_tensor(inputs: jnp.ndarray) -> jnp.ndarray:
    """[quat(4), trans(3)] tensor -> 3x4 camera-to-world matrix.

    Differentiable; this is the tracked pose parameterization
    (reference: src/common.py:163-176).
    Accepts (7,) or (B, 7); returns (3, 4) or (B, 3, 4).
    """
    single = inputs.ndim == 1
    if single:
        inputs = inputs[None]
    quad, t = inputs[:, :4], inputs[:, 4:]
    R = quat_to_rotation(quad)
    RT = jnp.concatenate([R, t[:, :, None]], axis=-1)
    return RT[0] if single else RT


def rotation_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> quaternion (w, x, y, z), w >= 0.

    Branch-free Shepperd-style extraction replacing the reference's
    mathutils C dependency (src/common.py:190-193).  Not used under grad
    (only for pose initialization), but written jit-safe anyway.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    # Four candidate extractions; pick the numerically best (largest pivot).
    def cand_w():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s])

    def cand_x():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s])

    def cand_y():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s])

    def cand_z():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s])

    pivots = jnp.stack([tr, m00, m11, m22])
    idx = jnp.argmax(pivots)
    q = jax.lax.switch(idx, [cand_w, cand_x, cand_y, cand_z])
    q = q / jnp.linalg.norm(q)
    return jnp.where(q[0] < 0, -q, q)


def tensor_from_pose(RT: jnp.ndarray, Tquad: bool = False) -> jnp.ndarray:
    """3x4 or 4x4 camera matrix -> [quat(4), trans(3)] (or [t, q] if Tquad).

    Reference: src/common.py:179-201 (mathutils replaced by
    :func:`rotation_to_quat`).
    """
    R, t = RT[:3, :3], RT[:3, 3]
    quad = rotation_to_quat(R)
    if Tquad:
        return jnp.concatenate([t, quad], axis=0)
    return jnp.concatenate([quad, t], axis=0)


# ---------------------------------------------------------------------------
# Rays
# ---------------------------------------------------------------------------

def rays_from_uv(
    i: jnp.ndarray,
    j: jnp.ndarray,
    c2w: jnp.ndarray,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-pixel world-space rays for pixel columns ``i`` / rows ``j``.

    Camera convention (reference: src/common.py:74-89): direction
    ``[(i-cx)/fx, -(j-cy)/fy, -1]`` rotated by c2w — i.e. the camera looks
    along -Z with +Y up.

    Args:
        i, j: (N,) pixel coordinates (float).
        c2w: (3|4, 4) camera-to-world.
    Returns:
        rays_o (N, 3), rays_d (N, 3).
    """
    dirs = jnp.stack([(i - cx) / fx, -(j - cy) / fy, -jnp.ones_like(i)], axis=-1)
    rays_d = dirs @ c2w[:3, :3].T
    rays_o = jnp.broadcast_to(c2w[:3, 3], rays_d.shape)
    return rays_o, rays_d


def get_rays(
    H: int, W: int, fx: float, fy: float, cx: float, cy: float, c2w: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-image ray grid (H, W, 3). Reference: src/common.py:248-266."""
    j, i = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32), jnp.arange(W, dtype=jnp.float32), indexing="ij"
    )
    rays_o, rays_d = rays_from_uv(i.reshape(-1), j.reshape(-1), c2w, fx, fy, cx, cy)
    return rays_o.reshape(H, W, 3), rays_d.reshape(H, W, 3)


def sample_pixels(
    key: jax.Array,
    H0: int,
    H1: int,
    W0: int,
    W1: int,
    n: int,
    depth: jnp.ndarray,
    color: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniformly sample ``n`` pixels from the crop region [H0:H1, W0:W1].

    Functional analog of reference src/common.py:92-122 (random integer
    indices into the flattened crop; duplicates allowed).

    Returns (i, j, depth_n, color_n) with i = column, j = row (full-image
    pixel coordinates, float32).
    """
    hs = H1 - H0
    ws = W1 - W0
    idx = jax.random.randint(key, (n,), 0, hs * ws)
    r = idx // ws
    c = idx % ws
    j = (r + H0).astype(jnp.float32)
    i = (c + W0).astype(jnp.float32)
    depth_n = depth[r + H0, c + W0]
    color_n = color[r + H0, c + W0]
    return i, j, depth_n, color_n


def get_samples(
    key: jax.Array,
    H0: int,
    H1: int,
    W0: int,
    W1: int,
    n: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    c2w: jnp.ndarray,
    depth: jnp.ndarray,
    color: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sample n rays + their GT depth/color from an image crop region.

    Reference: src/common.py:125-134.
    Returns (rays_o, rays_d, depth, color).
    """
    i, j, sample_depth, sample_color = sample_pixels(key, H0, H1, W0, W1, n, depth, color)
    rays_o, rays_d = rays_from_uv(i, j, c2w, fx, fy, cx, cy)
    return rays_o, rays_d, sample_depth, sample_color


def ray_aabb_far(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, bound: jnp.ndarray
) -> jnp.ndarray:
    """Per-ray scene-box exit distance: min over axes of max(t_lo, t_hi).

    Used both as the far plane (reference: src/utils/Renderer.py:98-105) and
    as the in-bound ray prefilter ``t >= gt_depth`` (src/Tracker.py:94-104).

    Args:
        bound: (3, 2) scene AABB.
    Returns:
        (N,) exit distances (no +0.01 margin; callers add their own).
    """
    t = (bound[None, :, :] - rays_o[:, :, None]) / rays_d[:, :, None]
    return jnp.min(jnp.max(t, axis=2), axis=1)


# ---------------------------------------------------------------------------
# Volume-rendering integrator
# ---------------------------------------------------------------------------

def raw2outputs_nerf_color(
    raw: jnp.ndarray,
    z_vals: jnp.ndarray,
    rays_d: jnp.ndarray,
    occupancy: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Integrate raw decoder outputs along rays.

    Parity with reference src/common.py:204-245:
      * occupancy mode: alpha = sigmoid(10 * raw[..., 3])
      * density mode: alpha = 1 - exp(-relu(raw[..., 3]) * dist),
        dist scaled by |rays_d| with a 1e10 cap on the last interval
      * transmittance weights w_i = a_i * prod_{j<i}(1 - a_j + 1e-10)
      * depth = sum w*z ; depth variance (the "uncertainty") =
        sum w*(z-depth)^2 ; rgb = sum w*c

    Args:
        raw: (N_rays, N_samples, 4) — rgb + occupancy/density.
        z_vals: (N_rays, N_samples).
        rays_d: (N_rays, 3).
    Returns:
        (depth (N,), depth_var (N,), rgb (N, 3), weights (N, S)).
    """
    rgb = raw[..., :3]
    if occupancy:
        alpha = jax.nn.sigmoid(10.0 * raw[..., 3])
    else:
        dists = z_vals[..., 1:] - z_vals[..., :-1]
        dists = jnp.concatenate(
            [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
        )
        dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)
        alpha = 1.0 - jnp.exp(-jax.nn.relu(raw[..., 3]) * dists)

    ones = jnp.ones_like(alpha[..., :1])
    transmittance = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1
    )[..., :-1]
    weights = alpha * transmittance
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    tmp = z_vals - depth_map[..., None]
    depth_var = jnp.sum(weights * tmp * tmp, axis=-1)
    return depth_map, depth_var, rgb_map, weights


# ---------------------------------------------------------------------------
# Hierarchical importance sampling
# ---------------------------------------------------------------------------

def sample_pdf(
    key: jax.Array,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    N_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling of z-value bins weighted by rendering weights.

    NeRF §5.2 hierarchical sampling; parity with reference
    src/common.py:19-63 (incl. the 1e-5 weight floor and the denom<1e-5
    guard).

    Args:
        bins: (B, M) bin edges (z_vals midpoints).
        weights: (B, M-1) weights per bin.
    Returns:
        (B, N_samples) new z samples.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (B, M)

    if det:
        u = jnp.linspace(0.0, 1.0, N_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (N_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (N_samples,))

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_above = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


# ---------------------------------------------------------------------------
# Coordinate normalization
# ---------------------------------------------------------------------------

def normalize_3d_coordinate(p: jnp.ndarray, bound: jnp.ndarray) -> jnp.ndarray:
    """World coords -> [-1, 1]^3 w.r.t. the scene AABB.

    Reference: src/common.py:269-284 (non-mutating here).

    Args:
        p: (..., 3).
        bound: (3, 2).
    """
    lo = bound[:, 0]
    hi = bound[:, 1]
    return (p - lo) / (hi - lo) * 2.0 - 1.0


def random_select(key: jax.Array, l: int, k: int) -> np.ndarray:
    """Randomly pick min(l, k) distinct ints from [0, l). Host-side helper
    mirroring reference src/common.py:66-71."""
    perm = jax.random.permutation(key, l)
    return np.asarray(perm[: min(l, k)])
