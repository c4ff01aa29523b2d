"""Mesher visibility-mask unit tests (reference point_masks semantics,
src/utils/Mesher.py:53-212)."""

import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.utils.mesher import _frame_masks

H, W, F = 60, 80, 60.0
CX, CY = 39.5, 29.5


def _c2w_at_origin():
    # SLAM convention: -z forward
    return jnp.eye(4, dtype=jnp.float32)


def test_frame_masks_all_frames_variant_has_no_depth_bound():
    """The all-frames path passes a ZERO depth image with depth_test=False
    (reference :88-125 skips the depth test entirely): in-frustum points
    must still be seen.  Regression: the zero image once collapsed the
    fallback bound max(depth)*1.1 to 0, marking everything unseen and
    producing an EMPTY final_mesh_eval_rec.ply."""
    pts = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -5.0],  # ahead
                     [0.0, 0.0, 2.0]])                    # behind
    seen, forecast = _frame_masks(
        pts, _c2w_at_origin(), jnp.zeros((H, W), jnp.float32),
        H, W, F, F, CX, CY, False,
    )
    assert bool(seen[0]) and bool(seen[1])
    assert not bool(seen[2])


def test_frame_masks_depth_bound_with_real_depths():
    """With a real depth image and depth_test=False, points beyond
    max(depth)*1.1 are not seen (reference :178-186)."""
    depth = jnp.full((H, W), 2.0, jnp.float32)
    pts = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -3.0]])
    seen, _ = _frame_masks(
        pts, _c2w_at_origin(), depth, H, W, F, F, CX, CY, False,
    )
    assert bool(seen[0])
    assert not bool(seen[1])


def test_frame_masks_depth_test_window():
    """depth_test=True keeps points within +-2.4 of the pixel's depth
    (reference :156-176)."""
    depth = jnp.full((H, W), 3.0, jnp.float32)
    pts = jnp.array([[0.0, 0.0, -2.0],   # within 3 +- 2.4
                     [0.0, 0.0, -0.3]])  # 2.7 in front of the surface: out
    seen, _ = _frame_masks(
        pts, _c2w_at_origin(), depth, H, W, F, F, CX, CY, True,
    )
    assert bool(seen[0])
    assert not bool(seen[1])
