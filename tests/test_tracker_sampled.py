"""Host-presampled tracking path (slam/tracker.py presample_pixels /
tracking_loss_sampled / tracked_frame_step_sampled): the strict loop's
transfer-size optimization.  The loss math must be byte-identical to the
image path when fed the same pixels; only the pixel gather moves to the
host (reference pixel sampling: src/common.py:92-122)."""

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.scene import build_scene
from nice_slam_tpu.ops.geometry import sample_pixels
from nice_slam_tpu.ops.render import RenderConfig
from nice_slam_tpu.slam.tracker import (
    TrackerConfig,
    presample_pixels,
    track_frame,
    track_frame_sampled,
    tracking_loss,
    tracking_loss_sampled,
    tracked_frames_step_sampled,
)


def _setup():
    cam = {"H": 24, "W": 32, "fx": 24.0, "fy": 24.0, "cx": 15.5, "cy": 11.5}
    cfg = {
        "scale": 1, "coarse": False, "occupancy": True,
        "grid_len": {"coarse": 2, "middle": 1.1, "fine": 0.55, "color": 0.55,
                     "bound_divisible": 1.1},
        "model": {"c_dim": 8, "coarse_bound_enlarge": 2,
                  "pos_embedding_method": "fourier"},
        "data": {"dim": 3},
        "mapping": {"bound": [[-2.2, 2.2]] * 3},
        "rendering": {"N_samples": 8, "N_surface": 4, "N_importance": 0,
                      "lindisp": False, "perturb": 0.0},
        "tracking": {"lr": 0.002, "iters": 6, "pixels": 64,
                     "seperate_LR": False, "w_color_loss": 0.5,
                     "ignore_edge_W": 2, "ignore_edge_H": 2,
                     "handle_dynamic": True, "use_color_in_tracking": True,
                     "const_speed_assumption": True, "gt_camera": False},
    }
    spec, state = build_scene(cfg, nice=True, seed=0)
    rcfg = RenderConfig.from_cfg(cfg)
    tcfg = TrackerConfig.from_cfg(cfg, cam, nice=True)
    rng = np.random.default_rng(0)
    color = np.asarray(rng.random((24, 32, 3)), np.float32)
    depth = np.asarray(1.0 + rng.random((24, 32)), np.float32)
    init = jnp.asarray([1.0, 0.01, 0.0, 0.0, 0.1, 0.0, 0.0], jnp.float32)
    return spec, state, tcfg, rcfg, init, color, depth


def test_sampled_loss_bit_matches_image_loss_on_same_pixels():
    """tracking_loss == tracking_loss_sampled when the sampled pixels are
    exactly the ones the image path would draw — the refactor moved only
    the gather, not the math."""
    spec, state, tcfg, rcfg, init, color, depth = _setup()
    key = jax.random.PRNGKey(7)
    He, We = tcfg.ignore_edge_H, tcfg.ignore_edge_W
    i, j, d, c = sample_pixels(key, He, tcfg.H - He, We, tcfg.W - We,
                               tcfg.pixels, jnp.asarray(depth),
                               jnp.asarray(color))
    l_img = tracking_loss(spec, state, init, jnp.asarray(color),
                          jnp.asarray(depth), key, tcfg, rcfg)
    l_smp = tracking_loss_sampled(spec, state, init, i, j, d, c, tcfg, rcfg)
    np.testing.assert_array_equal(np.asarray(l_img), np.asarray(l_smp))


def test_presample_pixels_contract():
    """Shapes, crop bounds, gather parity with the image, and determinism
    in (seed, idx)."""
    _, _, tcfg, _, _, color, depth = _setup()
    i, j, d, c = presample_pixels(42, 3, tcfg, color, depth)
    assert i.shape == (tcfg.iters, tcfg.pixels)
    assert j.shape == (tcfg.iters, tcfg.pixels)
    assert d.shape == (tcfg.iters, tcfg.pixels)
    assert c.shape == (tcfg.iters, tcfg.pixels, 3)
    He, We = tcfg.ignore_edge_H, tcfg.ignore_edge_W
    assert i.min() >= We and i.max() < tcfg.W - We
    assert j.min() >= He and j.max() < tcfg.H - He
    ri = j.astype(np.int64)
    ci = i.astype(np.int64)
    np.testing.assert_array_equal(d, depth[ri, ci])
    np.testing.assert_array_equal(c, color[ri, ci])
    i2, j2, _, _ = presample_pixels(42, 3, tcfg, color, depth)
    np.testing.assert_array_equal(i, i2)
    np.testing.assert_array_equal(j, j2)
    i3, _, _, _ = presample_pixels(42, 4, tcfg, color, depth)
    assert not np.array_equal(i, i3)


def test_track_frame_sampled_matches_image_scan_statistically():
    """Both scans run the same optimizer on the same scene with different
    (equally distributed) pixel draws: losses must descend in both and the
    final candidates must land near each other."""
    spec, state, tcfg, rcfg, init, color, depth = _setup()
    key = jax.random.PRNGKey(3)
    cand_img, losses_img, _, _ = track_frame(
        spec, state, init, jnp.asarray(color), jnp.asarray(depth), key,
        tcfg, rcfg)
    pi, pj, pd, pc = presample_pixels(42, 5, tcfg, color, depth)
    cand_smp, losses_smp, cams, _ = track_frame_sampled(
        spec, state, init, jnp.asarray(pi), jnp.asarray(pj),
        jnp.asarray(pd), jnp.asarray(pc), tcfg, rcfg)
    l_i = np.asarray(losses_img)
    l_s = np.asarray(losses_smp)
    assert l_s.shape == (tcfg.iters,)
    # candidate = argmin-loss iterate (reference candidate quirk)
    np.testing.assert_array_equal(
        np.asarray(cand_smp), np.asarray(cams)[int(np.argmin(l_s))])
    # the two streams see the same problem: per-iteration losses agree to
    # sampling noise and the optimized poses agree to Adam-step scale
    assert abs(l_s[0] - l_i[0]) / l_i[0] < 0.5
    assert np.max(np.abs(np.asarray(cand_smp) - np.asarray(cand_img))) < 0.05


def test_tracked_frames_step_pose_writeback_and_cs_init():
    """The batched step writes each tracked pose into the device pose list
    and const-speed-initializes frame k from the poses frames k-1/k-2 wrote
    — the first frame's init must match the host const_speed_init
    (reference src/Tracker.py:208-219)."""
    spec, state, tcfg, rcfg, _, color, depth = _setup()
    est = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    # two distinct prior poses -> nontrivial const-speed extrapolation
    est[1][:3, 3] = [0.02, 0.0, 0.0]
    est[2][:3, 3] = [0.05, 0.01, 0.0]
    est_dev = jnp.asarray(est)
    packs = [presample_pixels(1, i, tcfg, color, depth) for i in (3, 4)]
    pi, pj, pd, pc = (np.stack([p[k] for p in packs]) for k in range(4))
    est2, cands, c2w44s, inits, losses = tracked_frames_step_sampled(
        spec, state, est_dev, np.int32(3), pi, pj, pd, pc, tcfg, rcfg)
    from nice_slam_tpu.slam.tracker import const_speed_init, tensor_from_c2w

    want_init = tensor_from_c2w(const_speed_init(est[2], est[1]))
    np.testing.assert_allclose(np.asarray(inits)[0],
                               np.asarray(want_init), atol=1e-5)
    est2 = np.asarray(est2)
    np.testing.assert_allclose(est2[3], np.asarray(c2w44s)[0], atol=1e-6)
    np.testing.assert_allclose(est2[4], np.asarray(c2w44s)[1], atol=1e-6)
    # untouched rows stay put
    np.testing.assert_array_equal(est2[:3], est[:3])
    np.testing.assert_array_equal(est2[5:], est[5:])
    assert np.all(np.isfinite(np.asarray(losses)))
    assert np.asarray(losses).shape == (2, tcfg.iters)


def test_batched_step_matches_per_frame_steps():
    """Running G frames through one batched module must equal running them
    one at a time (each frame seeing the previous frame's written pose):
    the grouping is a dispatch optimization, not a semantic change."""
    spec, state, tcfg, rcfg, _, color, depth = _setup()
    est = np.tile(np.eye(4, dtype=np.float32), (8, 1, 1))
    est[1][:3, 3] = [0.02, 0.0, 0.0]
    est[2][:3, 3] = [0.05, 0.01, 0.0]
    packs = [presample_pixels(9, i, tcfg, color, depth) for i in (3, 4, 5)]
    pi, pj, pd, pc = (np.stack([p[k] for p in packs]) for k in range(4))
    est_b, cands_b, _, _, losses_b = tracked_frames_step_sampled(
        spec, state, jnp.asarray(est), np.int32(3), pi, pj, pd, pc,
        tcfg, rcfg)
    # per-frame: G=1 batched calls chained on the written pose list
    est_s = jnp.asarray(est)
    cands_s, losses_s = [], []
    for k, (qi, qj, qd, qc) in enumerate(packs):
        est_s, cand, _, _, loss = tracked_frames_step_sampled(
            spec, state, est_s, np.int32(3 + k),
            qi[None], qj[None], qd[None], qc[None], tcfg, rcfg)
        cands_s.append(np.asarray(cand)[0])
        losses_s.append(np.asarray(loss)[0])
    np.testing.assert_allclose(np.asarray(cands_b), np.asarray(cands_s),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(losses_b), np.asarray(losses_s),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(est_b), np.asarray(est_s),
                               atol=1e-6)
