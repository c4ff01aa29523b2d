"""Opt-in coarse-to-fine tracking LR schedule (slam/tracker.py cf_iters /
cf_lr_mult — the tracking-envelope robustness lever, RESULTS.md)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.scene import build_scene
from nice_slam_tpu.ops.render import RenderConfig
from nice_slam_tpu.slam.tracker import TrackerConfig, track_frame


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
        "tracking": {"lr": 0.002, "iters": 8, "pixels": 64,
                     "seperate_LR": False, "w_color_loss": 0.5,
                     "ignore_edge_W": 2, "ignore_edge_H": 2,
                     "handle_dynamic": True, "use_color_in_tracking": True,
                     "const_speed_assumption": True, "gt_camera": False},
    }
    spec, state = build_scene(cfg, nice=True, seed=0)
    rcfg = RenderConfig.from_cfg(cfg)
    tcfg = TrackerConfig.from_cfg(cfg, cam, nice=True)
    rng = np.random.default_rng(0)
    color = jnp.asarray(rng.random((24, 32, 3)), jnp.float32)
    depth = jnp.asarray(1.0 + rng.random((24, 32)), jnp.float32)
    init = jnp.asarray([1.0, 0.01, 0.0, 0.0, 0.1, 0.0, 0.0], jnp.float32)
    key = jax.random.PRNGKey(3)
    return spec, state, tcfg, rcfg, init, color, depth, key


def test_cf_defaults_are_a_noop():
    """cf_iters=0 / cf_lr_mult=1 must reproduce the plain schedule exactly
    (reference-parity default), and an engaged-but-unit multiplier must be
    bitwise identical too."""
    spec, state, tcfg, rcfg, init, color, depth, key = _setup()
    base = track_frame(spec, state, init, color, depth, key, tcfg, rcfg)
    unit = dataclasses.replace(tcfg, cf_iters=4, cf_lr_mult=1.0)
    same = track_frame(spec, state, init, color, depth, key, unit, rcfg)
    np.testing.assert_array_equal(np.asarray(base[0]), np.asarray(same[0]))
    np.testing.assert_array_equal(np.asarray(base[1]), np.asarray(same[1]))


def test_cf_boost_takes_larger_early_steps():
    """With cf engaged, the first cf_iters steps move the pose further
    (Adam's first-step magnitude is ~lr per coordinate), and the boosted
    iterations are exactly the first cf_iters."""
    spec, state, tcfg, rcfg, init, color, depth, key = _setup()
    boosted = dataclasses.replace(tcfg, cf_iters=4, cf_lr_mult=10.0)

    _, _, cams_base, _ = track_frame(
        spec, state, init, color, depth, key, tcfg, rcfg)
    _, _, cams_cf, _ = track_frame(
        spec, state, init, color, depth, key, boosted, rcfg)
    cams_base, cams_cf = np.asarray(cams_base), np.asarray(cams_cf)

    step0_base = np.abs(cams_base[0] - np.asarray(init)).max()
    step0_cf = np.abs(cams_cf[0] - np.asarray(init)).max()
    assert step0_cf > 5 * step0_base, (step0_base, step0_cf)
    # identical sampling => the first iteration's gradient is shared, so
    # the boosted first step is exactly mult x the base first step (Adam
    # step = lr * mhat/(sqrt(vhat)+eps) is linear in lr)
    np.testing.assert_allclose(
        cams_cf[0] - np.asarray(init),
        10.0 * (cams_base[0] - np.asarray(init)), rtol=1e-5, atol=1e-7)
    assert np.isfinite(cams_cf).all()
