"""Mapper components: stage plan, frustum masks, keyframe selection/store."""

import dataclasses

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.slam.keyframes import KeyframeStore
from nice_slam_tpu.slam.mapper import (
    MapperConfig,
    frustum_mask,
    overlap_scores,
    stage_plan_for,
)

CAM = {"H": 60, "W": 80, "fx": 60.0, "fy": 60.0, "cx": 39.5, "cy": 29.5}


def _mcfg(**over):
    base = dict(
        H=60, W=80, fx=60.0, fy=60.0, cx=39.5, cy=29.5,
        pixels=100, iters=60, iters_first=1500, every_frame=5,
        keyframe_every=50, mapping_window_size=5, middle_iter_ratio=0.4,
        fine_iter_ratio=0.6, w_color_loss=0.2, BA=False, BA_cam_lr=0.001,
        fix_fine=True, fix_color=False, frustum_feature_selection=True,
        keyframe_selection_method="overlap", lr_first_factor=5.0,
        lr_factor=1.0, color_refine=True, nice=True, coarse_mapper=False,
        occupancy=True, imap_decoders_lr=0.0,
        stage_lr=tuple(
            (0.0, 0.001, 0.0, 0.0, 0.0) if s == 0 else
            (0.0, 0.0, 0.1, 0.0, 0.0) if s == 1 else
            (0.0, 0.0, 0.005, 0.005, 0.0) if s == 2 else
            (0.005, 0.0, 0.005, 0.005, 0.005)
            for s in range(4)
        ),
    )
    base.update(over)
    return MapperConfig(**base)


def test_stage_plan_default_60():
    plan = stage_plan_for(_mcfg(), 60)
    # joint_iter <= int(60*0.4)=24 -> middle (25 iters);
    # <= int(60*0.6)=36 -> fine (12); rest color (23)
    assert plan == (("middle", 25), ("fine", 12), ("color", 23))
    assert sum(n for _, n in plan) == 60


def test_stage_plan_color_refine_ratios_zero():
    plan = stage_plan_for(_mcfg(), 100, middle_iter_ratio=0.0,
                          fine_iter_ratio=0.0)
    # reference quirk: joint_iter 0 still lands in 'middle' (<= int(0))
    assert plan[0] == ("middle", 1)
    assert plan[2] == ("color", 99)


def test_stage_plan_coarse_and_imap():
    assert stage_plan_for(_mcfg(coarse_mapper=True), 30) == (("coarse", 30),)
    assert stage_plan_for(_mcfg(nice=False), 30) == (("color", 30),)


def _reference_frustum_mask(c2w, depth_np, bound, shape, H, W, fx, fy, cx, cy):
    """Numpy+cv2 reimplementation of the reference's get_mask_from_c2w
    semantics (src/Mapper.py:93-164) for parity checking."""
    nx, ny, nz = shape
    X, Y, Z = np.meshgrid(
        np.linspace(bound[0][0], bound[0][1], nx),
        np.linspace(bound[1][0], bound[1][1], ny),
        np.linspace(bound[2][0], bound[2][1], nz),
        indexing="ij",
    )
    points = np.stack([X, Y, Z], -1).reshape(-1, 3)
    w2c = np.linalg.inv(c2w)
    ones = np.ones((len(points), 1))
    homo = np.concatenate([points, ones], axis=1)
    cam = (w2c @ homo.T).T[:, :3]
    cam[:, 0] *= -1
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    uv = (K @ cam.T).T
    z = uv[:, 2:3] + 1e-5
    uv2 = (uv[:, :2] / z).astype(np.float32)
    depths = cv2.remap(
        depth_np, uv2[:, 0:1], uv2[:, 1:2], interpolation=cv2.INTER_LINEAR
    ).reshape(-1)
    mask = (uv2[:, 0] < W) & (uv2[:, 0] > 0) & (uv2[:, 1] < H) & (uv2[:, 1] > 0)
    depths[depths == 0] = np.max(depths)
    mask = mask & (0 <= -z[:, 0]) & (-z[:, 0] <= depths + 0.5)
    dist = np.sum((points - c2w[:3, 3]) ** 2, axis=1)
    mask |= dist < 0.25
    return mask.reshape(nx, ny, nz)


def test_frustum_mask_matches_cv2_reference():
    rng = np.random.default_rng(0)
    H, W = CAM["H"], CAM["W"]
    depth = (1.0 + rng.random((H, W))).astype(np.float32)
    depth[10:20, 10:20] = 0.0  # simulated depth holes
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [0.1, -0.2, 0.3]
    bound = np.array([[-2.0, 2.0], [-2.0, 2.0], [-2.0, 2.0]], np.float32)
    shape = (9, 8, 7)
    ours = np.asarray(
        frustum_mask(
            jnp.asarray(c2w), jnp.asarray(depth), jnp.asarray(bound), shape,
            H, W, CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
        )
    )
    ref = _reference_frustum_mask(
        c2w, depth, bound, shape, H, W,
        CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"],
    )
    # bilinear boundary pixels can differ by a hair; demand near-exact match
    agreement = np.mean(ours == ref)
    assert agreement > 0.99, f"frustum mask agreement {agreement}"


def test_overlap_scores_direction():
    key = jax.random.PRNGKey(0)
    H, W = CAM["H"], CAM["W"]
    depth = jnp.full((H, W), 2.0)
    color = jnp.zeros((H, W, 3))
    c2w = jnp.eye(4)
    # keyframe 0: same pose -> high overlap; keyframe 1: rotated 180deg
    # about y (looks the other way) -> zero overlap
    flip = jnp.array(
        [[-1.0, 0, 0, 0], [0, 1, 0, 0], [0, 0, -1, 0], [0, 0, 0, 1]]
    )
    kf = jnp.stack([c2w, flip])
    scores = np.asarray(
        overlap_scores(key, color, depth, c2w, kf, H, W,
                       CAM["fx"], CAM["fy"], CAM["cx"], CAM["cy"])
    )
    # the reference's edge=20 margin leaves only the central 40x20 strip of
    # this tiny 80x60 test camera, so same-pose overlap is ~1/6, not ~1
    assert scores[0] > 0.05
    assert scores[1] == 0.0


def test_keyframe_store_roundtrip():
    store = KeyframeStore(4, 8, 10)
    c = np.random.default_rng(0).random((8, 10, 3)).astype(np.float32)
    d = np.ones((8, 10), np.float32)
    p = np.eye(4, dtype=np.float32)
    store.add(0, c, d, p, p)
    p2 = p.copy()
    p2[0, 3] = 5.0
    store.add(50, 2 * c, 2 * d, p2, p2)
    assert len(store) == 2
    colors, depths, poses = store.gather_window([1, 0])
    np.testing.assert_allclose(np.asarray(colors[0]), 2 * c, atol=1e-6)
    np.testing.assert_allclose(np.asarray(poses[1]), p, atol=1e-6)
    store.set_est_c2w(0, p2)
    np.testing.assert_allclose(np.asarray(store.arrays.est_c2w[0]), p2)


def test_keyframe_store_grows_past_capacity():
    """Admission past the initial capacity grows the store instead of
    crashing (decoupled mapping cadence in 'free' sync — VERDICT weak #6)."""
    store = KeyframeStore(2, 8, 10)
    c = np.zeros((8, 10, 3), np.float32)
    d = np.ones((8, 10), np.float32)
    p = np.eye(4, dtype=np.float32)
    for i in range(5):
        ci = c + i
        store.add(i, ci, d, p, p)
    assert len(store) == 5
    assert store.capacity >= 5
    colors, _, poses = store.gather_window([4, 0])
    np.testing.assert_allclose(np.asarray(colors[0]), c + 4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(poses[1]), p, atol=1e-6)


def test_chunked_optimize_map_equals_unsplit(tmp_path):
    """Splitting one logical optimize_map call at visualization boundaries
    (Adam state carried, per-iteration keys folded from the global
    iteration index) must reproduce the UNSPLIT call exactly — enabling
    visualization may not change the optimization trajectory."""
    import jax
    import jax.numpy as jnp

    from nice_slam_tpu.models.scene import build_scene
    from nice_slam_tpu.ops.render import RenderConfig
    from nice_slam_tpu.slam.keyframes import KeyframeStore
    from nice_slam_tpu.slam.mapper import Mapper, MapperConfig
    from nice_slam_tpu.utils.datasets import Synthetic

    cam = {"H": 40, "W": 52, "fx": 40.0, "fy": 40.0, "cx": 25.5, "cy": 19.5,
           "png_depth_scale": 1.0, "crop_edge": 0}
    cfg = {
        "dataset": "synthetic", "scale": 1, "coarse": False, "occupancy": True,
        "grid_len": {"coarse": 2, "middle": 0.8, "fine": 0.4, "color": 0.4,
                     "bound_divisible": 0.8},
        "model": {"c_dim": 8, "coarse_bound_enlarge": 2,
                  "pos_embedding_method": "fourier"},
        "data": {"dim": 3, "n_frames": 3},
        "cam": cam,
        "mapping": {
            "bound": [[-2.2, 2.2]] * 3,
            "pixels": 200, "iters": 12, "iters_first": 12, "every_frame": 1,
            "keyframe_every": 1, "mapping_window_size": 3,
            "middle_iter_ratio": 0.4, "fine_iter_ratio": 0.6,
            "w_color_loss": 0.2, "BA": False, "BA_cam_lr": 0.001,
            "fix_fine": True, "fix_color": False,
            "frustum_feature_selection": True,
            "keyframe_selection_method": "overlap",
            "lr_first_factor": 5, "lr_factor": 1, "color_refine": False,
            "stage": {
                "coarse": {"decoders_lr": 0.0, "coarse_lr": 0.001,
                           "middle_lr": 0.0, "fine_lr": 0.0, "color_lr": 0.0},
                "middle": {"decoders_lr": 0.0, "coarse_lr": 0.0,
                           "middle_lr": 0.1, "fine_lr": 0.0, "color_lr": 0.0},
                "fine": {"decoders_lr": 0.0, "coarse_lr": 0.0,
                         "middle_lr": 0.005, "fine_lr": 0.005,
                         "color_lr": 0.0},
                "color": {"decoders_lr": 0.005, "coarse_lr": 0.0,
                          "middle_lr": 0.005, "fine_lr": 0.005,
                          "color_lr": 0.005},
            },
        },
        "rendering": {"N_samples": 8, "N_surface": 4, "N_importance": 0,
                      "lindisp": False, "perturb": 0.0},
    }
    spec, state = build_scene(cfg, nice=True, seed=0)
    rcfg = RenderConfig.from_cfg(cfg)
    mcfg = MapperConfig.from_cfg(cfg, cam, nice=True)

    ds = Synthetic(cfg)
    store = KeyframeStore(4, cam["H"], cam["W"])
    for j in range(2):
        _, c, d, p = ds[j]
        store.add(j, jnp.asarray(c), jnp.asarray(d), np.asarray(p),
                  np.asarray(p))
    _, c, d, p = ds[2]

    def run(vis_hook, vis_every):
        m = Mapper(spec, mcfg, rcfg, seed=7)
        st, _, losses = m.optimize_map(
            state, 12, 1.0, 2, jnp.asarray(c), jnp.asarray(d), np.asarray(p),
            store, np.asarray(p), BA=False,
            vis_hook=vis_hook, vis_every=vis_every,
        )
        return st, np.asarray(losses)

    calls = []
    st_a, losses_a = run(None, 0)
    st_b, losses_b = run(lambda it, s: calls.append(it), 5)

    assert calls == [0, 5, 10]  # the hook really chunked the call
    np.testing.assert_array_equal(losses_a, losses_b)
    for k in st_a.grids:
        np.testing.assert_array_equal(np.asarray(st_a.grids[k]),
                                      np.asarray(st_b.grids[k]),
                                      err_msg=k)


def test_device_select_positions():
    """On-device overlap window selection (mapper.device_select_positions):
    eligible-only, distinct, in-range picks; shortfall slots come back
    valid=False with in-bounds clamped positions."""
    import jax

    from nice_slam_tpu.slam.mapper import device_select_positions

    # 9 candidate slots (capacity-1), n_kf=8 -> positions 0..6 scoreable
    scores = jnp.asarray([0.5, 0.0, 0.2, 0.9, 0.1, 0.0, 0.3, 0.7, 0.4])
    n_kf = jnp.asarray(8)
    sel, valid = device_select_positions(scores, n_kf, jax.random.PRNGKey(0),
                                         k=3)
    sel, valid = np.asarray(sel), np.asarray(valid)
    assert valid.all()
    assert len(set(sel.tolist())) == 3
    assert all(0 <= p < 7 for p in sel)
    assert all(scores[p] > 0 for p in sel)
    # positions 7,8 (>= n_kf-1) must never be picked even with scores
    for seed in range(5):
        s, v = device_select_positions(scores, n_kf,
                                       jax.random.PRNGKey(seed), k=3)
        assert np.asarray(s).max() < 7

    # shortfall: only one eligible candidate, k=3
    scores2 = jnp.asarray([0.0, 0.4, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    sel2, valid2 = device_select_positions(scores2, n_kf,
                                           jax.random.PRNGKey(1), k=3)
    sel2, valid2 = np.asarray(sel2), np.asarray(valid2)
    assert valid2.sum() == 1
    assert sel2[valid2][0] == 1
    assert (sel2[~valid2] == 0).all()  # clamped, in-bounds
