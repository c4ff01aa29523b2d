"""Multi-chip sharding: 8-virtual-device mesh over the real mapping path."""

import argparse
import os

import jax
import numpy as np
import pytest

from nice_slam_tpu.config import load_config

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 virtual devices"
)


def test_sharded_map_step_runs_and_is_finite():
    from nice_slam_tpu.models.scene import build_scene
    from nice_slam_tpu.ops.render import RenderConfig
    from nice_slam_tpu.parallel.sharding import make_mesh, make_sharded_map_step

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
    }
    spec, state = build_scene(cfg, nice=True, seed=0)
    rcfg = RenderConfig.from_cfg(cfg)
    mesh = make_mesh(8)
    assert mesh.size == 8
    step, shard_batch, replicate, init_adam = make_sharded_map_step(
        mesh, spec, "color", rcfg
    )
    rng = np.random.default_rng(0)
    n = 64
    dirs = rng.normal(size=(n, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    args = shard_batch(
        np.zeros((n, 3), np.float32), dirs,
        np.full((n,), 1.5, np.float32), np.full((n, 3), 0.5, np.float32),
    )
    state_r = replicate(state)
    adam = replicate(init_adam(state_r))
    new_state, new_adam, loss = step(state_r, adam, *args)
    assert np.isfinite(float(loss))
    # gradients actually updated the replicated grids identically everywhere
    delta = float(np.abs(np.asarray(new_state.grids["grid_color"])
                         - np.asarray(state.grids["grid_color"])).max())
    assert delta > 0


def test_mapper_engages_mesh_in_slam(tmp_path):
    cfg = load_config(os.path.join(ROOT, "configs", "Synthetic", "box.yaml"),
                      os.path.join(ROOT, "configs", "nice_slam.yaml"))
    cfg["coarse"] = False
    cfg["verbose"] = False
    cfg["data"]["n_frames"] = 6
    cfg["data"]["output"] = str(tmp_path)
    cfg["cam"].update({"H": 60, "W": 80, "fx": 60.0, "fy": 60.0,
                       "cx": 39.5, "cy": 29.5})
    cfg["tracking"].update({"pixels": 100, "iters": 4, "gt_camera": True})
    cfg["mapping"].update({"pixels": 320, "iters_first": 20, "iters": 10,
                           "every_frame": 5, "keyframe_every": 5,
                           "mesh_freq": 10 ** 6, "ckpt_freq": 10 ** 6})
    cfg["rendering"].update({"N_samples": 8, "N_surface": 4})

    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)
    slam = NiceSLAM(cfg, args)
    assert slam.mapper.mesh is not None and slam.mapper.mesh.size == 8
    slam.run()
    assert slam.mapping_idx == 5


def _tiny_scene():
    from nice_slam_tpu.models.scene import build_scene
    from nice_slam_tpu.ops.render import RenderConfig

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
    }
    spec, state = build_scene(cfg, nice=True, seed=0)
    return spec, state, RenderConfig.from_cfg(cfg)


def test_sharded_lattice_eval_matches_single_device():
    """Mesher occupancy queries sharded over 8 devices must equal the
    single-device result (VERDICT r1 next #7)."""
    from nice_slam_tpu.parallel.sharding import make_mesh
    from nice_slam_tpu.utils.mesher import _eval_chunk

    spec, state, _ = _tiny_scene()
    rng = np.random.default_rng(3)
    pts = rng.uniform(-2.4, 2.4, (4096, 3)).astype(np.float32)
    import jax.numpy as jnp

    single = np.asarray(_eval_chunk(spec, state, jnp.asarray(pts), "fine",
                                    None))
    sharded = np.asarray(_eval_chunk(spec, state, jnp.asarray(pts), "fine",
                                     make_mesh(8)))
    np.testing.assert_allclose(sharded, single, atol=1e-5)


def test_sharded_map_call_matches_unsharded(monkeypatch):
    """The FULL jitted optimize_map call with the ray batch sharded over 8
    devices must match the unsharded call numerically (scene replicated,
    gradient psum over the dp axis).  f32 reduction-order differences are
    the only allowed divergence — so pin the f32 grid-gradient buffer
    (the production bf16 buffer adds rounding that varies with the
    sharded accumulation order; its tolerance is covered in
    test_interp.test_block_scatter_bf16_grad_within_tolerance)."""
    import jax.numpy as jnp

    from nice_slam_tpu.ops import interp as interp_mod

    monkeypatch.setattr(interp_mod, "_DGRAD_BF16", False)

    from nice_slam_tpu.slam.mapper import MapperConfig, optimize_map_jit
    from nice_slam_tpu.parallel.sharding import make_mesh

    spec, state, rcfg = _tiny_scene()
    cam = {"H": 48, "W": 64, "fx": 48.0, "fy": 48.0, "cx": 31.5, "cy": 23.5}
    cfg_m = {
        "pixels": 256, "iters": 3, "iters_first": 3, "every_frame": 1,
        "keyframe_every": 1, "mapping_window_size": 2,
        "middle_iter_ratio": 0.4, "fine_iter_ratio": 0.7,
        "w_color_loss": 0.2, "BA": False, "BA_cam_lr": 0.001,
        "fix_fine": True, "fix_color": False,
        "frustum_feature_selection": False,
        "keyframe_selection_method": "global", "lr_first_factor": 5,
        "lr_factor": 1, "color_refine": False,
        "stage": {s: {"decoders_lr": 0.001, "coarse_lr": 0.001,
                      "middle_lr": 0.01, "fine_lr": 0.01, "color_lr": 0.01}
                  for s in ("coarse", "middle", "fine", "color")},
    }
    mcfg = MapperConfig.from_cfg(
        {"mapping": cfg_m, "occupancy": True}, cam, nice=True)

    rng = np.random.default_rng(0)
    F = 2
    colors = jnp.asarray(rng.random((F, 48, 64, 3)), jnp.float32)
    depths = jnp.asarray(1.0 + rng.random((F, 48, 64)), jnp.float32)
    c2w = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    fixed = jnp.asarray(c2w)
    cams = jnp.zeros((F, 7), jnp.float32).at[:, 0].set(1.0)
    key = jax.random.PRNGKey(7)
    plan = (("middle", 1), ("fine", 1), ("color", 1))

    outs = {}
    for name, mesh in [("single", None), ("sharded", make_mesh(8))]:
        new_state, _, losses, _ = optimize_map_jit(
            spec, state, colors, depths, fixed, cams,
            jnp.zeros((F,), jnp.float32), jnp.ones((F,), bool), None,
            jnp.asarray(1.0, jnp.float32), key, None, mcfg, rcfg, plan,
            False, 128, mesh,
        )
        outs[name] = (np.asarray(losses),
                      {k: np.asarray(v) for k, v in new_state.grids.items()})

    l1, g1 = outs["single"]
    l2, g2 = outs["sharded"]
    np.testing.assert_allclose(l2, l1, rtol=2e-4)
    for k in g1:
        np.testing.assert_allclose(g2[k], g1[k], atol=5e-5)
