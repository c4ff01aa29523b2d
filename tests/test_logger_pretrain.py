"""Checkpoint serialization round-trips and pretrained-decoder import."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from nice_slam_tpu.models import decoders as D
from nice_slam_tpu.models.scene import build_scene
from nice_slam_tpu.utils.logger import (
    decoders_from_state_dict,
    decoders_to_state_dict,
    grid_from_torch_layout,
    grid_to_torch_layout,
)


def _cfg():
    return {
        "scale": 1, "coarse": True, "occupancy": True,
        "grid_len": {"coarse": 2, "middle": 0.32, "fine": 0.16, "color": 0.16,
                     "bound_divisible": 0.32},
        "model": {"c_dim": 8, "coarse_bound_enlarge": 2,
                  "pos_embedding_method": "fourier"},
        "data": {"dim": 3},
        "mapping": {"bound": [[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]]},
    }


def test_grid_layout_roundtrip():
    g = np.random.default_rng(0).random((5, 6, 7, 4)).astype(np.float32)
    t = grid_to_torch_layout(g)
    assert tuple(t.shape) == (1, 4, 7, 6, 5)  # [1, C, Z, Y, X]
    back = grid_from_torch_layout(t)
    np.testing.assert_allclose(back, g)


def test_decoder_state_dict_roundtrip_nice():
    spec, state = build_scene(_cfg(), nice=True, seed=3)
    sd = decoders_to_state_dict(spec, state.decoders)
    # torch naming convention used by the reference checkpoints
    assert "middle_decoder.pts_linears.0.weight" in sd
    assert "fine_decoder.fc_c.0.weight" in sd
    assert "color_decoder.output_linear.bias" in sd
    assert "coarse_decoder.pts_linears.0.weight" in sd
    assert "middle_decoder.embedder._B" in sd
    # weight transposed to torch (out, in)
    w = sd["middle_decoder.pts_linears.0.weight"]
    assert tuple(w.shape)[::-1] == state.decoders["middle"]["pts_linears"][0]["w"].shape

    restored = decoders_from_state_dict(spec, sd, state.decoders)
    p = jnp.asarray(np.random.default_rng(1).uniform(-0.5, 0.5, (7, 3)),
                    jnp.float32)
    r1 = D.apply_nice(state.decoders, spec.decoder, p, state.grids,
                      state.bound, state.coarse_bound, "color")
    r2 = D.apply_nice(restored, spec.decoder, p, state.grids, state.bound,
                      state.coarse_bound, "color")
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-6)


def test_pretrain_import_key_surgery(tmp_path):
    """ConvONet .pt loading with the reference's prefix conventions
    (src/NICE_SLAM.py:159-190): middle_fine.pt holds the middle decoder
    under 'decoder.coarse_*' and fine under 'decoder.fine_*'."""
    from nice_slam_tpu.models.pretrain import load_pretrain

    cfg = _cfg()
    spec, state = build_scene(cfg, nice=True, seed=4)

    # build a fake middle_fine checkpoint from a differently-seeded scene
    spec2, state2 = build_scene(cfg, nice=True, seed=99)
    model = {}

    def emit(params, prefix):
        model[f"decoder.{prefix}embedder._B"] = torch.from_numpy(
            np.asarray(params["embedder_B"]))
        for i, l in enumerate(params["pts_linears"]):
            model[f"decoder.{prefix}pts_linears.{i}.weight"] = torch.from_numpy(
                np.asarray(l["w"]).T.copy())
            model[f"decoder.{prefix}pts_linears.{i}.bias"] = torch.from_numpy(
                np.asarray(l["b"]))
        for i, l in enumerate(params.get("fc_c", [])):
            model[f"decoder.{prefix}fc_c.{i}.weight"] = torch.from_numpy(
                np.asarray(l["w"]).T.copy())
            model[f"decoder.{prefix}fc_c.{i}.bias"] = torch.from_numpy(
                np.asarray(l["b"]))
        model[f"decoder.{prefix}output_linear.weight"] = torch.from_numpy(
            np.asarray(params["output_linear"]["w"]).T.copy())
        model[f"decoder.{prefix}output_linear.bias"] = torch.from_numpy(
            np.asarray(params["output_linear"]["b"]))

    emit(state2.decoders["middle"], "coarse_")  # middle lives under 'coarse_'
    emit(state2.decoders["fine"], "fine_")
    model["encoder.something"] = torch.zeros(3)  # must be ignored
    mf = tmp_path / "middle_fine.pt"
    torch.save({"model": model}, mf)

    cfg["pretrained_decoders"] = {"middle_fine": str(mf)}
    new_state = load_pretrain(cfg, spec, state, verbose=False)

    np.testing.assert_allclose(
        np.asarray(new_state.decoders["middle"]["pts_linears"][0]["w"]),
        np.asarray(state2.decoders["middle"]["pts_linears"][0]["w"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.decoders["fine"]["output_linear"]["w"]),
        np.asarray(state2.decoders["fine"]["output_linear"]["w"]), atol=1e-6,
    )
    # color decoder untouched
    np.testing.assert_allclose(
        np.asarray(new_state.decoders["color"]["output_linear"]["w"]),
        np.asarray(state.decoders["color"]["output_linear"]["w"]), atol=0,
    )


def test_pretrain_import_real_blob_structure_full_coverage(tmp_path):
    """Fixture checkpoints with the exact REAL ConvONet blob structure
    (VERDICT r2 next #6): ``{'model': state_dict}`` containing encoder.*
    tensors plus 'decoder.<param>' (coarse.pt) / 'decoder.coarse_<param>' +
    'decoder.fine_<param>' (middle_fine.pt), torch (out,in) Linear weights.
    A mounted real blob must import first try: assert EVERY decoder
    parameter receives a checkpoint value and EVERY decoder key is
    consumed (no silent drops)."""
    from nice_slam_tpu.models.pretrain import (
        apply_state_dict,
        load_pretrain,
        surgery_coarse,
        surgery_middle_fine,
    )

    cfg = _cfg()
    spec, state = build_scene(cfg, nice=True, seed=4)
    spec2, state2 = build_scene(cfg, nice=True, seed=123)

    def emit(model, params, prefix):
        if "embedder_B" in params:
            model[f"{prefix}embedder._B"] = torch.from_numpy(
                np.asarray(params["embedder_B"]))
        for i, l in enumerate(params["pts_linears"]):
            model[f"{prefix}pts_linears.{i}.weight"] = torch.from_numpy(
                np.asarray(l["w"]).T.copy())
            model[f"{prefix}pts_linears.{i}.bias"] = torch.from_numpy(
                np.asarray(l["b"]))
        for i, l in enumerate(params.get("fc_c", [])):
            model[f"{prefix}fc_c.{i}.weight"] = torch.from_numpy(
                np.asarray(l["w"]).T.copy())
            model[f"{prefix}fc_c.{i}.bias"] = torch.from_numpy(
                np.asarray(l["b"]))
        model[f"{prefix}output_linear.weight"] = torch.from_numpy(
            np.asarray(params["output_linear"]["w"]).T.copy())
        model[f"{prefix}output_linear.bias"] = torch.from_numpy(
            np.asarray(params["output_linear"]["b"]))

    # coarse.pt: 'decoder.' + MLP_no_xyz params, plus ConvONet encoder noise
    coarse_model = {"encoder.fc_pos.weight": torch.zeros(4, 4),
                    "encoder.blocks.0.fc_0.bias": torch.zeros(4)}
    emit(coarse_model, state2.decoders["coarse"], "decoder.")
    coarse_pt = tmp_path / "coarse.pt"
    torch.save({"model": coarse_model}, coarse_pt)

    # middle_fine.pt: middle under 'decoder.coarse_', fine under 'decoder.fine_'
    mf_model = {"encoder.unet3d.final_conv.weight": torch.zeros(2, 2)}
    emit(mf_model, state2.decoders["middle"], "decoder.coarse_")
    emit(mf_model, state2.decoders["fine"], "decoder.fine_")
    mf_pt = tmp_path / "middle_fine.pt"
    torch.save({"model": mf_model}, mf_pt)

    # surgery + apply: full coverage both directions
    coarse_sd = surgery_coarse({k: v for k, v in coarse_model.items()})
    new_coarse, used, missing = apply_state_dict(
        state.decoders["coarse"], coarse_sd)
    assert not missing, f"decoder params without checkpoint values: {missing}"
    assert used == set(coarse_sd), f"unconsumed: {set(coarse_sd) - used}"

    middle_sd, fine_sd = surgery_middle_fine(mf_model)
    for which, sd in (("middle", middle_sd), ("fine", fine_sd)):
        newp, used, missing = apply_state_dict(state.decoders[which], sd)
        assert not missing, f"{which}: params missing values: {missing}"
        assert used == set(sd), f"{which}: unconsumed: {set(sd) - used}"

    # end-to-end through load_pretrain: values land bit-exact
    cfg["pretrained_decoders"] = {"coarse": str(coarse_pt),
                                  "middle_fine": str(mf_pt)}
    new_state = load_pretrain(cfg, spec, state, verbose=False)
    for which in ("coarse", "middle", "fine"):
        ref = state2.decoders[which]
        got = new_state.decoders[which]
        np.testing.assert_allclose(
            np.asarray(got["pts_linears"][0]["w"]),
            np.asarray(ref["pts_linears"][0]["w"]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(got["output_linear"]["b"]),
            np.asarray(ref["output_linear"]["b"]), atol=1e-6)


def test_pretrain_improves_first_frame_convergence():
    """Quantify what the self-pretrained decoder blobs buy (VERDICT r1
    next #8): identical first-frame mapping with pretrained vs random-init
    decoders; the priors must not hurt, and the comparison is printed so
    regressions in the blobs are visible."""
    import os

    import pytest

    from nice_slam_tpu.models.pretrain import load_pretrain
    from nice_slam_tpu.ops.render import RenderConfig, render_img
    from nice_slam_tpu.slam.keyframes import KeyframeStore
    from nice_slam_tpu.slam.mapper import Mapper, MapperConfig
    from nice_slam_tpu.utils.datasets import Synthetic

    root = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
    mf = os.path.join(root, "pretrained", "middle_fine.pt")
    if not os.path.exists(mf):
        pytest.skip("pretrained blobs not present")

    cam = {"H": 60, "W": 80, "fx": 60.0, "fy": 60.0, "cx": 39.5, "cy": 29.5,
           "png_depth_scale": 1.0, "crop_edge": 0}
    cfg = {
        "dataset": "synthetic", "scale": 1, "coarse": False, "occupancy": True,
        "grid_len": {"coarse": 2, "middle": 0.32, "fine": 0.16,
                     "color": 0.16, "bound_divisible": 0.32},
        "model": {"c_dim": 32, "coarse_bound_enlarge": 2,
                  "pos_embedding_method": "fourier"},
        "data": {"dim": 3, "n_frames": 2},
        "cam": cam,
        "mapping": {
            "bound": [[-2.2, 2.2]] * 3,
            "pixels": 500, "iters": 30, "iters_first": 30, "every_frame": 1,
            "keyframe_every": 1, "mapping_window_size": 2,
            "middle_iter_ratio": 0.4, "fine_iter_ratio": 0.6,
            "w_color_loss": 0.2, "BA": False, "BA_cam_lr": 0.001,
            "fix_fine": True, "fix_color": False,
            "frustum_feature_selection": False,
            "keyframe_selection_method": "global",
            "lr_first_factor": 5, "lr_factor": 1, "color_refine": False,
            "stage": {
                s: {"decoders_lr": 0.001, "coarse_lr": 0.001,
                    "middle_lr": 0.1 if s == "middle" else 0.005,
                    "fine_lr": 0.005, "color_lr": 0.005}
                for s in ("coarse", "middle", "fine", "color")
            },
        },
        "rendering": {"N_samples": 12, "N_surface": 6, "N_importance": 0,
                      "lindisp": False, "perturb": 0.0},
    }
    spec, state_fresh = build_scene(cfg, nice=True, seed=0)
    cfg_p = dict(cfg)
    cfg_p["pretrained_decoders"] = {"middle_fine": mf}
    state_pre = load_pretrain(cfg_p, spec, state_fresh, verbose=False)

    ds = Synthetic(cfg)
    _, color, depth, c2w = ds[0]
    rcfg = RenderConfig.from_cfg(cfg)
    mcfg = MapperConfig.from_cfg(cfg, cam, nice=True)

    results = {}
    for name, st in [("fresh", state_fresh), ("pretrained", state_pre)]:
        mapper = Mapper(spec, mcfg, rcfg, seed=5)
        store = KeyframeStore(4, cam["H"], cam["W"])
        new_state, _, losses = mapper.optimize_map(
            st, 30, 5.0, 0, color, depth, c2w, store, c2w, BA=False,
        )
        d, _, _ = render_img(
            spec, new_state, jnp.asarray(c2w), cam["H"], cam["W"],
            cam["fx"], cam["fy"], cam["cx"], cam["cy"], "color",
            gt_depth=jnp.asarray(depth), rcfg=rcfg,
        )
        l1 = float(np.mean(np.abs(np.asarray(d) - depth)[depth > 0]))
        results[name] = {"first_loss": float(losses[0]),
                         "final_loss": float(losses[-1]), "depth_l1": l1}
        assert np.isfinite(losses).all()

    print("pretrain-vs-fresh first-frame:", results)
    # priors must not make first-frame mapping materially worse
    assert results["pretrained"]["depth_l1"] < max(
        1.5 * results["fresh"]["depth_l1"], 0.35)
