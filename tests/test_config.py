"""Config system: inheritance chain, merge semantics, schema presence."""

import os

import pytest
import yaml

from nice_slam_tpu.config import load_config, update_recursive

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def cfgpath(*parts):
    return os.path.join(ROOT, "configs", *parts)


def test_update_recursive_nested():
    a = {"x": {"y": 1, "z": 2}, "w": 3}
    update_recursive(a, {"x": {"y": 10}, "v": 4})
    assert a == {"x": {"y": 10, "z": 2}, "w": 3, "v": 4}


def test_inherit_chain_scene_to_base():
    cfg = load_config(cfgpath("Replica", "room0.yaml"), cfgpath("nice_slam.yaml"))
    # leaf values
    assert cfg["data"]["input_folder"].endswith("room0")
    assert cfg["mapping"]["bound"][0] == [-2.9, 8.9]
    # dataset base values
    assert cfg["tracking"]["ignore_edge_W"] == 100
    assert cfg["dataset"] == "replica"
    # mode base values survive the merge
    assert cfg["coarse"] is True
    assert cfg["mapping"]["stage"]["middle"]["middle_lr"] == 0.1
    assert cfg["grid_len"]["fine"] == 0.16


def test_imap_mode_base():
    cfg = load_config(cfgpath("Replica", "room0_imap.yaml"), cfgpath("imap.yaml"))
    assert cfg["occupancy"] is False
    assert cfg["scale"] == 0.1
    assert cfg["rendering"]["N_importance"] == 12
    assert cfg["mapping"]["imap_decoders_lr"] == 0.0002


def test_full_schema_keys_present():
    cfg = load_config(cfgpath("nice_slam.yaml"))
    for key in ["coarse", "sync_method", "scale", "verbose", "occupancy",
                "low_gpu_mem", "grid_len", "pretrained_decoders", "meshing",
                "tracking", "mapping", "cam", "rendering", "data", "model"]:
        assert key in cfg, key
    for key in ["level_set", "resolution", "eval_rec", "clean_mesh",
                "depth_test", "mesh_coarse_level", "clean_mesh_bound_scale",
                "get_largest_components", "color_mesh_extraction_method",
                "remove_small_geometry_threshold"]:
        assert key in cfg["meshing"], key
    for key in ["ignore_edge_W", "ignore_edge_H", "use_color_in_tracking",
                "handle_dynamic", "w_color_loss", "seperate_LR",
                "const_speed_assumption", "no_vis_on_first_frame",
                "gt_camera", "lr", "pixels", "iters", "vis_freq",
                "vis_inside_freq"]:
        assert key in cfg["tracking"], key
    for key in ["color_refine", "middle_iter_ratio", "fine_iter_ratio",
                "every_frame", "BA", "BA_cam_lr", "fix_fine", "fix_color",
                "mesh_freq", "ckpt_freq", "keyframe_every",
                "mapping_window_size", "w_color_loss",
                "frustum_feature_selection", "keyframe_selection_method",
                "lr_first_factor", "lr_factor", "pixels", "iters_first",
                "iters", "stage"]:
        assert key in cfg["mapping"], key
    for stage in ["coarse", "middle", "fine", "color"]:
        for lr in ["decoders_lr", "coarse_lr", "middle_lr", "fine_lr",
                   "color_lr"]:
            assert lr in cfg["mapping"]["stage"][stage]


def test_ba_defaults_match_reference():
    """Reference mode bases ship BA: True for NICE, False for iMAP*
    (/root/reference/configs/nice_slam.yaml:49-50, imap.yaml:49-50) — a
    value parity that round 5 found silently inverted (the 750-frame
    tracked tour diverged without the pose-map joint anchor)."""
    nice = load_config(cfgpath("nice_slam.yaml"))
    assert nice["mapping"]["BA"] is True
    assert nice["mapping"]["BA_cam_lr"] == 0.001
    imap = load_config(cfgpath("imap.yaml"))
    assert imap["mapping"]["BA"] is False
    assert imap["mapping"]["BA_cam_lr"] == 0.0002
    # the synthetic bench fixture opts out: BA's host sync on the refit
    # window poses forfeits the strict loop's dispatch overlap that the
    # perf gates are calibrated against (quality tours use selfcheck --ba)
    box = load_config(cfgpath("Synthetic", "box.yaml"),
                      cfgpath("nice_slam.yaml"))
    assert box["mapping"]["BA"] is False


def test_all_dataset_bases_parse():
    families = {
        "Replica": "replica", "ScanNet": "scannet", "TUM_RGBD": "tum",
        "CoFusion": "cofusion",
    }
    for fam, base in families.items():
        for suffix in ("", "_imap"):
            mode = "nice_slam.yaml" if suffix == "" else "imap.yaml"
            cfg = load_config(cfgpath(fam, f"{base}{suffix}.yaml"),
                              cfgpath(mode))
            assert "dataset" in cfg
            assert "cam" in cfg and "fx" in cfg["cam"]


def test_tum_scene_overrides_cam():
    cfg = load_config(cfgpath("TUM_RGBD", "freiburg1_desk.yaml"),
                      cfgpath("nice_slam.yaml"))
    assert cfg["cam"]["fx"] == 517.3
    assert cfg["cam"]["crop_size"] == [384, 512]
    assert len(cfg["cam"]["distortion"]) == 5
    assert cfg["grid_len"]["fine"] == 0.08  # TUM uses finer grids
