"""Generate the full configs/ tree.

The YAML key schema is API (north-star requirement: identical schema &
inheritance to the reference — SURVEY.md §5.6); per-scene numbers (bounds,
intrinsics, workloads) are dataset facts.  This generator emits every
config programmatically so the tree stays consistent and reviewable.

Run:  python -m nice_slam_tpu.tools.gen_configs [configs_dir]
"""

from __future__ import annotations

import os
import sys

import yaml


def dump(path: str, data: dict, header: str = "") -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        if header:
            f.write(f"# {header}\n")
        yaml.safe_dump(data, f, sort_keys=False, default_flow_style=None)


STAGE_LR = {
    "coarse": {"decoders_lr": 0.0, "coarse_lr": 0.001, "middle_lr": 0.0,
               "fine_lr": 0.0, "color_lr": 0.0},
    "middle": {"decoders_lr": 0.0, "coarse_lr": 0.0, "middle_lr": 0.1,
               "fine_lr": 0.0, "color_lr": 0.0},
    "fine": {"decoders_lr": 0.0, "coarse_lr": 0.0, "middle_lr": 0.005,
             "fine_lr": 0.005, "color_lr": 0.0},
    "color": {"decoders_lr": 0.005, "coarse_lr": 0.0, "middle_lr": 0.005,
              "fine_lr": 0.005, "color_lr": 0.005},
}


def base_nice() -> dict:
    """Mode base: hierarchical-grid NICE-SLAM (counterpart of the
    reference configs/nice_slam.yaml — full key schema)."""
    return {
        "sync_method": "strict",
        "verbose": True,
        "coarse": True,
        "occupancy": True,
        "scale": 1,
        "low_gpu_mem": True,
        "grid_len": {"coarse": 2, "middle": 0.32, "fine": 0.16, "color": 0.16,
                     "bound_divisible": 0.32},
        "pretrained_decoders": {
            "coarse": "pretrained/coarse.pt",
            "middle_fine": "pretrained/middle_fine.pt",
        },
        "model": {"c_dim": 32, "coarse_bound_enlarge": 2,
                  "pos_embedding_method": "fourier"},
        "data": {"dim": 3},
        "cam": {"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0, "cx": 599.5,
                "cy": 339.5, "png_depth_scale": 6553.5, "crop_edge": 0},
        "rendering": {"N_samples": 32, "N_surface": 16, "N_importance": 0,
                      "lindisp": False, "perturb": 0.0},
        "tracking": {
            "device": "tpu:0",
            "ignore_edge_W": 20, "ignore_edge_H": 20,
            "use_color_in_tracking": True, "handle_dynamic": True,
            "vis_freq": 50, "vis_inside_freq": 25,
            "w_color_loss": 0.5, "seperate_LR": False,
            "const_speed_assumption": True, "no_vis_on_first_frame": True,
            "gt_camera": False, "lr": 0.001, "pixels": 200, "iters": 10,
        },
        "mapping": {
            "device": "tpu:0",
            "color_refine": True,
            "middle_iter_ratio": 0.4, "fine_iter_ratio": 0.6,
            "every_frame": 5,
            "BA": False, "BA_cam_lr": 0.001,
            "fix_fine": True, "fix_color": False,
            "no_vis_on_first_frame": True, "no_mesh_on_first_frame": True,
            "no_log_on_first_frame": True,
            "vis_freq": 50, "vis_inside_freq": 25,
            "mesh_freq": 50, "ckpt_freq": 500,
            "keyframe_every": 50, "mapping_window_size": 5,
            "w_color_loss": 0.2,
            "frustum_feature_selection": True,
            "keyframe_selection_method": "overlap",
            "save_selected_keyframes_info": False,
            "lr_first_factor": 5, "lr_factor": 1,
            "pixels": 1000, "iters_first": 1500, "iters": 60,
            "stage": STAGE_LR,
        },
        "meshing": {
            "level_set": 0, "resolution": 256, "eval_rec": False,
            "clean_mesh": True, "depth_test": False,
            "mesh_coarse_level": False, "clean_mesh_bound_scale": 1.02,
            "get_largest_components": False,
            "color_mesh_extraction_method": "direct_point_query",
            "remove_small_geometry_threshold": 0.2,
        },
    }


def base_imap() -> dict:
    """Mode base: iMAP* single-MLP re-implementation (counterpart of
    configs/imap.yaml)."""
    cfg = base_nice()
    cfg.update({
        "coarse": False,
        "occupancy": False,
        "scale": 0.1,
    })
    cfg["meshing"]["level_set"] = 10
    cfg["meshing"]["color_mesh_extraction_method"] = "render_ray_along_normal"
    cfg["tracking"].update({"handle_dynamic": False, "pixels": 5000, "iters": 50})
    cfg["mapping"].update({
        "BA_cam_lr": 0.0002,
        "w_color_loss": 0.05,
        "frustum_feature_selection": False,
        "keyframe_selection_method": "global",
        "pixels": 5000, "iters": 300,
        "imap_decoders_lr": 0.0002,
    })
    cfg["rendering"].update({"N_surface": 0, "N_importance": 12})
    return cfg


# --------------------------------------------------------------------------
# Dataset bases (tracking/mapping workloads + cameras per dataset family)
# --------------------------------------------------------------------------

REPLICA_CAM = {"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0, "cx": 599.5,
               "cy": 339.5, "png_depth_scale": 6553.5, "crop_edge": 0}
SCANNET_CAM = {"H": 480, "W": 640, "fx": 577.590698, "fy": 578.729797,
               "cx": 318.905426, "cy": 242.683609, "png_depth_scale": 1000.0,
               "crop_edge": 10}
AZURE_CAM = {"H": 720, "W": 1280, "fx": 607.4694213867188,
             "fy": 607.4534912109375, "cx": 636.9967041015625,
             "cy": 369.2689514160156, "png_depth_scale": 1000.0, "crop_edge": 0}
COFUSION_CAM = {"H": 480, "W": 640, "fx": 360.0, "fy": 360.0, "cx": 320.0,
                "cy": 240.0, "png_depth_scale": 1.0, "crop_edge": 0}
TUM_CAM = {"H": 480, "W": 640, "fx": 517.3, "fy": 516.5, "cx": 318.6,
           "cy": 255.3, "png_depth_scale": 5000.0, "crop_edge": 0}


def _tracking(**kw):
    base = {"vis_freq": 50, "vis_inside_freq": 25, "ignore_edge_W": 20,
            "ignore_edge_H": 20, "seperate_LR": False,
            "const_speed_assumption": True}
    base.update(kw)
    return base


def _mapping(**kw):
    base = {"every_frame": 5, "vis_freq": 50, "vis_inside_freq": 30,
            "mesh_freq": 50, "ckpt_freq": 500, "keyframe_every": 50,
            "mapping_window_size": 5, "pixels": 1000, "iters_first": 1500,
            "iters": 60}
    base.update(kw)
    return base


DATASET_BASES = {
    # family -> (filename base, nice dict, imap dict)
    "Replica": {
        "file": "replica",
        "nice": {
            "dataset": "replica",
            "meshing": {"eval_rec": True},
            "tracking": _tracking(ignore_edge_W=100, ignore_edge_H=100,
                                  lr=0.001, pixels=200, iters=10),
            "mapping": _mapping(),
            "cam": REPLICA_CAM,
        },
        "imap": {
            "dataset": "replica",
            "meshing": {"eval_rec": True},
            "tracking": _tracking(ignore_edge_W=100, ignore_edge_H=100,
                                  lr=0.0005, pixels=5000, iters=50),
            "mapping": _mapping(pixels=5000, iters=300),
            "cam": REPLICA_CAM,
        },
    },
    "ScanNet": {
        "file": "scannet",
        "nice": {
            "dataset": "scannet",
            "tracking": _tracking(lr=0.0005, pixels=1000, iters=50),
            "mapping": _mapping(mapping_window_size=10, pixels=5000),
            "cam": SCANNET_CAM,
        },
        "imap": {
            "dataset": "scannet",
            "tracking": _tracking(lr=0.002, pixels=5000, iters=50),
            "mapping": _mapping(vis_inside_freq=25, pixels=5000, iters=300),
            "cam": SCANNET_CAM,
        },
    },
    "TUM_RGBD": {
        "file": "tum",
        "nice": {
            "dataset": "tumrgbd",
            "grid_len": {"coarse": 2, "middle": 0.16, "fine": 0.08,
                         "color": 0.08, "bound_divisible": 0.32},
            "tracking": _tracking(seperate_LR=True, gt_camera=False, lr=0.01,
                                  pixels=5000, iters=200, vis_inside_freq=25),
            "mapping": _mapping(every_frame=1, vis_inside_freq=25,
                                mapping_window_size=10, pixels=5000),
            "cam": TUM_CAM,
        },
        "imap": {
            "dataset": "tumrgbd",
            "grid_len": {"coarse": 2, "middle": 0.16, "fine": 0.08,
                         "color": 0.08, "bound_divisible": 0.32},
            "tracking": _tracking(seperate_LR=True, gt_camera=False, lr=0.005,
                                  pixels=5000, iters=200, vis_inside_freq=25),
            "mapping": _mapping(every_frame=1, vis_inside_freq=25,
                                pixels=5000, iters=300),
            "cam": TUM_CAM,
        },
    },
    "CoFusion": {
        "file": "cofusion",
        "nice": {
            "dataset": "cofusion",
            "tracking": _tracking(seperate_LR=True, lr=0.001, pixels=200,
                                  iters=10),
            "mapping": _mapping(),
            "cam": COFUSION_CAM,
        },
        "imap": {
            "dataset": "cofusion",
            "tracking": _tracking(seperate_LR=True, lr=0.0005, pixels=5000,
                                  iters=50),
            "mapping": _mapping(iters=300),
            "cam": COFUSION_CAM,
        },
    },
}

REPLICA_SCENES = {
    "room0": [[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]],
    "room1": [[-7.0, 2.8], [-4.6, 4.3], [-3.0, 2.9]],
    "room2": [[-4.3, 9.5], [-6.7, 5.2], [-6.4, 4.2]],
    "office0": [[-5.5, 5.9], [-6.7, 5.4], [-4.7, 5.3]],
    "office1": [[-5.3, 6.5], [-5.1, 6.0], [-4.5, 5.2]],
    "office2": [[-5.0, 4.6], [-4.4, 6.9], [-2.8, 3.1]],
    "office3": [[-6.7, 5.1], [-7.5, 4.9], [-2.8, 3.5]],
    "office4": [[-3.7, 7.8], [-4.8, 6.7], [-3.7, 4.1]],
}

SCANNET_SCENES = {
    "scene0000": [[-2.0, 11.0], [-2.0, 11.5], [-2.0, 5.5]],
    "scene0059": [[-0.9, 7.3], [-1.0, 9.6], [-1.0, 3.7]],
    "scene0106": [[-1.1, 9.8], [-1.0, 10.0], [-1.0, 4.3]],
    "scene0169": [[-0.2, 9.8], [-1.0, 8.5], [-1.0, 3.4]],
    "scene0181": [[-1.0, 8.9], [-0.9, 8.0], [-1.0, 3.6]],
    "scene0207": [[0.3, 9.9], [-1.0, 8.0], [-1.0, 3.8]],
    "scene0472": [[-0.6, 9.5], [-1.5, 9.5], [-1.5, 3.5]],
}

TUM_SCENES = {
    "freiburg1_desk": {
        "bound": [[-4.6, 2.6], [-3.3, 3.2], [-2.0, 4.9]],
        "mc_bound": [[-2.6, 1.1], [-1.5, 1.5], [-0.6, 2.4]],
        "folder": "rgbd_dataset_freiburg1_desk",
        "cam": {"H": 480, "W": 640, "fx": 517.3, "fy": 516.5, "cx": 318.6,
                "cy": 255.3, "crop_edge": 8, "crop_size": [384, 512],
                "distortion": [0.2624, -0.9531, -0.0054, 0.0026, 1.1633]},
    },
    "freiburg2_xyz": {
        "bound": [[-4.7, 4.3], [-5.9, 1.5], [-2.5, 10.3]],
        "mc_bound": [[-5.0, 13.4], [-5.0, 13.7], [-5.0, 5.0]],
        "folder": "rgbd_dataset_freiburg2_xyz",
        "cam": {"H": 480, "W": 640, "fx": 520.9, "fy": 521.0, "cx": 325.1,
                "cy": 249.7, "crop_edge": 8, "crop_size": [384, 512],
                "distortion": [0.2312, -0.7849, -0.0033, -0.0001, 0.9172]},
    },
    "freiburg3_office": {
        "bound": [[-5.0, 5.0], [-5.0, 5.0], [-5.0, 5.0]],
        "mc_bound": [[-1.6, 1.5], [-2.0, 1.1], [1.4, 4.45]],
        "folder": "rgbd_dataset_freiburg3_long_office_household",
        "cam": {"fx": 535.4, "fy": 539.2, "cx": 320.1, "cy": 247.6,
                "crop_edge": 8, "crop_size": [384, 512]},
    },
}


def scene_leaf(inherit, bound, mc_bound, input_folder, output, cam=None):
    leaf = {
        "inherit_from": inherit,
        "mapping": {"bound": bound, "marching_cubes_bound": mc_bound},
        "data": {"input_folder": input_folder, "output": output},
    }
    if cam:
        leaf["cam"] = cam
    return leaf


def generate(root: str) -> None:
    dump(os.path.join(root, "nice_slam.yaml"), base_nice(),
         "NICE mode base — full schema (keys are API)")
    dump(os.path.join(root, "imap.yaml"), base_imap(),
         "iMAP* mode base — full schema (keys are API)")

    for fam, info in DATASET_BASES.items():
        for mode in ("nice", "imap"):
            suffix = "" if mode == "nice" else "_imap"
            dump(os.path.join(root, fam, f"{info['file']}{suffix}.yaml"),
                 info[mode], f"{fam} dataset base ({mode})")

    for name, bound in REPLICA_SCENES.items():
        for mode in ("", "_imap"):
            out_prefix = "output" if mode == "" else "output_imap"
            dump(
                os.path.join(root, "Replica", f"{name}{mode}.yaml"),
                scene_leaf(
                    f"configs/Replica/replica{mode}.yaml", bound, bound,
                    f"Datasets/Replica/{name}", f"{out_prefix}/Replica/{name}",
                ),
            )

    for name, bound in SCANNET_SCENES.items():
        for mode in ("", "_imap"):
            out_prefix = "output" if mode == "" else "output_imap"
            dump(
                os.path.join(root, "ScanNet", f"{name}{mode}.yaml"),
                scene_leaf(
                    f"configs/ScanNet/scannet{mode}.yaml", bound, bound,
                    f"Datasets/scannet/scans/{name}_00",
                    f"{out_prefix}/scannet/scans/{name}_00",
                ),
            )

    for name, info in TUM_SCENES.items():
        for mode in ("", "_imap"):
            out_prefix = "output" if mode == "" else "output_imap"
            dump(
                os.path.join(root, "TUM_RGBD", f"{name}{mode}.yaml"),
                scene_leaf(
                    f"configs/TUM_RGBD/tum{mode}.yaml", info["bound"],
                    info["mc_bound"],
                    f"Datasets/TUM_RGBD/{info['folder']}",
                    f"{out_prefix}/TUM_RGBD/{info['folder']}",
                    cam=info["cam"],
                ),
            )

    cofusion_bound = [[-4.5, 3.5], [-1.5, 2.0], [-3.0, 2.5]]
    for mode in ("", "_imap"):
        out_prefix = "output" if mode == "" else "output_imap"
        dump(
            os.path.join(root, "CoFusion", f"room4{mode}.yaml"),
            scene_leaf(
                f"configs/CoFusion/cofusion{mode}.yaml", cofusion_bound,
                cofusion_bound, "Datasets/CoFusion/room4",
                f"{out_prefix}/CoFusion/room4",
            ),
        )

    # Apartment (azure capture) — self-contained configs
    apt_bound = [[-5.8, 11.3], [-4.0, 4.5], [-7.9, 4.9]]
    apt = {
        "dataset": "azure",
        "tracking": _tracking(gt_camera=False, lr=0.003, pixels=200, iters=50),
        "mapping": _mapping(mapping_window_size=10, pixels=5000,
                            bound=apt_bound, marching_cubes_bound=apt_bound),
        "cam": AZURE_CAM,
        "data": {"input_folder": "Datasets/Apartment",
                 "output": "output/Apartment"},
        "meshing": {"depth_test": True, "get_largest_components": True},
    }
    dump(os.path.join(root, "Apartment", "apartment.yaml"), apt)
    apt_imap = {
        "dataset": "azure",
        "tracking": _tracking(gt_camera=False, lr=0.001, pixels=5000, iters=50),
        "mapping": _mapping(every_frame=1, mapping_window_size=10, pixels=5000,
                            iters=300, bound=apt_bound,
                            marching_cubes_bound=apt_bound),
        "cam": AZURE_CAM,
        "data": {"input_folder": "Datasets/Apartment",
                 "output": "output_imap/Apartment"},
        "meshing": {"depth_test": True, "get_largest_components": True},
    }
    dump(os.path.join(root, "Apartment", "apartment_imap.yaml"), apt_imap)

    # Demo (500-frame ScanNet snippet)
    demo_bound = [[0.0, 6.5], [0.0, 4.0], [0, 3.5]]
    demo = {
        "dataset": "scannet",
        "sync_method": "loose",
        "coarse": True,
        "verbose": False,
        "meshing": {"resolution": 256},
        "tracking": _tracking(lr=0.0005, pixels=1000, iters=30),
        "mapping": _mapping(every_frame=10, mapping_window_size=10,
                            iters_first=400, iters=10, bound=demo_bound,
                            marching_cubes_bound=demo_bound),
        "cam": SCANNET_CAM,
        "data": {"input_folder": "Datasets/Demo", "output": "output/Demo"},
    }
    dump(os.path.join(root, "Demo", "demo.yaml"), demo)
    demo_imap = {
        "dataset": "scannet",
        "sync_method": "strict",
        "verbose": False,
        "meshing": {"resolution": 256},
        "tracking": _tracking(lr=0.0005, pixels=5000, iters=50),
        "mapping": _mapping(vis_inside_freq=25, pixels=5000, iters_first=1000,
                            iters=30, bound=demo_bound,
                            marching_cubes_bound=demo_bound),
        "cam": SCANNET_CAM,
        "data": {"input_folder": "Datasets/Demo", "output": "output_imap/Demo"},
    }
    dump(os.path.join(root, "Demo", "demo_imap.yaml"), demo_imap)

    # Own-data capture template (azure pipeline)
    own = {
        "dataset": "azure",
        "sync_method": "strict",
        "tracking": _tracking(gt_camera=False, lr=0.003, pixels=1000,
                              iters=50),
        "mapping": _mapping(mapping_window_size=10, pixels=5000,
                            iters_first=1000),
        "cam": AZURE_CAM,
    }
    dump(os.path.join(root, "Own", "own.yaml"), own)
    own_bound = [[-5.8, 11.3], [-4.0, 4.5], [-7.9, 4.9]]
    dump(
        os.path.join(root, "Own", "sample.yaml"),
        scene_leaf("configs/Own/own.yaml", own_bound, own_bound,
                   "Datasets/Own/scene0", "output/Own/scene0", cam=AZURE_CAM),
    )

    # Synthetic procedural fixture (new in this framework; tests + benches)
    syn_bound = [[-2.2, 2.2], [-2.2, 2.2], [-2.2, 2.2]]
    syn = {
        "dataset": "synthetic",
        "verbose": False,
        "tracking": _tracking(ignore_edge_W=8, ignore_edge_H=8, lr=0.001,
                              pixels=200, iters=10),
        "mapping": _mapping(every_frame=5, keyframe_every=5,
                            mapping_window_size=5, pixels=1000,
                            iters_first=300, iters=60, mesh_freq=1000000,
                            ckpt_freq=1000000, bound=syn_bound,
                            marching_cubes_bound=syn_bound),
        "cam": {"H": 120, "W": 160, "fx": 120.0, "fy": 120.0, "cx": 79.5,
                "cy": 59.5, "png_depth_scale": 1.0, "crop_edge": 0},
        "data": {"n_frames": 40, "output": "output/Synthetic/box",
                 "input_folder": ""},
        "meshing": {"resolution": 128},
    }
    dump(os.path.join(root, "Synthetic", "box.yaml"), syn)


if __name__ == "__main__":
    target = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "..", "configs"
    )
    generate(os.path.abspath(target))
    print(f"configs written to {os.path.abspath(target)}")
