#!/usr/bin/env python
"""Capture a jax.profiler device trace of one steady-state optimize_map call
(Replica workload, bench.py's exact configuration) and print a per-category
device-time breakdown parsed from the trace.

Usage: python scripts/profile_map.py [--out /tmp/map_trace] [--iters 60]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

import jax

from nice_slam_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache(here)  # host-fingerprinted partition (utils/cache.py)

import jax.numpy as jnp
import numpy as np


def build(iters):
    from nice_slam_tpu.models.scene import build_scene
    from nice_slam_tpu.ops.render import RenderConfig
    from nice_slam_tpu.slam.keyframes import KeyframeStore
    from nice_slam_tpu.slam.mapper import Mapper, MapperConfig
    from nice_slam_tpu.utils.datasets import Synthetic

    sys.path.insert(0, here)
    import bench

    # reuse bench.py's cfg by constructing it the same way
    cfg = bench_cfg()
    spec, state = build_scene(cfg, nice=True, seed=0)
    rcfg = RenderConfig.from_cfg(cfg)
    mcfg = MapperConfig.from_cfg(cfg, cfg["cam"], nice=True)
    ds = Synthetic(cfg)
    frames = [ds[i] for i in range(6)]
    frames = [(i, jnp.asarray(c), jnp.asarray(d), np.asarray(p))
              for (i, c, d, p) in frames]
    mapper = Mapper(spec, mcfg, rcfg)
    store = KeyframeStore(8, cfg["cam"]["H"], cfg["cam"]["W"])
    for j in range(4):
        _, c, d, p = frames[j]
        store.add(j * 50, c, d, p, p)

    def run(st, i):
        _, c, d, p = frames[4 + (i % 2)]
        mapper.prefetch_selection(200 + i, c, d, p[:3], store)
        new_state, _, losses = mapper.optimize_map(
            st, iters, 1.0, 200 + i, c, d, p, store, p, BA=False)
        return new_state

    return state, run


def bench_cfg():
    cfg = {
        "dataset": "synthetic", "scale": 1, "occupancy": True, "coarse": True,
        "sync_method": "strict", "verbose": False, "low_gpu_mem": False,
        "grid_len": {"coarse": 2, "middle": 0.32, "fine": 0.16, "color": 0.16,
                     "bound_divisible": 0.32},
        "model": {"c_dim": 32, "coarse_bound_enlarge": 2,
                  "pos_embedding_method": "fourier"},
        "data": {"dim": 3, "n_frames": 30,
                 "room": [[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]]},
        "mapping": {
            "bound": [[-2.9, 8.9], [-3.2, 5.5], [-3.5, 3.3]],
            "pixels": 1000, "iters": 60, "iters_first": 1500,
            "every_frame": 5, "keyframe_every": 50,
            "mapping_window_size": 5, "middle_iter_ratio": 0.4,
            "fine_iter_ratio": 0.6, "w_color_loss": 0.2,
            "BA": False, "BA_cam_lr": 0.001, "fix_fine": True,
            "fix_color": False, "frustum_feature_selection": True,
            "keyframe_selection_method": "overlap",
            "lr_first_factor": 5, "lr_factor": 1, "color_refine": True,
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
        "rendering": {"N_samples": 32, "N_surface": 16, "N_importance": 0,
                      "lindisp": False, "perturb": 0.0},
        "cam": {"H": 680, "W": 1200, "fx": 600.0, "fy": 600.0, "cx": 599.5,
                "cy": 339.5, "png_depth_scale": 6553.5, "crop_edge": 0},
        "tracking": {"lr": 0.001, "iters": 10, "pixels": 200,
                     "seperate_LR": False, "w_color_loss": 0.5,
                     "ignore_edge_W": 100, "ignore_edge_H": 100,
                     "handle_dynamic": True, "use_color_in_tracking": True,
                     "const_speed_assumption": True, "gt_camera": False},
    }
    return cfg


CATEGORIES = (
    ("scatter", ("scatter",)),
    ("fold/loop", ("loop_",)),
    ("copy/format", ("copy", "transpose", "bitcast")),
    ("conv/matmul", ("convolution", "dot", "conv")),
)


def parse_trace(out_dir):
    files = glob.glob(os.path.join(out_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        print("no trace files found under", out_dir)
        return
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-side complete events only (pid of TPU device tracks)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower()}
    by_name = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        total += dur
    cats = defaultdict(float)
    for name, dur in by_name.items():
        low = name.lower()
        for cat, keys in CATEGORIES:
            if any(k in low for k in keys):
                cats[cat] += dur
                break
        else:
            cats["other"] += dur
    print(f"trace: {path}")
    print(f"device total: {total:.1f} ms")
    for cat, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {cat:14s} {dur:8.1f} ms  {100*dur/max(total,1e-9):5.1f}%")
    print("top ops:")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur:8.2f} ms  {name}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/map_trace")
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--parse-only", action="store_true")
    args = ap.parse_args()

    if not args.parse_only:
        state, run = build(args.iters)
        # warmup/compile
        st = run(state, 0)
        np.asarray(st.grids["grid_fine"][..., 0, 0])
        with jax.profiler.trace(args.out):
            st = run(st, 1)
            np.asarray(st.grids["grid_fine"][..., 0, 0])
    parse_trace(args.out)


if __name__ == "__main__":
    main()
