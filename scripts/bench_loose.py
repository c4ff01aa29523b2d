#!/usr/bin/env python
"""Measure loose-mode e2e FPS against strict on the SAME workload.

VERDICT r3 #5: loose/free inherited the strict loop's engineering
(device pose list, fused per-frame modules, quantized uploads) — this
script proves the throughput parity claim on the bench's Replica-scale
synthetic workload.

Method: both modes run the identical 61-frame sequence with
iters_first == iters (so the frame-0 init event isn't special and
whole-run wall FPS is directly comparable), one untimed pass to compile,
then a timed pass on a fresh NiceSLAM instance (jit caches are
module-level, frame synthesis is shared via the reader instance).

Usage: python scripts/bench_loose.py [--frames 61]
"""

import argparse
import copy
import os
import sys
import tempfile
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)
sys.path.insert(0, os.path.join(here, "scripts"))

import jax

from nice_slam_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache(here)  # host-fingerprinted partition (utils/cache.py)

import numpy as np  # noqa: E402

from profile_map import bench_cfg  # noqa: E402


def build_cfg(mode: str, n_frames: int):
    cfg = copy.deepcopy(bench_cfg())
    big = 10 ** 9
    cfg["seed"] = 0
    cfg["sync_method"] = mode
    cfg["data"].update({"n_frames": n_frames,
                        "output": tempfile.mkdtemp(prefix="nsb_loose_"),
                        "orbit_radians": 0.3})
    cfg["mapping"].update({
        "iters_first": cfg["mapping"]["iters"],  # no special init event
        "keyframe_every": 5,
        "ckpt_freq": big, "mesh_freq": big, "vis_freq": big,
        "vis_inside_freq": big, "no_vis_on_first_frame": True,
        "no_log_on_first_frame": True, "no_mesh_on_first_frame": True,
    })
    cfg["tracking"].update({"vis_freq": big, "vis_inside_freq": big})
    cfg["meshing"] = None  # throughput of the loop, not meshing
    return cfg


def run_mode(mode: str, n_frames: int, reader=None):
    from nice_slam_tpu.slam.slam import NiceSLAM

    args = argparse.Namespace(nice=True, input_folder=None, output=None)
    fps = None
    for timed in (False, True):
        cfg = build_cfg(mode, n_frames)
        slam = NiceSLAM(cfg, args)
        slam.mesher = None  # throughput of the loop, not meshing
        if reader is not None:
            slam.frame_reader = reader
        else:
            for i in range(n_frames):  # pre-synthesize (1-vCPU host)
                slam.frame_reader[i]
            reader = slam.frame_reader
        t0 = time.perf_counter()
        slam.run()
        np.asarray(slam.state.grids["grid_fine"][..., 0, 0])  # drain
        dt = time.perf_counter() - t0
        fps = (n_frames - 1) / dt
        print(f"{mode:6s} {'timed' if timed else 'compile'} pass: "
              f"{dt:6.2f}s -> {fps:5.2f} FPS")
    return fps, reader


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=61)
    args = ap.parse_args()

    strict_fps, reader = run_mode("strict", args.frames)
    loose_fps, _ = run_mode("loose", args.frames, reader)
    ratio = loose_fps / strict_fps
    print(f"\nstrict {strict_fps:.2f} FPS, loose {loose_fps:.2f} FPS "
          f"-> loose/strict = {ratio:.2f}")


if __name__ == "__main__":
    main()
