#!/usr/bin/env python
"""Measure strict vs loose vs free e2e FPS on the SAME workload.

VERDICT r3 #5 / r4 #3: loose/free inherited the strict loop's
engineering (device pose list, fused per-frame modules, quantized
uploads) — this script proves the throughput-parity claim on the
bench's Replica-scale synthetic workload and emits a BENCH-style JSON
artifact (``BENCH_SYNC.json`` at the repo root) that
tests/test_perf_gate.py gates on.

Method: every mode runs the identical 61-frame sequence with
iters_first == iters (so the frame-0 init event isn't special and
whole-run wall FPS is directly comparable), one untimed pass to compile,
then a timed pass on a fresh NiceSLAM instance (jit caches are
module-level, frame synthesis is shared via the reader instance).

The per-event columns are the parity evidence proper: strict, loose and
free run DIFFERENT event counts by design (loose remaps at every//2
cadence, free maps as fast as the mapper thread can poll — reference
src/Mapper.py:550-563), so whole-run FPS mixes schedule semantics with
engineering.  tracking_ms_per_frame / mapping_ms_per_event isolate the
engineering.

Usage: python scripts/bench_loose.py [--frames 61] [--out BENCH_SYNC.json]
"""

import argparse
import copy
import json
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

MODES = ("strict", "loose", "free")


def build_cfg(mode: str, n_frames: int):
    cfg = copy.deepcopy(bench_cfg())
    big = 10 ** 9
    cfg["seed"] = 0
    cfg["sync_method"] = mode
    cfg["data"].update({"n_frames": n_frames,
                        "output": tempfile.mkdtemp(prefix="nsb_sync_"),
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
    fps, timings = None, None
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
        timings = dict(slam.timings)
        print(f"{mode:6s} {'timed' if timed else 'compile'} pass: "
              f"{dt:6.2f}s -> {fps:5.2f} FPS")
    return fps, timings, reader


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=61)
    ap.add_argument("--out", default=os.path.join(here, "BENCH_SYNC.json"))
    args = ap.parse_args()

    results = {}
    reader = None
    for mode in MODES:
        fps, timings, reader = run_mode(mode, args.frames, reader)
        results[mode] = {
            "fps": round(fps, 3),
            "tracking_ms_per_frame":
                round(timings.get("tracking_ms_per_frame", 0.0), 3),
            "mapping_ms_per_event":
                round(timings.get("mapping_ms_per_event", 0.0), 3),
            "coarse_mapping_ms_per_event":
                round(timings.get("coarse_mapping_ms_per_event", 0.0), 3),
            "tracked_frames": timings.get("tracked_frames", 0),
            "mapping_events": timings.get("mapping_events", 0),
            "coarse_mapping_events": timings.get("coarse_mapping_events", 0),
        }

    record = {
        "metric": "sync_mode_fps",
        "unit": "frames/s",
        "frames": args.frames,
        "backend": jax.default_backend(),
        "modes": results,
        "loose_over_strict": round(
            results["loose"]["fps"] / results["strict"]["fps"], 3),
        "free_over_strict": round(
            results["free"]["fps"] / results["strict"]["fps"], 3),
    }
    with open(args.out, "w") as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
