"""Tracking operating envelope: ATE vs per-frame camera motion.

Sweeps the synthetic orbit's per-frame angular motion and runs FULL
tracked SLAM (no gt_camera) at each level, reporting ATE RMSE — the
divergence threshold of the default 10-iteration tracking budget
(reference budget: configs/nice_slam.yaml:40-42), and what the opt-in
coarse-to-fine LR schedule (``tracking: {cf_iters, cf_lr_mult}``,
slam/tracker.py) buys on top.  Results land in RESULTS.md.

CLI:
  python -m nice_slam_tpu.tools.track_envelope \
      [--frames 20] [--deg 0.5,1,1.5,2,2.5,3] [--cf_iters 5] [--cf_mult 5]

Prints one JSON line per (motion, mode) with ate_rmse_cm.
"""

from __future__ import annotations

import argparse
import json
import math
import os


def run_once(cfg_base, frames, deg_per_frame, out_dir, cf=None):
    import numpy as np

    from nice_slam_tpu.slam.slam import NiceSLAM
    from nice_slam_tpu.tools.eval_ate import align

    cfg = json.loads(json.dumps(cfg_base))  # deep copy
    cfg["data"]["n_frames"] = frames
    cfg["data"]["orbit_radians"] = math.radians(deg_per_frame) * frames
    cfg["data"]["output"] = out_dir
    if cf is not None:
        cfg["tracking"]["cf_iters"] = cf[0]
        cfg["tracking"]["cf_lr_mult"] = cf[1]

    class Args:
        nice, input_folder, output = True, None, None

    slam = NiceSLAM(cfg, Args())
    slam.run()
    gt = slam.gt_c2w_list[:frames, :3, 3].T
    est = slam.estimate_c2w_list[:frames, :3, 3].T
    _, _, err = align(est, gt)
    return float(np.sqrt(np.mean(err ** 2)))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=20)
    parser.add_argument("--deg", type=str, default="0.5,1.0,1.5,2.0,2.5,3.0",
                        help="comma-separated per-frame motions (degrees)")
    parser.add_argument("--cf_iters", type=int, default=5)
    parser.add_argument("--cf_mult", type=float, default=5.0)
    parser.add_argument("--out", type=str, default="output/envelope")
    parser.add_argument("--skip_cf", action="store_true")
    parser.add_argument(
        "--record", type=str, default=None,
        help="write the envelope rows into this JSON file under key "
             "'envelope' (tests/test_quality_gates.py gates on it)")
    args = parser.parse_args()

    import jax

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from nice_slam_tpu.utils.cache import setup_cache

    setup_cache(here)  # host-fingerprinted partition (utils/cache.py)

    from nice_slam_tpu.config import load_config

    cfg = load_config(os.path.join(here, "configs", "Synthetic", "box.yaml"),
                      os.path.join(here, "configs", "nice_slam.yaml"))
    cfg["coarse"] = False
    cfg["verbose"] = False
    cfg["mapping"]["mesh_freq"] = 10 ** 6
    cfg["mapping"]["ckpt_freq"] = 10 ** 6
    cfg["meshing"]["eval_rec"] = False
    cfg["mapping"]["iters_first"] = 400

    rows = []
    for deg in [float(x) for x in args.deg.split(",")]:
        modes = [("default", None)]
        if not args.skip_cf:
            modes.append(("cf", (args.cf_iters, args.cf_mult)))
        for name, cf in modes:
            out = os.path.join(args.out, f"{name}_{deg:g}")
            ate = run_once(cfg, args.frames, deg, out, cf)
            row = {"deg_per_frame": deg, "mode": name,
                   "ate_rmse_cm": round(ate * 100, 2)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"envelope": rows}))
    if args.record:
        book = {}
        if os.path.exists(args.record):
            with open(args.record) as f:
                book = json.load(f)
        book["envelope"] = {"frames": args.frames,
                            "cf_iters": args.cf_iters,
                            "cf_lr_mult": args.cf_mult, "rows": rows}
        # atomic replace (suite quality gates may read concurrently)
        tmp = args.record + ".tmp"
        with open(tmp, "w") as f:
            json.dump(book, f, indent=1, sort_keys=True)
        os.replace(tmp, args.record)


if __name__ == "__main__":
    main()
