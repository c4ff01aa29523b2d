#!/usr/bin/env python
"""CLI entry point.

Usage parity with the reference (reference: run.py:22-41):
    python run.py configs/<scene>.yaml [--nice | --imap]
                  [--input_folder DIR] [--output DIR]

``--nice`` (default) selects the hierarchical-grid model and the
``configs/nice_slam.yaml`` base; ``--imap`` selects the single-MLP iMAP*
mode and ``configs/imap.yaml``.
"""

import argparse
import os
import random

import numpy as np


def setup_seed(seed: int) -> None:
    """Deterministic host RNG seeding (device RNG is keyed explicitly)."""
    np.random.seed(seed)
    random.seed(seed)


def main() -> None:
    parser = argparse.ArgumentParser(
        description="TPU-native NICE-SLAM: dense neural-implicit RGB-D SLAM."
    )
    parser.add_argument("config", type=str, help="path to scene config file")
    parser.add_argument("--input_folder", type=str, default=None,
                        help="override cfg data.input_folder")
    parser.add_argument("--output", type=str, default=None,
                        help="override cfg data.output")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the output folder's last checkpoint")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler trace of the run")
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--nice", dest="nice", action="store_true")
    group.add_argument("--imap", dest="nice", action="store_false")
    parser.set_defaults(nice=True)
    args = parser.parse_args()

    # persistent compile cache: amortize XLA compiles across runs
    import jax

    # optional platform override (registered accelerator plugins can ignore
    # JAX_PLATFORMS; this knob always wins): NICE_SLAM_TPU_PLATFORM=cpu|tpu
    plat = os.environ.get("NICE_SLAM_TPU_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from nice_slam_tpu.utils.cache import setup_cache

    setup_cache(os.path.dirname(os.path.abspath(__file__)))

    from nice_slam_tpu.config import load_config
    from nice_slam_tpu.slam.slam import NiceSLAM

    base = "configs/nice_slam.yaml" if args.nice else "configs/imap.yaml"
    here = os.path.dirname(os.path.abspath(__file__))
    if not os.path.exists(base):
        base = os.path.join(here, base)
    cfg = load_config(args.config, base)

    slam = NiceSLAM(cfg, args)
    if args.resume:
        slam.resume()
    if args.profile:
        trace_dir = os.path.join(slam.output, "jax_trace")
        jax.profiler.start_trace(trace_dir)
        try:
            slam.run()
        finally:
            jax.profiler.stop_trace()
            print(f"INFO: profiler trace written to {trace_dir}")
    else:
        slam.run()


if __name__ == "__main__":
    main()
