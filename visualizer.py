#!/usr/bin/env python
"""Offline run visualizer: replay the tracked trajectory over the mesh.

CLI parity with the reference viewer (reference: visualizer.py:15-37):
    python visualizer.py <config> [--output DIR] [--save_rendering]
                         [--vis_input_frame] [--nice|--imap]

Loads the run's last checkpoint and the latest mesh, replays the estimated
trajectory, and (``--save_rendering``) writes ``{output}/vis.mp4``.  The
reference's interactive Open3D window is replaced by offline native-raycast
rendering (no Open3D in this environment); ``--vis_input_frame`` dumps the
input RGB-D frames alongside.
"""

import argparse
import glob
import os
import time

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser(description="Arguments to visualize the SLAM run.")
    parser.add_argument("config", type=str)
    parser.add_argument("--input_folder", type=str, default=None)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--save_rendering", action="store_true")
    parser.add_argument("--vis_input_frame", action="store_true")
    parser.add_argument("--no_gt_traj", action="store_true")
    parser.add_argument(
        "--online", action="store_true",
        help="force the live Open3D window (default: auto — live when "
             "open3d is importable, offline raycast replay otherwise)")
    parser.add_argument(
        "--frontend", choices=["auto", "open3d", "web", "offline"],
        default="auto",
        help="viewer backend: 'web' serves a live browser viewer over "
             "HTTP (works on headless hosts, tools/webviz.py), 'open3d' "
             "the GUI window, 'offline' the raycast replay")
    parser.add_argument("--port", type=int, default=8765,
                        help="HTTP port for --frontend web")
    parser.add_argument("--host", default="127.0.0.1",
                        help="bind address for --frontend web (loopback by "
                             "default; pass 0.0.0.0 to expose remotely)")
    parser.add_argument("--fps", type=float, default=0.0,
                        help="pace the replay (e.g. 30 for web viewing; "
                             "0 = as fast as possible)")
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--nice", dest="nice", action="store_true")
    group.add_argument("--imap", dest="nice", action="store_false")
    parser.set_defaults(nice=True)
    args = parser.parse_args()

    import torch

    from nice_slam_tpu.config import load_config
    from nice_slam_tpu.tools.viz import make_frontend

    cfg = load_config(
        args.config,
        "configs/nice_slam.yaml" if args.nice else "configs/imap.yaml",
    )
    scale = cfg["scale"]
    output = args.output or cfg["data"]["output"]

    ckptsdir = os.path.join(output, "ckpts")
    ckpts = [os.path.join(ckptsdir, f)
             for f in sorted(os.listdir(ckptsdir)) if "tar" in f]
    if not ckpts:
        raise SystemExit(f"no checkpoints in {ckptsdir}")
    print("Get ckpt :", ckpts[-1])
    ckpt = torch.load(ckpts[-1], map_location="cpu", weights_only=False)
    estimate_c2w_list = np.asarray(ckpt["estimate_c2w_list"], np.float32)
    gt_c2w_list = np.asarray(ckpt["gt_c2w_list"], np.float32)
    N = int(ckpt["idx"])
    estimate_c2w_list[:, :3, 3] /= scale
    gt_c2w_list[:, :3, 3] /= scale

    frontend = make_frontend(
        output, init_pose=estimate_c2w_list[0], save_rendering=args.save_rendering,
        estimate_c2w_list=estimate_c2w_list,
        gt_c2w_list=None if args.no_gt_traj else gt_c2w_list,
        online=True if args.online else None,
        frontend=None if args.frontend == "auto" else args.frontend,
        port=args.port,
        host=args.host,
    )

    frame_reader = None
    if args.vis_input_frame:
        # dump the input RGB-D stream alongside the replay (the reference
        # shows it in a cv2 window, reference visualizer.py:60-71)
        from nice_slam_tpu.utils.datasets import get_dataset

        frame_reader = get_dataset(cfg, args, cfg["scale"])
        os.makedirs(os.path.join(output, "inputs"), exist_ok=True)

    meshes = sorted(glob.glob(f"{output}/mesh/*.ply"))
    mesh_i = 0
    for i in range(0, N + 1):
        if frame_reader is not None and i < len(frame_reader):
            import cv2

            _, color, depth, _ = frame_reader[i]
            panel = (np.clip(color, 0, 1) * 255).astype(np.uint8)
            d = depth / max(float(depth.max()), 1e-6)
            d8 = (np.clip(d, 0, 1) * 255).astype(np.uint8)
            d3 = cv2.applyColorMap(d8, cv2.COLORMAP_PLASMA)
            side = np.concatenate(
                [cv2.cvtColor(panel, cv2.COLOR_RGB2BGR), d3], axis=1
            )
            cv2.imwrite(os.path.join(output, "inputs", f"{i:05d}.jpg"), side)
        # attach the freshest mesh available at this frame (reference
        # visualizer.py:72-79 streams meshes as they appear)
        while (
            mesh_i < len(meshes)
            and os.path.basename(meshes[mesh_i])[:5].isdigit()
            and int(os.path.basename(meshes[mesh_i])[:5]) <= i
        ):
            frontend.update_mesh(meshes[mesh_i])
            mesh_i += 1
        if frontend.renderer is None and meshes:
            frontend.update_mesh(meshes[-1])
        frontend.update_pose(i, estimate_c2w_list[i])
        if args.fps > 0:
            time.sleep(1.0 / args.fps)
        if i % 50 == 0:
            print(f"rendered frame {i}/{N}")

    if args.save_rendering:
        path = os.path.join(output, "vis.mp4")
        frontend.finalize_video(path)
        print(f"video saved at {path}")
    if args.frontend == "web":
        frontend.finalize_video("")  # flags 'done' in the HUD
        print("replay finished; web viewer stays up (ctrl-c to exit)")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            pass


if __name__ == "__main__":
    main()
