"""Absolute-trajectory-error evaluation (TUM protocol).

Metric parity with the reference harness (src/tools/eval_ate.py): greedy
nearest-timestamp association, Horn closed-form SE(3) alignment with the
det-sign reflection guard, and RMSE/mean/median/std/min/max of the aligned
translational error; ScanNet NaN/Inf ground-truth poses masked out; the
aligned-trajectory plot saved next to the output.

CLI: python -m nice_slam_tpu.tools.eval_ate <config> [--output DIR]
     [--nice|--imap]
Reads the last checkpoint of the run like the reference (:281-298).
"""

from __future__ import annotations

import argparse
import os
from typing import Dict, Tuple

import numpy as np


def associate(
    first_list: Dict[float, np.ndarray],
    second_list: Dict[float, np.ndarray],
    offset: float = 0.0,
    max_difference: float = 0.02,
):
    """Greedy closest-timestamp matching (TUM tooling; reference :11-41)."""
    first_keys = set(first_list.keys())
    second_keys = set(second_list.keys())
    potential = sorted(
        (abs(a - (b + offset)), a, b)
        for a in first_keys
        for b in second_keys
        if abs(a - (b + offset)) < max_difference
    )
    matches = []
    for _, a, b in potential:
        if a in first_keys and b in second_keys:
            first_keys.remove(a)
            second_keys.remove(b)
            matches.append((a, b))
    matches.sort()
    return matches


def align(model: np.ndarray, data: np.ndarray):
    """Horn closed-form alignment of two (3, N) trajectories.

    Returns (rot (3,3), trans (3,1), per-point translational error (N,)).
    Reference :44-78.
    """
    model_zc = model - model.mean(axis=1, keepdims=True)
    data_zc = data - data.mean(axis=1, keepdims=True)
    W = model_zc @ data_zc.T
    U, _, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(axis=1, keepdims=True) - rot @ model.mean(
        axis=1, keepdims=True
    )
    err = rot @ model + trans - data
    trans_error = np.sqrt(np.sum(err * err, axis=0))
    return rot, trans, trans_error


def evaluate_ate(
    first_list: Dict[float, np.ndarray],
    second_list: Dict[float, np.ndarray],
    plot: str = "",
    offset: float = 0.0,
    scale: float = 1.0,
    max_difference: float = 0.02,
) -> Dict[str, float]:
    matches = associate(first_list, second_list, offset, max_difference)
    if len(matches) < 2:
        raise ValueError(
            "Couldn't find matching timestamp pairs between groundtruth and "
            "estimated trajectory!"
        )
    first_xyz = np.array([first_list[a][:3] for a, _ in matches], float).T
    second_xyz = np.array(
        [np.asarray(second_list[b][:3], float) * scale for _, b in matches]
    ).T
    rot, trans, trans_error = align(second_xyz, first_xyz)

    if plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        second_aligned = rot @ second_xyz + trans
        ate = float(np.sqrt(np.mean(trans_error**2)))
        fig, ax = plt.subplots()
        ax.set_title(f"len:{len(trans_error)} ATE RMSE:{ate:.6f} m")
        ax.plot(first_xyz[0], first_xyz[1], "-", color="black",
                label="ground truth")
        ax.plot(second_aligned[0], second_aligned[1], "-", color="blue",
                label="estimated")
        ax.legend()
        ax.set_xlabel("x [m]")
        ax.set_ylabel("y [m]")
        plt.savefig(plot, dpi=90)
        plt.close(fig)

    return {
        "compared_pose_pairs": len(trans_error),
        "absolute_translational_error.rmse": float(
            np.sqrt(np.mean(trans_error**2))
        ),
        "absolute_translational_error.mean": float(np.mean(trans_error)),
        "absolute_translational_error.median": float(np.median(trans_error)),
        "absolute_translational_error.std": float(np.std(trans_error)),
        "absolute_translational_error.min": float(np.min(trans_error)),
        "absolute_translational_error.max": float(np.max(trans_error)),
    }


def convert_poses(
    c2w_list: np.ndarray, N: int, scale: float, gt: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """4x4 pose array -> [t, quat] vectors with NaN/Inf GT masking
    (reference :239-256)."""
    from nice_slam_tpu.ops.geometry import tensor_from_pose

    poses = []
    mask = np.ones(N + 1, bool)
    for idx in range(N + 1):
        c2w = np.array(c2w_list[idx], np.float64)
        if gt and (np.isinf(c2w).any() or np.isnan(c2w).any()):
            mask[idx] = False
            continue
        c2w[:3, 3] /= scale
        poses.append(np.asarray(tensor_from_pose(c2w.astype(np.float32),
                                                 Tquad=True)))
    return np.stack(poses), mask


def evaluate(poses_gt: np.ndarray, poses_est: np.ndarray, plot: str):
    N = poses_gt.shape[0]
    gt_dict = {i: poses_gt[i] for i in range(N)}
    est_dict = {i: poses_est[i] for i in range(poses_est.shape[0])}
    results = evaluate_ate(gt_dict, est_dict, plot)
    print(results)
    return results


def main() -> None:
    import torch

    from nice_slam_tpu.config import load_config

    parser = argparse.ArgumentParser(
        description="Arguments to eval the tracking ATE."
    )
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    group = parser.add_mutually_exclusive_group()
    group.add_argument("--nice", dest="nice", action="store_true")
    group.add_argument("--imap", dest="nice", action="store_false")
    parser.set_defaults(nice=True)
    args = parser.parse_args()

    cfg = load_config(
        args.config,
        "configs/nice_slam.yaml" if args.nice else "configs/imap.yaml",
    )
    scale = cfg["scale"]
    output = args.output or cfg["data"]["output"]
    ckptsdir = os.path.join(output, "ckpts")
    ckpts = [
        os.path.join(ckptsdir, f)
        for f in sorted(os.listdir(ckptsdir))
        if "tar" in f
    ]
    if not ckpts:
        raise SystemExit(f"no checkpoints in {ckptsdir}")
    print("Get ckpt :", ckpts[-1])
    ckpt = torch.load(ckpts[-1], map_location="cpu", weights_only=False)
    estimate_c2w_list = np.asarray(ckpt["estimate_c2w_list"])
    gt_c2w_list = np.asarray(ckpt["gt_c2w_list"])
    N = int(ckpt["idx"])
    poses_gt, mask = convert_poses(gt_c2w_list, N, scale)
    poses_est, _ = convert_poses(estimate_c2w_list, N, scale, gt=False)
    poses_est = poses_est[mask]
    evaluate(poses_gt, poses_est, plot=os.path.join(output, "eval_ate_plot.png"))


if __name__ == "__main__":
    main()
