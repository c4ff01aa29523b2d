"""Per-iteration residual visualizer (L6).

Same artifact as the reference (src/utils/Visualizer.py:24-107): every
(``freq`` frames, ``inside_freq`` iterations) render the full frame at the
current pose estimate and save a 2x3 panel — GT / rendered / residual for
depth (top) and RGB (bottom) — as ``{idx:05d}_{iter:04d}.jpg``.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from nice_slam_tpu.models.scene import SceneSpec, SceneState
from nice_slam_tpu.ops.geometry import pose_from_tensor
from nice_slam_tpu.ops.render import RenderConfig, render_img


class Visualizer:
    def __init__(
        self,
        freq: int,
        inside_freq: int,
        vis_dir: str,
        spec: SceneSpec,
        rcfg: RenderConfig,
        cam: dict,
        verbose: bool = False,
    ):
        self.freq = freq
        self.inside_freq = inside_freq
        self.vis_dir = vis_dir
        self.spec = spec
        self.rcfg = rcfg
        self.cam = cam
        self.verbose = verbose
        os.makedirs(vis_dir, exist_ok=True)

    def vis(
        self,
        idx: int,
        iter: int,
        gt_depth: np.ndarray,
        gt_color: np.ndarray,
        c2w_or_tensor,
        state: SceneState,
    ) -> Optional[str]:
        """Render and dump a residual panel if this (frame, iter) is due."""
        if not (idx % self.freq == 0 and iter % self.inside_freq == 0):
            return None
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        c2w_or_tensor = np.asarray(c2w_or_tensor)
        if c2w_or_tensor.ndim == 1:  # [quat, trans] tensor
            c2w = np.asarray(pose_from_tensor(c2w_or_tensor))
            c2w = np.concatenate([c2w, np.array([[0, 0, 0, 1.0]], np.float32)], 0)
        else:
            c2w = c2w_or_tensor

        gt_depth = np.asarray(gt_depth)
        gt_color = np.asarray(gt_color)
        H, W = gt_depth.shape
        depth, _, color = render_img(
            self.spec, state, c2w, H, W,
            self.cam["fx"], self.cam["fy"], self.cam["cx"], self.cam["cy"],
            stage="color", gt_depth=gt_depth, rcfg=self.rcfg,
        )
        depth = np.asarray(depth)
        color = np.asarray(color)

        depth_res = np.abs(gt_depth - depth)
        depth_res[gt_depth == 0.0] = 0.0
        color_res = np.abs(gt_color - color)
        color_res[gt_depth == 0.0] = 0.0

        max_depth = float(np.max(gt_depth)) or 1.0
        fig, axs = plt.subplots(2, 3, figsize=(12, 6))
        for ax_row in axs:
            for ax in ax_row:
                ax.set_xticks([])
                ax.set_yticks([])
        axs[0, 0].imshow(gt_depth, cmap="plasma", vmin=0, vmax=max_depth)
        axs[0, 0].set_title("Input Depth")
        axs[0, 1].imshow(depth, cmap="plasma", vmin=0, vmax=max_depth)
        axs[0, 1].set_title("Generated Depth")
        axs[0, 2].imshow(depth_res, cmap="plasma", vmin=0, vmax=max_depth)
        axs[0, 2].set_title("Depth Residual")
        axs[1, 0].imshow(np.clip(gt_color, 0, 1))
        axs[1, 0].set_title("Input RGB")
        axs[1, 1].imshow(np.clip(color, 0, 1))
        axs[1, 1].set_title("Generated RGB")
        axs[1, 2].imshow(np.clip(color_res, 0, 1))
        axs[1, 2].set_title("RGB Residual")
        plt.subplots_adjust(wspace=0, hspace=0)
        path = os.path.join(self.vis_dir, f"{idx:05d}_{iter:04d}.jpg")
        plt.savefig(path, bbox_inches="tight", pad_inches=0.2, dpi=100)
        plt.close(fig)
        if self.verbose:
            print(f"Saved rendering visualization of color/depth image at {path}")
        return path
