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
        self.near = int(near)  # render/record only frames past this idx
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
        if self.renderer is None or idx < self.near:
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


def _frustum_lineset(o3d, c2w: np.ndarray, scale: float, color):
    """Camera frustum wireframe at ``c2w`` (SLAM convention, -z forward)."""
    pts = np.array([
        [0.0, 0.0, 0.0],
        [0.5, 0.3, -1.0], [0.5, -0.3, -1.0],
        [-0.5, -0.3, -1.0], [-0.5, 0.3, -1.0],
    ]) * scale
    pts = pts @ c2w[:3, :3].T + c2w[:3, 3]
    lines = [[0, 1], [0, 2], [0, 3], [0, 4], [1, 2], [2, 3], [3, 4], [4, 1]]
    ls = o3d.geometry.LineSet(
        points=o3d.utility.Vector3dVector(pts),
        lines=o3d.utility.Vector2iVector(lines),
    )
    ls.paint_uniform_color(color)
    return ls


class O3DFrontend:
    """Live Open3D viewer window (capability parity with the reference's
    interactive viewer, src/tools/viz.py:45-209): streams reconstructed
    meshes as they appear, draws the estimated (blue) and ground-truth
    (green) trajectories and the current camera frustum, and optionally
    dumps the rendered frames for a video.

    Lazy-optional: constructed only when ``open3d`` imports (absent from
    this environment's image — the offline ``SLAMFrontend`` is the
    default); same update_mesh/update_pose/finalize_video interface.
    """

    def __init__(self, output: str, init_pose, cam_scale=0.3,
                 save_rendering=False, near=0,
                 estimate_c2w_list=None, gt_c2w_list=None):
        import open3d as o3d  # raises ImportError when unavailable

        self._o3d = o3d
        self.output = output
        self.cam_scale = cam_scale
        self.near = int(near)
        self.save_rendering = save_rendering
        self.estimate_c2w_list = estimate_c2w_list
        self.gt_c2w_list = gt_c2w_list
        self.frames: List[np.ndarray] = []
        self.renderer = None  # parity with SLAMFrontend's "mesh attached" flag
        self._mesh_geom = None
        self._frustum = None
        self._traj_pts: List[np.ndarray] = []
        self._gt_pts: List[np.ndarray] = []
        # ONE persistent LineSet per trajectory, grown in place — a
        # geometry per segment would make the scene graph (and the
        # per-frame poll/update) degrade on long sequences
        self._traj_ls = o3d.geometry.LineSet()
        self._gt_ls = o3d.geometry.LineSet()
        self._traj_added = False
        self._gt_added = False
        self.vis = o3d.visualization.Visualizer()
        if not self.vis.create_window(window_name="nice_slam_tpu",
                                      width=1280, height=720):
            raise RuntimeError("open3d window creation failed "
                               "(headless host / no display?)")
        if save_rendering:
            os.makedirs(os.path.join(output, "tmp_rendering"), exist_ok=True)

    def update_mesh(self, mesh_path: str) -> None:
        o3d = self._o3d
        mesh = o3d.io.read_triangle_mesh(mesh_path)
        mesh.compute_vertex_normals()
        if self._mesh_geom is not None:
            self.vis.remove_geometry(self._mesh_geom, False)
        self._mesh_geom = mesh
        self.vis.add_geometry(mesh, self._frustum is None)
        self.renderer = mesh

    def update_pose(self, idx: int, c2w: np.ndarray) -> Optional[np.ndarray]:
        if idx < self.near:
            return None
        o3d = self._o3d
        if self._frustum is not None:
            self.vis.remove_geometry(self._frustum, False)
        self._frustum = _frustum_lineset(o3d, c2w, self.cam_scale, [1, 0, 0])
        self.vis.add_geometry(self._frustum, False)
        self._traj_pts.append(np.asarray(c2w[:3, 3], np.float64))
        if len(self._traj_pts) >= 2:
            self._traj_ls.points = o3d.utility.Vector3dVector(self._traj_pts)
            self._traj_ls.lines = o3d.utility.Vector2iVector(
                [[i, i + 1] for i in range(len(self._traj_pts) - 1)])
            self._traj_ls.paint_uniform_color([0, 0, 1])
            if self._traj_added:
                self.vis.update_geometry(self._traj_ls)
            else:
                self.vis.add_geometry(self._traj_ls, False)
                self._traj_added = True
        if (self.gt_c2w_list is not None and idx < len(self.gt_c2w_list)):
            self._gt_pts.append(
                np.asarray(self.gt_c2w_list[idx][:3, 3], np.float64))
            if len(self._gt_pts) >= 2:
                self._gt_ls.points = o3d.utility.Vector3dVector(self._gt_pts)
                self._gt_ls.lines = o3d.utility.Vector2iVector(
                    [[i, i + 1] for i in range(len(self._gt_pts) - 1)])
                self._gt_ls.paint_uniform_color([0, 1, 0])
                if self._gt_added:
                    self.vis.update_geometry(self._gt_ls)
                else:
                    self.vis.add_geometry(self._gt_ls, False)
                    self._gt_added = True
        self.vis.poll_events()
        self.vis.update_renderer()
        img = None
        if self.save_rendering:
            buf = self.vis.capture_screen_float_buffer(do_render=True)
            img = (np.asarray(buf) * 255).astype(np.uint8)
            self.frames.append(img)
        return img

    def finalize_video(self, path: str, fps: int = 30) -> Optional[str]:
        self.vis.destroy_window()
        return SLAMFrontend.finalize_video(self, path, fps)


def make_frontend(*args, online: Optional[bool] = None,
                  frontend: Optional[str] = None, port: int = 8765,
                  host: str = "127.0.0.1", **kwargs):
    """Frontend factory.

    ``frontend`` selects explicitly: 'open3d' (live GUI window, raises if
    unavailable), 'web' (live browser viewer served over HTTP — the
    headless-host interactive path, tools/webviz.py), 'offline' (raycast
    replay to frames/mp4).  Default/auto: the Open3D window when the
    library is importable (or ``online=True`` forces the attempt), else
    the offline replay — ANY construction failure falls back (open3d
    importing but window creation failing on a headless host is as
    common as the library being absent); an explicit request surfaces
    the error instead."""
    if frontend == "web":
        from nice_slam_tpu.tools.webviz import WebFrontend

        return WebFrontend(*args, port=port, host=host, **kwargs)
    if frontend == "open3d" or (frontend is None and online is not False):
        try:
            return O3DFrontend(*args, **kwargs)
        except Exception:
            if online or frontend == "open3d":  # explicit: surface it
                raise
    return SLAMFrontend(*args, **kwargs)
