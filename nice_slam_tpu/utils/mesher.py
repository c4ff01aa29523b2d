"""Mesher (L6): extract a culled, colored triangle mesh from the scene rep.

Pipeline parity with the reference mesher (src/utils/Mesher.py:349-574):

  1. uniform ``resolution``^3 query lattice over marching_cubes_bound +-0.05
     pad (:321-347);
  2. occupancy evaluation of the lattice on-device in fixed chunks ('fine'
     stage; with ``show_forecast``: forecast regions use the 'coarse' stage
     +0.2 and unseen regions get -100; otherwise points outside the scene
     hull get +100) (:386-433);
  3. iso-surface extraction at ``level_set`` — native marching tetrahedra
     (csrc/) instead of skimage marching_cubes (:437-458);
  4. mesh cleaning: drop faces whose vertices are all outside the seen
     region (keyframe-frustum test, optionally with a +-2.4 depth test)
     and filter connected components (largest, or area >
     remove_small_geometry_threshold * scale^2) (:469-510);
  5. vertex colors by direct 'color'-stage point query, or (iMAP) by
     rendering a short ray along the vertex normal (:512-556); forecast
     regions painted cyan (:558-565);
  6. vertices /= scale, PLY export (:570-572).

The scene "hull" replaces the reference's Open3D ScalableTSDFVolume +
convex hull (:214-279) with depth-map backprojection + scipy ConvexHull:
the hull of backprojected surface points + camera centers is the same
convex region the TSDF-mesh vertices span.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.scene import SceneSpec, SceneState, eval_points
from nice_slam_tpu.ops.interp import bilinear_sample_2d
from nice_slam_tpu.ops.render import RenderConfig, render_batch_ray
from nice_slam_tpu.utils import meshlib


import os


@partial(jax.jit, static_argnames=("spec", "stage", "mesh"))
def _eval_chunk(spec, state, pts, stage, mesh=None):
    # A Pallas fused decoder kernel was measured at parity with this
    # plain-XLA path on the TPU (XLA already keeps the MLP chain fused;
    # PERF.md) and was deleted in round 3.
    if mesh is not None and pts.shape[0] % mesh.size == 0:
        # multi-chip: shard the lattice points over the dp axis (scene
        # replicated) — the largest single query volume in the system
        # (resolution^3 nodes per mesh extraction)
        from jax.sharding import NamedSharding, PartitionSpec as P

        pts = jax.lax.with_sharding_constraint(
            pts, NamedSharding(mesh, P("dp", None)))
    return eval_points(spec, state, pts, stage)


def _query_mesh(state=None):
    """The dp device mesh for lattice queries (None single-device).

    Spatially sharded grids own the mesh axis themselves (shard_map in the
    grid lookup), so lattice points stay replicated in that mode."""
    if state is not None and any(
            hasattr(g, "slabs") for g in state.grids.values()):
        return None
    if jax.device_count() > 1:
        from nice_slam_tpu.parallel.sharding import make_mesh

        return make_mesh()
    return None


def chunked_eval(
    spec: SceneSpec, state: SceneState, points: np.ndarray, stage: str,
    chunk: int,
) -> np.ndarray:
    """Occupancy (raw[:, 3]) for a large point set, fixed-size device chunks."""
    n = len(points)
    out = np.zeros((n,), np.float32)
    mesh = _query_mesh(state)
    for i in range(0, n, chunk):
        p = points[i : i + chunk]
        pad = chunk - len(p)
        if pad > 0:
            p = np.pad(p, ((0, pad), (0, 0)))
        raw = _eval_chunk(spec, state, jnp.asarray(p, jnp.float32), stage,
                          mesh)
        out[i : i + chunk] = np.asarray(raw[: chunk - pad, 3])
    return out


def chunked_color(
    spec: SceneSpec, state: SceneState, points: np.ndarray, chunk: int
) -> np.ndarray:
    n = len(points)
    out = np.zeros((n, 3), np.float32)
    mesh = _query_mesh(state)
    for i in range(0, n, chunk):
        p = points[i : i + chunk]
        pad = chunk - len(p)
        if pad > 0:
            p = np.pad(p, ((0, pad), (0, 0)))
        raw = _eval_chunk(spec, state, jnp.asarray(p, jnp.float32), "color",
                          mesh)
        out[i : i + chunk] = np.asarray(raw[: chunk - pad, :3])
    return out


@partial(jax.jit, static_argnames=("H", "W", "depth_test"))
def _frame_masks(
    points: jnp.ndarray,
    c2w: jnp.ndarray,
    depth_img: jnp.ndarray,
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    depth_test: bool,
):
    """Per-frame (seen, forecast) point masks (reference point_masks body,
    src/utils/Mesher.py:127-196)."""
    w2c = jnp.linalg.inv(c2w)
    cam = points @ w2c[:3, :3].T + w2c[:3, 3]
    zc = cam[:, 2] + 1e-8
    u = (fx * (-cam[:, 0]) + cx * cam[:, 2]) / zc
    v = (fy * cam[:, 1] + cy * cam[:, 2]) / zc
    in_front = zc < 0

    seen = (u < W) & (u > 0) & (v < H) & (v > 0) & in_front
    edge = -1000.0
    forecast = (u < W - edge) & (u > edge) & (v < H - edge) & (v > edge) & in_front

    proj_depth = -cam[:, 2]
    if depth_test:
        depth_sample = bilinear_sample_2d(depth_img, u, v)
        max_depth = jnp.max(depth_sample)
        forecast = forecast & (proj_depth < max_depth)
        seen = seen & (proj_depth < depth_sample + 2.4) & (
            depth_sample - 2.4 < proj_depth
        )
    else:
        # the all-frames variant (get_mask_use_all_frames) passes a zero
        # depth image and expects NO depth bound (reference :88-125 skips
        # the depth test entirely there) — an all-zero image must not
        # collapse the bound to 0 and mark everything unseen
        md = jnp.max(depth_img)
        max_depth = jnp.where(md > 0, md * 1.1, jnp.inf)
        forecast = forecast & (proj_depth < max_depth)
        seen = seen & (proj_depth < max_depth)
    return seen, forecast


class Mesher:
    def __init__(
        self,
        cfg,
        cam,
        spec: SceneSpec,
        output: str,
        points_batch_size: int = 500_000,
        ray_batch_size: int = 100_000,
    ):
        m = cfg["meshing"]
        self.resolution = m["resolution"]
        self.level_set = m["level_set"]
        self.clean_mesh_bound_scale = m["clean_mesh_bound_scale"]
        self.remove_small_geometry_threshold = m["remove_small_geometry_threshold"]
        self.color_mesh_extraction_method = m["color_mesh_extraction_method"]
        self.get_largest_components = m["get_largest_components"]
        self.depth_test = m["depth_test"]
        self.scale = cfg["scale"]
        self.verbose = cfg["verbose"]
        self.spec = spec
        self.cam = cam
        self.H, self.W = cam["H"], cam["W"]
        self.marching_cubes_bound = (
            np.asarray(cfg["mapping"]["marching_cubes_bound"], np.float64)
            * self.scale
        )
        self.points_batch_size = points_batch_size
        self.ray_batch_size = ray_batch_size
        self.rcfg = RenderConfig.from_cfg(cfg)

    # ------------------------------------------------------------------

    def get_grid_uniform(self, resolution: int):
        """Query lattice over the padded marching-cubes bound (reference
        :321-347)."""
        b = self.marching_cubes_bound
        pad = 0.05
        x = np.linspace(b[0][0] - pad, b[0][1] + pad, resolution)
        y = np.linspace(b[1][0] - pad, b[1][1] + pad, resolution)
        z = np.linspace(b[2][0] - pad, b[2][1] + pad, resolution)
        X, Y, Z = np.meshgrid(x, y, z, indexing="ij")
        pts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1).astype(np.float32)
        return pts, (x, y, z)

    def point_masks(
        self,
        points: np.ndarray,
        keyframes,
        estimate_c2w_list: np.ndarray,
        idx: int,
        get_mask_use_all_frames: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Seen / forecast / unseen classification of points (reference
        :53-212)."""
        n = len(points)
        seen = np.zeros((n,), bool)
        forecast = np.zeros((n,), bool)
        chunk = self.points_batch_size
        zero_depth = jnp.zeros((self.H, self.W), jnp.float32)
        for i in range(0, n, chunk):
            pts = jnp.asarray(points[i : i + chunk], jnp.float32)
            s = np.zeros((pts.shape[0],), bool)
            f = np.zeros((pts.shape[0],), bool)
            if get_mask_use_all_frames:
                for fi in range(idx + 1):
                    cs, cf = _frame_masks(
                        pts, jnp.asarray(estimate_c2w_list[fi]), zero_depth,
                        self.H, self.W, self.cam["fx"], self.cam["fy"],
                        self.cam["cx"], self.cam["cy"], False,
                    )
                    # all-frames variant applies no depth bound (reference
                    # :88-125 skips the depth test entirely)
                    s |= np.asarray(cs)
                    f |= np.asarray(cf)
            else:
                for k in range(len(keyframes)):
                    cs, cf = _frame_masks(
                        pts, keyframes.arrays.est_c2w[k],
                        keyframes.arrays.depths[k],
                        self.H, self.W, self.cam["fx"], self.cam["fy"],
                        self.cam["cx"], self.cam["cy"], bool(self.depth_test),
                    )
                    s |= np.asarray(cs)
                    f |= np.asarray(cf)
            seen[i : i + chunk] = s
            forecast[i : i + chunk] = f
        forecast &= ~seen
        unseen = ~(seen | forecast)
        return seen, forecast, unseen

    def get_bound_from_frames(self, keyframes):
        """Scene hull from keyframe depth backprojections + camera centers
        (replaces the reference's TSDF+hull, :214-279).  Returns a Delaunay
        triangulation usable for contains() tests plus the hull points."""
        from scipy.spatial import ConvexHull, Delaunay

        H, W = self.H, self.W
        fx, fy = self.cam["fx"], self.cam["fy"]
        cx, cy = self.cam["cx"], self.cam["cy"]
        stride = max(1, int(np.sqrt(H * W / 5000)))  # ~5k points per frame
        all_pts: List[np.ndarray] = []
        for k in range(len(keyframes)):
            depth = np.asarray(keyframes.arrays.depths[k])[::stride, ::stride]
            c2w = np.asarray(keyframes.arrays.est_c2w[k])
            j, i = np.meshgrid(
                np.arange(0, H, stride, dtype=np.float32),
                np.arange(0, W, stride, dtype=np.float32),
                indexing="ij",
            )
            d = depth
            valid = d > 0
            xc = (i - cx) / fx * d
            yc = -(j - cy) / fy * d
            zc = -d
            pts_cam = np.stack([xc[valid], yc[valid], zc[valid]], axis=-1)
            pts_w = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
            all_pts.append(pts_w)
            all_pts.append(c2w[None, :3, 3])
        pts = np.concatenate(all_pts, axis=0)
        hull = ConvexHull(pts)
        hull_pts = pts[hull.vertices]
        center = hull_pts.mean(axis=0)
        hull_pts = center + self.clean_mesh_bound_scale * (hull_pts - center)
        return Delaunay(hull_pts)

    # ------------------------------------------------------------------

    def get_mesh(
        self,
        mesh_out_file: str,
        state: SceneState,
        keyframes,
        estimate_c2w_list: np.ndarray,
        idx: int,
        show_forecast: bool = False,
        color: bool = True,
        clean_mesh: bool = True,
        get_mask_use_all_frames: bool = False,
    ) -> Optional[str]:
        points, (x, y, z) = self.get_grid_uniform(self.resolution)
        chunk = min(self.points_batch_size, len(points))

        if show_forecast and self.spec.coarse:
            seen_mask, forecast_mask, unseen_mask = self.point_masks(
                points, keyframes, estimate_c2w_list, idx,
                get_mask_use_all_frames,
            )
            occ = np.full((len(points),), -100.0, np.float32)
            if seen_mask.any():
                occ[seen_mask] = chunked_eval(
                    self.spec, state, points[seen_mask], "fine", chunk
                )
            if forecast_mask.any():
                occ[forecast_mask] = chunked_eval(
                    self.spec, state, points[forecast_mask], "coarse", chunk
                ) + 0.2
        else:
            hull = self.get_bound_from_frames(keyframes)
            inside = hull.find_simplex(points) >= 0
            occ = chunked_eval(self.spec, state, points, "fine", chunk)
            occ[~inside] = 100.0

        field = occ.reshape(len(x), len(y), len(z))
        verts, faces = meshlib.marching_cubes(
            field, float(self.level_set),
            origin=(x[0], y[0], z[0]),
            spacing=(x[1] - x[0], y[1] - y[0], z[1] - z[0]),
        )
        if len(verts) == 0:
            print("marching_cubes error. Possibly no surface extracted from "
                  "the level set.")
            return None

        if clean_mesh:
            if show_forecast:
                hull = self.get_bound_from_frames(keyframes)
                contain = hull.find_simplex(verts) >= 0
                face_drop = (~contain)[faces].all(axis=1)
            else:
                seen_mask, _, _ = self.point_masks(
                    verts, keyframes, estimate_c2w_list, idx,
                    get_mask_use_all_frames,
                )
                face_drop = (~seen_mask)[faces].all(axis=1)
            faces = faces[~face_drop]

            comp, areas = meshlib.components(verts, faces)
            if len(areas) > 0:
                if self.get_largest_components:
                    keep = comp == int(np.argmax(areas))
                else:
                    ok = areas > (
                        self.remove_small_geometry_threshold
                        * self.scale * self.scale
                    )
                    keep = ok[comp]
                faces = faces[keep]
            # drop unused vertices
            used = np.unique(faces)
            remap = -np.ones(len(verts), np.int64)
            remap[used] = np.arange(len(used))
            verts = verts[used]
            faces = remap[faces]

        vertex_colors = None
        if color:
            if self.color_mesh_extraction_method == "direct_point_query":
                rgb = chunked_color(self.spec, state, verts, chunk)
            else:
                # iMAP: render a 0.1 m ray along the inward vertex normal
                # (reference :526-553)
                normals = _vertex_normals(verts, faces)
                length = 0.1
                rays_o = verts - length * normals
                rays_d = normals
                rgb = np.zeros((len(verts), 3), np.float32)
                bs = min(self.ray_batch_size, len(verts))
                for i in range(0, len(verts), bs):
                    ro = rays_o[i : i + bs]
                    rd = rays_d[i : i + bs]
                    pad = bs - len(ro)
                    if pad > 0:
                        ro = np.pad(ro, ((0, pad), (0, 0)), constant_values=1.0)
                        rd = np.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
                    gtd = jnp.full((bs,), length, jnp.float32)
                    _, _, c = _render_rays_jit(
                        self.spec, state, jnp.asarray(ro, jnp.float32),
                        jnp.asarray(rd, jnp.float32), gtd, self.rcfg,
                    )
                    rgb[i : i + bs] = np.asarray(c)[: bs - pad]
            vertex_colors = (np.clip(rgb, 0, 1) * 255).astype(np.uint8)

            if show_forecast:
                _, forecast_mask, _ = self.point_masks(
                    verts, keyframes, estimate_c2w_list, idx,
                    get_mask_use_all_frames,
                )
                vertex_colors[forecast_mask] = (0, 255, 255)  # cyan

        verts = verts / self.scale
        meshlib.write_ply(mesh_out_file, verts, faces, vertex_colors)
        if self.verbose:
            print("Saved mesh at", mesh_out_file)
        return mesh_out_file


@partial(jax.jit, static_argnames=("spec", "rcfg"))
def _render_rays_jit(spec, state, rays_o, rays_d, gt_depth, rcfg):
    return render_batch_ray(
        spec, state, rays_o, rays_d, "color", gt_depth=gt_depth, rcfg=rcfg
    )


def _vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (replaces o3d compute_vertex_normals)."""
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]],
        verts[faces[:, 2]] - verts[faces[:, 0]],
    )
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return vn / norm
