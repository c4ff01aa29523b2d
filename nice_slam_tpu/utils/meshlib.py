"""Host mesh library: native iso-surface extraction, components, PLY IO.

Python surface over csrc/mesh_kernels.cpp (built on first use), replacing
the reference's skimage marching_cubes + trimesh toolchain (reference:
src/utils/Mesher.py:441-458, :484-510, :570-572).  A pure-numpy marching-
tetrahedra fallback keeps everything functional if the C++ toolchain is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_CSRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..", "csrc")


# every symbol the current code requires — a prebuilt .so from an older
# source revision that lacks any of them must be REBUILT, not loaded
# (loading it would raise AttributeError at attribute-binding time and
# silently disable all meshing)
_REQUIRED_SYMBOLS = (
    "marching_tetrahedra", "marching_cubes_classic", "mesh_components",
    "free_buffer", "bvh_build", "bvh_free", "bvh_render_depth",
    "bvh_cast_rays",
)


def _build_lib(src: str, so: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", so],
            check=True, capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.join(_CSRC, "libmesh_kernels.so")
    src = os.path.join(_CSRC, "mesh_kernels.cpp")
    if not os.path.exists(so):
        if not os.path.exists(src) or not _build_lib(src, so):
            return None
    lib = ctypes.CDLL(so)
    if not all(hasattr(lib, s) for s in _REQUIRED_SYMBOLS):
        # stale prebuilt library from an older source revision: rebuild once
        if not os.path.exists(src) or not _build_lib(src, so):
            return None
        lib = ctypes.CDLL(so)
        if not all(hasattr(lib, s) for s in _REQUIRED_SYMBOLS):
            return None
    _mc_argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.marching_tetrahedra.restype = ctypes.c_int
    lib.marching_tetrahedra.argtypes = _mc_argtypes
    lib.marching_cubes_classic.restype = ctypes.c_int
    lib.marching_cubes_classic.argtypes = _mc_argtypes
    lib.mesh_components.restype = ctypes.c_int64
    lib.mesh_components.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
    ]
    lib.free_buffer.argtypes = [ctypes.c_void_p]
    lib.bvh_build.restype = ctypes.c_void_p
    lib.bvh_build.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.bvh_free.argtypes = [ctypes.c_void_p]
    lib.bvh_render_depth.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.c_int32, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
    ]
    lib.bvh_cast_rays.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return lib


class MeshRaycaster:
    """BVH-accelerated depth renderer over a triangle mesh (native).

    Replaces Open3D's offscreen depth capture for the 2D reconstruction
    metric (reference: src/tools/eval_recon.py:155-204).  CV pinhole
    convention: +z forward, x right, y down; depth = camera-space z.
    """

    def __init__(self, verts: np.ndarray, tris: np.ndarray):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native mesh kernels unavailable (no g++?)")
        self._lib = lib
        # keep buffers alive: the BVH references them
        self._verts = np.ascontiguousarray(verts, np.float32)
        self._tris = np.ascontiguousarray(tris, np.int64)
        self._handle = lib.bvh_build(
            self._verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(self._verts),
            self._tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(self._tris),
        )

    def render_depth(
        self, c2w: np.ndarray, H: int, W: int,
        fx: float, fy: float, cx: float, cy: float, z_far: float = 20.0,
    ) -> np.ndarray:
        out = np.zeros((H, W), np.float32)
        c2w32 = np.ascontiguousarray(c2w, np.float32)
        self._lib.bvh_render_depth(
            self._handle,
            c2w32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            H, W, fx, fy, cx, cy, z_far,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def cast_rays(self, origins: np.ndarray, dirs: np.ndarray) -> np.ndarray:
        o = np.ascontiguousarray(origins, np.float32)
        d = np.ascontiguousarray(dirs, np.float32)
        out = np.zeros((len(o),), np.float32)
        self._lib.bvh_cast_rays(
            self._handle,
            o.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            d.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(o),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return out

    def __del__(self):
        if getattr(self, "_handle", None):
            self._lib.bvh_free(self._handle)
            self._handle = None


def sample_surface(
    verts: np.ndarray, tris: np.ndarray, n: int, seed: int = 0
) -> np.ndarray:
    """Area-weighted uniform surface sampling (replaces
    trimesh.sample.sample_surface, reference eval_recon.py:103-107)."""
    rng = np.random.default_rng(seed)
    v0, v1, v2 = verts[tris[:, 0]], verts[tris[:, 1]], verts[tris[:, 2]]
    areas = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1)
    total = areas.sum()
    if total <= 0:
        return verts[rng.integers(0, len(verts), n)]
    probs = areas / total
    idx = rng.choice(len(tris), size=n, p=probs)
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    a, b, c = v0[idx], v1[idx], v2[idx]
    return (1 - r1)[:, None] * a + (r1 * (1 - r2))[:, None] * b + (
        r1 * r2
    )[:, None] * c


def marching_cubes(
    field: np.ndarray,
    level: float,
    origin=(0.0, 0.0, 0.0),
    spacing=(1.0, 1.0, 1.0),
    method: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Iso-surface of a (nx, ny, nz) scalar field at ``level``.

    ``method``: 'mc' (default) = classic per-cube marching cubes with
    face-consistent ambiguity resolution — same vertex placement and
    cube-cell topology family as the reference's skimage marching_cubes
    (src/utils/Mesher.py:441-458); 'tets' = marching tetrahedra (denser
    triangulation).  Env override: NICE_SLAM_TPU_MC.

    Returns (vertices (V, 3) float32 world coords, triangles (T, 3) int64).
    Surface orientation: triangles wind around the region where
    ``field < level`` (matching the occupancy convention where higher value
    = occupied and the iso-surface bounds occupied space).
    """
    if method is None:
        method = os.environ.get("NICE_SLAM_TPU_MC", "mc")
    field = np.ascontiguousarray(field, dtype=np.float32)
    lib = _load_lib()
    if lib is not None:
        origin_a = (ctypes.c_float * 3)(*[float(v) for v in origin])
        spacing_a = (ctypes.c_float * 3)(*[float(v) for v in spacing])
        verts_p = ctypes.POINTER(ctypes.c_float)()
        tris_p = ctypes.POINTER(ctypes.c_int64)()
        nv = ctypes.c_int64()
        nt = ctypes.c_int64()
        fn = (lib.marching_cubes_classic if method == "mc"
              else lib.marching_tetrahedra)
        rc = fn(
            field.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            field.shape[0], field.shape[1], field.shape[2],
            float(level), origin_a, spacing_a,
            ctypes.byref(verts_p), ctypes.byref(nv),
            ctypes.byref(tris_p), ctypes.byref(nt),
        )
        if rc != 0:
            raise MemoryError("marching cubes failed")
        if nv.value == 0:
            return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
        verts = np.ctypeslib.as_array(verts_p, shape=(nv.value, 3)).copy()
        tris = np.ctypeslib.as_array(tris_p, shape=(nt.value, 3)).copy()
        lib.free_buffer(verts_p)
        lib.free_buffer(tris_p)
        return verts, tris
    return _marching_tets_numpy(field, level, origin, spacing)


def components(
    verts: np.ndarray, tris: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Connected components by vertex connectivity.

    Returns (per-triangle component ids (T,), per-component areas (C,)).
    """
    if len(tris) == 0:
        return np.zeros((0,), np.int32), np.zeros((0,), np.float32)
    lib = _load_lib()
    verts32 = np.ascontiguousarray(verts, np.float32)
    tris64 = np.ascontiguousarray(tris, np.int64)
    if lib is not None:
        comp = np.zeros((len(tris64),), np.int32)
        areas = np.zeros((len(tris64),), np.float32)
        n = lib.mesh_components(
            verts32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(verts32),
            tris64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(tris64),
            comp.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            areas.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return comp, areas[:n].copy()
    return _components_numpy(verts32, tris64)


# ---------------------------------------------------------------------------
# Pure-numpy fallbacks
# ---------------------------------------------------------------------------

def _marching_tets_numpy(field, level, origin, spacing):
    """Slow but dependency-free fallback (small grids / tests only)."""
    nx, ny, nz = field.shape
    verts = []
    tris = []
    cache = {}

    corners = [(c & 1, (c >> 1) & 1, (c >> 2) & 1) for c in range(8)]
    tets = [(0, 5, 1, 7), (0, 1, 3, 7), (0, 3, 2, 7),
            (0, 2, 6, 7), (0, 6, 4, 7), (0, 4, 5, 7)]

    def gid(ix, iy, iz):
        return (ix * ny + iy) * nz + iz

    def edge_vertex(ga, gb, pa, pb, va, vb):
        if ga > gb:
            ga, gb, pa, pb, va, vb = gb, ga, pb, pa, vb, va
        key = (ga, gb)
        if key in cache:
            return cache[key]
        denom = vb - va
        t = 0.5 if abs(denom) < 1e-12 else np.clip((level - va) / denom, 0, 1)
        v = [pa[k] + t * (pb[k] - pa[k]) for k in range(3)]
        idx = len(verts)
        verts.append(v)
        cache[key] = idx
        return idx

    inside_tables = {
        1: [(0, 1, 0, 2, 0, 3)], 2: [(1, 0, 1, 3, 1, 2)],
        4: [(2, 0, 2, 1, 2, 3)], 8: [(3, 0, 3, 2, 3, 1)],
        14: [(0, 1, 0, 3, 0, 2)], 13: [(1, 0, 1, 2, 1, 3)],
        11: [(2, 0, 2, 3, 2, 1)], 7: [(3, 0, 3, 1, 3, 2)],
        3: [(0, 2, 0, 3, 1, 3), (0, 2, 1, 3, 1, 2)],
        12: [(0, 2, 1, 3, 0, 3), (0, 2, 1, 2, 1, 3)],
        5: [(0, 1, 2, 3, 0, 3), (0, 1, 2, 1, 2, 3)],
        10: [(0, 1, 0, 3, 2, 3), (0, 1, 2, 3, 2, 1)],
        6: [(1, 0, 2, 3, 1, 3), (1, 0, 2, 0, 2, 3)],
        9: [(1, 0, 1, 3, 2, 3), (1, 0, 2, 3, 2, 0)],
    }

    for ix in range(nx - 1):
        for iy in range(ny - 1):
            for iz in range(nz - 1):
                cv = [field[ix + dx, iy + dy, iz + dz] for dx, dy, dz in corners]
                if all(v >= level for v in cv) or all(v < level for v in cv):
                    continue
                cp = [
                    (origin[0] + spacing[0] * (ix + dx),
                     origin[1] + spacing[1] * (iy + dy),
                     origin[2] + spacing[2] * (iz + dz))
                    for dx, dy, dz in corners
                ]
                cg = [gid(ix + dx, iy + dy, iz + dz) for dx, dy, dz in corners]
                for tet in tets:
                    code = sum(1 << c for c in range(4) if cv[tet[c]] < level)
                    if code in (0, 15):
                        continue
                    for (a1, b1, a2, b2, a3, b3) in inside_tables[code]:
                        i1 = edge_vertex(cg[tet[a1]], cg[tet[b1]], cp[tet[a1]],
                                         cp[tet[b1]], cv[tet[a1]], cv[tet[b1]])
                        i2 = edge_vertex(cg[tet[a2]], cg[tet[b2]], cp[tet[a2]],
                                         cp[tet[b2]], cv[tet[a2]], cv[tet[b2]])
                        i3 = edge_vertex(cg[tet[a3]], cg[tet[b3]], cp[tet[a3]],
                                         cp[tet[b3]], cv[tet[a3]], cv[tet[b3]])
                        if len({i1, i2, i3}) == 3:
                            tris.append((i1, i2, i3))
    if not verts:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    return np.asarray(verts, np.float32), np.asarray(tris, np.int64)


def _components_numpy(verts, tris):
    parent = np.arange(len(verts), dtype=np.int64)

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for a, b, c in tris:
        ra, rb, rc = find(a), find(b), find(c)
        parent[ra] = rb
        parent[find(rb)] = find(rc)

    labels = {}
    comp = np.zeros((len(tris),), np.int32)
    areas_list = []
    for t, (a, b, c) in enumerate(tris):
        r = find(a)
        if r not in labels:
            labels[r] = len(labels)
            areas_list.append(0.0)
        cid = labels[r]
        comp[t] = cid
        e1 = verts[b] - verts[a]
        e2 = verts[c] - verts[a]
        areas_list[cid] += 0.5 * np.linalg.norm(np.cross(e1, e2))
    return comp, np.asarray(areas_list, np.float32)


# ---------------------------------------------------------------------------
# PLY IO (replaces trimesh export/load, reference Mesher.py:570-572)
# ---------------------------------------------------------------------------

def write_ply(
    path: str,
    verts: np.ndarray,
    tris: np.ndarray,
    colors: Optional[np.ndarray] = None,
) -> None:
    """Binary little-endian PLY with optional per-vertex uchar RGB."""
    verts = np.asarray(verts, np.float32)
    tris = np.asarray(tris, np.int32)
    n_v, n_t = len(verts), len(tris)
    with open(path, "wb") as f:
        header = ["ply", "format binary_little_endian 1.0",
                  f"element vertex {n_v}",
                  "property float x", "property float y", "property float z"]
        if colors is not None:
            header += ["property uchar red", "property uchar green",
                       "property uchar blue"]
        header += [f"element face {n_t}",
                   "property list uchar int vertex_indices", "end_header"]
        f.write(("\n".join(header) + "\n").encode())
        if colors is not None:
            c = np.clip(np.asarray(colors), 0, 255).astype(np.uint8)
            rec = np.zeros(n_v, dtype=[("v", np.float32, 3), ("c", np.uint8, 3)])
            rec["v"] = verts
            rec["c"] = c
            f.write(rec.tobytes())
        else:
            f.write(verts.tobytes())
        face = np.zeros(n_t, dtype=[("n", np.uint8), ("i", np.int32, 3)])
        face["n"] = 3
        face["i"] = tris
        f.write(face.tobytes())


def read_ply(path: str):
    """Read a PLY (binary LE or ascii) -> (verts, tris, colors|None)."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply", "not a ply file"
        fmt = None
        n_v = n_t = 0
        v_props = []
        while True:
            line = f.readline().strip()
            if line.startswith(b"format"):
                fmt = line.split()[1]
            elif line.startswith(b"element vertex"):
                n_v = int(line.split()[-1])
                reading = "v"
            elif line.startswith(b"element face"):
                n_t = int(line.split()[-1])
                reading = "f"
            elif line.startswith(b"property") and "reading" in dir() and reading == "v":
                parts = line.split()
                v_props.append((parts[1].decode(), parts[2].decode()))
            elif line == b"end_header":
                break

        type_map = {"float": np.float32, "float32": np.float32,
                    "double": np.float64, "uchar": np.uint8,
                    "uint8": np.uint8, "int": np.int32}
        if fmt == b"ascii":
            verts = np.zeros((n_v, 3), np.float32)
            colors = None
            names = [n for _, n in v_props]
            has_c = "red" in names
            if has_c:
                colors = np.zeros((n_v, 3), np.uint8)
            for i in range(n_v):
                vals = f.readline().split()
                rec = {n: v for (_, n), v in zip(v_props, vals)}
                verts[i] = [float(rec["x"]), float(rec["y"]), float(rec["z"])]
                if has_c:
                    colors[i] = [int(rec["red"]), int(rec["green"]),
                                 int(rec["blue"])]
            tris = np.zeros((n_t, 3), np.int64)
            for i in range(n_t):
                vals = f.readline().split()
                tris[i] = [int(v) for v in vals[1:4]]
            return verts, tris, colors

        dt = np.dtype([(n, type_map[t]) for t, n in v_props])
        vdata = np.frombuffer(f.read(dt.itemsize * n_v), dtype=dt)
        verts = np.stack(
            [vdata["x"], vdata["y"], vdata["z"]], axis=-1
        ).astype(np.float32)
        colors = None
        if "red" in dt.names:
            colors = np.stack(
                [vdata["red"], vdata["green"], vdata["blue"]], axis=-1
            )
        fdt = np.dtype([("n", np.uint8), ("i", np.int32, 3)])
        fdata = np.frombuffer(f.read(fdt.itemsize * n_t), dtype=fdt)
        tris = fdata["i"].astype(np.int64)
        return verts, tris, colors
