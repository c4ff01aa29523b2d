"""Native mesh kernels: iso-surface quality, components, PLY, raycaster."""

import os
import numpy as np
import pytest

from nice_slam_tpu.utils import meshlib


@pytest.fixture(scope="module")
def sphere_mesh():
    n = 40
    g = np.linspace(-1.5, 1.5, n).astype(np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    field = 1.0 - np.sqrt(X**2 + Y**2 + Z**2)
    sp = 3.0 / (n - 1)
    return meshlib.marching_cubes(
        field, 0.0, origin=(-1.5, -1.5, -1.5), spacing=(sp, sp, sp)
    )


def test_sphere_radius(sphere_mesh):
    v, t = sphere_mesh
    assert len(v) > 1000
    r = np.linalg.norm(v, axis=1)
    assert abs(r.mean() - 1.0) < 5e-3
    assert r.std() < 5e-3


def test_sphere_watertight_area(sphere_mesh):
    v, t = sphere_mesh
    comp, areas = meshlib.components(v, t)
    assert len(areas) == 1
    assert abs(areas.sum() - 4 * np.pi) / (4 * np.pi) < 0.01


def test_two_components():
    n = 32
    g = np.linspace(-1.5, 1.5, n).astype(np.float32)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    f = np.maximum(
        0.4 - np.sqrt((X + 0.8) ** 2 + Y**2 + Z**2),
        0.4 - np.sqrt((X - 0.8) ** 2 + Y**2 + Z**2),
    )
    sp = 3.0 / (n - 1)
    v, t = meshlib.marching_cubes(f, 0.0, origin=(-1.5,) * 3, spacing=(sp,) * 3)
    comp, areas = meshlib.components(v, t)
    assert len(areas) == 2


def test_ply_roundtrip(tmp_path, sphere_mesh):
    v, t = sphere_mesh
    colors = np.random.default_rng(0).integers(0, 255, (len(v), 3))
    path = str(tmp_path / "m.ply")
    meshlib.write_ply(path, v, t, colors)
    v2, t2, c2 = meshlib.read_ply(path)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    assert (t2 == t).all()
    assert (c2 == colors).all()


def test_raycaster_depth(sphere_mesh):
    v, t = sphere_mesh
    rc = meshlib.MeshRaycaster(v, t)
    # camera at z=-3 looking at +z (CV convention): sphere front face at z=-1
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = -3.0
    H = W = 64
    depth = rc.render_depth(c2w, H, W, 60.0, 60.0, 31.5, 31.5)
    center = depth[32, 32]
    assert abs(center - 2.0) < 0.02  # |(-3) - (-1)| = 2
    assert depth[0, 0] == 0.0  # corner misses the sphere


def test_raycaster_cast_rays(sphere_mesh):
    v, t = sphere_mesh
    rc = meshlib.MeshRaycaster(v, t)
    o = np.array([[0.0, 0.0, -3.0], [3.0, 3.0, 3.0]], np.float32)
    d = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], np.float32)
    ts = rc.cast_rays(o, d)
    assert abs(ts[0] - 2.0) < 0.02
    assert ts[1] < 0  # miss


def test_sample_surface_uniform(sphere_mesh):
    v, t = sphere_mesh
    pts = meshlib.sample_surface(v, t, 5000, seed=0)
    r = np.linalg.norm(pts, axis=1)
    assert abs(r.mean() - 1.0) < 0.01
    # roughly uniform over the sphere: mean z ~ 0
    assert abs(pts[:, 2].mean()) < 0.05


def test_stale_library_is_rebuilt(tmp_path):
    """A prebuilt libmesh_kernels.so from an older source revision (missing
    newer symbols) must be rebuilt, not loaded — loading it would raise
    AttributeError and silently disable all meshing."""
    import ctypes
    import shutil
    import subprocess

    from nice_slam_tpu.utils import meshlib as M

    so = os.path.join(M._CSRC, "libmesh_kernels.so")
    if not os.path.exists(so):
        pytest.skip("native lib not built in this environment")
    backup = tmp_path / "libmesh_kernels.so.bak"
    shutil.copyfile(so, backup)
    old_lib = M._LIB
    try:
        # fabricate a stale library: valid shared object, missing symbols
        stub_src = tmp_path / "stub.cpp"
        stub_src.write_text('extern "C" int marching_tetrahedra() '
                            "{ return 1; }\n")
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", str(stub_src), "-o", so],
            check=True, capture_output=True,
        )
        M._LIB = None
        lib = M._load_lib()
        assert lib is not None
        for sym in M._REQUIRED_SYMBOLS:
            assert hasattr(lib, sym), f"missing {sym} after rebuild"
        # and the rebuilt library actually works
        field = np.zeros((3, 3, 3), np.float32)
        field[1, 1, 1] = 1.0
        verts, tris = M.marching_cubes(field, 0.5)
        assert len(verts) > 0 and len(tris) > 0
    finally:
        shutil.copyfile(backup, so)
        M._LIB = old_lib
