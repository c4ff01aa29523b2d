"""Trilinear grid interpolation: parity vs torch.nn.functional.grid_sample.

The reference samples features with F.grid_sample(mode='bilinear',
padding_mode='border', align_corners=True) on a [1, C, Z, Y, X] grid
(reference: src/conv_onet/models/decoder.py:168-175).  Our channels-last
gather+lerp implementation must match it bit-for-bit (up to f32 rounding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from nice_slam_tpu.ops.geometry import normalize_3d_coordinate
from nice_slam_tpu.ops.interp import sample_grid_feature, trilinear_interp


def _torch_reference(grid_xyzc, p_nor):
    """Evaluate torch grid_sample on the equivalent [1,C,Z,Y,X] layout."""
    nx, ny, nz, C = grid_xyzc.shape
    g = torch.from_numpy(np.asarray(grid_xyzc)).permute(3, 2, 1, 0)[None]  # 1,C,Z,Y,X
    v = torch.from_numpy(np.asarray(p_nor))[None, :, None, None, :]  # 1,N,1,1,3 (x,y,z)
    out = F.grid_sample(
        g, v, padding_mode="border", align_corners=True, mode="bilinear"
    )
    return out[0, :, :, 0, 0].T.numpy()  # (N, C)


def test_matches_torch_grid_sample_inside():
    key = jax.random.PRNGKey(0)
    grid = jax.random.normal(key, (7, 5, 9, 4))
    p = jax.random.uniform(jax.random.PRNGKey(1), (256, 3), minval=-0.99, maxval=0.99)
    ours = np.asarray(trilinear_interp(grid, p))
    ref = _torch_reference(grid, p)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_matches_torch_grid_sample_border():
    # Points outside [-1,1] must clamp to the border exactly like torch.
    key = jax.random.PRNGKey(2)
    grid = jax.random.normal(key, (4, 6, 3, 8))
    p = jax.random.uniform(jax.random.PRNGKey(3), (128, 3), minval=-2.5, maxval=2.5)
    ours = np.asarray(trilinear_interp(grid, p))
    ref = _torch_reference(grid, p)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_world_space_sampling():
    bound = jnp.array([[-2.0, 2.0], [0.0, 4.0], [-1.0, 3.0]])
    grid = jax.random.normal(jax.random.PRNGKey(4), (8, 8, 8, 2))
    p_world = jnp.array([[0.0, 2.0, 1.0], [-2.0, 0.0, -1.0]])
    got = sample_grid_feature(grid, p_world, bound)
    p_nor = normalize_3d_coordinate(p_world, bound)
    expect = trilinear_interp(grid, p_nor)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=1e-6)


def test_grid_gradient_flows():
    grid = jnp.zeros((4, 4, 4, 2))
    p = jnp.array([[0.1, -0.2, 0.3]])

    def loss(g):
        return jnp.sum(trilinear_interp(g, p))

    dg = jax.grad(loss)(grid)
    # gradient mass is the trilinear weights: sums to 1 per channel
    # (atol covers the production bf16 contribution buffer, ~0.4% rel)
    np.testing.assert_allclose(float(jnp.sum(dg)), 2.0, atol=1e-2)
    # and is concentrated on the 8 corners around the point
    assert int(jnp.sum(dg != 0)) <= 8 * 2


def test_explicit_vjp_matches_autodiff():
    from nice_slam_tpu.ops.interp import trilinear_interp_explicit_vjp

    grid = jax.random.normal(jax.random.PRNGKey(8), (7, 6, 5, 4))
    p = jax.random.uniform(jax.random.PRNGKey(9), (64, 3), minval=-1.4,
                           maxval=1.4)
    cot = jax.random.normal(jax.random.PRNGKey(10), (64, 4))

    v1 = trilinear_interp_explicit_vjp(grid, p)
    v2 = trilinear_interp(grid, p)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-6)

    g1 = jax.grad(lambda g, pp: jnp.sum(
        trilinear_interp_explicit_vjp(g, pp) * cot), argnums=(0, 1))(grid, p)
    g2 = jax.grad(lambda g, pp: jnp.sum(
        trilinear_interp(g, pp) * cot), argnums=(0, 1))(grid, p)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)


def test_block_scatter_vjp_matches_autodiff(monkeypatch):
    """The default dgrid strategy (cell-base block scatter + shifted adds)
    must be grad-exact vs autodiff in its f32 mode, including clamped
    border points where the virtual unclamped offsets rely on zero corner
    weights.  (The production default keeps the contribution buffer in
    bf16 — covered by the tolerance test below.)"""
    from nice_slam_tpu.ops import interp as interp_mod

    monkeypatch.setattr(interp_mod, "_DGRAD_BF16", False)
    # pin the SCATTER variant: the test grid is small enough that the
    # block mode's auto-dispatch would otherwise take the matmul path
    monkeypatch.setattr(interp_mod, "_MATMUL_V_MAX", 0)
    assert interp_mod._DGRAD_MODE == "block"
    grid = jax.random.normal(jax.random.PRNGKey(21), (6, 9, 7, 8))
    # heavy border coverage: points at/past all 6 faces plus interior
    p = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(22), (128, 3), minval=-1.6,
                           maxval=1.6),
        jnp.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0], [2.0, 0.0, 0.0],
                   [0.0, -3.0, 1.0], [1.0, 0.3, -0.2]]),
    ])
    cot = jax.random.normal(jax.random.PRNGKey(23), (p.shape[0], 8))

    g1 = jax.grad(lambda g, pp: jnp.sum(
        interp_mod.trilinear_interp_explicit_vjp(g, pp) * cot),
        argnums=(0, 1))(grid, p)
    g2 = jax.grad(lambda g, pp: jnp.sum(
        interp_mod._trilinear_impl(g, pp) * cot), argnums=(0, 1))(grid, p)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)


def test_block_matmul_vjp_matches_autodiff(monkeypatch):
    """Small grids (e.g. the 2 m-voxel coarse grid) take the one-hot
    MATMUL dgrid instead of the scatter (the TPU scatter loop costs
    ~13 ns/row regardless of grid size; a dense MXU contraction wins for
    V <= _MATMUL_V_MAX).  Must be grad-exact vs autodiff in f32 mode,
    including border clamps and the N-padding of the chunked contraction."""
    from nice_slam_tpu.ops import interp as interp_mod

    monkeypatch.setattr(interp_mod, "_DGRAD_BF16", False)
    grid = jax.random.normal(jax.random.PRNGKey(31), (6, 9, 7, 8))
    assert 6 * 9 * 7 <= interp_mod._MATMUL_V_MAX  # auto-dispatch applies
    p = jnp.concatenate([
        jax.random.uniform(jax.random.PRNGKey(32), (173, 3), minval=-1.6,
                           maxval=1.6),  # odd N: exercises chunk padding
        jnp.array([[1.0, 1.0, 1.0], [-1.0, -1.0, -1.0], [2.0, 0.0, 0.0],
                   [0.0, -3.0, 1.0], [1.0, 0.3, -0.2]]),
    ])
    cot = jax.random.normal(jax.random.PRNGKey(33), (p.shape[0], 8))

    g1 = jax.grad(lambda g, pp: jnp.sum(
        interp_mod.trilinear_interp_explicit_vjp(g, pp) * cot),
        argnums=(0, 1))(grid, p)
    g2 = jax.grad(lambda g, pp: jnp.sum(
        interp_mod._trilinear_impl(g, pp) * cot), argnums=(0, 1))(grid, p)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)


def test_block_scatter_bf16_grad_within_tolerance():
    """The production default keeps the scatter's contribution buffer in
    bf16 (halves the dominant mapping HBM cost); the resulting grid
    gradient must stay within bf16 rounding of the exact one, and the
    POINT gradient (the tracker's pose path) must remain exactly f32."""
    from nice_slam_tpu.ops import interp as interp_mod

    assert interp_mod._DGRAD_BF16  # the default
    grid = jax.random.normal(jax.random.PRNGKey(31), (8, 7, 6, 8))
    p = jax.random.uniform(jax.random.PRNGKey(32), (300, 3), minval=-1.2,
                           maxval=1.2)
    cot = jax.random.normal(jax.random.PRNGKey(33), (300, 8))

    g1 = jax.grad(lambda g, pp: jnp.sum(
        interp_mod.trilinear_interp_explicit_vjp(g, pp) * cot),
        argnums=(0, 1))(grid, p)
    g2 = jax.grad(lambda g, pp: jnp.sum(
        interp_mod._trilinear_impl(g, pp) * cot), argnums=(0, 1))(grid, p)
    ref = np.asarray(g2[0])
    # bf16 has an 8-bit mantissa: per-contribution relative error ~0.4%,
    # a few collisions per cell -> stay within ~2% of the gradient scale
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(g1[0]), ref, atol=0.02 * scale)
    # the dp branch never touches the bf16 buffer
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]), atol=1e-4)


def test_point_gradient_zero_outside_border():
    grid = jax.random.normal(jax.random.PRNGKey(5), (4, 4, 4, 1))

    def f(p):
        return jnp.sum(trilinear_interp(grid, p))

    g_inside = jax.grad(f)(jnp.array([[0.2, 0.1, -0.3]]))
    g_outside = jax.grad(f)(jnp.array([[1.7, 1.9, -1.8]]))
    assert float(jnp.max(jnp.abs(g_inside))) > 0
    np.testing.assert_allclose(np.asarray(g_outside), 0.0, atol=1e-7)
