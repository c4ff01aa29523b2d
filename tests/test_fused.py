"""Pallas fused decoder kernel vs the XLA reference path (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nice_slam_tpu.models import decoders as D
from nice_slam_tpu.models import grids as G
from nice_slam_tpu.models.scene import SceneSpec, SceneState, eval_points
from nice_slam_tpu.ops import fused as F


@pytest.fixture(scope="module", autouse=True)
def f32_kernel():
    # exact comparison on CPU: disable the bf16 MXU mode
    old = F.BF16_COMPUTE
    F.BF16_COMPUTE = False
    yield
    F.BF16_COMPUTE = old


@pytest.fixture(scope="module")
def scene():
    dec_spec = D.NICESpec(c_dim=8, hidden_size=32, coarse=True)
    params = D.init_nice(jax.random.PRNGKey(0), dec_spec)
    bound = jnp.array([[-2.0, 2.0]] * 3)
    shapes = {"grid_middle": (6, 6, 6), "grid_fine": (9, 9, 9),
              "grid_color": (9, 9, 9), "grid_coarse": (4, 4, 4)}
    grids_d = G.init_grids(jax.random.PRNGKey(1), shapes, 8)
    spec = SceneSpec(nice=True, decoder=dec_spec,
                     grid_shapes=tuple(sorted(shapes.items())), c_dim=8,
                     occupancy=True, coarse=True, coarse_bound_enlarge=2)
    state = SceneState(decoders=params, grids=grids_d, bound=bound,
                       coarse_bound=2 * bound)
    return spec, state


@pytest.mark.parametrize("stage", ["coarse", "middle", "fine", "color"])
def test_fused_matches_reference(scene, stage):
    # The Gaussian-Fourier embedding sin(25 * p @ B) evaluates sin at
    # arguments of O(100) rad, where a 1-ulp difference in the dot product
    # (e.g. fma vs non-fma scheduling) already perturbs the feature by
    # ~1e-5; the decoder stack amplifies that to ~1e-2 on raw logits.
    # Exact cross-schedule parity is therefore impossible by construction
    # (the torch reference shows the same spread across devices); assert
    # agreement at the level that matters for rendering/meshing.
    spec, state = scene
    p = jax.random.uniform(jax.random.PRNGKey(2), (700, 3), minval=-1.8,
                           maxval=1.8)
    ref = eval_points(spec, state, p, stage)
    fus = F.fused_eval_points(spec, state, p, stage)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref), atol=0.05)


def test_fused_imap(scene):
    spec_mlp = D.MLPSpec(name="", c_dim=0, color=True, hidden_size=64,
                         skips=(), n_blocks=4)
    params = D.init_mlp(jax.random.PRNGKey(5), spec_mlp)
    bound = jnp.array([[-2.0, 2.0]] * 3)
    spec = SceneSpec(nice=False, decoder=spec_mlp, grid_shapes=(), c_dim=0,
                     occupancy=False, coarse=False, coarse_bound_enlarge=2)
    state = SceneState(decoders=params, grids={}, bound=bound,
                       coarse_bound=2 * bound)
    p = jax.random.uniform(jax.random.PRNGKey(6), (300, 3), minval=-1.5,
                           maxval=1.5)
    ref = eval_points(spec, state, p)
    fus = F.fused_eval_points(spec, state, p, "color")
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref), atol=2e-4)


def test_fused_handles_nonmultiple_tile(scene):
    spec, state = scene
    p = jax.random.uniform(jax.random.PRNGKey(7), (13, 3), minval=-1, maxval=1)
    fus = F.fused_eval_points(spec, state, p, "middle")
    ref = eval_points(spec, state, p, "middle")
    np.testing.assert_allclose(np.asarray(fus), np.asarray(ref), atol=0.05)
