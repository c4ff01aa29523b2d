"""Decoder stack tests: shapes, stage composition, gradient routing."""

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models import decoders as D
from nice_slam_tpu.models import grids as G


def _tiny_scene(coarse=True):
    spec = D.NICESpec(c_dim=8, hidden_size=16, coarse=coarse)
    params = D.init_nice(jax.random.PRNGKey(0), spec)
    bound = jnp.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
    shapes = {"grid_middle": (6, 6, 6), "grid_fine": (10, 10, 10),
              "grid_color": (10, 10, 10)}
    if coarse:
        shapes["grid_coarse"] = (4, 4, 4)
    grids = G.init_grids(jax.random.PRNGKey(1), shapes, 8)
    return spec, params, grids, bound


def test_stage_shapes():
    spec, params, grids, bound = _tiny_scene()
    p = jax.random.uniform(jax.random.PRNGKey(2), (17, 3), minval=-0.9, maxval=0.9)
    for stage in ["coarse", "middle", "fine", "color"]:
        raw = D.apply_nice(params, spec, p, grids, bound, 2 * bound, stage)
        assert raw.shape == (17, 4)


def test_fine_stage_is_residual_of_middle():
    # fine-stage occupancy == fine_occ + middle_occ (reference decoder.py:329-335)
    spec, params, grids, bound = _tiny_scene()
    subs = spec.sub_specs()
    p = jax.random.uniform(jax.random.PRNGKey(3), (9, 3), minval=-0.9, maxval=0.9)
    mid = D.apply_mlp(params["middle"], subs["middle"], p, grids, bound)
    fine = D.apply_mlp(params["fine"], subs["fine"], p, grids, bound)
    raw = D.apply_nice(params, spec, p, grids, bound, 2 * bound, "fine")
    np.testing.assert_allclose(np.asarray(raw[:, 3]), np.asarray(mid + fine), atol=1e-5)


def test_color_stage_occupancy_matches_fine_stage():
    spec, params, grids, bound = _tiny_scene()
    p = jax.random.uniform(jax.random.PRNGKey(4), (9, 3), minval=-0.9, maxval=0.9)
    raw_f = D.apply_nice(params, spec, p, grids, bound, 2 * bound, "fine")
    raw_c = D.apply_nice(params, spec, p, grids, bound, 2 * bound, "color")
    np.testing.assert_allclose(
        np.asarray(raw_f[:, 3]), np.asarray(raw_c[:, 3]), atol=1e-5
    )
    # rgb channels are zero at non-color stages
    np.testing.assert_allclose(np.asarray(raw_f[:, :3]), 0.0)


def test_middle_grid_gets_no_gradient_via_fine_concat():
    # The fine decoder's concat of the middle feature is gradient-stopped
    # (reference decoder.py:182-187); but the middle grid still receives
    # gradient through the middle decoder's own occupancy at fine stage.
    spec, params, grids, bound = _tiny_scene()
    subs = spec.sub_specs()
    p = jnp.array([[0.1, 0.2, -0.1]])

    def fine_only_loss(g):
        return jnp.sum(D.apply_mlp(params["fine"], subs["fine"], p, g, bound))

    dg = jax.grad(fine_only_loss)(grids)
    assert float(jnp.max(jnp.abs(dg["grid_middle"]))) == 0.0
    assert float(jnp.max(jnp.abs(dg["grid_fine"]))) > 0.0


def test_imap_mlp_shape():
    spec = D.MLPSpec(name="", c_dim=0, color=True, hidden_size=64,
                     skips=(), n_blocks=4)
    params = D.init_mlp(jax.random.PRNGKey(5), spec)
    p = jax.random.normal(jax.random.PRNGKey(6), (11, 3))
    out = D.apply_imap(params, spec, p)
    assert out.shape == (11, 4)


def test_skip_concat_layer_widths():
    # skips=(2,) means layer 3 consumes hidden+embedding features
    spec = D.MLPSpec(c_dim=4, hidden_size=16, skips=(2,), n_blocks=5)
    params = D.init_mlp(jax.random.PRNGKey(7), spec)
    assert params["pts_linears"][0]["w"].shape == (93, 16)
    assert params["pts_linears"][3]["w"].shape == (16 + 93, 16)
    assert params["pts_linears"][4]["w"].shape == (16, 16)
