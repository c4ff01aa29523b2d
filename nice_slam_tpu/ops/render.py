"""Volume renderer: depth-guided ray sampling + integration (L4).

Behavioral parity with the reference renderer (src/utils/Renderer.py):

  * per-ray far plane from the ray/scene-AABB exit distance (+0.01), clamped
    to ``1.2 * max(gt_depth)`` when sensor depth is available (:98-111);
  * ``N_samples`` stratified samples in [0.01*d, far] plus ``N_surface``
    samples in [0.95*d, 1.05*d] for rays with sensor depth — zero-depth rays
    instead get surface samples spread to the batch max depth (:112-150);
  * optional stratified perturbation (:159-166) and ``N_importance``
    inverse-CDF re-sampling (:181-196);
  * sort-merged z-values, decoder eval, NeRF integration (:168-180).

TPU-first design: every shape is static (fixed sample counts, fixed ray
batch), the zero-depth special case is a ``where``-select instead of boolean
indexing, and the whole render is jit/grad-safe so tracker and mapper can
scan entire optimization loops on-device.  The reference's float64 surface
sampling (:132-139) is replaced by a float32 formulation (values are metric
depths ~O(10), well within f32).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nice_slam_tpu.models.scene import SceneSpec, SceneState, eval_points
from nice_slam_tpu.ops.geometry import (
    get_rays,
    raw2outputs_nerf_color,
    ray_aabb_far,
    sample_pdf,
)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (cfg['rendering'] + flags)."""

    N_samples: int = 32
    N_surface: int = 16
    N_importance: int = 0
    lindisp: bool = False
    perturb: float = 0.0
    occupancy: bool = True
    points_batch_size: int = 500_000
    ray_batch_size: int = 100_000

    @staticmethod
    def from_cfg(cfg) -> "RenderConfig":
        r = cfg["rendering"]
        return RenderConfig(
            N_samples=r["N_samples"],
            N_surface=r["N_surface"],
            N_importance=r["N_importance"],
            lindisp=r["lindisp"],
            perturb=r["perturb"],
            occupancy=bool(cfg["occupancy"]),
        )


def _stratified_z(
    key: Optional[jax.Array],
    near: jnp.ndarray,
    far: jnp.ndarray,
    N_samples: int,
    lindisp: bool,
    perturb: float,
) -> jnp.ndarray:
    """Stratified z-values in [near, far] per ray; near/far broadcast (N, 1)."""
    t_vals = jnp.linspace(0.0, 1.0, N_samples)
    if not lindisp:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    else:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    if perturb > 0.0:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def render_batch_ray(
    spec: SceneSpec,
    state: SceneState,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    stage: str,
    gt_depth: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    rcfg: RenderConfig = RenderConfig(),
    sample_fn=None,
    act_bf16: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Render depth / uncertainty / color for a fixed-size ray batch.

    ``sample_fn`` overrides the grid feature lookup (see
    models.scene.eval_points) — e.g. the spatially sharded grid store.

    Args:
        rays_o, rays_d: (N, 3).
        stage: decoder stage ('coarse'|'middle'|'fine'|'color'); static.
        gt_depth: (N,) sensor depth or None. The coarse stage always renders
            depth-free (reference: Renderer.py:88-89).
        key: PRNG key; required if perturb > 0 or N_importance sampling is
            stochastic.

    Returns:
        (depth (N,), uncertainty (N,), color (N, 3)).
    """
    N_samples = rcfg.N_samples
    N_surface = rcfg.N_surface
    N_importance = rcfg.N_importance

    if stage == "coarse":
        gt_depth = None
    if gt_depth is None:
        N_surface = 0
        near = jnp.asarray(0.01, rays_o.dtype)
    else:
        gt_depth = gt_depth.reshape(-1, 1)
        near = gt_depth * 0.01

    far_bb = jax.lax.stop_gradient(ray_aabb_far(rays_o, rays_d, state.bound))
    far_bb = far_bb[:, None] + 0.01
    if gt_depth is not None:
        far = jnp.clip(far_bb, 0.0, jnp.max(gt_depth * 1.2))
    else:
        far = far_bb

    k_strat = k_surf = k_imp = None
    if key is not None:
        k_strat, k_surf, k_imp = jax.random.split(key, 3)

    z_vals = _stratified_z(k_strat, near, far, N_samples, rcfg.lindisp, rcfg.perturb)

    if N_surface > 0:
        # Rays with sensor depth sample tightly around the surface
        # [0.95d, 1.05d]; zero-depth rays sweep [0.001, max depth in batch]
        # so interpolated geometry still gets colorized
        # (reference: Renderer.py:121-150).
        t_surf = jnp.linspace(0.0, 1.0, N_surface)
        d = gt_depth  # (N, 1)
        z_surf_depth = 0.95 * d * (1.0 - t_surf) + 1.05 * d * t_surf
        far_surface = jnp.max(gt_depth)
        z_surf_zero = 0.001 * (1.0 - t_surf) + far_surface * t_surf
        nonzero = gt_depth > 0.0  # (N, 1)
        z_vals_surface = jnp.where(nonzero, z_surf_depth, z_surf_zero[None, :])
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_vals_surface], axis=-1), axis=-1)

    def _eval(z):
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        raw = eval_points(spec, state, pts.reshape(-1, 3), stage,
                          sample_fn=sample_fn, act_bf16=act_bf16)
        return raw.reshape(z.shape[0], z.shape[1], 4)

    raw = _eval(z_vals)
    depth, uncertainty, color, weights = raw2outputs_nerf_color(
        raw, z_vals, rays_d, occupancy=rcfg.occupancy
    )

    if N_importance > 0:
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            k_imp, z_mid, weights[..., 1:-1], N_importance, det=(rcfg.perturb == 0.0)
        )
        z_samples = jax.lax.stop_gradient(z_samples)
        z_vals = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        raw = _eval(z_vals)
        depth, uncertainty, color, weights = raw2outputs_nerf_color(
            raw, z_vals, rays_d, occupancy=rcfg.occupancy
        )

    return depth, uncertainty, color


def render_img(
    spec: SceneSpec,
    state: SceneState,
    c2w: jnp.ndarray,
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    stage: str,
    gt_depth: Optional[jnp.ndarray] = None,
    rcfg: RenderConfig = RenderConfig(),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full-frame render in fixed-size ray chunks (reference: Renderer.py:200-255).

    Host-side loop over jitted chunk renders; chunks are padded to a fixed
    size so only one executable is compiled.
    """
    rays_o, rays_d = get_rays(H, W, fx, fy, cx, cy, c2w)
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    n = rays_o.shape[0]
    chunk = min(rcfg.ray_batch_size, n)
    gt_flat = None if gt_depth is None else gt_depth.reshape(-1)

    depths, uncs, colors = [], [], []
    for i in range(0, n, chunk):
        ro = rays_o[i : i + chunk]
        rd = rays_d[i : i + chunk]
        gd = None if gt_flat is None else gt_flat[i : i + chunk]
        pad = chunk - ro.shape[0]
        if pad > 0:
            ro = jnp.pad(ro, ((0, pad), (0, 0)), constant_values=1.0)
            rd = jnp.pad(rd, ((0, pad), (0, 0)), constant_values=1.0)
            if gd is not None:
                gd = jnp.pad(gd, (0, pad))
        d, u, c = _render_chunk_jit(spec, state, ro, rd, stage, gd, rcfg)
        if pad > 0:
            d, u, c = d[:-pad], u[:-pad], c[:-pad]
        depths.append(d)
        uncs.append(u)
        colors.append(c)

    depth = jnp.concatenate(depths).reshape(H, W)
    uncertainty = jnp.concatenate(uncs).reshape(H, W)
    color = jnp.concatenate(colors).reshape(H, W, 3)
    return depth, uncertainty, color


from functools import partial


@partial(jax.jit, static_argnames=("spec", "stage", "rcfg"))
def _render_chunk_jit(spec, state, rays_o, rays_d, stage, gt_depth, rcfg):
    return render_batch_ray(
        spec, state, rays_o, rays_d, stage, gt_depth=gt_depth, key=None, rcfg=rcfg
    )


def regulation(
    spec: SceneSpec,
    state: SceneState,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    gt_depth: jnp.ndarray,
    key: jax.Array,
    N_samples: int,
    stage: str = "color",
    act_bf16: bool = False,
) -> jnp.ndarray:
    """iMAP* free-space regulariser: sampled volume densities in
    [0, 0.85*depth] along each ray (reference: Renderer.py:258-296)."""
    gt_depth = gt_depth.reshape(-1, 1)
    near = jnp.zeros_like(gt_depth)
    far = gt_depth * 0.85
    z_vals = _stratified_z(key, near, far, N_samples, lindisp=False, perturb=1.0)
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    raw = eval_points(spec, state, pts.reshape(-1, 3), stage,
                      act_bf16=act_bf16)
    return raw[:, 3]
