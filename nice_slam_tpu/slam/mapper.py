"""Mapper: joint optimization of grids, decoders and (optionally) poses.

Behavioral parity with the reference mapper (src/Mapper.py):
  * keyframe window = overlap-ranked (or globally random) keyframes + the
    last keyframe + the current frame (:256-272);
  * frustum feature selection: only grid features visible from the current
    camera (projective depth test + a 0.5 m camera ball) are optimizable
    (:93-164,297-333) — realized here as gradient masks, which is exactly
    equivalent under a fresh Adam (see slam/optim.py docstring);
  * staged schedule middle -> fine -> color split by iteration ratios, with
    the per-stage 5-group learning rates from the config (:403-419);
  * local BA over window poses except the oldest, camera LR active only in
    the color stage (:346-363,417-419);
  * loss = masked depth L1 (+ weighted color L1 at the color stage)
    (+ the iMAP free-space sigma regularizer x 5e-4) summed, not meaned
    (:487-501);
  * the coarse mapper is the same machinery pinned to stage 'coarse' with
    global keyframe selection and depth-free rendering (:78-80,403-404,484).

TPU-first: one ``optimize_map`` call = up to three ``lax.scan`` segments
(one per stage) inside jit — the stage is static so each segment's forward
graph contains exactly the decoders that stage trains; group-wise masked
Adam reproduces torch param-group semantics without Python-side LR
rewriting.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.scene import SceneSpec, SceneState
from nice_slam_tpu.ops.geometry import (
    get_samples,
    pose_from_tensor,
    ray_aabb_far,
    tensor_from_pose,
)
from nice_slam_tpu.ops.interp import bilinear_sample_2d
from nice_slam_tpu.ops.render import RenderConfig, regulation, render_batch_ray
from nice_slam_tpu.slam.optim import GroupAdamState, group_adam_update, init_group_adam

STAGE_INDEX = {"coarse": 0, "middle": 1, "fine": 2, "color": 3}
LR_KEYS = ("decoders_lr", "coarse_lr", "middle_lr", "fine_lr", "color_lr")

# Device-side overlap window selection (default on): the ranked-random
# keyframe pick runs on device from the prefetched scores, so a mapping
# call needs ZERO device->host syncs (a fetch costs 40-600 ms over a
# remote tunnel, PERF.md r3).  NICE_SLAM_TPU_DEVICE_SELECT=0 restores the
# host-side np.random selection.
_DEVICE_SELECT = os.environ.get("NICE_SLAM_TPU_DEVICE_SELECT", "1") == "1"

# bfloat16 activations through the mapping forward/backward (decoder
# residuals, grid features, per-iteration stacked weights); matmuls keep
# f32 accumulation and losses stay f32.  Set NICE_SLAM_TPU_ACT_BF16=1 to
# enable; default OFF (measured neutral in the PERF.md r4 A/B).
_ACT_BF16 = os.environ.get("NICE_SLAM_TPU_ACT_BF16", "0") == "1"

# jitted pose converters: the eager op-by-op versions cost dozens of host
# dispatches per call (see slam/tracker.py note)
_batched_tensor_from_pose = jax.jit(jax.vmap(tensor_from_pose))
_pose_from_tensor_jit = jax.jit(pose_from_tensor)


@dataclasses.dataclass(frozen=True)
class MapperConfig:
    """Static mapping configuration (cfg['mapping'] + camera + mode)."""

    H: int
    W: int
    fx: float
    fy: float
    cx: float
    cy: float
    pixels: int
    iters: int
    iters_first: int
    every_frame: int
    keyframe_every: int
    mapping_window_size: int
    middle_iter_ratio: float
    fine_iter_ratio: float
    w_color_loss: float
    BA: bool
    BA_cam_lr: float
    fix_fine: bool
    fix_color: bool
    frustum_feature_selection: bool
    keyframe_selection_method: str
    lr_first_factor: float
    lr_factor: float
    color_refine: bool
    nice: bool
    coarse_mapper: bool
    occupancy: bool
    imap_decoders_lr: float
    # ((decoders_lr, coarse_lr, middle_lr, fine_lr, color_lr) per stage)
    stage_lr: Tuple[Tuple[float, float, float, float, float], ...]

    @staticmethod
    def from_cfg(cfg, cam, nice: bool, coarse_mapper: bool = False) -> "MapperConfig":
        m = cfg["mapping"]
        stage_lr = tuple(
            tuple(float(m["stage"][s][k]) for k in LR_KEYS)
            for s in ("coarse", "middle", "fine", "color")
        )
        ksel = m["keyframe_selection_method"]
        if nice and coarse_mapper:
            ksel = "global"  # reference: src/Mapper.py:78-80
        return MapperConfig(
            H=cam["H"], W=cam["W"], fx=cam["fx"], fy=cam["fy"],
            cx=cam["cx"], cy=cam["cy"],
            pixels=m["pixels"], iters=m["iters"], iters_first=m["iters_first"],
            every_frame=m["every_frame"], keyframe_every=m["keyframe_every"],
            mapping_window_size=m["mapping_window_size"],
            middle_iter_ratio=m["middle_iter_ratio"],
            fine_iter_ratio=m["fine_iter_ratio"],
            w_color_loss=m["w_color_loss"],
            BA=m["BA"], BA_cam_lr=m["BA_cam_lr"],
            fix_fine=m["fix_fine"], fix_color=m["fix_color"],
            frustum_feature_selection=m["frustum_feature_selection"],
            keyframe_selection_method=ksel,
            lr_first_factor=m["lr_first_factor"], lr_factor=m["lr_factor"],
            color_refine=m["color_refine"], nice=nice,
            coarse_mapper=coarse_mapper, occupancy=bool(cfg["occupancy"]),
            imap_decoders_lr=float(m.get("imap_decoders_lr", 0.0)),
            stage_lr=stage_lr,
        )


# ---------------------------------------------------------------------------
# Keyframe selection
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("H", "W", "pixels", "N_samples"))
def overlap_scores(
    key: jax.Array,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    c2w: jnp.ndarray,
    kf_c2ws: jnp.ndarray,
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    pixels: int = 100,
    N_samples: int = 16,
) -> jnp.ndarray:
    """Fraction of current-frame surface samples visible in each keyframe.

    Device-side replacement of the reference's numpy projection loop
    (src/Mapper.py:166-228): sample 100 pixels x 16 depth-bounded points,
    project into every keyframe at once (vmap), count in-frustum fraction.
    """
    rays_o, rays_d, d, _ = get_samples(
        key, 0, H, 0, W, pixels, fx, fy, cx, cy, c2w, gt_depth, gt_color
    )
    d = d[:, None]
    t = jnp.linspace(0.0, 1.0, N_samples)
    z = 0.8 * d * (1.0 - t) + (d + 0.5) * t
    pts = (rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]).reshape(-1, 3)

    def score(kf_c2w):
        w2c = jnp.linalg.inv(kf_c2w)
        cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
        zc = cam[:, 2] + 1e-5
        u = (fx * (-cam[:, 0]) + cx * cam[:, 2]) / zc
        v = (fy * cam[:, 1] + cy * cam[:, 2]) / zc
        edge = 20
        mask = (u < W - edge) & (u > edge) & (v < H - edge) & (v > edge) & (zc < 0)
        return jnp.mean(mask.astype(jnp.float32))

    return jax.vmap(score)(kf_c2ws)


def _select_from_scores(
    rng: np.random.Generator, mcfg: MapperConfig, scores: np.ndarray,
    n_keyframes: int,
) -> List[int]:
    """Overlap-path selection from host-side scores: keep positive-overlap
    keyframes, random-permute, take window_size-2 (reference :222-228)."""
    k = mcfg.mapping_window_size - 2
    scores = np.asarray(scores)[: n_keyframes - 1]
    eligible = [int(i) for i in np.nonzero(scores > 0.0)[0]]
    perm = rng.permutation(len(eligible))
    return [eligible[int(i)] for i in perm[:k]]


@partial(jax.jit, static_argnames=("k",))
def device_select_positions(
    scores: jnp.ndarray, n_kf: jnp.ndarray, key: jax.Array, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ON-DEVICE overlap window selection: random-rank the positive-overlap
    keyframes (reference :222-228 semantics; jax PRNG instead of np) and
    take ``k``.  Returns (positions (k,) int32, valid (k,) bool).

    When fewer than ``k`` keyframes are eligible the surplus slots come
    back with valid=False (their positions are clamped to 0 so gathers
    stay in bounds); the mapping loss zero-weights those frames' rays.
    This differs from the reference only in that rare shortfall case —
    the reference shrinks the window instead, re-spreading the same pixel
    budget over fewer frames."""
    K = scores.shape[0]
    pos = jnp.arange(K, dtype=jnp.int32)
    eligible = (scores > 0.0) & (pos < n_kf - 1)
    u = jax.random.uniform(key, (K,))
    order = jnp.argsort(jnp.where(eligible, u, jnp.inf))
    sel = order[:k].astype(jnp.int32)
    valid = eligible[sel]
    return jnp.where(valid, sel, 0), valid


@partial(jax.jit, static_argnames=("k", "BA"))
def prepare_window(
    scores: jnp.ndarray,
    n_kf: jnp.ndarray,
    key: jax.Array,
    kf_colors: jnp.ndarray,
    kf_depths: jnp.ndarray,
    kf_est: jnp.ndarray,
    cur_color: jnp.ndarray,
    cur_depth: jnp.ndarray,
    cur_c2w: jnp.ndarray,
    k: int,
    BA: bool,
):
    """The whole mapping-window prologue as ONE compiled module: on-device
    overlap selection, keyframe gathers, current-frame concat, camera
    tensors, BA optimizability mask.  The eager version of this prologue
    was ~12 tiny module executions per mapping event — each pays a fixed
    scheduling overhead over a remote-tunnel device (PERF.md r3).

    Returns (colors, depths, fixed_c2w, cam_tensors, opt_mask,
    frame_valid, positions) with F = k + 2 window slots
    (k selected + last keyframe + current frame)."""
    F = k + 2
    sel, valid = device_select_positions(scores, n_kf, key, k)
    last = (n_kf - 1).astype(jnp.int32)[None]
    positions = jnp.concatenate([sel, last])
    frame_valid = jnp.concatenate([valid, jnp.array([True, True])])

    colors = jnp.concatenate([kf_colors[positions], cur_color[None]])
    depths = jnp.concatenate([kf_depths[positions], cur_depth[None]])
    fixed_c2w = jnp.concatenate([kf_est[positions], cur_c2w[None]])
    cam_tensors = jax.vmap(tensor_from_pose)(fixed_c2w)

    if BA:
        # oldest WINDOW pose stays fixed (reference :349-363); invalid
        # slots are pushed past every real position so they can't win the
        # argmin (the last-kf slot always can)
        cand = jnp.concatenate([jnp.where(valid, sel, n_kf), last])
        oldest = jnp.argmin(cand)
        opt_mask = (frame_valid.astype(jnp.float32)
                    * (1.0 - jax.nn.one_hot(oldest, F)))
    else:
        oldest = jnp.zeros((), jnp.int32)
        opt_mask = jnp.zeros((F,), jnp.float32)
    return (colors, depths, fixed_c2w, cam_tensors, opt_mask, frame_valid,
            positions, oldest)


@jax.jit
def assemble_window(
    positions: jnp.ndarray,
    kf_colors: jnp.ndarray,
    kf_depths: jnp.ndarray,
    kf_est: jnp.ndarray,
    cur_color: jnp.ndarray,
    cur_depth: jnp.ndarray,
    cur_c2w: jnp.ndarray,
):
    """Window assembly for HOST-selected positions as one compiled module
    (the eager gather+concat+pose-tensor prologue was ~8 module
    executions; see ``prepare_window`` for the launch-overhead rationale).
    Returns (colors, depths, fixed_c2w, cam_tensors)."""
    colors = jnp.concatenate([kf_colors[positions], cur_color[None]])
    depths = jnp.concatenate([kf_depths[positions], cur_depth[None]])
    fixed_c2w = jnp.concatenate([kf_est[positions], cur_c2w[None]])
    return colors, depths, fixed_c2w, jax.vmap(tensor_from_pose)(fixed_c2w)


def select_keyframes(
    rng: np.random.Generator,
    mcfg: MapperConfig,
    key: jax.Array,
    gt_color,
    gt_depth,
    cur_c2w,
    kf_est_c2w: jnp.ndarray,
    n_keyframes: int,
) -> List[int]:
    """Window keyframe positions (excluding the always-added last keyframe
    and current frame).  Reference: src/Mapper.py:256-272."""
    if n_keyframes == 0:
        return []
    k = mcfg.mapping_window_size - 2
    if mcfg.keyframe_selection_method == "global":
        # random among positions 0..n-2 (reference random_select over len-1)
        if n_keyframes - 1 <= 0:
            return []
        perm = rng.permutation(n_keyframes - 1)
        return [int(x) for x in perm[: min(n_keyframes - 1, k)]]
    # 'overlap' — scored over the full capacity-padded pose array (static
    # shape: keyframe admissions don't recompile; padded slots are sliced
    # off host-side in _select_from_scores)
    scores = np.asarray(
        overlap_scores(
            key, gt_color, gt_depth, jnp.asarray(cur_c2w), kf_est_c2w,
            mcfg.H, mcfg.W, mcfg.fx, mcfg.fy, mcfg.cx, mcfg.cy,
        )
    )
    return _select_from_scores(rng, mcfg, scores, n_keyframes)


# ---------------------------------------------------------------------------
# Frustum feature selection
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("shape", "H", "W"))
def frustum_mask(
    c2w: jnp.ndarray,
    depth_img: jnp.ndarray,
    bound: jnp.ndarray,
    shape: Tuple[int, int, int],
    H: int,
    W: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
) -> jnp.ndarray:
    """Boolean visibility mask over a grid's feature lattice.

    Parity with reference get_mask_from_c2w (src/Mapper.py:93-164): project
    every grid node into the camera, bilinear depth lookup (0 outside, zeros
    replaced by the max looked-up depth), keep nodes with 0 <= cam_depth <=
    depth+0.5 inside the image, plus all nodes within 0.5 m of the camera
    center.
    """
    nx, ny, nz = shape
    xs = jnp.linspace(bound[0, 0], bound[0, 1], nx)
    ys = jnp.linspace(bound[1, 0], bound[1, 1], ny)
    zs = jnp.linspace(bound[2, 0], bound[2, 1], nz)
    X, Y, Z = jnp.meshgrid(xs, ys, zs, indexing="ij")
    points = jnp.stack([X, Y, Z], axis=-1).reshape(-1, 3)

    w2c = jnp.linalg.inv(c2w)
    cam = points @ w2c[:3, :3].T + w2c[:3, 3]
    zc = cam[:, 2] + 1e-5
    u = (fx * (-cam[:, 0]) + cx * cam[:, 2]) / zc
    v = (fy * cam[:, 1] + cy * cam[:, 2]) / zc

    depths = bilinear_sample_2d(depth_img, u, v)
    depths = jnp.where(depths == 0.0, jnp.max(depths), depths)

    in_img = (u < W) & (u > 0) & (v < H) & (v > 0)
    mask = in_img & (0.0 <= -zc) & (-zc <= depths + 0.5)

    dist2 = jnp.sum((points - c2w[:3, 3]) ** 2, axis=-1)
    mask = mask | (dist2 < 0.25)
    return mask.reshape(nx, ny, nz)


# ---------------------------------------------------------------------------
# The jitted mapping call
# ---------------------------------------------------------------------------

def _opt_param_groups(
    spec: SceneSpec, state: SceneState, mcfg: MapperConfig, cam_tensors, BA: bool
) -> Dict[str, Any]:
    groups: Dict[str, Any] = {}
    if spec.nice:
        if mcfg.coarse_mapper:
            groups["grid_coarse"] = state.grids["grid_coarse"]
        else:
            groups["grid_middle"] = state.grids["grid_middle"]
            groups["grid_fine"] = state.grids["grid_fine"]
            groups["grid_color"] = state.grids["grid_color"]
            if not mcfg.fix_fine:
                groups["dec_fine"] = state.decoders["fine"]
            if not mcfg.fix_color:
                groups["dec_color"] = state.decoders["color"]
    else:
        groups["dec"] = state.decoders
    if BA:
        groups["cams"] = cam_tensors
    return groups


def _merge_scene(
    spec: SceneSpec, state: SceneState, groups: Dict[str, Any]
) -> SceneState:
    grids = dict(state.grids)
    for k in ("grid_coarse", "grid_middle", "grid_fine", "grid_color"):
        if k in groups:
            grids[k] = groups[k]
    decoders = state.decoders
    if spec.nice:
        decoders = dict(decoders)
        if "dec_fine" in groups:
            decoders["fine"] = groups["dec_fine"]
        if "dec_color" in groups:
            decoders["color"] = groups["dec_color"]
    elif "dec" in groups:
        decoders = groups["dec"]
    return state._replace(decoders=decoders, grids=grids)


def _active_groups(
    spec: SceneSpec, mcfg: MapperConfig, stage: str, groups: Dict[str, Any]
) -> Dict[str, bool]:
    """Which param groups receive gradients in this stage's forward graph
    (static — mirrors torch's per-parameter grad-presence behavior)."""
    if not spec.nice:
        return {k: True for k in groups}
    if stage == "coarse":
        active = {"grid_coarse"}
    elif stage == "middle":
        active = {"grid_middle"}
    elif stage == "fine":
        active = {"grid_middle", "grid_fine", "dec_fine"}
    else:  # color
        active = {"grid_middle", "grid_fine", "grid_color", "dec_fine", "dec_color"}
    if "cams" in groups:
        active.add("cams")
    return {k: (k in active) for k in groups}


def _stage_lrs(
    mcfg: MapperConfig, stage: str, lr_factor, groups: Dict[str, Any], it
) -> Dict[str, jnp.ndarray]:
    """Per-group LR for this stage (reference :412-424)."""
    tab = mcfg.stage_lr[STAGE_INDEX[stage]]
    dec_lr, coarse_lr, mid_lr, fine_lr, color_lr = tab
    lrs: Dict[str, Any] = {}
    for k in groups:
        if k == "grid_coarse":
            lrs[k] = coarse_lr * lr_factor
        elif k == "grid_middle":
            lrs[k] = mid_lr * lr_factor
        elif k == "grid_fine":
            lrs[k] = fine_lr * lr_factor
        elif k == "grid_color":
            lrs[k] = color_lr * lr_factor
        elif k in ("dec_fine", "dec_color"):
            lrs[k] = dec_lr * lr_factor
        elif k == "dec":
            # iMAP: StepLR(step=200, gamma=0.8) over the call's iterations
            # (reference :388-389,422,505-507)
            lrs[k] = mcfg.imap_decoders_lr * (0.8 ** (it // 200).astype(jnp.float32))
    # camera LR is stage-static: active only at the color stage for NICE
    # (reference :417-419), always on for iMAP BA (:423-424)
    if "cams" in groups:
        if (not mcfg.nice) or stage == "color":
            lrs["cams"] = mcfg.BA_cam_lr
        else:
            lrs["cams"] = 0.0
    return lrs


def mapping_loss(
    spec: SceneSpec,
    opt_groups: Dict[str, Any],
    base_state: SceneState,
    colors: jnp.ndarray,
    depths: jnp.ndarray,
    fixed_c2w: jnp.ndarray,
    opt_cam_mask: jnp.ndarray,
    frame_valid: jnp.ndarray,
    key: jax.Array,
    stage: str,
    mcfg: MapperConfig,
    rcfg: RenderConfig,
    pixs_per_image: int,
    mesh=None,
) -> jnp.ndarray:
    """One mapping iteration's loss over the keyframe window
    (reference src/Mapper.py:426-501)."""
    state = _merge_scene(spec, base_state, opt_groups)
    F = colors.shape[0]

    if "cams" in opt_groups:
        pose = pose_from_tensor(opt_groups["cams"])  # (F, 3, 4)
        m = opt_cam_mask[:, None, None]
        c2ws = m * pose + (1.0 - m) * fixed_c2w[:, :3, :]
    else:
        c2ws = fixed_c2w[:, :3, :]

    k_frames, k_reg = jax.random.split(key)
    frame_keys = jax.random.split(k_frames, F)

    def sample_frame(k, color, depth, c2w):
        return get_samples(
            k, 0, mcfg.H, 0, mcfg.W, pixs_per_image,
            mcfg.fx, mcfg.fy, mcfg.cx, mcfg.cy, c2w, depth, color,
        )

    rays_o, rays_d, gt_d, gt_c = jax.vmap(sample_frame)(
        frame_keys, colors, depths, c2ws
    )
    rays_o = rays_o.reshape(-1, 3)
    rays_d = rays_d.reshape(-1, 3)
    gt_d = gt_d.reshape(-1)
    gt_c = gt_c.reshape(-1, 3)

    if mesh is not None and rays_o.shape[0] % mesh.size == 0:
        # multi-chip: shard the ray batch over the dp axis; the scene pytree
        # stays replicated and XLA SPMD inserts the gradient psum over ICI
        # (see nice_slam_tpu/parallel/sharding.py for the standalone form)
        from jax.sharding import NamedSharding, PartitionSpec as P

        ray_s = NamedSharding(mesh, P("dp"))
        ray_s2 = NamedSharding(mesh, P("dp", None))
        rays_o = jax.lax.with_sharding_constraint(rays_o, ray_s2)
        rays_d = jax.lax.with_sharding_constraint(rays_d, ray_s2)
        gt_d = jax.lax.with_sharding_constraint(gt_d, ray_s)
        gt_c = jax.lax.with_sharding_constraint(gt_c, ray_s2)

    if spec.nice:
        t_exit = jax.lax.stop_gradient(ray_aabb_far(rays_o, rays_d, state.bound))
        inside = t_exit >= gt_d
    else:
        inside = jnp.ones_like(gt_d, dtype=bool)
    # device-selected windows may carry invalid (shortfall-padding) frames:
    # their rays are weight-masked out of every loss term
    inside = inside & jnp.repeat(frame_valid, pixs_per_image,
                                 total_repeat_length=inside.shape[0])

    depth, uncertainty, color = render_batch_ray(
        spec, state, rays_o, rays_d, stage,
        gt_depth=None if mcfg.coarse_mapper else gt_d,
        key=None, rcfg=rcfg, act_bf16=_ACT_BF16,
    )

    depth_mask = (gt_d > 0) & inside
    loss = jnp.sum(jnp.where(depth_mask, jnp.abs(gt_d - depth), 0.0))
    if (not spec.nice) or stage == "color":
        color_loss = jnp.sum(
            jnp.where(inside[:, None], jnp.abs(gt_c - color), 0.0)
        )
        loss = loss + mcfg.w_color_loss * color_loss

    if not mcfg.occupancy:
        # iMAP volume-density free-space regularizer (reference :496-501)
        sigma = regulation(
            spec, state, rays_d, rays_o, gt_d, k_reg, rcfg.N_samples, stage,
            act_bf16=_ACT_BF16,
        )
        loss = loss + 0.0005 * jnp.sum(jnp.abs(sigma))
    return loss


@partial(
    jax.jit,
    static_argnames=("spec", "mcfg", "rcfg", "stage_plan", "BA",
                     "pixs_per_image", "mesh"),
)
def optimize_map_jit(
    spec: SceneSpec,
    state: SceneState,
    colors: jnp.ndarray,
    depths: jnp.ndarray,
    fixed_c2w: jnp.ndarray,
    cam_tensors: jnp.ndarray,
    opt_cam_mask: jnp.ndarray,
    frame_valid: jnp.ndarray,
    grid_masks: Optional[Dict[str, jnp.ndarray]],
    lr_factor: jnp.ndarray,
    key: jax.Array,
    adam_in,  # None (fresh optimizer) | (GroupAdamState, it0) carried chunk
    mcfg: MapperConfig,
    rcfg: RenderConfig,
    stage_plan: Tuple[Tuple[str, int], ...],
    BA: bool,
    pixs_per_image: int,
    mesh=None,
):
    """One full optimize_map call: staged scans over jointly trained groups.

    ``adam_in`` lets the host split one logical optimize_map call into
    several jit calls (the per-iteration visualizer renders between chunks,
    reference src/Mapper.py:444-448) while keeping exact fresh-Adam-per-call
    semantics: pass None for the first chunk, the returned carry after.

    Returns (new_state, new_cam_tensors, losses (num_iters,), adam_carry).
    """
    if grid_masks is None and spec.nice and mcfg.frustum_feature_selection:
        # frustum gradient masks computed IN the jit (from the current
        # frame's pose/depth, already passed as the window's last entry) —
        # keeps the whole mapping call one dispatch instead of one per grid
        grid_masks = {
            name: frustum_mask(
                fixed_c2w[-1], depths[-1], state.bound, shape,
                mcfg.H, mcfg.W, mcfg.fx, mcfg.fy, mcfg.cx, mcfg.cy,
            )
            for name, shape in dict(spec.grid_shapes).items()
            if name != "grid_coarse"
        }
    groups = _opt_param_groups(spec, state, mcfg, cam_tensors, BA)
    if adam_in is None:
        adam = init_group_adam(groups)
        it0 = jnp.zeros((), jnp.int32)
    else:
        adam, it0 = adam_in

    all_losses = []
    carry = (groups, adam, it0)

    for stage, n_iters in stage_plan:
        if n_iters <= 0:
            continue
        active = _active_groups(spec, mcfg, stage, groups)

        def step(c, k, _stage=stage, _active=active):
            g, a, it = c
            loss, grads = jax.value_and_grad(
                lambda gg: mapping_loss(
                    spec, gg, state, colors, depths, fixed_c2w, opt_cam_mask,
                    frame_valid, k, _stage, mcfg, rcfg, pixs_per_image, mesh,
                )
            )(g)
            for gk in list(grads.keys()):
                if not gk.startswith("grid_"):
                    continue
                gv = grads[gk]
                if hasattr(gv, "slabs"):
                    # spatially sharded grid: total the duplicated halo
                    # planes (keeps both copies bitwise-consistent under
                    # Adam) and shard the frustum mask with the slabs
                    from nice_slam_tpu.parallel.grid_sharding import (
                        fold_halo_grads,
                        mask_to_slabs,
                    )

                    slabs = fold_halo_grads(gv.slabs)
                    if grid_masks is not None and gk in grid_masks:
                        m = mask_to_slabs(
                            grid_masks[gk], gv.planes, gv.slabs.shape[0])
                        slabs = slabs * m[..., None]
                    grads[gk] = gv._replace(slabs)
                elif grid_masks is not None and gk in grid_masks:
                    grads[gk] = gv * grid_masks[gk][..., None]
            lrs = _stage_lrs(mcfg, _stage, lr_factor, g, it)
            g2, a2 = group_adam_update(g, grads, a, lrs, _active)
            return (g2, a2, it + 1), loss

        # per-iteration keys derive from (call key, GLOBAL iteration index),
        # so splitting one logical call into chunks (adam_in carry, per-
        # iteration visualization) reproduces the unsplit call's sampling
        # exactly — it_base tracks the global offset across chunks/stages
        _, _, it_base = carry
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
            it_base + jnp.arange(n_iters, dtype=jnp.int32))
        carry, losses = jax.lax.scan(step, carry, keys)
        all_losses.append(losses)

    groups, adam, it_out = carry
    new_state = _merge_scene(spec, state, groups)
    new_cams = groups.get("cams", cam_tensors)
    return new_state, new_cams, jnp.concatenate(all_losses), (adam, it_out)


def stage_plan_for(
    mcfg: MapperConfig, num_joint_iters: int,
    middle_iter_ratio: Optional[float] = None,
    fine_iter_ratio: Optional[float] = None,
) -> Tuple[Tuple[str, int], ...]:
    """Split the call's iterations into stage segments.

    Reproduces the reference per-iteration stage rule (src/Mapper.py:403-410):
    joint_iter <= int(n*middle_ratio) -> middle; <= int(n*fine_ratio) ->
    fine; else color.  The coarse mapper is all-coarse; iMAP is all-color.
    """
    if mcfg.coarse_mapper:
        return (("coarse", num_joint_iters),)
    if not mcfg.nice:
        return (("color", num_joint_iters),)
    mr = mcfg.middle_iter_ratio if middle_iter_ratio is None else middle_iter_ratio
    fr = mcfg.fine_iter_ratio if fine_iter_ratio is None else fine_iter_ratio
    n_mid = min(num_joint_iters, int(num_joint_iters * mr) + 1)
    n_fine = min(num_joint_iters, int(num_joint_iters * fr) + 1) - n_mid
    n_color = num_joint_iters - n_mid - n_fine
    return (("middle", n_mid), ("fine", max(n_fine, 0)), ("color", max(n_color, 0)))


def split_plan(
    plan: Tuple[Tuple[str, int], ...], boundaries
) -> List[Tuple[Tuple[str, int], ...]]:
    """Cut a stage plan at global-iteration boundaries.

    Each returned chunk is itself a stage plan; running the chunks back to
    back (carrying the optimizer) is iteration-for-iteration identical to
    running ``plan`` in one call.  Used to hand control back to the host at
    per-iteration visualization points (reference src/Mapper.py:444-448).
    """
    bset = sorted(b for b in set(boundaries) if b > 0)
    chunks: List[Tuple[Tuple[str, int], ...]] = []
    cur: List[Tuple[str, int]] = []
    g, bi = 0, 0
    for stage, n in plan:
        rem = n
        while rem > 0:
            if bi < len(bset) and bset[bi] == g:
                if cur:
                    chunks.append(tuple(cur))
                    cur = []
                bi += 1
                continue
            nxt = bset[bi] if bi < len(bset) else None
            take = rem if nxt is None else min(rem, nxt - g)
            cur.append((stage, take))
            g += take
            rem -= take
    if cur:
        chunks.append(tuple(cur))
    return chunks


class Mapper:
    """Host-side mapping driver: window selection, frustum masks, the jitted
    optimize call, keyframe admission and pose write-back."""

    def __init__(
        self,
        spec: SceneSpec,
        mcfg: MapperConfig,
        rcfg: RenderConfig,
        seed: int = 1,
        save_selected_keyframes_info: bool = False,
    ):
        self.spec = spec
        self.mcfg = mcfg
        self.rcfg = rcfg
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed + 1000)
        # optional record of each mapping call's window (reference
        # src/Mapper.py:74-76,274-287); checkpointed when enabled
        self.save_selected_keyframes_info = save_selected_keyframes_info
        self.selected_keyframes = {} if save_selected_keyframes_info else None
        self._pending_selection = None  # [frame_idx, n_kf, scores]
        # multi-chip ray-batch data parallelism: engage automatically when
        # more than one device is visible (scene replicated, rays sharded)
        self.mesh = None
        if jax.device_count() > 1:
            from nice_slam_tpu.parallel.sharding import make_mesh

            self.mesh = make_mesh()
        # when set, the whole optimize_map computation runs on this single
        # device: the coarse mapper is pinned to its own chip so the strict
        # loop's back-to-back main+coarse dispatch executes concurrently
        # (the reference overlaps them as separate GPU processes,
        # src/NICE_SLAM.py:288-307); all input copies are async D2D
        self.device = None
        # runtime-adjustable copies (color refinement rewrites these,
        # reference :578-586)
        self.mapping_window_size = mcfg.mapping_window_size
        self.middle_iter_ratio = mcfg.middle_iter_ratio
        self.fine_iter_ratio = mcfg.fine_iter_ratio
        self.fix_color = mcfg.fix_color
        self.frustum_feature_selection = mcfg.frustum_feature_selection

    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    # ------------------------------------------------------------------
    # Keyframe-selection prefetch: the overlap ranking's device->host sync
    # was one blocking round-trip per mapping call (~50-100 ms over a
    # remote-tunnel device, PERF.md round-3 queue #3).  The strict loop now
    # dispatches the ranking right after the tracking scan — before it
    # syncs on the tracked pose — so both results come back in ONE fetch.
    # ------------------------------------------------------------------

    def prefetch_selection(
        self, frame_idx: int, gt_color, gt_depth, c2w_dev, keyframes
    ) -> Optional[jax.Array]:
        """Dispatch the overlap-score computation asynchronously.

        ``c2w_dev`` may be a device array still being computed (the tracked
        pose).  Returns the device scores (caller may batch-fetch them with
        its own pending results and hand them back via
        ``store_prefetched_scores``), or None when the selection method
        needs no device work.  Consumes the selection PRNG key that
        ``optimize_map`` would otherwise draw."""
        n_kf = len(keyframes)
        if self.mcfg.keyframe_selection_method != "overlap" or n_kf < 2:
            return None
        scores = overlap_scores(
            self._next_key(), jnp.asarray(gt_color), jnp.asarray(gt_depth),
            jnp.asarray(c2w_dev), keyframes.arrays.est_c2w,
            self.mcfg.H, self.mcfg.W, self.mcfg.fx, self.mcfg.fy,
            self.mcfg.cx, self.mcfg.cy,
        )
        self._pending_selection = [frame_idx, n_kf, scores]
        return scores

    def store_prefetched_scores(self, scores_host: np.ndarray) -> None:
        """Replace the pending device scores with already-fetched host
        values (so consumption pays no sync at all)."""
        if self._pending_selection is not None:
            self._pending_selection[2] = scores_host

    def optimize_map(
        self,
        state: SceneState,
        num_joint_iters: int,
        lr_factor: float,
        idx: int,
        cur_gt_color,
        cur_gt_depth,
        gt_cur_c2w,
        keyframes,
        cur_c2w: np.ndarray,
        BA: bool,
        vis_hook=None,
        vis_every: int = 0,
    ):
        """One mapping call. Returns (new_state, cur_c2w|None, losses).

        ``vis_hook(global_iter, state)`` — when given (with ``vis_every`` =
        the vis_inside_freq) — is invoked with the pre-iteration scene state
        at every ``vis_every``-th iteration, matching the reference's
        in-loop Visualizer.vis calls (src/Mapper.py:444-448); the optimize
        call is split into jit chunks at those boundaries with the optimizer
        state carried across (bit-equal to the unsplit call)."""
        mcfg = dataclasses.replace(
            self.mcfg,
            mapping_window_size=self.mapping_window_size,
            middle_iter_ratio=self.middle_iter_ratio,
            fine_iter_ratio=self.fine_iter_ratio,
            fix_color=self.fix_color,
            frustum_feature_selection=self.frustum_feature_selection,
        )
        n_kf = len(keyframes)
        pending, self._pending_selection = self._pending_selection, None
        if pending is not None and (pending[0] != idx or pending[1] != n_kf):
            pending = None  # stale prefetch (schedule changed); fall back
        scores_pending = pending[2] if pending is not None else None

        window_positions: Optional[List[int]] = None  # host-known positions
        positions_dev = None        # device-selected keyframe positions
        frame_valid = None          # per-window-slot validity (device path)
        oldest_slot = None          # host int | device scalar (BA)
        if (_DEVICE_SELECT and isinstance(scores_pending, jnp.ndarray)
                and n_kf >= 2
                and mcfg.keyframe_selection_method == "overlap"):
            # fully on-device selection + window assembly, ONE module, no
            # host sync anywhere in the call
            k_needed = min(mcfg.mapping_window_size - 2, n_kf - 1)
            F = k_needed + 2
            a = keyframes.arrays
            (colors, depths, fixed_c2w, cam_tensors, opt_mask_j,
             frame_valid, positions_dev, oldest_slot) = prepare_window(
                scores_pending, jnp.asarray(n_kf), self._next_key(),
                a.colors, a.depths, a.est_c2w,
                jnp.asarray(cur_gt_color, jnp.float32),
                jnp.asarray(cur_gt_depth, jnp.float32),
                jnp.asarray(cur_c2w, jnp.float32),
                k_needed, BA,
            )
            frame_valid_j = frame_valid
        else:
            if scores_pending is not None:
                selected = _select_from_scores(
                    self.rng, mcfg, np.asarray(scores_pending), n_kf)
            else:
                selected = select_keyframes(
                    self.rng, mcfg, self._next_key(), cur_gt_color,
                    cur_gt_depth, cur_c2w, keyframes.arrays.est_c2w, n_kf,
                )
            # window = selected + last keyframe + current (reference :267-272)
            window_positions = list(selected)
            if n_kf > 0:
                window_positions.append(n_kf - 1)
                oldest_pos = min(window_positions)
                oldest_slot = window_positions.index(oldest_pos)
            F = len(window_positions) + 1  # +1 for the current frame

            cur_color = jnp.asarray(cur_gt_color, jnp.float32)
            cur_depth = jnp.asarray(cur_gt_depth, jnp.float32)
            cur_c2w_j = jnp.asarray(cur_c2w, jnp.float32)

            if F > 1:
                a = keyframes.arrays
                colors, depths, fixed_c2w, cam_tensors = assemble_window(
                    jnp.asarray(np.asarray(window_positions, np.int32)),
                    a.colors, a.depths, a.est_c2w,
                    cur_color, cur_depth, cur_c2w_j,
                )
            else:
                colors = cur_color[None]
                depths = cur_depth[None]
                fixed_c2w = cur_c2w_j[None]
                cam_tensors = _batched_tensor_from_pose(fixed_c2w)

            # optimizability mask (oldest fixed, reference :349-363)
            opt_mask = np.zeros((F,), np.float32)
            if BA:
                opt_mask[:] = 1.0
                if oldest_slot is not None:
                    opt_mask[oldest_slot] = 0.0
            opt_mask_j = jnp.asarray(opt_mask)
            frame_valid_j = jnp.ones((F,), bool)

        # frustum gradient masks (reference get_mask_from_c2w, :113-115:
        # grid_coarse gets an all-ones mask == no mask) are computed inside
        # optimize_map_jit when grid_masks is None and
        # mcfg.frustum_feature_selection is set — one dispatch per mapping
        # call instead of one per grid
        grid_masks = None

        if self.save_selected_keyframes_info:
            if window_positions is None:  # device path: opt-in record syncs
                vmask = np.asarray(frame_valid[:-1])
                info_positions = [int(p) for p, v
                                  in zip(np.asarray(positions_dev), vmask)
                                  if v]
            else:
                info_positions = window_positions
            infos = []
            for pos in info_positions:
                infos.append({
                    "idx": keyframes.frame_ids[pos],
                    "gt_c2w": np.asarray(keyframes.arrays.gt_c2w[pos]),
                    "est_c2w": np.asarray(keyframes.arrays.est_c2w[pos]),
                })
            infos.append({"idx": idx, "gt_c2w": np.asarray(gt_cur_c2w),
                          "est_c2w": np.asarray(cur_c2w)})
            self.selected_keyframes[idx] = infos

        pixs_per_image = mcfg.pixels // F
        plan = stage_plan_for(mcfg, num_joint_iters)

        if vis_hook is not None and vis_every > 0:
            chunk_plans = split_plan(
                plan, range(0, num_joint_iters, vis_every))
        else:
            chunk_plans = [plan]

        cur_state, cur_cams = state, cam_tensors
        adam_carry = None
        g = 0
        chunk_losses = []
        # spatially sharded grids own the mesh axis themselves (shard_map
        # inside the grid lookup) — don't also shard the ray batch over it
        ray_mesh = self.mesh
        if any(hasattr(gr, "slabs") for gr in state.grids.values()):
            ray_mesh = None
        if self.device is not None:
            # dedicated-chip mapper: move every jit input to that device
            # (async D2D; on TPU the copies ride ICI) and skip ray DP —
            # the point is concurrency with the main mapper, not width
            (cur_state, colors, depths, fixed_c2w, cur_cams, opt_mask_j,
             frame_valid_j) = jax.device_put(
                (cur_state, colors, depths, fixed_c2w, cur_cams,
                 opt_mask_j, frame_valid_j), self.device)
            ray_mesh = None
        # ONE key per logical optimize_map call: per-iteration keys are
        # folded from (call key, global iteration) inside the jit, so every
        # chunk samples exactly what the unsplit call would
        call_key = self._next_key()
        for cplan in chunk_plans:
            if vis_hook is not None and vis_every > 0 and g % vis_every == 0:
                vis_hook(g, cur_state)
            cur_state, cur_cams, losses, adam_carry = optimize_map_jit(
                self.spec, cur_state, colors, depths, fixed_c2w, cur_cams,
                opt_mask_j, frame_valid_j, grid_masks,
                jnp.asarray(lr_factor, jnp.float32),
                call_key, adam_carry, mcfg, self.rcfg, cplan, BA,
                pixs_per_image, ray_mesh,
            )
            # losses stay ON DEVICE: converting here would block the host on
            # the whole mapping call, serializing the coarse-mapper dispatch
            # (and the next frame's tracking) behind it.  Callers that print
            # losses pay the sync themselves.
            chunk_losses.append(losses)
            g += sum(n for _, n in cplan)
        new_state, new_cams = cur_state, cur_cams
        losses = (jnp.concatenate(chunk_losses) if len(chunk_losses) > 1
                  else chunk_losses[0])

        cur_out = None
        if BA:
            # write back window poses (reference :521-536) — BA inherently
            # syncs here (the updated poses are host bookkeeping)
            cams_np = np.asarray(new_cams)
            if window_positions is None:  # device-selected window
                window_positions = [int(p) for p in np.asarray(positions_dev)]
                vmask = np.asarray(frame_valid[:-1])
                oldest_slot = int(np.asarray(oldest_slot))
                for slot, pos in enumerate(window_positions):
                    if slot == oldest_slot or not vmask[slot]:
                        continue
                    keyframes.set_est_c2w(pos, _tensor_to_c2w44(cams_np[slot]))
            else:
                for slot, pos in enumerate(window_positions):
                    if slot == oldest_slot:
                        continue
                    keyframes.set_est_c2w(pos, _tensor_to_c2w44(cams_np[slot]))
            cur_out = _tensor_to_c2w44(cams_np[-1])
        return new_state, cur_out, losses


def _tensor_to_c2w44(tensor: np.ndarray) -> np.ndarray:
    c2w = np.asarray(_pose_from_tensor_jit(jnp.asarray(tensor)))
    return np.concatenate([c2w, np.array([[0, 0, 0, 1.0]], np.float32)], axis=0)
