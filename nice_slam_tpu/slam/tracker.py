"""Camera tracker: per-frame pose gradient descent, fully on-device.

Behavioral parity with the reference tracker (src/Tracker.py):
  * pose parameterized as an unnormalized quaternion + translation 7-vector
    optimized with Adam (optional separate LRs: translation at ``lr``,
    quaternion at ``0.2*lr`` — :202-219);
  * constant-speed motion-model initialization (:192-198);
  * per iteration: sample ``pixels`` rays in the edge-cropped image, filter
    rays whose scene-box exit precedes the sensor depth (nice mode,
    :93-104), render at stage 'color', uncertainty-weighted depth L1 +
    weighted color L1 summed over the dynamic-rejection mask
    ``tmp < 10*median(tmp)`` (:106-123);
  * the pose kept for the frame is the one whose *pre-step* loss was
    minimal — and, faithfully to the reference's in-place optimizer quirk
    (:245-247 clones the tensor *after* optimizer.step()), the recorded
    candidate is the post-step tensor of that iteration.

TPU-first: the whole per-frame loop is one jitted ``lax.scan`` — a single
dispatch per frame instead of the reference's ~10-200 CUDA launch rounds.
Variable-size ray filters are weight masks; the masked lower-median
reproduces torch's even-count median convention.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.scene import SceneSpec, SceneState
from nice_slam_tpu.ops.geometry import (
    get_samples,
    pose_from_tensor,
    ray_aabb_far,
    rays_from_uv,
    tensor_from_pose,
)
from nice_slam_tpu.ops.render import RenderConfig, render_batch_ray
from nice_slam_tpu.slam.optim import plain_adam_init, plain_adam_update


class PixelPack(NamedTuple):
    """Host-presampled per-iteration tracking pixels, device-resident
    (see ``presample_pixels``): the ~50 KB a non-mapping tracked frame
    actually needs on device instead of the full 13 MB RGB-D frame."""

    i: "jnp.ndarray"       # (iters, n) f32 full-image column coords
    j: "jnp.ndarray"       # (iters, n) f32 full-image row coords
    depth: "jnp.ndarray"   # (iters, n) f32 GT depth at the pixels
    color: "jnp.ndarray"   # (iters, n, 3) f32 GT color at the pixels


@dataclasses.dataclass(frozen=True)
class TrackerConfig:
    """Static tracking configuration (cfg['tracking'] + camera)."""

    H: int
    W: int
    fx: float
    fy: float
    cx: float
    cy: float
    lr: float
    iters: int
    pixels: int
    seperate_LR: bool
    w_color_loss: float
    ignore_edge_W: int
    ignore_edge_H: int
    handle_dynamic: bool
    use_color_in_tracking: bool
    const_speed_assumption: bool
    gt_camera: bool
    nice: bool
    # opt-in coarse-to-fine step sizing (OFF by default — reference parity):
    # the first cf_iters iterations run at cf_lr_mult x lr, taking large
    # steps toward the basin before the stock-LR refinement.  Extends the
    # per-frame-motion operating envelope (RESULTS.md tracking-envelope
    # curve); enable via tracking: {cf_iters: N, cf_lr_mult: M}.
    cf_iters: int = 0
    cf_lr_mult: float = 1.0

    @staticmethod
    def from_cfg(cfg, cam, nice: bool) -> "TrackerConfig":
        t = cfg["tracking"]
        return TrackerConfig(
            H=cam["H"], W=cam["W"], fx=cam["fx"], fy=cam["fy"],
            cx=cam["cx"], cy=cam["cy"],
            lr=t["lr"], iters=t["iters"], pixels=t["pixels"],
            seperate_LR=t["seperate_LR"], w_color_loss=t["w_color_loss"],
            ignore_edge_W=t["ignore_edge_W"], ignore_edge_H=t["ignore_edge_H"],
            handle_dynamic=t["handle_dynamic"],
            use_color_in_tracking=t["use_color_in_tracking"],
            const_speed_assumption=t["const_speed_assumption"],
            gt_camera=t["gt_camera"], nice=nice,
            cf_iters=int(t.get("cf_iters", 0)),
            cf_lr_mult=float(t.get("cf_lr_mult", 1.0)),
        )


def masked_lower_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """torch.median semantics (lower middle element) over a masked subset."""
    big = jnp.where(mask, x, jnp.inf)
    s = jnp.sort(big)
    cnt = jnp.sum(mask.astype(jnp.int32))
    k = jnp.maximum((cnt - 1) // 2, 0)
    return s[k]


def tracking_loss(
    spec: SceneSpec,
    state: SceneState,
    cam_tensor: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    key: jax.Array,
    tcfg: TrackerConfig,
    rcfg: RenderConfig,
) -> jnp.ndarray:
    """One tracking iteration's loss (reference optimize_cam_in_batch,
    src/Tracker.py:71-128)."""
    c2w = pose_from_tensor(cam_tensor)
    He, We = tcfg.ignore_edge_H, tcfg.ignore_edge_W
    rays_o, rays_d, batch_gt_depth, batch_gt_color = get_samples(
        key, He, tcfg.H - He, We, tcfg.W - We, tcfg.pixels,
        tcfg.fx, tcfg.fy, tcfg.cx, tcfg.cy, c2w, gt_depth, gt_color,
    )
    return _loss_from_batch(spec, state, rays_o, rays_d, batch_gt_depth,
                            batch_gt_color, tcfg, rcfg)


def tracking_loss_sampled(
    spec: SceneSpec,
    state: SceneState,
    cam_tensor: jnp.ndarray,
    pix_i: jnp.ndarray,
    pix_j: jnp.ndarray,
    pix_depth: jnp.ndarray,
    pix_color: jnp.ndarray,
    tcfg: TrackerConfig,
    rcfg: RenderConfig,
) -> jnp.ndarray:
    """tracking_loss on HOST-PRESAMPLED pixels (i=column, j=row, full-image
    float coords + their GT depth/color).  The loss math is byte-identical
    to the image version — only the pixel gather moved to the host, so the
    per-frame H2D upload shrinks from the full 13 MB RGB-D frame to the
    ~50 KB the tracker actually consumes (PERF.md r3: the strict loop was
    transfer-bound on this tunnel)."""
    c2w = pose_from_tensor(cam_tensor)
    rays_o, rays_d = rays_from_uv(pix_i, pix_j, c2w,
                                  tcfg.fx, tcfg.fy, tcfg.cx, tcfg.cy)
    return _loss_from_batch(spec, state, rays_o, rays_d, pix_depth,
                            pix_color, tcfg, rcfg)


def _loss_from_batch(spec, state, rays_o, rays_d, batch_gt_depth,
                     batch_gt_color, tcfg, rcfg):
    if tcfg.nice:
        t_exit = jax.lax.stop_gradient(ray_aabb_far(rays_o, rays_d, state.bound))
        inside = t_exit >= batch_gt_depth
    else:
        inside = jnp.ones_like(batch_gt_depth, dtype=bool)

    depth, uncertainty, color = render_batch_ray(
        spec, state, rays_o, rays_d, "color", gt_depth=batch_gt_depth,
        key=None, rcfg=rcfg,
    )
    uncertainty = jax.lax.stop_gradient(uncertainty)

    tmp = jnp.abs(batch_gt_depth - depth) / jnp.sqrt(uncertainty + 1e-10)
    if tcfg.handle_dynamic:
        med = masked_lower_median(tmp, inside)
        mask = (tmp < 10.0 * med) & (batch_gt_depth > 0)
    else:
        mask = batch_gt_depth > 0
    mask = mask & inside

    loss = jnp.sum(jnp.where(mask, tmp, 0.0))
    if tcfg.use_color_in_tracking:
        color_loss = jnp.sum(
            jnp.where(mask[:, None], jnp.abs(batch_gt_color - color), 0.0)
        )
        loss = loss + tcfg.w_color_loss * color_loss
    return loss


@partial(jax.jit, static_argnames=("spec", "tcfg", "rcfg"))
def track_frame(
    spec: SceneSpec,
    state: SceneState,
    init_tensor: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    key: jax.Array,
    tcfg: TrackerConfig,
    rcfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the full per-frame tracking loop on-device.

    Returns (candidate_cam_tensor, losses (iters,), cams (iters, 7) —
    the post-step tensor of every iteration, used by the per-iteration
    visualizer — and the final_cam_tensor).
    """
    if tcfg.seperate_LR:
        # quaternion components at 0.2x LR (reference :212-213)
        lr = jnp.array([0.2] * 4 + [1.0] * 3, jnp.float32) * tcfg.lr
    else:
        lr = jnp.asarray(tcfg.lr, jnp.float32)

    adam0 = plain_adam_init(init_tensor)

    def step(carry, inp):
        k, it = inp
        cam, adam = carry
        loss, g = jax.value_and_grad(
            lambda c: tracking_loss(
                spec, state, c, gt_color, gt_depth, k, tcfg, rcfg
            )
        )(cam)
        # coarse-to-fine: boosted LR for the first cf_iters iterations
        # (no-op at the reference-parity defaults cf_iters=0/mult=1)
        lr_it = lr * jnp.where(it < tcfg.cf_iters, tcfg.cf_lr_mult, 1.0)
        cam2, adam2 = plain_adam_update(cam, g, adam, lr_it)
        # candidate recorded post-step, scored by pre-step loss (see module doc)
        return (cam2, adam2), (loss, cam2)

    keys = jax.random.split(key, tcfg.iters)
    its = jnp.arange(tcfg.iters, dtype=jnp.int32)
    (cam_final, _), (losses, cams) = jax.lax.scan(
        step, (init_tensor, adam0), (keys, its))
    best = jnp.argmin(losses)
    candidate = cams[best]
    return candidate, losses, cams, cam_final


@partial(jax.jit, static_argnames=("spec", "tcfg", "rcfg"))
def track_frame_sampled(
    spec: SceneSpec,
    state: SceneState,
    init_tensor: jnp.ndarray,
    pix_i: jnp.ndarray,
    pix_j: jnp.ndarray,
    pix_depth: jnp.ndarray,
    pix_color: jnp.ndarray,
    tcfg: TrackerConfig,
    rcfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``track_frame`` on host-presampled per-iteration pixel batches
    (arrays shaped (iters, pixels[, 3]); see ``presample_pixels``).  Same
    scan, candidate rule and return signature as ``track_frame``."""
    if tcfg.seperate_LR:
        lr = jnp.array([0.2] * 4 + [1.0] * 3, jnp.float32) * tcfg.lr
    else:
        lr = jnp.asarray(tcfg.lr, jnp.float32)

    adam0 = plain_adam_init(init_tensor)

    def step(carry, inp):
        pi, pj, pd, pc, it = inp
        cam, adam = carry
        loss, g = jax.value_and_grad(
            lambda c: tracking_loss_sampled(
                spec, state, c, pi, pj, pd, pc, tcfg, rcfg
            )
        )(cam)
        lr_it = lr * jnp.where(it < tcfg.cf_iters, tcfg.cf_lr_mult, 1.0)
        cam2, adam2 = plain_adam_update(cam, g, adam, lr_it)
        return (cam2, adam2), (loss, cam2)

    its = jnp.arange(tcfg.iters, dtype=jnp.int32)
    (cam_final, _), (losses, cams) = jax.lax.scan(
        step, (init_tensor, adam0), (pix_i, pix_j, pix_depth, pix_color, its))
    best = jnp.argmin(losses)
    candidate = cams[best]
    return candidate, losses, cams, cam_final


def presample_pixels(
    seed: int,
    idx: int,
    tcfg: TrackerConfig,
    color: np.ndarray,
    depth: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """HOST-side analog of the tracker's per-iteration pixel sampling: draw
    ``iters`` independent uniform batches of ``pixels`` pixels from the
    edge-cropped image (duplicates allowed, reference src/common.py:92-122)
    and gather their GT values with numpy.

    Deterministic in (seed, idx) via a Philox counter stream — a parallel
    stream to the device path's threefry fold_in, same distribution.  Runs
    in the Prefetcher worker so the SLAM loop uploads the ~50 KB the
    tracker consumes instead of the full 13 MB frame (PERF.md r3).

    Returns (i, j, depth, color): (iters, n) f32 x2, (iters, n) f32,
    (iters, n, 3) f32."""
    He, We = tcfg.ignore_edge_H, tcfg.ignore_edge_W
    hs = tcfg.H - 2 * He
    ws = tcfg.W - 2 * We
    rng = np.random.Generator(np.random.Philox(key=[seed, idx]))
    flat = rng.integers(0, hs * ws, size=(tcfg.iters, tcfg.pixels))
    r = flat // ws + He
    c = flat % ws + We
    return (
        (c).astype(np.float32),
        (r).astype(np.float32),
        np.ascontiguousarray(depth[r, c], dtype=np.float32),
        np.ascontiguousarray(color[r, c], dtype=np.float32),
    )


@partial(jax.jit, static_argnames=("tcfg", "rcfg", "spec"))
def tracked_frames_step_sampled(
    spec,
    state,
    est_dev: jnp.ndarray,
    idx0: jnp.ndarray,
    pix_i: jnp.ndarray,
    pix_j: jnp.ndarray,
    pix_depth: jnp.ndarray,
    pix_color: jnp.ndarray,
    tcfg: "TrackerConfig",
    rcfg,
):
    """Track G CONSECUTIVE non-mapping frames (idx0 .. idx0+G-1) in ONE
    device module: each module execution pays a fixed host-dispatch cost
    over a remote-tunnel device (~10-15 ms measured, PERF.md r3), so the
    strict loop batches every run of presampled frames between two
    mapping/vis events into a single program.

    pix_* are stacked host-presampled batches shaped (G, iters, n[, 3])
    (``presample_pixels`` per frame).  Per-frame semantics are identical
    to ``tracked_frame_step_sampled``: const-speed init from the device
    pose list (engaged from frame 2 on), the sampled tracking scan, the
    argmin-loss candidate, and the pose write-back at idx0+k — frame k+1
    reads the pose frame k just wrote.

    Returns (est_dev', candidates (G,7), c2w44s (G,4,4),
    init_tensors (G,7), losses (G,iters))."""
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)

    def frame(est, inp):
        pi, pj, pd, pc, off = inp
        idx = idx0 + off
        pre = est[idx - 1]
        if tcfg.const_speed_assumption:
            prepre = est[jnp.maximum(idx - 2, 0)]
            cs = (pre @ jnp.linalg.inv(prepre)) @ pre
            init_c2w = jnp.where(idx >= 2, cs, pre)
        else:
            init_c2w = pre
        init_tensor = tensor_from_pose(init_c2w)
        candidate, losses, _, _ = track_frame_sampled(
            spec, state, init_tensor, pi, pj, pd, pc, tcfg, rcfg,
        )
        c2w34 = pose_from_tensor(candidate)
        c2w44 = jnp.concatenate([c2w34, bottom], axis=0)
        est = est.at[idx].set(c2w44)
        return est, (candidate, c2w44, init_tensor, losses)

    offs = jnp.arange(pix_i.shape[0], dtype=jnp.int32)
    est_dev, (cands, c2w44s, inits, losses) = jax.lax.scan(
        frame, est_dev, (pix_i, pix_j, pix_depth, pix_color, offs))
    return est_dev, cands, c2w44s, inits, losses


def const_speed_init(
    pre_c2w: np.ndarray, pre_pre_c2w: Optional[np.ndarray]
) -> np.ndarray:
    """Constant-speed motion model: extrapolate the last relative motion
    (reference src/Tracker.py:192-198)."""
    if pre_pre_c2w is None:
        return pre_c2w
    delta = pre_c2w @ np.linalg.inv(pre_pre_c2w)
    return delta @ pre_c2w


@partial(jax.jit,
         static_argnames=("tcfg", "rcfg", "spec", "use_cs", "sel_cam"))
def tracked_frame_step(
    spec,
    state,
    est_dev: jnp.ndarray,
    idx: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    track_base: jax.Array,
    sel_base: jax.Array,
    kf_c2ws: jnp.ndarray,
    tcfg: "TrackerConfig",
    rcfg,
    use_cs: bool,
    sel_cam: Optional[Tuple[int, int, float, float, float, float]],
):
    """The WHOLE per-tracked-frame device program as ONE compiled module.

    Over a remote-tunnel device every module execution pays a fixed
    scheduling overhead (~5-15 ms measured, PERF.md r3), so the strict
    loop's previous shape — ~30 eager minis (pose slices, key splits,
    convert/squeeze) + 2-3 jitted calls per frame — was launch-bound, not
    compute-bound.  This fuses: constant-speed init from the device pose
    list, the tracking scan, the 4x4 pose write-back into ``est_dev``,
    and (on mapping frames) the keyframe-overlap ranking, into a single
    launch.  Per-frame PRNG keys fold in from fixed base keys so no host
    key-split module rides the loop.

    Returns (est_dev', candidate, c2w44, init_tensor, losses, cams,
    scores) — scores is None unless ``sel_cam`` (H, W, fx, fy, cx, cy)
    is given."""
    from nice_slam_tpu.slam.mapper import overlap_scores

    pre = est_dev[idx - 1]
    if use_cs:
        prepre = est_dev[jnp.maximum(idx - 2, 0)]
        init_c2w = (pre @ jnp.linalg.inv(prepre)) @ pre
    else:
        init_c2w = pre
    init_tensor = tensor_from_pose(init_c2w)

    track_key = jax.random.fold_in(track_base, idx)
    candidate, losses, cams, _ = track_frame(
        spec, state, init_tensor, gt_color, gt_depth, track_key, tcfg, rcfg
    )

    c2w34 = pose_from_tensor(candidate)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)
    c2w44 = jnp.concatenate([c2w34, bottom], axis=0)
    est_dev = est_dev.at[idx].set(c2w44)

    scores = None
    if sel_cam is not None:
        H, W, fx, fy, cx, cy = sel_cam
        scores = overlap_scores(
            jax.random.fold_in(sel_base, idx), gt_color, gt_depth,
            c2w34, kf_c2ws, H, W, fx, fy, cx, cy,
        )
    return est_dev, candidate, c2w44, init_tensor, losses, cams, scores


def c2w_from_candidate(candidate: jnp.ndarray) -> np.ndarray:
    """7-vector -> 4x4 with homogeneous bottom row (reference :248-252)."""
    c2w = np.asarray(_pose_from_tensor_jit(candidate))
    return np.concatenate([c2w, np.array([[0, 0, 0, 1.0]], np.float32)], axis=0)


def pose34_device(candidate: jnp.ndarray) -> jnp.ndarray:
    """7-vector -> (3, 4) pose, left ON DEVICE (no host sync) — lets callers
    chain device work (e.g. keyframe-overlap ranking) onto a still-in-flight
    tracking result and batch the fetches."""
    return _pose_from_tensor_jit(candidate)


_tensor_from_pose_jit = jax.jit(tensor_from_pose)
_pose_from_tensor_jit = jax.jit(pose_from_tensor)


def tensor_from_c2w(c2w) -> jnp.ndarray:
    # jitted: the eager op-by-op quaternion extraction costs ~50 small
    # dispatches per call, which dominated per-frame latency on slow hosts
    return _tensor_from_pose_jit(jnp.asarray(c2w, jnp.float32))
