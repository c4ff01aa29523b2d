"""NiceSLAM orchestrator (L5): allocates state, drives tracking + mapping.

Replaces the reference's 3-process shared-memory runtime
(src/NICE_SLAM.py:62-90,288-307) with a functional design:

  * the scene map is a single authoritative ``SceneState`` pytree; the
    mapper returns a new value, the tracker snapshots by holding the
    reference (the deepcopy at src/Tracker.py:130-142 becomes free);
  * ``sync_method: strict`` (the default) is exactly a deterministic
    schedule — map frame 0, then per frame: track, and map every
    ``every_frame``-th frame (src/Tracker.py:161-167, src/Mapper.py:554-556)
    — so it runs single-process with zero synchronization;
  * ``loose``/``free`` run the tracker and mapper(s) as host threads with
    the reference's poll-on-flag gating; the map hand-off is an atomic
    pytree-reference swap instead of shared CUDA memory.

Public surface parity: ``NiceSLAM(cfg, args).run()``, the output tree
``{output}/{ckpts, mesh, tracking_vis|vis, mapping_vis}``, checkpoint
contents, and the camera preprocessing (crop_size/crop_edge intrinsics
rescale, src/NICE_SLAM.py:113-135).
"""

from __future__ import annotations

import os
import threading
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.pretrain import load_pretrain
from nice_slam_tpu.models.scene import build_scene
from nice_slam_tpu.ops.render import RenderConfig
from nice_slam_tpu.slam.keyframes import KeyframeStore
from nice_slam_tpu.slam.mapper import Mapper, MapperConfig
from nice_slam_tpu.slam.tracker import (
    TrackerConfig,
    c2w_from_candidate,
    const_speed_init,
    PixelPack,
    pose34_device,
    presample_pixels,
    tracked_frame_step,
    tracked_frames_step_sampled,
    tensor_from_c2w,
    track_frame,
)
from nice_slam_tpu.utils.datasets import get_dataset
from nice_slam_tpu.utils.logger import Logger
from nice_slam_tpu.utils.visualizer import Visualizer


def update_cam(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Apply crop_size / crop_edge to the intrinsics
    (reference: src/NICE_SLAM.py:113-135)."""
    cam = dict(cfg["cam"])
    H, W = cam["H"], cam["W"]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    if "crop_size" in cam and cam["crop_size"] is not None:
        th, tw = cam["crop_size"]
        fx, cx = fx * tw / W, cx * tw / W
        fy, cy = fy * th / H, cy * th / H
        H, W = th, tw
    edge = cam.get("crop_edge", 0)
    if edge > 0:
        H -= 2 * edge
        W -= 2 * edge
        cx -= edge
        cy -= edge
    cam.update({"H": H, "W": W, "fx": fx, "fy": fy, "cx": cx, "cy": cy})
    return cam


def _dequant_fn(pds: float, scale: float):
    """Jitted device dequant replaying BaseDataset's exact f32 ops
    (color = u8/255, depth = u16/pds*scale)."""

    @jax.jit
    def dq(c8, d16):
        color = c8.astype(jnp.float32) / 255.0
        depth = d16.astype(jnp.float32) / pds * scale
        return color, depth

    return dq


def make_frame_uploader(frame_reader):
    """Host->device frame upload at SOURCE precision: full f32 RGB-D is
    ~13 MB at Replica resolution, but the data carries only u8 color +
    u16 depth of information (the reference reads exactly that from disk,
    src/utils/datasets.py:77-113) — so re-quantize on the host, ship 4 MB,
    and dequantize on device with the reader's f32 ops (values match to
    1 ulp; XLA may lower /const as a reciprocal multiply).  Falls back
    to the f32 upload for float-native datasets (``upload_quant`` None),
    depth that would clip at the u16 ceiling, or
    NICE_SLAM_TPU_QUANT_UPLOAD=0."""
    from nice_slam_tpu.utils.datasets import quantize_frame

    quant = getattr(frame_reader, "upload_quant", None)
    if os.environ.get("NICE_SLAM_TPU_QUANT_UPLOAD", "1") != "1":
        quant = None
    dq = _dequant_fn(*quant) if quant is not None else None

    def upload(color, depth):
        if dq is not None:
            packed = quantize_frame(color, depth, quant[0] / quant[1])
            if packed is not None:
                c8, d16 = packed
                return dq(jax.device_put(c8), jax.device_put(d16))
        return jax.device_put(np.asarray(color)), jax.device_put(
            np.asarray(depth))

    return upload


class NiceSLAM:
    """Main SLAM system. ``nice=True`` -> hierarchical grids; ``False`` -> iMAP*."""

    def __init__(self, cfg: Dict[str, Any], args):
        self.cfg = cfg
        self.args = args
        self.nice = getattr(args, "nice", True)
        self.verbose = cfg["verbose"]
        self.sync_method = cfg["sync_method"]
        self.coarse = bool(cfg["coarse"]) and self.nice
        self.scale = cfg["scale"]

        self.output = getattr(args, "output", None) or cfg["data"]["output"]
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(os.path.join(self.output, "mesh"), exist_ok=True)

        self.cam = update_cam(cfg)
        self.H, self.W = self.cam["H"], self.cam["W"]

        # scene representation
        self.spec, self.state = build_scene(cfg, nice=self.nice)
        if self.nice:
            self.state = load_pretrain(cfg, self.spec, self.state, self.verbose)
        # spatial grid sharding (scenes beyond one chip's HBM): engaged by
        # NICE_SLAM_TPU_SPATIAL=1 or automatically when the dense grids
        # exceed the HBM budget on a multi-device mesh; every downstream
        # consumer is sharding-transparent via the grid-type dispatch in
        # ops.interp.sample_grid_feature
        from nice_slam_tpu.parallel.grid_sharding import maybe_shard_state

        self.state, self.spatial_mesh = maybe_shard_state(
            self.state, verbose=self.verbose)

        # data
        self.frame_reader = get_dataset(cfg, args, self.scale)
        self.n_img = len(self.frame_reader)

        # pose lists (host side; published to the checkpoint)
        self.estimate_c2w_list = np.zeros((self.n_img, 4, 4), np.float32)
        self.gt_c2w_list = np.zeros((self.n_img, 4, 4), np.float32)
        # DEVICE-resident estimate list (strict fast path): per-frame pose
        # results never cross the device->host boundary on the hot loop —
        # one fetch over a remote tunnel costs 40-600 ms (PERF.md r3), so
        # the host mirror above is flushed lazily at ckpt/vis/mesh/end
        # boundaries instead of every frame
        self._est_dev = None
        self._pend = []  # queued presampled frames (idx, PixelPack, gt_c2w)
        self.idx = 0               # latest tracked frame
        self.mapping_idx = -1      # latest mapped frame
        self.mapping_cnt = 0
        self.mapping_first_frame = 0
        self._state_lock = threading.Lock()
        # Guards the device pose list (_est_dev) read->dispatch->assign
        # windows: in loose/free the tracker thread replaces the whole list
        # (its step threads the list through the device program) while the
        # mapper thread point-writes BA pose updates — unguarded, a BA
        # write landing inside the tracker's window is silently lost.
        # Strict is single-threaded so the lock is uncontended there; every
        # hold is an async dispatch (no device sync under the lock).
        self._est_lock = threading.RLock()

        # configs
        self.rcfg = RenderConfig.from_cfg(cfg)
        self.tcfg = TrackerConfig.from_cfg(cfg, self.cam, self.nice)
        self.mcfg = MapperConfig.from_cfg(cfg, self.cam, self.nice, False)

        kf_capacity = self.n_img // self.mcfg.keyframe_every + 3
        self.keyframes = KeyframeStore(kf_capacity, self.H, self.W)

        self.mapper = Mapper(
            self.spec, self.mcfg, self.rcfg,
            save_selected_keyframes_info=cfg["mapping"].get(
                "save_selected_keyframes_info", False),
        )
        self.coarse_mapper = None
        if self.coarse:
            ccfg = MapperConfig.from_cfg(cfg, self.cam, self.nice, True)
            self.coarse_mapper = Mapper(self.spec, ccfg, self.rcfg, seed=7)
            # pin the coarse mapper to its own chip when one is available:
            # coarse and main mapping share no grids, so the strict loop's
            # back-to-back dispatch executes them concurrently (reference
            # overlaps them as separate processes, src/NICE_SLAM.py:288-307)
            devs = jax.devices()
            if (len(devs) > 1 and self.spatial_mesh is None
                    and os.environ.get("NICE_SLAM_TPU_COARSE_DEVICE", "1")
                    == "1"):
                self.coarse_mapper.device = devs[-1]
                self.coarse_mapper.mesh = None  # dedicated chip, no ray DP

        self.logger = Logger(self.output, self.spec, self.verbose)

        in_demo = "Demo" in self.output
        self.tracking_visualizer = Visualizer(
            freq=cfg["tracking"]["vis_freq"],
            inside_freq=cfg["tracking"]["vis_inside_freq"],
            vis_dir=os.path.join(self.output, "vis" if in_demo else "tracking_vis"),
            spec=self.spec, rcfg=self.rcfg, cam=self.cam, verbose=self.verbose,
        )
        self.mapping_visualizer = None
        if not in_demo:  # reference disables mapping vis in demo (Mapper.py:87)
            self.mapping_visualizer = Visualizer(
                freq=cfg["mapping"]["vis_freq"],
                inside_freq=cfg["mapping"]["vis_inside_freq"],
                vis_dir=os.path.join(self.output, "mapping_vis"),
                spec=self.spec, rcfg=self.rcfg, cam=self.cam, verbose=self.verbose,
            )

        self.mesher = None
        if cfg.get("meshing") is not None:
            try:
                from nice_slam_tpu.utils.mesher import Mesher

                self.mesher = Mesher(cfg, self.cam, self.spec, self.output)
            except ImportError:
                pass

        self._track_key = jax.random.PRNGKey(int(cfg.get("seed", 42)))
        # fixed base keys for the fused per-frame step: per-frame keys are
        # fold_in(base, idx) INSIDE the jit, so no host key-split module
        # rides the hot loop
        self._track_base = jax.random.PRNGKey(
            int(cfg.get("seed", 42)) ^ 0x5EED)
        self._sel_base = jax.random.PRNGKey(int(cfg.get("seed", 42)) + 7919)
        self._start_idx = 0
        # per-stage wall-clock accounting (written to {output}/timings.json)
        self.timings = {"tracking_s": 0.0, "mapping_s": 0.0,
                        "coarse_mapping_s": 0.0, "meshing_s": 0.0,
                        "frames": 0,
                        # event counts -> per-event costs in timings.json
                        # (each key is written by exactly one thread)
                        "tracked_frames": 0, "mapping_events": 0,
                        "coarse_mapping_events": 0}
        self.print_output_desc()

    # ------------------------------------------------------------------
    # Resume (capability the reference lacks: its Logger only writes,
    # SURVEY.md §5.4)
    # ------------------------------------------------------------------

    def resume(self) -> int:
        """Restore the latest checkpoint; returns the frame index to resume
        from (0 if no checkpoint exists)."""
        import glob

        from nice_slam_tpu.utils.logger import load_checkpoint

        ckpts = sorted(glob.glob(os.path.join(self.output, "ckpts", "*.tar")))
        if not ckpts:
            return 0
        state, est, gt, kf_list, idx = load_checkpoint(
            ckpts[-1], self.spec, self.state
        )
        if self.spatial_mesh is not None:
            from nice_slam_tpu.parallel.grid_sharding import shard_scene_grids

            state = state._replace(
                grids=shard_scene_grids(state.grids, self.spatial_mesh))
        with self._state_lock:
            self.state = state
        n = min(len(est), self.n_img)
        self.estimate_c2w_list[:n] = est[:n]
        self.gt_c2w_list[:n] = gt[:n]
        # keyframe images are not checkpointed (reference Logger.py:29
        # excludes them) — re-read them from the dataset
        for kf_idx in kf_list:
            _, color, depth, gt_c2w = self.frame_reader[kf_idx]
            self.keyframes.add(kf_idx, color, depth,
                               self.estimate_c2w_list[kf_idx],
                               np.asarray(gt_c2w))
        self.idx = idx
        self.mapping_idx = idx
        self.mapping_first_frame = 1
        self._start_idx = idx + 1
        print(f"INFO: resumed from {ckpts[-1]} at frame {idx}")
        return self._start_idx

    # ------------------------------------------------------------------
    def print_output_desc(self) -> None:
        print(f"INFO: The output folder is {self.output}")
        if "Demo" in self.output:
            print(f"INFO: The GT, generated and residual depth/color images can "
                  f"be found under {self.output}/vis/")
        else:
            print(f"INFO: The GT, generated and residual depth/color images can "
                  f"be found under {self.output}/tracking_vis/ and "
                  f"{self.output}/mapping_vis/")
        print(f"INFO: The mesh can be found under {self.output}/mesh/")
        print(f"INFO: The checkpoint can be found under {self.output}/ckpt/")

    # ------------------------------------------------------------------
    # Device-resident pose list (strict fast path)
    # ------------------------------------------------------------------

    def enable_device_pose_list(self) -> None:
        """Engage the device-resident estimate list (seeded from the host
        mirror).  _run_strict does this automatically; external drivers of
        track_one/map_one may opt in."""
        self._est_dev = jnp.asarray(self.estimate_c2w_list)

    def _flush_est(self) -> None:
        """Synchronize the host estimate_c2w_list mirror from the device
        list (one fetch; called at ckpt/vis/mesh/end boundaries only)."""
        with self._est_lock:
            if self._est_dev is not None:
                self.estimate_c2w_list[:] = np.asarray(self._est_dev)

    def _record_est(self, idx: int, c2w) -> None:
        """Record a tracked/updated pose.  Host values land in both lists;
        device values stay on device (mirror flushed lazily)."""
        with self._est_lock:
            if isinstance(c2w, np.ndarray):
                self.estimate_c2w_list[idx] = c2w
                if self._est_dev is not None:
                    self._est_dev = self._est_dev.at[idx].set(jnp.asarray(c2w))
            else:
                self._est_dev = self._est_dev.at[idx].set(c2w)

    def _cur_est(self, idx: int):
        """The current pose of ``idx`` for mapping: device slice on the
        fast path, host copy otherwise."""
        with self._est_lock:
            if self._est_dev is not None:
                return self._est_dev[idx]
            return self.estimate_c2w_list[idx].copy()

    # ------------------------------------------------------------------
    # Tracking
    # ------------------------------------------------------------------

    def _next_track_key(self):
        self._track_key, sub = jax.random.split(self._track_key)
        return sub

    def make_strict_packer(self):
        """Prefetcher ``packer`` for the strict schedule: frames the mapper,
        visualizer, or first/last-frame logic consumes are uploaded in full
        from the worker thread; every other tracked frame is presampled on
        the host and uploaded as a ~50 KB PixelPack — the tracker only ever
        reads ``iters x pixels`` pixels of a frame, so shipping the full
        13 MB RGB-D image per frame made the loop transfer-bound over this
        tunnel (PERF.md r3)."""
        every = self.mcfg.every_frame
        vf = self.tracking_visualizer.freq
        seed = int(self.cfg.get("seed", 42))
        tcfg = self.tcfg
        n_img = self.n_img
        upload_full = make_frame_uploader(self.frame_reader)

        presample = os.environ.get("NICE_SLAM_TPU_PRESAMPLE", "1") == "1"

        def packer(item):
            idx, color, depth, c2w = item
            will_map = idx % every == 0 or idx == n_img - 1
            full = (idx == 0 or will_map or idx % vf == 0 or tcfg.gt_camera
                    or not presample)
            if full:
                color_d, depth_d = upload_full(color, depth)
                return (idx, color_d, depth_d, c2w, None)
            # host arrays, NOT device_put: the strict loop batches a run of
            # these frames into one device module (_flush_packs) and the
            # stacked ~200 KB upload rides that single call
            pack = PixelPack(*presample_pixels(seed, idx, tcfg, color, depth))
            return (idx, color, depth, c2w, pack)

        return packer

    def enqueue_pack(self, idx: int, pix, gt_c2w) -> None:
        """Queue a presampled non-mapping frame for the next batched
        tracking module (``_flush_packs``).  Frames in the queue are
        consecutive by construction of the strict schedule."""
        if self._pend:
            assert idx == self._pend[-1][0] + 1, "packs must be consecutive"
        self._pend.append((idx, pix, np.asarray(gt_c2w, np.float32)))
        if len(self._pend) >= max(self.mcfg.every_frame - 1, 1):
            self.flush_packs()

    def flush_packs(self) -> None:
        """Track every queued presampled frame in ONE device module
        (tracked_frames_step_sampled): each module execution costs a fixed
        host-dispatch overhead over a remote-tunnel device (~10-15 ms,
        PERF.md r3), so the 4 non-mapping frames between two mapping events
        dispatch once instead of four times."""
        if not self._pend:
            return
        _t0 = time.perf_counter()
        idx0 = self._pend[0][0]
        pi = np.stack([p.i for _, p, _ in self._pend])
        pj = np.stack([p.j for _, p, _ in self._pend])
        pd = np.stack([p.depth for _, p, _ in self._pend])
        pc = np.stack([p.color for _, p, _ in self._pend])
        with self._state_lock:
            state = self.state
        with self._est_lock:
            (self._est_dev, cands, _, inits, losses) = \
                tracked_frames_step_sampled(
                    self.spec, state, self._est_dev, np.int32(idx0),
                    pi, pj, pd, pc, self.tcfg, self.rcfg,
                )
        if self.verbose:
            l = np.asarray(losses)
            inits_np = np.asarray(inits)
            cands_np = np.asarray(cands)
            for k, (idx, _, gtc) in enumerate(self._pend):
                gt_tensor = np.asarray(tensor_from_c2w(gtc))
                err0 = float(np.mean(np.abs(gt_tensor - inits_np[k])))
                err1 = float(np.mean(np.abs(gt_tensor - cands_np[k])))
                print(f"Tracking Frame {idx}  re-rendering loss: "
                      f"{l[k, 0]:.2f}->{l[k, -1]:.2f}  "
                      f"camera tensor error: {err0:.4f}->{err1:.4f}")
        for idx, _, gtc in self._pend:
            self.gt_c2w_list[idx] = gtc
        self.idx = self._pend[-1][0]
        self.timings["tracked_frames"] += len(self._pend)
        self._pend.clear()
        self.timings["tracking_s"] += time.perf_counter() - _t0

    def track_one(self, idx: int, gt_color, gt_depth, gt_c2w,
                  will_map: bool = False) -> np.ndarray:
        """Track a single frame (reference Tracker.run body,
        src/Tracker.py:152-258).  ``will_map``: a mapping call on this frame
        follows immediately (strict schedule) — dispatch the mapper's
        keyframe-overlap ranking before syncing on the tracked pose so both
        device results return in one fetch.  (Non-mapping frames go through
        enqueue_pack/flush_packs instead: batched presampled tracking.)"""
        _t0 = time.perf_counter()
        try:
            return self._track_one(idx, gt_color, gt_depth, gt_c2w, will_map)
        finally:
            self.timings["tracking_s"] += time.perf_counter() - _t0
            self.timings["tracked_frames"] += 1

    def _track_one(self, idx: int, gt_color, gt_depth, gt_c2w,
                   will_map: bool = False) -> np.ndarray:
        if idx == 0 or self.tcfg.gt_camera:
            c2w = np.asarray(gt_c2w, np.float32)
            if will_map:
                # nothing to overlap with, but dispatching early still hides
                # the device latency behind map_one's host-side prologue
                sc = self.mapper.prefetch_selection(
                    idx, gt_color, gt_depth, c2w[:3], self.keyframes)
                if sc is not None:
                    try:
                        sc.copy_to_host_async()
                    except Exception:
                        pass
            if idx % self.tracking_visualizer.freq == 0 and not (
                idx == 0 and self.cfg["mapping"]["no_vis_on_first_frame"]
            ):
                with self._state_lock:
                    state = self.state
                self.tracking_visualizer.vis(idx, 0, gt_depth, gt_color, c2w, state)
        elif self._est_dev is not None:
            # FAST PATH: the whole per-frame device program (const-speed
            # init from the device pose list, tracking scan, pose
            # write-back, overlap ranking on mapping frames) is ONE
            # compiled module — each module execution pays a fixed
            # scheduling overhead over a remote-tunnel device (~5-15 ms
            # measured), so launch count, not compute, bounded the loop
            # (PERF.md r3)
            use_cs = bool(self.tcfg.const_speed_assumption and idx >= 2)
            n_kf = len(self.keyframes)
            sel_cam = None
            if (will_map and n_kf >= 2
                    and self.mapper.mcfg.keyframe_selection_method
                    == "overlap"):
                m = self.mapper.mcfg
                sel_cam = (m.H, m.W, m.fx, m.fy, m.cx, m.cy)
            with self._state_lock:
                state = self.state
            with self._est_lock:
                (self._est_dev, candidate, c2w, init_tensor, losses, cams,
                 scores_dev) = tracked_frame_step(
                    self.spec, state, self._est_dev, idx,
                    jnp.asarray(gt_color), jnp.asarray(gt_depth),
                    self._track_base, self._sel_base,
                    self.keyframes.arrays.est_c2w, self.tcfg, self.rcfg,
                    use_cs, sel_cam,
                )
            if scores_dev is not None:
                self.mapper._pending_selection = [idx, n_kf, scores_dev]
                from nice_slam_tpu.slam.mapper import _DEVICE_SELECT

                if not _DEVICE_SELECT:
                    # host-side selection will consume the scores: start
                    # their D2H now so it overlaps the dispatches
                    try:
                        scores_dev.copy_to_host_async()
                    except Exception:
                        pass
            if self.verbose:
                l = np.asarray(losses)
                gt_tensor = np.asarray(tensor_from_c2w(np.asarray(gt_c2w)))
                err0 = float(np.mean(np.abs(gt_tensor
                                            - np.asarray(init_tensor))))
                err1 = float(np.mean(np.abs(gt_tensor
                                            - np.asarray(candidate))))
                print(f"Tracking Frame {idx}  re-rendering loss: "
                      f"{l[0]:.2f}->{l[-1]:.2f}  "
                      f"camera tensor error: {err0:.4f}->{err1:.4f}")
            if idx % self.tracking_visualizer.freq == 0:
                cams_np = np.asarray(cams)
                for it in range(0, self.tcfg.iters,
                                self.tracking_visualizer.inside_freq):
                    pre_step = init_tensor if it == 0 else cams_np[it - 1]
                    self.tracking_visualizer.vis(
                        idx, it, gt_depth, gt_color, pre_step, state
                    )
            self.gt_c2w_list[idx] = np.asarray(gt_c2w, np.float32)
            self.idx = idx
            return c2w
        else:
            pre_c2w = self.estimate_c2w_list[idx - 1]
            if self.tcfg.const_speed_assumption and idx - 2 >= 0:
                init_c2w = const_speed_init(
                    pre_c2w, self.estimate_c2w_list[idx - 2])
            else:
                init_c2w = pre_c2w
            init_tensor = tensor_from_c2w(init_c2w)

            with self._state_lock:
                state = self.state  # functional snapshot (free)

            candidate, losses, cams, _ = track_frame(
                self.spec, state, init_tensor,
                jnp.asarray(gt_color), jnp.asarray(gt_depth),
                self._next_track_key(), self.tcfg, self.rcfg,
            )
            scores_dev = None
            if will_map:
                # async: uses the still-in-flight tracked pose on device
                scores_dev = self.mapper.prefetch_selection(
                    idx, gt_color, gt_depth, pose34_device(candidate),
                    self.keyframes)
            if scores_dev is not None:
                c2w34, scores = jax.device_get(
                    (pose34_device(candidate), scores_dev))
                self.mapper.store_prefetched_scores(scores)
                c2w = np.concatenate(
                    [c2w34, np.array([[0, 0, 0, 1.0]], np.float32)], axis=0)
            else:
                c2w = c2w_from_candidate(candidate)
            if self.verbose:
                # loss trajectory + camera-tensor error vs GT (reference
                # src/Tracker.py:221-244 verbose block)
                l = np.asarray(losses)
                gt_tensor = np.asarray(tensor_from_c2w(np.asarray(gt_c2w)))
                err0 = float(np.mean(np.abs(gt_tensor - np.asarray(init_tensor))))
                err1 = float(np.mean(np.abs(gt_tensor - np.asarray(candidate))))
                print(f"Tracking Frame {idx}  re-rendering loss: "
                      f"{l[0]:.2f}->{l[-1]:.2f}  "
                      f"camera tensor error: {err0:.4f}->{err1:.4f}")
            if idx % self.tracking_visualizer.freq == 0:
                # per-iteration panels: the reference renders at the top of
                # every vis_inside_freq-th optimization iteration with the
                # pre-step camera tensor (src/Tracker.py:225-231) — iter 0
                # renders the motion-model init, iter i the post-step tensor
                # of iter i-1 (the scan already returns every per-iter pose)
                cams_np = np.asarray(cams)
                for it in range(0, self.tcfg.iters,
                                self.tracking_visualizer.inside_freq):
                    pre_step = init_tensor if it == 0 else cams_np[it - 1]
                    self.tracking_visualizer.vis(
                        idx, it, gt_depth, gt_color, pre_step, state
                    )

        self._record_est(idx, c2w)
        self.gt_c2w_list[idx] = np.asarray(gt_c2w, np.float32)
        self.idx = idx
        return c2w

    # ------------------------------------------------------------------
    # Mapping
    # ------------------------------------------------------------------

    def map_one(self, idx: int, gt_color, gt_depth, gt_c2w,
                init: bool, coarse: bool = False) -> None:
        """Map a frame with the main (or coarse) mapper
        (reference Mapper.run body, src/Mapper.py:542-657)."""
        _t0 = time.perf_counter()
        try:
            return self._map_one(idx, gt_color, gt_depth, gt_c2w, init, coarse)
        finally:
            key = "coarse_mapping_s" if coarse else "mapping_s"
            self.timings[key] += time.perf_counter() - _t0
            self.timings["coarse_mapping_events" if coarse
                         else "mapping_events"] += 1

    def _map_one(self, idx: int, gt_color, gt_depth, gt_c2w,
                 init: bool, coarse: bool = False) -> None:
        mapper = self.coarse_mapper if coarse else self.mapper
        cfg_m = self.cfg["mapping"]

        if not init:
            lr_factor = cfg_m["lr_factor"]
            num_joint_iters = cfg_m["iters"]
            if idx == self.n_img - 1 and cfg_m["color_refine"] and not coarse:
                # final color refinement (reference :578-586)
                outer_joint_iters = 5
                mapper.mapping_window_size = self.mcfg.mapping_window_size * 2
                mapper.middle_iter_ratio = 0.0
                mapper.fine_iter_ratio = 0.0
                num_joint_iters *= 5
                mapper.fix_color = True
                mapper.frustum_feature_selection = False
            else:
                outer_joint_iters = 1 if self.nice else 3
        else:
            outer_joint_iters = 1
            lr_factor = cfg_m["lr_first_factor"]
            num_joint_iters = cfg_m["iters_first"]

        cur_c2w = self._cur_est(idx)
        num_joint_iters = num_joint_iters // outer_joint_iters

        # per-iteration residual panels inside the optimization (reference
        # src/Mapper.py:444-448): rendered from the pre-iteration map state
        # at every vis_inside_freq-th joint iteration of a vis frame
        vis_hook, vis_every = None, 0
        if (not coarse and self.mapping_visualizer is not None
                and idx % self.mapping_visualizer.freq == 0
                and not (idx == 0 and cfg_m["no_vis_on_first_frame"])):
            vis_every = self.mapping_visualizer.inside_freq
            self._flush_est()  # panels render at the host-mirrored pose

            def vis_hook(it, st):
                self.mapping_visualizer.vis(
                    idx, it, gt_depth, gt_color,
                    self.estimate_c2w_list[idx], st,
                )

        for outer in range(outer_joint_iters):
            BA = (len(self.keyframes) > 4) and cfg_m["BA"] and not coarse

            with self._state_lock:
                state = self.state
            new_state, cur_out, losses = mapper.optimize_map(
                state, num_joint_iters, lr_factor, idx,
                gt_color, gt_depth, gt_c2w, self.keyframes, cur_c2w, BA,
                vis_hook=vis_hook, vis_every=vis_every,
            )
            with self._state_lock:
                if coarse:
                    # the coarse mapper owns only the coarse grid — merge it
                    # into the authoritative state (the main mapper may have
                    # advanced the other grids concurrently in loose/free)
                    grids = dict(self.state.grids)
                    gc = new_state.grids["grid_coarse"]
                    if mapper.device is not None:
                        # dedicated-chip coarse mapper: bring the updated
                        # grid back to the main state's placement (async) —
                        # match a MAIN grid's live sharding (the ray-DP
                        # path keeps main-state arrays replicated over the
                        # mesh, so the old coarse sharding can be stale)
                        ref = next(v for k, v in self.state.grids.items()
                                   if k != "grid_coarse")
                        gc = jax.device_put(gc, ref.sharding)
                    grids["grid_coarse"] = gc
                    self.state = self.state._replace(grids=grids)
                else:
                    grids = dict(new_state.grids)
                    if self.coarse and "grid_coarse" in self.state.grids:
                        grids["grid_coarse"] = self.state.grids["grid_coarse"]
                    self.state = new_state._replace(grids=grids)

            if BA and cur_out is not None:
                cur_c2w = cur_out
                self._record_est(idx, cur_c2w)

            if outer == outer_joint_iters - 1:
                if (idx % self.mcfg.keyframe_every == 0 or idx == self.n_img - 2) \
                        and (idx not in self.keyframes.frame_ids) and not coarse:
                    self.keyframes.add(idx, gt_color, gt_depth, cur_c2w,
                                       np.asarray(gt_c2w))

        if self.verbose:
            prefix = "Coarse " if coarse else ""
            print(f"{prefix}Mapping Frame {idx}  loss: "
                  f"{losses[0]:.2f}->{losses[-1]:.2f}")

        self.mapping_first_frame = 1
        if not coarse:
            if ((not (idx == 0 and cfg_m["no_log_on_first_frame"]))
                    and idx % cfg_m["ckpt_freq"] == 0) or idx == self.n_img - 1:
                self._flush_est()
                self.logger.log(idx, self.state, self.estimate_c2w_list,
                                self.gt_c2w_list, self.keyframes.frame_ids,
                                selected_keyframes=self.mapper.selected_keyframes)
            self.mapping_idx = idx
            self.mapping_cnt += 1

            mesh_freq = cfg_m["mesh_freq"]
            if self.mesher is not None:
                if (idx % mesh_freq == 0) and not (
                    idx == 0 and cfg_m["no_mesh_on_first_frame"]
                ):
                    self._mesh(f"{self.output}/mesh/{idx:05d}_mesh.ply", idx)
                if idx == self.n_img - 1:
                    final = f"{self.output}/mesh/final_mesh.ply"
                    self._mesh(final, idx)
                    import shutil

                    shutil.copyfile(final, f"{self.output}/mesh/{idx:05d}_mesh.ply")
                    if self.cfg["meshing"]["eval_rec"]:
                        self._mesh(f"{self.output}/mesh/final_mesh_eval_rec.ply",
                                   idx, eval_rec=True)

    def _mesh(self, path: str, idx: int, eval_rec: bool = False) -> None:
        _t0 = time.perf_counter()
        try:
            self._flush_est()  # culling uses the host pose mirror
            with self._state_lock:
                state = self.state
            self.mesher.get_mesh(
                path, state, self.keyframes, self.estimate_c2w_list, idx,
                show_forecast=self.cfg["meshing"]["mesh_coarse_level"] and not eval_rec,
                clean_mesh=self.cfg["meshing"]["clean_mesh"],
                get_mask_use_all_frames=eval_rec,
            )
        except Exception as e:  # meshing must never kill the SLAM loop
            print(f"WARN: meshing failed at frame {idx}: {e}")
        finally:
            self.timings["meshing_s"] += time.perf_counter() - _t0

    # ------------------------------------------------------------------
    # Schedules
    # ------------------------------------------------------------------

    def run(self) -> None:
        import json

        t0 = time.perf_counter()
        if self.sync_method == "strict":
            self._run_strict()
        else:
            self._run_threaded()
        self._flush_est()
        self.timings["total_s"] = time.perf_counter() - t0
        self.timings["frames"] = self.n_img - self._start_idx
        if self.timings["frames"] > 0:
            self.timings["fps"] = self.timings["frames"] / max(
                self.timings["total_s"], 1e-9
            )
        # per-event costs: the cross-sync-mode comparison currency
        # (strict vs loose vs free run DIFFERENT event counts by design;
        # per-event cost is what "engineering parity" means, PERF.md)
        for skey, nkey, out in (
            ("tracking_s", "tracked_frames", "tracking_ms_per_frame"),
            ("mapping_s", "mapping_events", "mapping_ms_per_event"),
            ("coarse_mapping_s", "coarse_mapping_events",
             "coarse_mapping_ms_per_event"),
        ):
            if self.timings.get(nkey, 0) > 0:
                self.timings[out] = 1e3 * self.timings[skey] / self.timings[nkey]
        with open(os.path.join(self.output, "timings.json"), "w") as f:
            json.dump(self.timings, f, indent=2)

    def _should_map(self, idx: int) -> bool:
        return idx % self.mcfg.every_frame == 0 or idx == self.n_img - 1

    def _run_strict(self) -> None:
        """Deterministic sequential schedule — equivalent to the reference's
        strict-sync 3-process interleaving (SURVEY.md §2.2).  Frame IO runs
        on a background prefetch thread (the reference used DataLoader
        workers, src/Tracker.py:64-65)."""
        from nice_slam_tpu.utils.datasets import Prefetcher

        # engage the device-resident pose list (covers resumed poses)
        self.enable_device_pose_list()
        prefetch = Prefetcher(self.frame_reader, depth=4,
                              start=self._start_idx,
                              packer=self.make_strict_packer())
        for idx, gt_color, gt_depth, gt_c2w, pix in prefetch:
            if pix is not None:
                # presampled non-mapping frame: queue for the next batched
                # tracking module (one dispatch per run of such frames)
                self.enqueue_pack(idx, pix, gt_c2w)
                continue
            self.flush_packs()
            if idx == 0:
                self._record_est(0, np.asarray(gt_c2w, np.float32))
                self.gt_c2w_list[0] = np.asarray(gt_c2w)
                self.map_one(0, gt_color, gt_depth, gt_c2w, init=True)
                if self.coarse_mapper is not None:
                    self.map_one(0, gt_color, gt_depth, gt_c2w, init=True,
                                 coarse=True)
                self.idx = 0
                continue
            will_map = self._should_map(idx)
            self.track_one(idx, gt_color, gt_depth, gt_c2w, will_map=will_map)
            if will_map:
                self.map_one(idx, gt_color, gt_depth, gt_c2w, init=False)
                if self.coarse_mapper is not None and idx != self.n_img - 1:
                    self.map_one(idx, gt_color, gt_depth, gt_c2w, init=False,
                                 coarse=True)
        self.flush_packs()

    def _run_threaded(self) -> None:
        """loose/free sync: tracker + mapper(s) as concurrent host threads
        polling shared progress counters (reference :161-175, :550-563).

        Frame IO: the tracker consumes a background Prefetcher (sequential
        access, same as the strict loop) and publishes each frame to a small
        shared cache the mappers read instead of re-hitting the disk — the
        mappers' access pattern is "a frame the tracker just produced".

        The tracker thread runs the same engineering as the strict loop
        (device pose list -> fused per-frame module, u8/u16 quantized
        uploads); before any thread spawns, the first frames run on the
        MAIN thread so the big jit signatures (init mapping, non-init
        mapping, tracking module) compile serially — concurrent cold
        compiles from two threads crashed the XLA compile/cache path
        (utils/compile_guard.py holds the backstop lock for signatures
        that only appear mid-run, e.g. BA engaging at 5 keyframes)."""
        from nice_slam_tpu.utils.datasets import Prefetcher
        from nice_slam_tpu.utils import compile_guard

        if not compile_guard.is_installed():
            # The guard degrades to a no-op when the private hook target is
            # missing (unpinned JAX upgrade); concurrent cold compiles then
            # segfault the process — refuse loudly instead.
            raise RuntimeError(
                "loose/free sync requires the first-compile lock "
                "(utils/compile_guard.py) but it is not installed on this "
                "JAX version; use sync_method=strict or pin jax per "
                "requirements.txt")

        every = self.mcfg.every_frame
        frame_cache: Dict[int, tuple] = {}
        cache_lock = threading.Lock()

        def read_frame(idx: int):
            with cache_lock:
                if idx in frame_cache:
                    return frame_cache[idx]
            item = self.frame_reader[idx]
            _, gt_color, gt_depth, gt_c2w = item
            return gt_color, gt_depth, gt_c2w

        def publish_frame(idx, gt_color, gt_depth, gt_c2w):
            with cache_lock:
                frame_cache[idx] = (gt_color, gt_depth, gt_c2w)
                for k in [k for k in frame_cache if k < idx - 2 * every]:
                    del frame_cache[k]

        errors: list = []
        abort = threading.Event()
        self._abort = abort

        upload_full = make_frame_uploader(self.frame_reader)

        def quant_pack(item):
            idx, c, d, p = item
            cd, dd = upload_full(c, d)
            return idx, cd, dd, p

        # ---- main-thread warmup: frame 0 init mapping, the first two
        # tracked frames (use_cs False and True signatures), and one
        # non-init mapping event.  With the stock every_frame=5 this IS the
        # loose schedule's own prefix (first remap at idx >= 2); for other
        # cadences it adds at most one early mapping event, which only
        # spends extra optimization on a valid frame.
        try:
            idx0 = self.idx
            self.enable_device_pose_list()
            _, c0, d0, p0 = self.frame_reader[idx0]
            publish_frame(idx0, c0, d0, p0)
            if idx0 == 0:  # fresh start: anchor frame 0 at GT (resume
                self._record_est(0, np.asarray(p0, np.float32))  # keeps its
                self.gt_c2w_list[0] = np.asarray(p0)  # restored estimate)
            self.map_one(idx0, c0, d0, p0, init=True)
            if self.coarse_mapper is not None:
                self.map_one(idx0, c0, d0, p0, init=True, coarse=True)
            warm_last = idx0
            for t in (idx0 + 1, idx0 + 2):
                if t >= self.n_img:
                    break
                _, ct, dt, pt = self.frame_reader[t]
                cd, dd = upload_full(ct, dt)
                publish_frame(t, cd, dd, pt)
                self.track_one(t, cd, dd, pt)
                warm_last = t
            warm_map = idx0
            if warm_last > idx0:
                gc, gd, gp = read_frame(warm_last)
                self.map_one(warm_last, gc, gd, gp, init=False)
                if self.coarse_mapper is not None and warm_last != self.n_img - 1:
                    self.map_one(warm_last, gc, gd, gp, init=False, coarse=True)
                warm_map = warm_last
        except Exception as e:  # same contract as a thread failure
            raise RuntimeError(f"SLAM thread failed: {e!r}") from e

        def tracker_thread():
            prefetch = Prefetcher(self.frame_reader, depth=3,
                                  start=warm_last + 1,
                                  packer=quant_pack)
            try:
                for idx, gt_color, gt_depth, gt_c2w in prefetch:
                    publish_frame(idx, gt_color, gt_depth, gt_c2w)
                    if self.sync_method == "loose":
                        while self.mapping_idx < idx - every - every // 2:
                            if self._abort.is_set():
                                return
                            time.sleep(0.005)
                    if self._abort.is_set():
                        return
                    self.track_one(idx, gt_color, gt_depth, gt_c2w)
            finally:
                prefetch.close()

        def mapper_thread(coarse: bool):
            prev = warm_map
            while True:
                if self._abort.is_set():
                    return
                if prev == self.n_img - 1:
                    return
                idx = self.idx
                if idx == self.n_img - 1:
                    pass  # final frame: always map it
                elif self.sync_method == "loose":
                    if not (idx >= prev + every // 2):
                        time.sleep(0.005)
                        continue
                if idx == prev:
                    time.sleep(0.005)
                    continue
                prev = idx
                gt_color, gt_depth, gt_c2w = read_frame(idx)
                self.map_one(idx, gt_color, gt_depth, gt_c2w, init=False,
                             coarse=coarse)
                if idx == self.n_img - 1:
                    return

        # A crashed mapper deadlocks the reference's tracker poll loop
        # (src/Tracker.py:165-172, SURVEY.md §5.3).  Here every thread
        # records its exception and trips a shared abort flag the pollers
        # also watch, so failures surface instead of hanging.
        def guarded(fn, *fargs):
            def run():
                try:
                    fn(*fargs)
                except Exception as e:  # noqa: BLE001 — report any failure
                    errors.append(e)
                    abort.set()
            return run

        threads = [threading.Thread(target=guarded(mapper_thread, False))]
        if self.coarse_mapper is not None:
            threads.append(threading.Thread(target=guarded(mapper_thread, True)))
        threads.append(threading.Thread(target=guarded(tracker_thread)))
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise RuntimeError(
                f"SLAM thread failed: {errors[0]!r}"
            ) from errors[0]
