"""Keyframe store: fixed-capacity HBM-resident ring of RGB-D keyframes.

The reference keeps keyframes as a mapper-process-local python list of CPU
tensors, re-uploading window members to GPU every iteration
(src/Mapper.py:82-83,439-440,611-617).  Here keyframes live in
fixed-capacity device arrays so window gathers are pure device ops and the
mapping step never touches the host; the logical count is host-side.
"""

from __future__ import annotations

from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _add_jit(arrays: "KeyframeArrays", i, color, depth, est_c2w, gt_c2w):
    """Admit one keyframe as ONE compiled module (4 eager .at[].set calls
    would be 4 module executions, each paying fixed per-module scheduling
    overhead over a remote-tunnel device — PERF.md r3)."""
    return KeyframeArrays(
        colors=arrays.colors.at[i].set(color),
        depths=arrays.depths.at[i].set(depth),
        est_c2w=arrays.est_c2w.at[i].set(est_c2w),
        gt_c2w=arrays.gt_c2w.at[i].set(gt_c2w),
    )


class KeyframeArrays(NamedTuple):
    colors: jnp.ndarray   # (K, H, W, 3) f32
    depths: jnp.ndarray   # (K, H, W) f32
    est_c2w: jnp.ndarray  # (K, 4, 4) f32
    gt_c2w: jnp.ndarray   # (K, 4, 4) f32


class KeyframeStore:
    """Host-managed ring of device-resident keyframes."""

    def __init__(self, capacity: int, H: int, W: int):
        self.capacity = capacity
        self.arrays = KeyframeArrays(
            colors=jnp.zeros((capacity, H, W, 3), jnp.float32),
            depths=jnp.zeros((capacity, H, W), jnp.float32),
            est_c2w=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
            gt_c2w=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
        )
        self.frame_ids: List[int] = []  # keyframe position -> source frame index

    def __len__(self) -> int:
        return len(self.frame_ids)

    def _grow(self) -> None:
        """Double the backing arrays (amortized O(1) per admission).

        The initial capacity covers the stock admission schedule
        (n_img // keyframe_every + slack); decoupled mapping cadences
        (sync_method 'free') or denser admission policies simply grow the
        store instead of crashing mid-run."""
        a = self.arrays
        pad = self.capacity  # double
        eye = jnp.tile(jnp.eye(4, dtype=jnp.float32), (pad, 1, 1))
        self.arrays = KeyframeArrays(
            colors=jnp.concatenate(
                [a.colors, jnp.zeros((pad,) + a.colors.shape[1:], jnp.float32)]),
            depths=jnp.concatenate(
                [a.depths, jnp.zeros((pad,) + a.depths.shape[1:], jnp.float32)]),
            est_c2w=jnp.concatenate([a.est_c2w, eye]),
            gt_c2w=jnp.concatenate([a.gt_c2w, eye]),
        )
        self.capacity += pad

    def add(self, frame_idx: int, color, depth, est_c2w, gt_c2w) -> None:
        i = len(self.frame_ids)
        if i >= self.capacity:
            self._grow()
        self.arrays = _add_jit(
            self.arrays, i,
            jnp.asarray(color, jnp.float32),
            jnp.asarray(depth, jnp.float32),
            jnp.asarray(est_c2w, jnp.float32),
            jnp.asarray(gt_c2w, jnp.float32),
        )
        self.frame_ids.append(frame_idx)

    def set_est_c2w(self, pos: int, c2w) -> None:
        a = self.arrays
        self.arrays = a._replace(est_c2w=a.est_c2w.at[pos].set(jnp.asarray(c2w)))

    def gather_window(self, positions) -> Tuple[jnp.ndarray, ...]:
        """Stack window keyframes: (colors, depths, est_c2w) for positions.

        ``positions`` may be a host list OR a device int array (the
        device-side window selection) — either way the gather itself is a
        pure device op and never syncs."""
        if isinstance(positions, jnp.ndarray):
            idx = positions.astype(jnp.int32)
        else:
            idx = jnp.asarray(np.asarray(positions, np.int32))
        a = self.arrays
        return a.colors[idx], a.depths[idx], a.est_c2w[idx]
