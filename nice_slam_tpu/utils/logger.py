"""Checkpointing (L6) — torch-serialization-compatible, plus real resume.

The reference writes ``{output}/ckpts/{idx:05d}.tar`` via torch.save with
keys {c, decoder_state_dict, gt_c2w_list, estimate_c2w_list, keyframe_list,
selected_keyframes, idx} (reference: src/utils/Logger.py:21-32), consumed
by the offline viewer and ATE eval.  This logger emits the same structure
(grids exported to the reference's [1, C, Z, Y, X] layout, decoder params
to torch state-dict naming) so reference-side consumers can read our
checkpoints — and unlike the reference, ``load_checkpoint`` restores a
runnable SceneState (the reference has no resume path, SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
import torch

from nice_slam_tpu.models.scene import SceneSpec, SceneState


# ---------------------------------------------------------------------------
# Layout converters
# ---------------------------------------------------------------------------

def grid_to_torch_layout(grid: np.ndarray) -> torch.Tensor:
    """(Nx, Ny, Nz, C) -> [1, C, Nz, Ny, Nx] (reference grid storage,
    src/NICE_SLAM.py:213-250)."""
    return torch.from_numpy(np.ascontiguousarray(np.transpose(grid, (3, 2, 1, 0))))[None]


def grid_from_torch_layout(t) -> np.ndarray:
    arr = np.asarray(t)
    if arr.ndim == 5:
        arr = arr[0]
    return np.ascontiguousarray(np.transpose(arr, (3, 2, 1, 0)))


def _mlp_to_state_dict(params: Dict[str, Any], prefix: str) -> Dict[str, torch.Tensor]:
    """Functional MLP params -> torch-style state dict (weights transposed
    to torch's (out, in) convention)."""
    sd: Dict[str, torch.Tensor] = {}

    def t(x):
        return torch.from_numpy(np.array(x))  # copy: jax buffers are read-only

    if "embedder_B" in params:
        sd[prefix + "embedder._B"] = t(params["embedder_B"])
    if "embedder_w" in params:
        sd[prefix + "embedder.weight"] = t(params["embedder_w"]).T
        sd[prefix + "embedder.bias"] = t(params["embedder_b"])
    for i, layer in enumerate(params["pts_linears"]):
        sd[f"{prefix}pts_linears.{i}.weight"] = t(layer["w"]).T.contiguous()
        sd[f"{prefix}pts_linears.{i}.bias"] = t(layer["b"])
    for i, layer in enumerate(params.get("fc_c", [])):
        sd[f"{prefix}fc_c.{i}.weight"] = t(layer["w"]).T.contiguous()
        sd[f"{prefix}fc_c.{i}.bias"] = t(layer["b"])
    sd[prefix + "output_linear.weight"] = t(params["output_linear"]["w"]).T.contiguous()
    sd[prefix + "output_linear.bias"] = t(params["output_linear"]["b"])
    return sd


def _mlp_from_state_dict(
    sd: Dict[str, Any], prefix: str, template: Dict[str, Any]
) -> Dict[str, Any]:
    """Torch-style state dict -> functional MLP params (template supplies
    structure)."""
    out = dict(template)

    def g(name):
        return jnp.asarray(np.asarray(sd[prefix + name]))

    if "embedder_B" in template:
        out["embedder_B"] = g("embedder._B")
    if "embedder_w" in template:
        out["embedder_w"] = g("embedder.weight").T
        out["embedder_b"] = g("embedder.bias")
    out["pts_linears"] = [
        {"w": g(f"pts_linears.{i}.weight").T, "b": g(f"pts_linears.{i}.bias")}
        for i in range(len(template["pts_linears"]))
    ]
    if "fc_c" in template:
        out["fc_c"] = [
            {"w": g(f"fc_c.{i}.weight").T, "b": g(f"fc_c.{i}.bias")}
            for i in range(len(template["fc_c"]))
        ]
    out["output_linear"] = {
        "w": g("output_linear.weight").T,
        "b": g("output_linear.bias"),
    }
    return out


def decoders_to_state_dict(spec: SceneSpec, decoders) -> Dict[str, torch.Tensor]:
    if spec.nice:
        sd = {}
        for name, params in decoders.items():
            sd.update(_mlp_to_state_dict(params, f"{name}_decoder."))
        return sd
    return _mlp_to_state_dict(decoders, "")


def decoders_from_state_dict(spec: SceneSpec, sd, template):
    if spec.nice:
        return {
            name: _mlp_from_state_dict(sd, f"{name}_decoder.", params)
            for name, params in template.items()
        }
    return _mlp_from_state_dict(sd, "", template)


# ---------------------------------------------------------------------------
# Logger
# ---------------------------------------------------------------------------

class Logger:
    """Writes reference-compatible checkpoint .tar files."""

    def __init__(self, output: str, spec: SceneSpec, verbose: bool = True):
        self.ckptsdir = os.path.join(output, "ckpts")
        os.makedirs(self.ckptsdir, exist_ok=True)
        self.spec = spec
        self.verbose = verbose

    def log(
        self,
        idx: int,
        state: SceneState,
        estimate_c2w_list: np.ndarray,
        gt_c2w_list: np.ndarray,
        keyframe_list,
        selected_keyframes=None,
    ) -> str:
        path = os.path.join(self.ckptsdir, f"{idx:05d}.tar")
        grids = state.grids
        if any(hasattr(g, "slabs") for g in grids.values()):
            # spatially sharded store: checkpoints stay dense/reference-
            # compatible (the export boundary materializes each grid once)
            from nice_slam_tpu.parallel.grid_sharding import dense_grids

            grids = dense_grids(grids)
        c = {
            name: grid_to_torch_layout(np.asarray(grid))
            for name, grid in grids.items()
        }
        payload = {
            "c": c,
            "decoder_state_dict": decoders_to_state_dict(self.spec, state.decoders),
            "gt_c2w_list": torch.from_numpy(np.asarray(gt_c2w_list)),
            "estimate_c2w_list": torch.from_numpy(np.asarray(estimate_c2w_list)),
            "keyframe_list": list(keyframe_list),
            "selected_keyframes": selected_keyframes,
            "idx": idx,
            # extras for native resume (ignored by reference consumers)
            "bound": torch.from_numpy(np.array(state.bound)),
        }
        torch.save(payload, path)
        if self.verbose:
            print(f"Saved checkpoints at {path}")
        return path


def load_checkpoint(
    path: str, spec: SceneSpec, template_state: SceneState
) -> Tuple[SceneState, np.ndarray, np.ndarray, list, int]:
    """Restore (SceneState, estimate_c2w_list, gt_c2w_list, keyframe_list,
    idx) from a checkpoint — the resume path the reference lacks."""
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    grids = {
        name: jnp.asarray(grid_from_torch_layout(t))
        for name, t in ckpt["c"].items()
    }
    decoders = decoders_from_state_dict(
        spec, ckpt["decoder_state_dict"], template_state.decoders
    )
    state = template_state._replace(decoders=decoders, grids=grids)
    est = np.asarray(ckpt["estimate_c2w_list"])
    gt = np.asarray(ckpt["gt_c2w_list"])
    return state, est, gt, list(ckpt["keyframe_list"]), int(ckpt["idx"])
