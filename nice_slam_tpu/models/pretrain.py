"""Import pretrained ConvONet decoder checkpoints (torch .pt) into the
functional parameter pytree.

The reference freezes pretrained coarse/middle/fine decoders loaded with
key-prefix surgery from two ConvONet checkpoints (reference:
src/NICE_SLAM.py:159-190): keys containing 'decoder' but not 'encoder' are
kept; in middle_fine.pt the 'coarse' branch is the middle decoder and the
'fine' branch is the fine decoder.

The blobs are large-file artifacts not always present; ``load_pretrain``
is a no-op (random init stands) when the files are missing.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.scene import SceneSpec, SceneState


def _strip(ckpt_model: Dict[str, Any], skip: int) -> Dict[str, np.ndarray]:
    out = {}
    for key, val in ckpt_model.items():
        if "decoder" in key and "encoder" not in key:
            out[key[skip:]] = np.asarray(val.cpu() if hasattr(val, "cpu") else val)
    return out


def _apply_torch_names(params: Dict[str, Any], sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Overlay torch-named tensors onto a functional MLP param dict."""
    out = dict(params)
    if "embedder._B" in sd:
        out["embedder_B"] = jnp.asarray(sd["embedder._B"])
    new_pts = []
    for i, layer in enumerate(params["pts_linears"]):
        w = sd.get(f"pts_linears.{i}.weight")
        b = sd.get(f"pts_linears.{i}.bias")
        new_pts.append(
            {
                "w": jnp.asarray(w.T) if w is not None else layer["w"],
                "b": jnp.asarray(b) if b is not None else layer["b"],
            }
        )
    out["pts_linears"] = new_pts
    if "fc_c" in params:
        new_fc = []
        for i, layer in enumerate(params["fc_c"]):
            w = sd.get(f"fc_c.{i}.weight")
            b = sd.get(f"fc_c.{i}.bias")
            new_fc.append(
                {
                    "w": jnp.asarray(w.T) if w is not None else layer["w"],
                    "b": jnp.asarray(b) if b is not None else layer["b"],
                }
            )
        out["fc_c"] = new_fc
    if "output_linear.weight" in sd:
        out["output_linear"] = {
            "w": jnp.asarray(sd["output_linear.weight"].T),
            "b": jnp.asarray(sd["output_linear.bias"]),
        }
    return out


def load_pretrain(
    cfg: Dict[str, Any], spec: SceneSpec, state: SceneState, verbose: bool = True
) -> SceneState:
    """Load coarse.pt / middle_fine.pt into the decoder pytree if present."""
    if not spec.nice:
        return state
    import torch

    decoders = dict(state.decoders)
    paths = cfg.get("pretrained_decoders", {})

    coarse_path = paths.get("coarse", "")
    if spec.coarse and os.path.exists(coarse_path):
        ckpt = torch.load(coarse_path, map_location="cpu", weights_only=False)
        coarse_sd = _strip(ckpt["model"], skip=8)  # drop 'decoder.'
        decoders["coarse"] = _apply_torch_names(decoders["coarse"], coarse_sd)
        if verbose:
            print(f"INFO: loaded pretrained coarse decoder from {coarse_path}")
    elif spec.coarse and verbose and coarse_path:
        print(f"WARN: pretrained coarse decoder missing at {coarse_path}; "
              "training coarse decoder from random init")

    mf_path = paths.get("middle_fine", "")
    if os.path.exists(mf_path):
        ckpt = torch.load(mf_path, map_location="cpu", weights_only=False)
        middle_sd, fine_sd = {}, {}
        for key, val in ckpt["model"].items():
            if "decoder" in key and "encoder" not in key:
                arr = np.asarray(val.cpu() if hasattr(val, "cpu") else val)
                if "coarse" in key:
                    middle_sd[key[8 + 7 :]] = arr  # 'decoder.coarse_'
                elif "fine" in key:
                    fine_sd[key[8 + 5 :]] = arr  # 'decoder.fine_'
        decoders["middle"] = _apply_torch_names(decoders["middle"], middle_sd)
        decoders["fine"] = _apply_torch_names(decoders["fine"], fine_sd)
        if verbose:
            print(f"INFO: loaded pretrained middle/fine decoders from {mf_path}")
    elif verbose and mf_path:
        print(f"WARN: pretrained middle/fine decoders missing at {mf_path}; "
              "training from random init")

    return state._replace(decoders=decoders)
