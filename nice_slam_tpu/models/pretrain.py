"""Import pretrained ConvONet decoder checkpoints (torch .pt) into the
functional parameter pytree.

The reference freezes pretrained coarse/middle/fine decoders loaded with
key-prefix surgery from two ConvONet checkpoints (reference:
src/NICE_SLAM.py:159-190):

  * every checkpoint is ``{'model': state_dict}``; only keys containing
    'decoder' but not 'encoder' are used (ConvONet ships an encoder too);
  * ``coarse.pt``: ``decoder.<param>`` -> the coarse ``MLP_no_xyz``
    (params: ``pts_linears.{i}.weight/bias``, ``output_linear.weight/bias``);
  * ``middle_fine.pt``: ``decoder.coarse_<param>`` -> the MIDDLE decoder,
    ``decoder.fine_<param>`` -> the fine decoder (both reference ``MLP``s:
    ``embedder._B``, ``fc_c.{i}.weight/bias``, ``pts_linears.{i}.weight/
    bias``, ``output_linear.weight/bias``) — the pretraining model named
    its branches coarse/fine, NICE-SLAM re-binds them to middle/fine.

Torch ``Linear.weight`` is (out, in); the functional pytree stores (in,
out), hence the transposes.  The import reports coverage: any decoder key
the surgery could not place, or any decoder parameter the checkpoint did
not provide, is surfaced (tests/test_logger_pretrain.py drives a fixture
checkpoint with the exact real-blob structure and asserts full coverage).

The blobs are large-file artifacts not always present; ``load_pretrain``
is a no-op (random init stands) when the files are missing.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Set, Tuple

import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.models.scene import SceneSpec, SceneState


def _to_np(val) -> np.ndarray:
    return np.asarray(val.cpu() if hasattr(val, "cpu") else val)


def surgery_coarse(ckpt_model: Dict[str, Any]) -> Dict[str, np.ndarray]:
    """coarse.pt key surgery (reference src/NICE_SLAM.py:167-175):
    keep decoder-not-encoder keys, strip the 8-char 'decoder.' prefix."""
    out = {}
    for key, val in ckpt_model.items():
        if "decoder" in key and "encoder" not in key:
            out[key[8:]] = _to_np(val)
    return out


def surgery_middle_fine(
    ckpt_model: Dict[str, Any]
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """middle_fine.pt key surgery (reference src/NICE_SLAM.py:177-190):
    'decoder.coarse_*' feeds the MIDDLE decoder (strip 8+7 chars),
    'decoder.fine_*' the fine decoder (strip 8+5 chars)."""
    middle_sd: Dict[str, np.ndarray] = {}
    fine_sd: Dict[str, np.ndarray] = {}
    for key, val in ckpt_model.items():
        if "decoder" in key and "encoder" not in key:
            if "coarse" in key:
                middle_sd[key[8 + 7:]] = _to_np(val)
            elif "fine" in key:
                fine_sd[key[8 + 5:]] = _to_np(val)
    return middle_sd, fine_sd


def apply_state_dict(
    params: Dict[str, Any], sd: Dict[str, np.ndarray]
) -> Tuple[Dict[str, Any], Set[str], List[str]]:
    """Overlay torch-named tensors onto a functional MLP param dict.

    Returns (new_params, consumed torch keys, decoder params the state
    dict did NOT provide — random init stands for those)."""
    used: Set[str] = set()
    missing: List[str] = []
    out = dict(params)

    def take(name):
        if name in sd:
            used.add(name)
            return jnp.asarray(sd[name])
        missing.append(name)
        return None

    if "embedder_B" in params:
        b = take("embedder._B")
        if b is not None:
            out["embedder_B"] = b
    new_pts = []
    for i, layer in enumerate(params["pts_linears"]):
        w = take(f"pts_linears.{i}.weight")
        b = take(f"pts_linears.{i}.bias")
        new_pts.append({
            "w": w.T if w is not None else layer["w"],
            "b": b if b is not None else layer["b"],
        })
    out["pts_linears"] = new_pts
    if "fc_c" in params:
        new_fc = []
        for i, layer in enumerate(params["fc_c"]):
            w = take(f"fc_c.{i}.weight")
            b = take(f"fc_c.{i}.bias")
            new_fc.append({
                "w": w.T if w is not None else layer["w"],
                "b": b if b is not None else layer["b"],
            })
        out["fc_c"] = new_fc
    w = take("output_linear.weight")
    b = take("output_linear.bias")
    if w is not None and b is not None:
        out["output_linear"] = {"w": w.T, "b": b}
    return out, used, missing


def _report(name: str, sd: Dict[str, np.ndarray], used: Set[str],
            missing: List[str], verbose: bool) -> None:
    unused = sorted(set(sd) - used)
    if unused:
        print(f"WARN: pretrained {name}: {len(unused)} checkpoint tensors "
              f"had no matching decoder parameter: {unused[:6]}...")
    if missing and verbose:
        print(f"WARN: pretrained {name}: {len(missing)} decoder parameters "
              f"not present in the checkpoint (random init stands): "
              f"{missing[:6]}...")


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
        coarse_sd = surgery_coarse(ckpt["model"])
        decoders["coarse"], used, missing = apply_state_dict(
            decoders["coarse"], coarse_sd)
        _report("coarse", coarse_sd, used, missing, verbose)
        if verbose:
            print(f"INFO: loaded pretrained coarse decoder from {coarse_path}")
    elif spec.coarse and verbose and coarse_path:
        print(f"WARN: pretrained coarse decoder missing at {coarse_path}; "
              "training coarse decoder from random init")

    mf_path = paths.get("middle_fine", "")
    if os.path.exists(mf_path):
        ckpt = torch.load(mf_path, map_location="cpu", weights_only=False)
        middle_sd, fine_sd = surgery_middle_fine(ckpt["model"])
        decoders["middle"], used_m, miss_m = apply_state_dict(
            decoders["middle"], middle_sd)
        decoders["fine"], used_f, miss_f = apply_state_dict(
            decoders["fine"], fine_sd)
        _report("middle", middle_sd, used_m, miss_m, verbose)
        _report("fine", fine_sd, used_f, miss_f, verbose)
        if verbose:
            print(f"INFO: loaded pretrained middle/fine decoders from {mf_path}")
    elif verbose and mf_path:
        print(f"WARN: pretrained middle/fine decoders missing at {mf_path}; "
              "training from random init")

    return state._replace(decoders=decoders)
