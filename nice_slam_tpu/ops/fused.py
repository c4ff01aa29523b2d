"""Pallas fused decoder kernels (TPU perf path).

The scene decoders are tiny (32-wide) MLPs applied to millions of points
(SURVEY.md §3.4: ~10^6-10^7 points/frame through eval_points; meshing
queries a 256^3 lattice).  Under plain XLA every layer's (N, 32)
activation round-trips HBM — at 500k points/chunk that's ~64 MB per
intermediate x ~12 intermediates per MLP, which dwarfs the actual matmul
time on the MXU.  These kernels keep the whole MLP stack (Fourier
embedding -> 5 dense blocks with per-block feature injection and the skip
concat -> head) in VMEM per point-tile: HBM traffic drops to the points +
gathered grid features in, raw outputs out.

Packing convention: every layer input is a 128-wide vector

  * layer 0 input  = [embedded(93) | 0 pad]
  * post-skip input = [embedded(93) | h(32) | 0 pad]
  * other inputs    = [h(32) | 0 pad]

with the corresponding weight rows packed to match, so each block is one
(TILE, 128) @ (128, 32) MXU matmul.  The trilinear grid gather stays in
XLA (random HBM gathers are not a Pallas-TPU strength); the kernel fuses
everything after it.

STATUS: retired experiment (kept as a reference Pallas kernel, still
tested in interpret mode).  On the TPU it measured at PARITY with the
plain XLA path — XLA already fuses the embed->MLP chain and the
HBM-roundtrip theory did not hold; the chain is latency/lane-occupancy
bound, not bandwidth bound (PERF.md).  Nothing on the production path
dispatches it.

Numerics note: exact parity with the XLA path is impossible by
construction — the Gaussian-Fourier embedding evaluates sin at O(100) rad
arguments, where 1-ulp dot-product scheduling differences (fma vs not)
perturb features by ~1e-5 and the decoder amplifies that to ~1e-2 on raw
logits.  The torch reference has the same cross-device spread; the
rendering/meshing consumers are insensitive at this level.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nice_slam_tpu.models import decoders as D

LANE = 128
TILE = 512


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class PackedMLP:
    """Static layout info for one packed decoder."""

    n_blocks: int
    hidden: int
    embed: int          # embedding width (93 fourier / 0 no_xyz)
    feat: int           # grid-feature width (c_dim or 2*c_dim; 0 for imap)
    skips: Tuple[int, ...]
    out_dim: int
    in_width: int       # padded layer-input width (>= embed+hidden)

    @staticmethod
    def from_spec(spec: D.MLPSpec) -> "PackedMLP":
        embed = 0 if spec.no_xyz else spec.embedding_size
        feat = spec.feat_dim if spec.c_dim != 0 else 0
        if spec.no_xyz:
            base = max(feat, spec.hidden_size + feat)
        else:
            base = max(embed, spec.hidden_size + embed)
        return PackedMLP(
            n_blocks=spec.n_blocks,
            hidden=spec.hidden_size,
            embed=embed,
            feat=feat,
            skips=spec.skips,
            out_dim=spec.out_dim,
            in_width=_round_up(base, LANE),
        )


def pack_params(spec: D.MLPSpec, params: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Pack a decoder's params into padded dense arrays for the kernel.

    Traceable (pure jnp), so it can live inside jit; packing fuses to a few
    pads/concats.
    """
    pk = PackedMLP.from_spec(spec)
    # Every layer input is packed contiguously from row 0 ([lead | h] for
    # post-skip layers, matching the reference's concat order,
    # decoder.py:199,:270), so packing is a zero-pad to in_width rows.
    rows = [
        jnp.pad(jnp.asarray(l["w"]),
                ((0, pk.in_width - l["w"].shape[0]), (0, 0)))
        for l in params["pts_linears"]
    ]
    W = jnp.stack(rows)  # (n_blocks, in_width, hidden)
    b = jnp.stack([jnp.asarray(l["b"]) for l in params["pts_linears"]])

    out: Dict[str, jnp.ndarray] = {"W": W, "b": b}
    if pk.feat > 0 and "fc_c" in params:
        out["Wc"] = jnp.stack([jnp.asarray(l["w"]) for l in params["fc_c"]])
        out["bc"] = jnp.stack([jnp.asarray(l["b"]) for l in params["fc_c"]])
    if pk.embed > 0:
        out["B"] = jnp.asarray(params["embedder_B"])  # (3, 93)
    wo = jnp.asarray(params["output_linear"]["w"])
    bo = jnp.asarray(params["output_linear"]["b"])
    pad_out = _round_up(pk.out_dim, 8) - pk.out_dim
    out["Wo"] = jnp.pad(wo, ((0, 0), (0, pad_out)))
    out["bo"] = jnp.pad(bo, (0, pad_out))
    return out


BF16_COMPUTE = True  # bf16 MXU multiplies with f32 accumulation on the
                     # no-grad inference path (~1e-2 abs difference on raw
                     # logits; the iso-surface / color quantization absorb it)


def _dot(a, b):
    if BF16_COMPUTE:
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _mlp_kernel(pk: PackedMLP, has_feat: bool):
    """Build the kernel body for one packed decoder."""

    def kernel(*refs):
        i = 0
        p_ref = refs[i]; i += 1
        feat_ref = None
        if has_feat:
            feat_ref = refs[i]; i += 1
        B_ref = None
        if pk.embed > 0:
            B_ref = refs[i]; i += 1
        W_ref = refs[i]; i += 1
        b_ref = refs[i]; i += 1
        Wc_ref = bc_ref = None
        if has_feat and pk.feat > 0 and pk.embed > 0:  # fc_c layers exist
            Wc_ref = refs[i]; i += 1
            bc_ref = refs[i]; i += 1
        Wo_ref = refs[i]; i += 1
        bo_ref = refs[i]; i += 1
        out_ref = refs[i]

        n = p_ref.shape[0]
        if pk.embed > 0:
            emb = jnp.sin(
                _dot(p_ref[:], B_ref[:])
            )  # (TILE, 93)
            lead = emb
        else:
            lead = feat_ref[:]  # no_xyz: feature is the input

        feat = feat_ref[:] if has_feat else None
        pad_cols = pk.in_width - lead.shape[1]
        x = jnp.pad(lead, ((0, 0), (0, pad_cols)))
        h = None
        for blk in range(pk.n_blocks):
            w = W_ref[blk]
            h = jnp.maximum(
                _dot(x, w) + b_ref[blk],
                0.0,
            )
            if has_feat and pk.feat > 0 and pk.embed > 0:
                h = h + _dot(feat, Wc_ref[blk]) + bc_ref[blk]
            if blk in pk.skips:
                x = jnp.pad(
                    jnp.concatenate([lead, h], axis=1),
                    ((0, 0), (0, pk.in_width - lead.shape[1] - pk.hidden)),
                )
            else:
                x = jnp.pad(h, ((0, 0), (0, pk.in_width - pk.hidden)))
        out = _dot(h, Wo_ref[:]) + bo_ref[:]
        out_ref[:] = out

    return kernel


@partial(jax.jit, static_argnames=("pk", "has_feat"))
def _fused_mlp_padded(
    pk: PackedMLP,
    has_feat: bool,
    p: jnp.ndarray,
    feat: Optional[jnp.ndarray],
    packed: Dict[str, jnp.ndarray],
) -> jnp.ndarray:
    n = p.shape[0]
    out_pad = _round_up(pk.out_dim, 8)
    grid = (n // TILE,)

    in_specs = [pl.BlockSpec((TILE, 3), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)]
    inputs = [p]
    if has_feat:
        in_specs.append(pl.BlockSpec((TILE, pk.feat), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(feat)
    if pk.embed > 0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(packed["B"])
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    inputs.append(packed["W"])
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    inputs.append(packed["b"])
    if has_feat and pk.feat > 0 and pk.embed > 0:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(packed["Wc"])
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(packed["bc"])
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    inputs.append(packed["Wo"])
    in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    inputs.append(packed["bo"])

    return pl.pallas_call(
        _mlp_kernel(pk, has_feat),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, out_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_pad), jnp.float32),
        # CPU backend (tests) runs the kernel interpreted
        interpret=jax.default_backend() != "tpu",
    )(*inputs)


def fused_mlp_apply(
    spec: D.MLPSpec,
    params: Dict[str, Any],
    p: jnp.ndarray,
    feat: Optional[jnp.ndarray],
    packed: Optional[Dict[str, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """Fused-kernel equivalent of decoders.apply_mlp / apply_mlp_no_xyz
    given pre-gathered grid features.  Returns (N,) or (N, 4)."""
    pk = PackedMLP.from_spec(spec)
    if packed is None:
        packed = pack_params(spec, params)
    n = p.shape[0]
    n_pad = _round_up(max(n, TILE), TILE)
    if n_pad != n:
        p = jnp.pad(p, ((0, n_pad - n), (0, 0)))
        if feat is not None:
            feat = jnp.pad(feat, ((0, n_pad - n), (0, 0)))
    has_feat = feat is not None
    out = _fused_mlp_padded(pk, has_feat, p, feat, packed)
    out = out[:n, : pk.out_dim]
    if not spec.color:
        out = out[:, 0]
    return out


# ---------------------------------------------------------------------------
# Stage-level fused evaluation (inference): drop-in for scene.eval_points
# ---------------------------------------------------------------------------

def fused_eval_points(spec, state, p: jnp.ndarray, stage: str,
                      packed_cache: Optional[Dict[str, Dict]] = None):
    """NICE/iMAP point evaluation through the fused kernels.

    Numerically equivalent to models.scene.eval_points (including the
    out-of-bound occ := 100 sentinel); no-grad inference only.
    """
    from nice_slam_tpu.models.scene import SceneState
    from nice_slam_tpu.ops.interp import sample_grid_feature

    def get_packed(name, sub_spec):
        if packed_cache is not None and name in packed_cache:
            return packed_cache[name]
        packed = pack_params(sub_spec, state.decoders[name]
                             if spec.nice else state.decoders)
        if packed_cache is not None:
            packed_cache[name] = packed
        return packed

    n = p.shape[0]
    if spec.nice:
        subs = spec.decoder.sub_specs()

        def feats_mid():
            return sample_grid_feature(state.grids["grid_middle"], p, state.bound)

        def occ_middle():
            return fused_mlp_apply(subs["middle"], None, p, feats_mid(),
                                   get_packed("middle", subs["middle"]))

        def occ_fine():
            f_fine = sample_grid_feature(state.grids["grid_fine"], p, state.bound)
            f = jnp.concatenate([f_fine, feats_mid()], axis=-1)
            return fused_mlp_apply(subs["fine"], None, p, f,
                                   get_packed("fine", subs["fine"]))

        if stage == "coarse":
            f = sample_grid_feature(state.grids["grid_coarse"], p,
                                    state.coarse_bound)
            occ = fused_mlp_apply(subs["coarse"], None, p, f,
                                  get_packed("coarse", subs["coarse"]))
            raw = jnp.concatenate([jnp.zeros((n, 3)), occ[:, None]], axis=-1)
        elif stage == "middle":
            raw = jnp.concatenate(
                [jnp.zeros((n, 3)), occ_middle()[:, None]], axis=-1
            )
        elif stage == "fine":
            occ = occ_fine() + occ_middle()
            raw = jnp.concatenate([jnp.zeros((n, 3)), occ[:, None]], axis=-1)
        elif stage == "color":
            f_color = sample_grid_feature(state.grids["grid_color"], p,
                                          state.bound)
            rgbo = fused_mlp_apply(subs["color"], None, p, f_color,
                                   get_packed("color", subs["color"]))
            occ = occ_fine() + occ_middle()
            raw = jnp.concatenate([rgbo[:, :3], occ[:, None]], axis=-1)
        else:
            raise ValueError(stage)
    else:
        raw = fused_mlp_apply(spec.decoder, None, p, None,
                              get_packed("imap", spec.decoder))

    lo, hi = state.bound[:, 0], state.bound[:, 1]
    inside = jnp.all((p > lo) & (p < hi), axis=-1)
    occ = jnp.where(inside, raw[:, 3], 100.0)
    return jnp.concatenate([raw[:, :3], occ[:, None]], axis=-1)
