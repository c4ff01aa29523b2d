"""Functional MLP decoders for the hierarchical scene representation.

Capability parity with the reference decoder zoo
(reference: src/conv_onet/models/decoder.py):

  * ``mlp``          — grid-conditioned point decoder: positional embedding
                       (Gaussian Fourier / NeRF / identity / learned-linear),
                       n_blocks hidden layers with per-block feature
                       injection ``h += fc_c[i](feat)`` and a skip concat,
                       linear head producing occupancy (1) or rgb+occ (4).
                       (:177-203)
  * ``mlp_no_xyz``   — feature-only decoder used at the coarse level (:262-274).
  * ``nice``         — the 4-level container with stage dispatch:
                       coarse→occ, middle→occ, fine→fine+middle residual occ,
                       color→rgb from color head + fine+middle occ (:312-342).
  * iMAP mode        — a single 256-wide, 4-block MLP with no grids
                       (src/conv_onet/config.py:28-32).

Design: parameters are plain pytrees (dicts of arrays); apply functions are
pure and jit/vmap/grad-safe.  All matmuls carry
``preferred_element_type=float32`` so XLA schedules them on the MXU at full
accumulate precision.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from nice_slam_tpu.ops.interp import sample_grid_feature

Params = Dict[str, Any]

FOURIER_EMBED_SIZE = 93  # reference: decoder.py:129
FOURIER_SCALE = 25.0     # reference: decoder.py:131


# ---------------------------------------------------------------------------
# Specs (static configuration; hashable so jit can close over them)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MLPSpec:
    """Static architecture description of one decoder MLP."""

    name: str = ""
    dim: int = 3
    c_dim: int = 32
    hidden_size: int = 32
    n_blocks: int = 5
    skips: Tuple[int, ...] = (2,)
    color: bool = False
    concat_feature: bool = False  # fine decoder: concat middle-level feature
    pos_embedding_method: str = "fourier"
    no_xyz: bool = False  # coarse decoder variant (MLP_no_xyz)

    @property
    def embedding_size(self) -> int:
        if self.no_xyz:
            return 0
        if self.pos_embedding_method == "fourier":
            return FOURIER_EMBED_SIZE
        if self.pos_embedding_method == "same":
            return self.dim
        if self.pos_embedding_method == "nerf":
            multires = 10 if "color" in self.name else 5
            return multires * 6 + self.dim
        if self.pos_embedding_method == "fc_relu":
            return FOURIER_EMBED_SIZE
        raise ValueError(f"unknown pos_embedding_method {self.pos_embedding_method}")

    @property
    def feat_dim(self) -> int:
        """Feature width entering fc_c / the skip concat."""
        return self.c_dim * (2 if self.concat_feature else 1)

    @property
    def out_dim(self) -> int:
        return 4 if self.color else 1


@dataclasses.dataclass(frozen=True)
class NICESpec:
    """Static description of the full NICE 4-level decoder stack."""

    dim: int = 3
    c_dim: int = 32
    hidden_size: int = 32
    coarse: bool = False
    pos_embedding_method: str = "fourier"

    def sub_specs(self) -> Dict[str, MLPSpec]:
        specs = {}
        if self.coarse:
            specs["coarse"] = MLPSpec(
                name="coarse", dim=self.dim, c_dim=self.c_dim,
                hidden_size=self.hidden_size, no_xyz=True,
            )
        specs["middle"] = MLPSpec(
            name="middle", dim=self.dim, c_dim=self.c_dim,
            hidden_size=self.hidden_size,
            pos_embedding_method=self.pos_embedding_method,
        )
        specs["fine"] = MLPSpec(
            name="fine", dim=self.dim, c_dim=self.c_dim,
            hidden_size=self.hidden_size, concat_feature=True,
            pos_embedding_method=self.pos_embedding_method,
        )
        specs["color"] = MLPSpec(
            name="color", dim=self.dim, c_dim=self.c_dim,
            hidden_size=self.hidden_size, color=True,
            pos_embedding_method=self.pos_embedding_method,
        )
        return specs


# ---------------------------------------------------------------------------
# Initialization (matches the torch layer inits so from-scratch training
# behaves like the reference when pretrained blobs are unavailable)
# ---------------------------------------------------------------------------

def _xavier_uniform_relu(key, shape):
    """DenseLayer init: xavier-uniform with relu gain, zero bias
    (reference: decoder.py:70-79)."""
    fan_in, fan_out = shape
    gain = math.sqrt(2.0)
    bound = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), minval=-bound, maxval=bound)


def _xavier_uniform_linear(key, shape):
    """Output head init: xavier-uniform with linear gain (=1)."""
    fan_in, fan_out = shape
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), minval=-bound, maxval=bound)


def _torch_linear_default(key, shape):
    """torch nn.Linear default init (used for fc_c feature-injection layers)."""
    fan_in, fan_out = shape
    kw, kb = jax.random.split(key)
    wb = 1.0 / math.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), minval=-wb, maxval=wb)
    b = jax.random.uniform(kb, (fan_out,), minval=-wb, maxval=wb)
    return w, b


def init_mlp(key: jax.Array, spec: MLPSpec) -> Params:
    """Allocate one decoder's parameter pytree."""
    params: Params = {}
    keys = jax.random.split(key, 3 * spec.n_blocks + 4)
    ki = iter(range(len(keys)))

    emb = spec.embedding_size
    if not spec.no_xyz:
        if spec.pos_embedding_method == "fourier":
            params["embedder_B"] = (
                jax.random.normal(keys[next(ki)], (spec.dim, FOURIER_EMBED_SIZE))
                * FOURIER_SCALE
            )
        elif spec.pos_embedding_method == "fc_relu":
            w = _xavier_uniform_relu(keys[next(ki)], (spec.dim, FOURIER_EMBED_SIZE))
            params["embedder_w"] = w
            params["embedder_b"] = jnp.zeros((FOURIER_EMBED_SIZE,))

    # Hidden stack.  Layer input widths mirror reference decoder.py:149-152
    # (grid-feature variant) and :235-238 (no_xyz variant).
    pts = []
    for i in range(spec.n_blocks):
        if spec.no_xyz:
            # Reference decoder.py:235-238 hardcodes hidden_size for the
            # first layer (valid because c_dim == hidden_size there); the
            # true input is the grid feature, width c_dim.
            in_dim = spec.c_dim if i == 0 else spec.hidden_size
            if i - 1 in spec.skips:
                in_dim = spec.hidden_size + spec.c_dim
        else:
            in_dim = emb if i == 0 else spec.hidden_size
            if i - 1 in spec.skips:
                in_dim = spec.hidden_size + emb
        w = _xavier_uniform_relu(keys[next(ki)], (in_dim, spec.hidden_size))
        pts.append({"w": w, "b": jnp.zeros((spec.hidden_size,))})
    params["pts_linears"] = pts

    if spec.c_dim != 0 and not spec.no_xyz:
        fc_c = []
        for i in range(spec.n_blocks):
            w, b = _torch_linear_default(
                keys[next(ki)], (spec.feat_dim, spec.hidden_size)
            )
            fc_c.append({"w": w, "b": b})
        params["fc_c"] = fc_c

    w = _xavier_uniform_linear(keys[next(ki)], (spec.hidden_size, spec.out_dim))
    params["output_linear"] = {"w": w, "b": jnp.zeros((spec.out_dim,))}
    return params


# ---------------------------------------------------------------------------
# Positional embeddings
# ---------------------------------------------------------------------------

def _nerf_embed(x: jnp.ndarray, multires: int, log_sampling: bool) -> jnp.ndarray:
    """NeRF sin/cos embedding (reference: decoder.py:33-67)."""
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    else:
        freqs = np.linspace(2.0**0.0, 2.0 ** (multires - 1), multires)
    outs = [x]
    for f in freqs:
        outs.append(jnp.sin(x * f))
        outs.append(jnp.cos(x * f))
    return jnp.concatenate(outs, axis=-1)


def embed_points(params: Params, spec: MLPSpec, p: jnp.ndarray) -> jnp.ndarray:
    if spec.pos_embedding_method == "fourier":
        return jnp.sin(
            jnp.dot(p, params["embedder_B"], preferred_element_type=jnp.float32)
        )
    if spec.pos_embedding_method == "same":
        return p
    if spec.pos_embedding_method == "nerf":
        multires = 10 if "color" in spec.name else 5
        return _nerf_embed(p, multires, log_sampling=("color" in spec.name))
    if spec.pos_embedding_method == "fc_relu":
        return jnp.dot(
            p, params["embedder_w"], preferred_element_type=jnp.float32
        ) + params["embedder_b"]
    raise ValueError(spec.pos_embedding_method)


# ---------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------

def _dense(layer: Params, x: jnp.ndarray) -> jnp.ndarray:
    # weights follow the activation dtype (bf16 activations keep the MXU
    # in its native mode instead of promoting the whole matmul to f32);
    # accumulation stays f32 either way
    return jnp.dot(x, layer["w"].astype(x.dtype),
                   preferred_element_type=jnp.float32) + layer["b"]


def apply_mlp(
    params: Params,
    spec: MLPSpec,
    p: jnp.ndarray,
    grids: Optional[Dict[str, jnp.ndarray]],
    bound: Optional[jnp.ndarray],
    sample_fn=sample_grid_feature,
    act_bf16: bool = False,
) -> jnp.ndarray:
    """Run one grid-conditioned decoder on (N, 3) world points.

    Returns (N,) occupancy or (N, 4) rgb+occ depending on ``spec.color``.
    Mirrors reference decoder.py:177-203 — per-block feature injection is
    additive AFTER the relu; the skip concatenates the embedded points.

    ``act_bf16``: carry activations (embedding, grid features, hidden
    states) in bfloat16 — halves the HBM bytes of the residuals autodiff
    saves for the backward pass; matmuls still accumulate f32 and the
    output head returns f32 (PERF.md r4 A/B).
    """
    adt = jnp.bfloat16 if act_bf16 else p.dtype
    feat = None
    if spec.c_dim != 0:
        feat = sample_fn(grids["grid_" + spec.name], p, bound)
        if spec.concat_feature:
            # fine decoder: concat the middle-level feature, gradient-stopped
            # (reference decoder.py:182-187 uses torch.no_grad()).
            feat_mid = jax.lax.stop_gradient(
                sample_fn(grids["grid_middle"], p, bound)
            )
            feat = jnp.concatenate([feat, feat_mid], axis=-1)
        feat = feat.astype(adt)

    embedded = embed_points(params, spec, p).astype(adt)
    h = embedded
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_dense(layer, h))
        if spec.c_dim != 0:
            h = h + _dense(params["fc_c"][i], feat)
        h = h.astype(adt)
        if i in spec.skips:
            h = jnp.concatenate([embedded, h], axis=-1)
    out = _dense(params["output_linear"], h)
    if not spec.color:
        out = out[..., 0]
    return out


def apply_mlp_no_xyz(
    params: Params,
    spec: MLPSpec,
    p: jnp.ndarray,
    grids: Dict[str, jnp.ndarray],
    bound: jnp.ndarray,
    sample_fn=sample_grid_feature,
    act_bf16: bool = False,
) -> jnp.ndarray:
    """Coarse decoder: the grid feature IS the input (no point embedding).

    Mirrors reference decoder.py:262-274.  ``bound`` here is the enlarged
    coarse bound (reference src/NICE_SLAM.py:157).
    """
    adt = jnp.bfloat16 if act_bf16 else p.dtype
    feat = sample_fn(grids["grid_" + spec.name], p, bound).astype(adt)
    h = feat
    for i, layer in enumerate(params["pts_linears"]):
        h = jax.nn.relu(_dense(layer, h)).astype(adt)
        if i in spec.skips:
            h = jnp.concatenate([feat, h], axis=-1)
    out = _dense(params["output_linear"], h)
    if not spec.color:
        out = out[..., 0]
    return out


# Stage names in optimizer-schedule order.
STAGES = ("coarse", "middle", "fine", "color")


# ---------------------------------------------------------------------------
# Batched multi-decoder evaluation (TPU perf path)
#
# The fine/color stages run 2-3 structurally identical 5-block MLPs over the
# same points.  Evaluating them as ONE batched matmul chain
# ((D, N, 128) @ (D, 128, 32) per block) instead of sequential stacks
# measures ~2.8x faster on v5e (see PERF.md) and is exactly the same math —
# weights are stacked/padded with zeros at trace time, so gradients flow to
# the original parameter leaves unchanged.
# ---------------------------------------------------------------------------

_BATCH_IN_WIDTH = 128  # padded layer-input width (93 embed + 32 hidden -> 128)


def _dbmm(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """(D, N, K) @ (D, K, H) batched matmul on the MXU."""
    return jax.lax.dot_general(
        x, w, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _stack_pts_weights(param_list, in_width: int):
    """Stack per-decoder pts_linears into (D, n_blocks, in_width, H) + biases.

    Rows are packed contiguously from 0 ([lead | h] for post-skip layers),
    so zero-padding to ``in_width`` is layout-exact (see ops/fused.py)."""
    n_blocks = len(param_list[0]["pts_linears"])
    Ws, bs = [], []
    for blk in range(n_blocks):
        Wd = jnp.stack([
            jnp.pad(p["pts_linears"][blk]["w"],
                    ((0, in_width - p["pts_linears"][blk]["w"].shape[0]),
                     (0, 0)))
            for p in param_list
        ])
        bd = jnp.stack([p["pts_linears"][blk]["b"] for p in param_list])
        Ws.append(Wd)
        bs.append(bd)
    return Ws, bs


def apply_nice_stage_batched(
    params: Dict[str, Params],
    spec: NICESpec,
    p: jnp.ndarray,
    grids: Dict[str, jnp.ndarray],
    bound: jnp.ndarray,
    stage: str,
    sample_fn=sample_grid_feature,
    act_bf16: bool = False,
) -> jnp.ndarray:
    """Batched fine/color stage forward — same outputs as apply_nice up to
    f32 summation-order noise (the Fourier embedding amplifies ulp-level
    scheduling differences; see ops/fused.py numerics note).

    ``act_bf16``: bfloat16 activations/stacked weights (halves the bytes of
    autodiff's saved residuals and the per-iteration weight stacks; f32
    accumulation, f32 output head — PERF.md r4 A/B)."""
    assert stage in ("fine", "color")
    assert spec.pos_embedding_method == "fourier"
    adt = jnp.bfloat16 if act_bf16 else p.dtype
    subs = spec.sub_specs()
    names = ["middle", "fine"] + (["color"] if stage == "color" else [])
    plist = [params[n] for n in names]
    D = len(names)
    n = p.shape[0]
    hidden = spec.hidden_size
    fw = 2 * spec.c_dim  # widest feature (fine concat)

    # features per decoder, padded to fw
    mid_feat = sample_fn(grids["grid_middle"], p, bound)
    fine_feat = jnp.concatenate(
        [sample_fn(grids["grid_fine"], p, bound),
         jax.lax.stop_gradient(mid_feat)], axis=-1,
    )
    feats = [jnp.pad(mid_feat, ((0, 0), (0, fw - spec.c_dim))), fine_feat]
    if stage == "color":
        color_feat = sample_fn(grids["grid_color"], p, bound)
        feats.append(jnp.pad(color_feat, ((0, 0), (0, fw - spec.c_dim))))
    feat = jnp.stack(feats).astype(adt)  # (D, N, fw)

    # embeddings
    B = jnp.stack([pp["embedder_B"] for pp in plist])  # (D, 3, 93)
    emb = jnp.sin(jnp.einsum("np,dpe->dne", p, B,
                             preferred_element_type=jnp.float32)
                  ).astype(adt)  # (D, N, 93)

    # stacked weights (zero-padded rows to match contiguous packing)
    Ws, bs = _stack_pts_weights(plist, _BATCH_IN_WIDTH)
    Wc = [
        jnp.stack([
            jnp.pad(pp["fc_c"][blk]["w"],
                    ((0, fw - pp["fc_c"][blk]["w"].shape[0]), (0, 0)))
            for pp in plist
        ])
        for blk in range(len(plist[0]["fc_c"]))
    ]
    bc = [jnp.stack([pp["fc_c"][blk]["b"] for pp in plist])
          for blk in range(len(plist[0]["fc_c"]))]
    out_pad = 4
    Wo = jnp.stack([
        jnp.pad(pp["output_linear"]["w"],
                ((0, 0), (0, out_pad - pp["output_linear"]["w"].shape[1])))
        for pp in plist
    ])
    bo = jnp.stack([
        jnp.pad(pp["output_linear"]["b"],
                (0, out_pad - pp["output_linear"]["b"].shape[0]))
        for pp in plist
    ])

    if act_bf16:
        Ws = [w.astype(adt) for w in Ws]
        Wc = [w.astype(adt) for w in Wc]
        Wo = Wo.astype(adt)

    emb_w = emb.shape[-1]
    x = jnp.pad(emb, ((0, 0), (0, 0), (0, _BATCH_IN_WIDTH - emb_w)))
    h = None
    for blk in range(len(Ws)):
        h = jax.nn.relu(_dbmm(x, Ws[blk]) + bs[blk][:, None, :])
        h = (h + _dbmm(feat, Wc[blk]) + bc[blk][:, None, :]).astype(adt)
        if blk in subs["middle"].skips:
            x = jnp.pad(
                jnp.concatenate([emb, h], axis=-1),
                ((0, 0), (0, 0), (0, _BATCH_IN_WIDTH - emb_w - hidden)),
            )
        else:
            x = jnp.pad(h, ((0, 0), (0, 0), (0, _BATCH_IN_WIDTH - hidden)))
    out = _dbmm(h, Wo) + bo[:, None, :]  # (D, N, 4)

    occ = out[0, :, 0] + out[1, :, 0]  # middle + fine residual
    if stage == "color":
        rgb = out[2, :, :3]
    else:
        rgb = jnp.zeros((n, 3), p.dtype)
    return jnp.concatenate([rgb, occ[:, None]], axis=-1)


def apply_nice(
    params: Dict[str, Params],
    spec: NICESpec,
    p: jnp.ndarray,
    grids: Dict[str, jnp.ndarray],
    bound: jnp.ndarray,
    coarse_bound: jnp.ndarray,
    stage: str,
    sample_fn=sample_grid_feature,
    act_bf16: bool = False,
) -> jnp.ndarray:
    """Stage-dispatched forward of the NICE decoder stack -> (N, 4) raw.

    Parity with reference decoder.py:312-342:
      coarse: raw[:, 3] = coarse_occ
      middle: raw[:, 3] = middle_occ
      fine:   raw[:, 3] = fine_occ + middle_occ
      color:  raw[:, :3] from color head; raw[:, 3] = fine_occ + middle_occ

    ``stage`` is static (each stage compiles its own step), so no traced
    control flow is needed.
    """
    subs = spec.sub_specs()
    n = p.shape[0]
    if stage == "coarse":
        occ = apply_mlp_no_xyz(params["coarse"], subs["coarse"], p, grids,
                               coarse_bound, sample_fn, act_bf16)
        return jnp.concatenate([jnp.zeros((n, 3), p.dtype), occ[:, None]], axis=-1)
    if stage == "middle":
        occ = apply_mlp(params["middle"], subs["middle"], p, grids, bound,
                        sample_fn, act_bf16)
        return jnp.concatenate([jnp.zeros((n, 3), p.dtype), occ[:, None]], axis=-1)
    if stage == "fine":
        fine_occ = apply_mlp(params["fine"], subs["fine"], p, grids, bound,
                             sample_fn, act_bf16)
        middle_occ = apply_mlp(params["middle"], subs["middle"], p, grids,
                               bound, sample_fn, act_bf16)
        occ = fine_occ + middle_occ
        return jnp.concatenate([jnp.zeros((n, 3), p.dtype), occ[:, None]], axis=-1)
    if stage == "color":
        raw = apply_mlp(params["color"], subs["color"], p, grids, bound,
                        sample_fn, act_bf16)
        fine_occ = apply_mlp(params["fine"], subs["fine"], p, grids, bound,
                             sample_fn, act_bf16)
        middle_occ = apply_mlp(params["middle"], subs["middle"], p, grids,
                               bound, sample_fn, act_bf16)
        occ = fine_occ + middle_occ
        return jnp.concatenate([raw[:, :3], occ[:, None]], axis=-1)
    raise ValueError(f"unknown stage {stage}")


def init_nice(key: jax.Array, spec: NICESpec) -> Dict[str, Params]:
    """Parameter pytree for the full NICE stack."""
    subs = spec.sub_specs()
    keys = jax.random.split(key, len(subs))
    return {name: init_mlp(k, s) for k, (name, s) in zip(keys, subs.items())}


def apply_imap(
    params: Params, spec: MLPSpec, p: jnp.ndarray, act_bf16: bool = False
) -> jnp.ndarray:
    """iMAP* single-MLP forward -> (N, 4) rgb + volume density."""
    return apply_mlp(params, spec, p, grids=None, bound=None,
                     act_bf16=act_bf16)
