#!/usr/bin/env python
"""Chained-latency experiments for the grid-gradient scatter redesign (r3).

Measures, ON DEVICE and with every iteration data-dependent on the previous
one (an in-jit fori_loop chain — the only timing this tunnel can't fake,
see PERF.md), the cost of:

  block        current default: cell-block scatter + 8 shifted folds
  block_nofold the scatter alone (no fold) — isolates the row loop
  fold_only    the 8 shifted folds alone — isolates the stream cost
  xla8n        round-1 8N-row narrow scatter
  sortpay      argsort 48k keys (iota payload) + full row gather
  stream       one read+write pass over the contribution buffer (roofline)
  pallas_vmem  Pallas per-row VMEM accumulate (middle-grid scale)
  pallas_hbm   Pallas per-row accumulate, grid in HBM slices (fine scale)

Workload: the real mapping shape — N = 1000 rays x 48 samples, fine grid
(75, 55, 43, 32) on the Replica room0 bound, bf16 contribution buffer.
"""

import argparse
import functools
import os
import sys
import time

here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, here)

import jax

from nice_slam_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache(here)  # host-fingerprinted partition (utils/cache.py)

import jax.numpy as jnp
import numpy as np
from jax import lax

N = 48000
FINE = (75, 55, 43, 32)
MID = (38, 28, 22, 32)
C = 32


def chain(body, reps, *args):
    """Run body(*args) `reps` times inside one jit, each iteration's input
    perturbed by a scalar from the previous output (real data dependency;
    nothing can pipeline or CSE across iterations)."""

    @jax.jit
    def run(*a):
        def f(i, carry):
            sliver, a = carry
            # force dependency: first row of the first float arg is scaled
            # by (1 + sliver * 1e-30) — unfoldable, negligible cost
            a0 = a[0]
            scaled = a0[0:1] * (1.0 + sliver * 1e-30).astype(a0.dtype)
            a = (lax.dynamic_update_slice(a0, scaled, (0,) * a0.ndim),) + a[1:]
            out = body(*a)
            s = jnp.asarray(out).reshape(-1)[0].astype(jnp.float32)
            return (s, a)

        sliver = jnp.float32(0.0)
        sliver, _ = lax.fori_loop(0, reps, f, (sliver, a))
        return sliver

    # warmup (compile)
    run(*args).block_until_ready()
    t0 = time.perf_counter()
    r = run(*args)
    float(r)  # terminal fetch
    return (time.perf_counter() - t0) / reps


def make_inputs(grid_shape, n=N, seed=0):
    nx, ny, nz, c = grid_shape
    rng = np.random.default_rng(seed)
    # ray-coherent bases: rays of 48 samples walking through the volume
    rays = n // 48
    p0 = rng.uniform(0.1, 0.9, (rays, 1, 3))
    d = rng.normal(size=(rays, 1, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.linspace(0, 0.35, 48)[None, :, None]
    p = np.clip(p0 + d * t, 0, 0.999)
    i0 = (p * (np.array([nx, ny, nz]) - 1)).astype(np.int32).reshape(-1, 3)
    base = (i0[:, 0] * ny + i0[:, 1]) * nz + i0[:, 2]
    contribs = rng.normal(size=(n, 8 * c)).astype(np.float32)
    return jnp.asarray(base), jnp.asarray(contribs, jnp.bfloat16), i0


def block_scatter(grid_shape, fold=True):
    nx, ny, nz, c = grid_shape
    V = nx * ny * nz
    offs = [(k & 1) * ny * nz + ((k >> 1) & 1) * nz + ((k >> 2) & 1)
            for k in range(8)]
    maxoff = max(offs)

    def body(contribs, base):
        A = jnp.zeros((maxoff + V, 8 * c), jnp.bfloat16)
        A = A.at[base + maxoff].add(contribs)
        if not fold:
            return A
        out = jnp.zeros((V, c), jnp.float32)
        for k, off in enumerate(offs):
            out = out + lax.dynamic_slice(
                A, (maxoff - off, k * c), (V, c)).astype(jnp.float32)
        return out

    return body


def fold_only(grid_shape):
    nx, ny, nz, c = grid_shape
    V = nx * ny * nz
    offs = [(k & 1) * ny * nz + ((k >> 1) & 1) * nz + ((k >> 2) & 1)
            for k in range(8)]
    maxoff = max(offs)

    def body(A):
        out = jnp.zeros((V, c), jnp.float32)
        for k, off in enumerate(offs):
            out = out + lax.dynamic_slice(
                A, (maxoff - off, k * c), (V, c)).astype(jnp.float32)
        return out

    return body


def xla8n(grid_shape):
    nx, ny, nz, c = grid_shape
    V = nx * ny * nz

    def body(contribs, base):
        # 8 corners as separate rows, width c
        rows = contribs.reshape(-1, 8, c).transpose(1, 0, 2).reshape(-1, c)
        idx = jnp.concatenate([base + ((k & 1) * ny * nz
                                       + ((k >> 1) & 1) * nz
                                       + ((k >> 2) & 1))
                               for k in range(8)])
        idx = jnp.minimum(idx, V - 1)
        return jnp.zeros((V, c), jnp.float32).at[idx].add(
            rows.astype(jnp.float32))

    return body


def sortpay():
    def body(contribs, base):
        keys, perm = lax.sort((base, jnp.arange(base.shape[0], dtype=jnp.int32)),
                              num_keys=1)
        rows = jnp.take(contribs, perm, axis=0)
        return rows[:1, :1].astype(jnp.float32) + keys[0]

    return body


def sort_only():
    def body(dummy, base):
        keys, perm = lax.sort((base, jnp.arange(base.shape[0], dtype=jnp.int32)),
                              num_keys=1)
        return dummy[:1, :1] + keys[0] + perm[0]

    return body


def stream(grid_shape):
    nx, ny, nz, c = grid_shape
    V = nx * ny * nz

    def body(A):
        return A + jnp.bfloat16(1.0)

    return body, jnp.zeros((V + ny * nz + nz + 1, 8 * c), jnp.bfloat16)


def pallas_rmw(grid_shape, chunk=2048, hbm=False):
    """Per-row accumulate kernel: sequential grid over input chunks; the
    (Vpad, 8C) accumulator lives in VMEM scratch (middle-grid scale) and is
    flushed to the output on the last step."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nx, ny, nz, c = grid_shape
    V = nx * ny * nz
    pad = ny * nz + nz + 1
    Vp = V + pad
    n_chunks = N // chunk

    def kernel(base_ref, contrib_ref, out_ref, acc):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        def row(r, _):
            idx = base_ref[r]
            cur = acc[pl.ds(idx, 1), :]
            acc[pl.ds(idx, 1), :] = cur + contrib_ref[pl.ds(r, 1), :]
            return 0

        lax.fori_loop(0, chunk, row, 0)

        @pl.when(step == n_chunks - 1)
        def _():
            out_ref[:] = acc[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((chunk, 8 * c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Vp, 8 * c), lambda i: (0, 0),
                               memory_space=pltpu.ANY if hbm else pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Vp, 8 * c), jnp.bfloat16)],
    )

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Vp, 8 * c), jnp.bfloat16),
        grid_spec=grid_spec,
    )

    def body(contribs, base):
        return f(base, contribs)

    return body


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    base_f, contribs, i0 = make_inputs(FINE)
    base_m, _, _ = make_inputs(MID)
    results = {}

    def run(name, fn, *a, reps=None):
        if args.only and args.only != name:
            return
        t = chain(fn, reps or args.reps, *a)
        results[name] = t
        print(f"{name:16s} {t*1e3:8.3f} ms", flush=True)

    V_f = FINE[0] * FINE[1] * FINE[2]
    pad_f = FINE[1] * FINE[2] + FINE[2] + 1
    A_f = jnp.zeros((V_f + pad_f, 8 * C), jnp.bfloat16)

    run("block", block_scatter(FINE), contribs, base_f)
    run("block_nofold", block_scatter(FINE, fold=False), contribs, base_f)
    run("fold_only", fold_only(FINE), A_f)
    run("xla8n", xla8n(FINE), contribs, base_f)
    run("sort_only", sort_only(), contribs[:1, :1].astype(jnp.float32), base_f)
    run("sortpay", sortpay(), contribs, base_f)
    sbody, sarr = stream(FINE)
    run("stream", sbody, sarr)
    try:
        run("pallas_vmem", pallas_rmw(MID), contribs, base_m)
    except Exception as e:
        print(f"pallas_vmem FAILED: {type(e).__name__}: {e}", flush=True)

    print({k: round(v * 1e3, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
