#!/usr/bin/env python
"""Round-3 scatter microphysics: per-row vs per-byte cost, OOB-row cost,
fp8 rows, paired double-wide rows.  Chained in-jit (scalar carry perturbs
the INDICES so the scatter can't be hoisted), with a control body whose
time is subtracted.

Findings feed the grid-gradient scatter redesign (PERF.md r3).
"""

import argparse
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
FINE_V = 178192  # 74*56*43
PAD = 56 * 43 + 43 + 1


def chain(body, reps, *args):
    """body(idx, *args) -> array; idx is perturbed per iteration by the
    carry scalar (int add, trivial) so the scatter has a data dependency."""

    @jax.jit
    def run(idx, *a):
        def f(i, carry):
            idx2 = idx + carry  # carry is 0 at runtime; XLA can't prove it
            out = body(idx2, *a)
            # unfoldable zero: out[0] * 1e-30 truncated to int is 0 for any
            # sane magnitude, but XLA cannot constant-fold it away
            return (out.reshape(-1)[0].astype(jnp.float32)
                    * 1e-30).astype(jnp.int32)

        return lax.fori_loop(0, reps, f, jnp.int32(0))

    int(run(*args))  # warmup: a real FETCH (block_until_ready does not
    # force execution under the lazy axon runtime, PERF.md)
    t0 = time.perf_counter()
    r = run(*args)
    int(r)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    # ray-coherent-ish indices into the fine grid row space
    base = rng.integers(0, FINE_V, N).astype(np.int32)
    base = np.sort(base.reshape(1000, 48), axis=1).reshape(-1)  # per-ray sorted
    idx = jnp.asarray(base)
    Vp = FINE_V + PAD

    results = {}

    def run(name, body, *a):
        t = chain(body, args.reps, idx, *a)
        results[name] = t * 1e3
        print(f"{name:18s} {t*1e3:8.3f} ms", flush=True)

    def mk(rows, width, dtype):
        return jnp.asarray(
            rng.normal(size=(rows, width)).astype(np.float32)).astype(dtype)

    # control: index-dependent but no scatter
    def control(i, c):
        return c[:1, :1].astype(jnp.float32) + i[0]

    run("control", control, mk(N, 256, jnp.bfloat16))

    def scat(rows, width, dtype, oob_frac=0.0, name=None):
        c = mk(rows, width, dtype)
        if oob_frac > 0:
            mask = rng.random(rows) < oob_frac
            off = jnp.asarray(np.where(mask, 2 * Vp, 0).astype(np.int32))
        else:
            off = None

        def body(i, c):
            ii = i[:rows]
            if off is not None:
                ii = ii + off
            A = jnp.zeros((Vp, width), dtype).at[ii].add(
                c, mode="drop", unique_indices=False)
            return A

        run(name or f"r{rows}_w{width}_{dtype.__name__}", body, c)

    scat(N, 256, jnp.bfloat16)                       # current block scatter
    scat(N, 256, jnp.bfloat16, 0.5, "oob50")
    scat(N, 256, jnp.bfloat16, 0.9, "oob90")
    scat(N, 512, jnp.bfloat16, name="paired_w512")   # fine+color fused rows
    scat(N, 128, jnp.bfloat16, name="w128")
    scat(N // 2, 256, jnp.bfloat16, name="halfrows")
    scat(N, 256, jnp.float32, name="f32")
    try:
        scat(N, 256, jnp.float8_e4m3fn, name="f8")
    except Exception as e:
        print("f8 FAILED:", type(e).__name__, str(e)[:200])

    print({k: round(v, 3) for k, v in results.items()})


if __name__ == "__main__":
    main()
