"""Serialize JAX first-compiles across host threads.

The loose/free SLAM schedules run the tracker and the mapper(s) as
concurrent host threads (reference runs them as separate *processes*,
src/NICE_SLAM.py:288-307, so it never shares a compiler).  When two of
our threads hit cold jit signatures simultaneously, the XLA:CPU/axon
compile + persistent-cache write path (`executable.serialize()` inside
``jax._src.compilation_cache.put_executable_and_time``) has crashed the
whole process with a segfault (observed round 3: rc=139 in
test_sync_hardening with a cold cache; the same test passes standalone).

Fix: route every ``compiler.compile_or_get_cached`` call — compilation,
persistent-cache read AND write — through one process-wide lock.  This
only serializes *cold* compiles: steady-state dispatch hits pjit's
in-memory executable cache and never reaches this function.  On this
1-vCPU host concurrent compiles gain nothing anyway.

``install()`` is idempotent and called from ``nice_slam_tpu.slam`` at
import time so every entry point (run.py, bench, tests) is covered.
"""

from __future__ import annotations

import threading

_LOCK = threading.RLock()
_installed = False


def install() -> None:
    global _installed
    if _installed:
        return
    from jax._src import compiler

    inner = compiler.compile_or_get_cached

    def locked_compile_or_get_cached(*args, **kwargs):
        with _LOCK:
            return inner(*args, **kwargs)

    compiler.compile_or_get_cached = locked_compile_or_get_cached
    _installed = True
