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

Robustness contract (round-5 hardening): the hook target is a private
jax API (``jax._src.compiler.compile_or_get_cached``), pinned by
``requirements.txt`` to the tested minor series.  If a JAX upgrade
removes or renames the symbol, ``install()`` emits a LOUD RuntimeWarning
and degrades to a no-op instead of bricking unrelated single-threaded
entry points; if only the signature drifts, the pass-through wrapper is
still safe and installs with a drift warning.  ``is_installed()`` lets
the threaded schedules assert the guard is live before spawning
(slam/slam.py refuses loose/free without it).
"""

from __future__ import annotations

import threading
import warnings

_LOCK = threading.RLock()
_installed = False

# Parameter names of the hook target as of the pinned jax (0.9.x); used
# only to WARN on drift — the wrapper is a pure pass-through, so a
# signature change cannot make it incorrect, merely suspicious.
_EXPECTED_PARAMS = (
    "backend", "computation", "devices", "compile_options",
    "host_callbacks", "executable_devices", "pgle_profiler",
)

# Diagnostics for tests: how many threads are inside the guarded region
# right now / at peak.  The lock makes >1 impossible; tests assert it.
_active = 0
_max_active = 0


def is_installed() -> bool:
    return _installed


def install() -> None:
    """Idempotently wrap the compile path in the process-wide lock.

    Degrades to a no-op with a RuntimeWarning if the private hook target
    vanished (e.g. an unpinned JAX upgrade) — single-threaded runs never
    need the lock, and the threaded schedules check ``is_installed()``.
    """
    global _installed
    if _installed:
        return
    try:
        from jax._src import compiler

        inner = compiler.compile_or_get_cached
    except (ImportError, AttributeError) as e:
        warnings.warn(
            "nice_slam_tpu.compile_guard: hook target jax._src.compiler."
            "compile_or_get_cached is missing on this JAX version "
            f"({e!r}). First-compiles are NOT serialized; loose/free "
            "threaded schedules will refuse to start. Pin jax to the "
            "tested series (see requirements.txt).",
            RuntimeWarning,
            stacklevel=2,
        )
        return

    import inspect

    try:
        params = tuple(inspect.signature(inner).parameters)
        if params != _EXPECTED_PARAMS:
            warnings.warn(
                "nice_slam_tpu.compile_guard: jax._src.compiler."
                f"compile_or_get_cached signature drifted ({params} vs "
                f"expected {_EXPECTED_PARAMS}); the pass-through lock is "
                "still installed, but re-validate against this JAX.",
                RuntimeWarning,
                stacklevel=2,
            )
    except (TypeError, ValueError):
        pass  # builtins/C funcs have no signature; pass-through still safe

    def locked_compile_or_get_cached(*args, **kwargs):
        global _active, _max_active
        with _LOCK:
            _active += 1
            _max_active = max(_max_active, _active)
            try:
                return inner(*args, **kwargs)
            finally:
                _active -= 1

    locked_compile_or_get_cached._nice_slam_tpu_guard = True  # type: ignore[attr-defined]
    compiler.compile_or_get_cached = locked_compile_or_get_cached
    _installed = True
