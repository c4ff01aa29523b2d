"""The process-wide first-compile lock (utils/compile_guard.py).

Round-3's crash class: two host threads hitting cold jit signatures
simultaneously segfaulted the XLA compile + persistent-cache path.  The
guard wraps the private ``jax._src.compiler.compile_or_get_cached`` in
one RLock.  These tests pin (a) that the wrapper is actually installed,
(b) that two threads compiling fresh signatures are genuinely
serialized, and (c) the degrade contract when the private hook target
vanishes (unpinned JAX upgrade): loud warning, no brick, threaded
schedules refuse to start.
"""

import os
import subprocess
import sys
import threading

import jax
import jax.numpy as jnp

import nice_slam_tpu.slam  # noqa: F401  — installs the guard at import
from nice_slam_tpu.utils import compile_guard

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_wrapper_installed_on_pinned_jax():
    from jax._src import compiler

    assert compile_guard.is_installed()
    assert getattr(compiler.compile_or_get_cached, "_nice_slam_tpu_guard",
                   False), "compile path is not routed through the guard"


def test_two_thread_cold_compiles_are_serialized():
    compile_guard._max_active = 0
    barrier = threading.Barrier(2)
    errors = []

    def compile_fresh(k):
        try:
            barrier.wait(timeout=30)
            # unique static shape per thread -> two genuinely cold
            # signatures racing into the compile path together
            x = jnp.arange(float(61 + k)).reshape(61 + k, 1)
            f = jax.jit(lambda a: (a * (2.5 + k) + k).sum())
            jax.block_until_ready(f(x))
        except Exception as e:  # noqa: BLE001 — surface in main thread
            errors.append(e)

    ts = [threading.Thread(target=compile_fresh, args=(i,)) for i in (1, 2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    assert not errors, errors
    assert compile_guard._max_active >= 1, (
        "compiles never reached the guarded region — is the wrapper "
        "installed above the path jit actually uses?")
    assert compile_guard._max_active == 1, (
        f"{compile_guard._max_active} threads were inside the compile "
        "path concurrently — the lock does not serialize")


def test_degrades_to_warning_when_hook_target_missing():
    """Unpinned-JAX contract: symbol gone -> RuntimeWarning + no-op
    install; single-threaded imports keep working (ADVICE r4)."""
    code = r"""
import os, warnings
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
from jax._src import compiler
del compiler.compile_or_get_cached   # simulate the upstream rename
with warnings.catch_warnings(record=True) as w:
    warnings.simplefilter("always")
    import nice_slam_tpu.slam        # install() runs here
msgs = [str(x.message) for x in w]
assert any("compile_guard" in m and "requirements.txt" in m for m in msgs), msgs
from nice_slam_tpu.utils import compile_guard
assert not compile_guard.is_installed()
print("OK-DEGRADE")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True,
        text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK-DEGRADE" in out.stdout
