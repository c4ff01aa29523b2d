"""Host-fingerprinted persistent compile cache.

The fleet running this repo is CPU-feature heterogeneous: XLA:CPU
serializes AOT-compiled executables that embed the compiling host's
machine features, and deserializing an entry written by a different
host fails the machine-feature check ("Machine type used for XLA:CPU
compilation doesn't match the machine type for execution ... could
lead to execution errors such as SIGILL", observed in
MULTICHIP_r04.json stderr) — or worse, segfaults the process inside
``jax._src.compilation_cache.get_executable_and_time`` (observed
round 4: rc=139 in the single-threaded strict arm of
tests/test_sync_hardening.py while deserializing a cache entry).

Fix: partition the cache directory by a host fingerprint — a hash of
(machine arch, jaxlib version, the /proc/cpuinfo feature-flag set).
Each host only ever reads entries that an identically-featured host
wrote, so the portability crash class is structurally impossible.
Entries remain shared across processes/rounds on the same host, which
is where all the wall-time savings live (this box has 1 vCPU and
20-40 s compiles).

Every entry point (tests/conftest.py, run.py, bench.py,
__graft_entry__.py, scripts/*, tools that jit) routes through
``setup_cache`` so the partitioning cannot drift.
"""

from __future__ import annotations

import hashlib
import os
import platform


def host_fingerprint() -> str:
    """Stable 12-hex-char id for (arch, jaxlib version, CPU feature set)."""
    bits = [platform.machine()]
    try:
        import jaxlib

        bits.append(getattr(jaxlib, "__version__", "unknown"))
    except Exception:
        bits.append("no-jaxlib")
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.lower().startswith("flags"):
                    # sorted so kernel ordering changes don't split the cache
                    bits.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        pass  # non-Linux: arch+jaxlib still partition coarsely
    return hashlib.sha256("|".join(bits).encode()).hexdigest()[:12]


def cache_dir(repo_root: str) -> str:
    """`<repo_root>/.jax_cache/<host_fingerprint>` (created if absent)."""
    d = os.path.join(os.path.abspath(repo_root), ".jax_cache",
                     host_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d


def setup_cache(repo_root: str) -> str:
    """Point jax's persistent compile cache at this host's partition.

    Returns the cache dir.  Safe to call multiple times / after jax
    backend init (these are plain config updates).
    """
    import jax

    d = cache_dir(repo_root)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return d
