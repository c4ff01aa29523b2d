"""Host-fingerprinted compile-cache partitioning (utils/cache.py).

Round-4 verdict: the suite segfaulted (rc=139) deserializing a
persistent-cache entry written by a different fleet host — XLA:CPU AOT
executables embed machine features and are not host-portable.  The fix
is structural: every entry point partitions `.jax_cache/` by a host
fingerprint, so a host only ever reads entries an identically-featured
host wrote.  These tests pin that contract.
"""

import os
import re

import jax

from nice_slam_tpu.utils.cache import cache_dir, host_fingerprint, setup_cache

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))


def test_fingerprint_stable_and_wellformed():
    fp = host_fingerprint()
    assert re.fullmatch(r"[0-9a-f]{12}", fp)
    assert host_fingerprint() == fp  # deterministic within a host


def test_fingerprint_covers_cpu_features(monkeypatch):
    """Two hosts differing only in CPU feature flags must not share a
    partition (the exact crash mechanism from MULTICHIP_r04.json)."""
    import nice_slam_tpu.utils.cache as mod

    base = host_fingerprint()

    real_open = open

    def fake_open(path, *a, **k):
        if path == "/proc/cpuinfo":
            import io

            return io.StringIO("flags\t: fpu sse sse2 avx avx2 avx512f\n")
        return real_open(path, *a, **k)

    monkeypatch.setattr("builtins.open", fake_open)
    # this host's real flag set (20+ flags) differs from the fake 6-flag set
    assert mod.host_fingerprint() != base


def test_conftest_routed_jax_cache_into_partition():
    """The suite's own jax config must point inside this host's partition."""
    configured = jax.config.jax_compilation_cache_dir
    assert configured == cache_dir(REPO)
    assert os.path.basename(configured) == host_fingerprint()
    assert os.path.dirname(configured) == os.path.join(REPO, ".jax_cache")
    assert os.path.isdir(configured)


def test_every_entry_point_uses_setup_cache():
    """No entry point may hand-roll a non-partitioned cache dir again."""
    entry_points = [
        "run.py", "bench.py", "__graft_entry__.py", "tests/conftest.py",
        "scripts/bench_loose.py", "scripts/profile_loop.py",
        "scripts/profile_map.py",
        "nice_slam_tpu/tools/selfcheck.py",
        "nice_slam_tpu/tools/track_envelope.py",
    ]
    for rel in entry_points:
        src = open(os.path.join(REPO, rel)).read()
        assert "setup_cache" in src, f"{rel} bypasses the cache partition"
        assert 'jax_compilation_cache_dir' not in src, (
            f"{rel} sets the cache dir directly; use utils.cache.setup_cache")


def test_setup_cache_idempotent(tmp_path):
    d1 = setup_cache(str(tmp_path))
    d2 = setup_cache(str(tmp_path))
    assert d1 == d2 and os.path.isdir(d1)
    # restore the suite's cache dir for subsequent tests
    setup_cache(REPO)
