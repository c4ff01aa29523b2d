"""SLAM runtime (L5): tracker, mapper, schedulers, shared state."""

from nice_slam_tpu.utils import compile_guard as _compile_guard

# Concurrent first-compiles from the loose/free tracker+mapper threads can
# segfault the XLA compile/persistent-cache path — serialize them process-
# wide before any SLAM thread exists (see utils/compile_guard.py).
_compile_guard.install()
