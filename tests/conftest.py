"""Test configuration: force CPU with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding tests use the
virtual-device CPU mesh.  Env vars must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu"
# via jax.config, which beats the env var — claim CPU back explicitly.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must run on the CPU backend"

jax.config.update("jax_enable_x64", False)

# Persistent compile cache: compiles dominate test wall-time on this host.
# Partitioned by host fingerprint — XLA:CPU AOT entries are not portable
# across the fleet's CPU-feature-heterogeneous hosts (utils/cache.py).
import sys  # noqa: E402

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
from nice_slam_tpu.utils.cache import setup_cache  # noqa: E402

setup_cache(os.path.join(os.path.dirname(__file__), ".."))
