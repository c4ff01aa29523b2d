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
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
