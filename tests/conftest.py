"""Test configuration.

Unit tests always run on a virtual 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (and without contending for the
single tunneled TPU chip). NOTE: this environment force-registers the 'axon'
TPU platform regardless of JAX_PLATFORMS, so the platform must be pinned via
jax.config, not the env var.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA compiles are expensive in this environment; persist them across runs
jax.config.update("jax_compilation_cache_dir", "/tmp/pgdvs_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
