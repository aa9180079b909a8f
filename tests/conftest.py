"""Test config: run all tests on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# Per-op eager dispatch is slow in this environment (~100ms/op compile);
# the persistent cache makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/prosper_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
