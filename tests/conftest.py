"""Test config: run all tests on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware.

Note: this environment forces JAX_PLATFORMS=axon via sitecustomize, so the
platform must be overridden through jax.config, not env vars.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Per-op eager dispatch is slow in this environment; the persistent cache
# makes repeat test runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/prosper_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
