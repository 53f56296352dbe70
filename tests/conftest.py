import os

# Virtual 8-device CPU mesh for all tests. NOTE: the axon TPU plugin ignores
# the JAX_PLATFORMS *environment variable*, so the env-var override silently
# left tests running on the single real TPU — jax.config.update is honored.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the heavy env graphs (hands ≈ minutes on CPU)
# compile once per machine, not once per pytest run
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
