import os

# Virtual 8-device CPU mesh for all tests. NOTE: the axon TPU plugin ignores
# the JAX_PLATFORMS *environment variable*, so the env-var override silently
# left tests running on the single real TPU — jax.config.update is honored.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
