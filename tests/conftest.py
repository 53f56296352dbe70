import os

# Force tests onto a virtual 8-device CPU mesh. The session environment pins
# JAX_PLATFORMS=axon (single real TPU via tunnel) — tests must override it,
# both to run fast and to validate multi-chip sharding without hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
