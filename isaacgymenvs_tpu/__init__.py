"""isaacgymenvs_tpu — a TPU-native vectorized robotics-RL framework.

Brand-new JAX/XLA implementation with the capabilities of
RPL-CS-UCL/IsaacGymEnvs: batched articulated rigid-body physics stepped
under jit, task environments, domain randomization, terrain curriculum,
PPO/SAC/AMP learning, multi-chip sharding.
"""

__version__ = "0.1.0"

import jax as _jax

# Physics needs true-f32 matmuls: TPU's default matmul precision is bf16
# passes, whose ~8-bit mantissa corrupts the mass matrix / Delassus operator
# (policy-net matmuls are explicitly bf16 under mixed_precision and are
# unaffected — bf16 inputs already use the MXU's native mode).
_jax.config.update("jax_default_matmul_precision", "highest")


def make(*args, **kwargs):
    """Public factory mirroring `isaacgymenvs.make` (reference
    __init__.py:14-55). Lazy import to keep `import isaacgymenvs_tpu` light."""
    from .api import make as _make
    return _make(*args, **kwargs)
