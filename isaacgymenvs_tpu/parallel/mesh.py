"""Device mesh + env-axis sharding (SURVEY.md §2.8 TPU-native equivalents).

The reference scales by one-sim-per-GPU-process with torch.distributed
NCCL all-reduce (`train.py:74-82`, rl_games A2CBase). Here: single-program
multi-chip — ONE logical sim whose env axis is sharded over the mesh with
`NamedSharding(P("env"))`; the PPO learner stays in the same jit, XLA
inserts psum/all-gather collectives over ICI. Multi-host: call
`jax.distributed.initialize()` (train.py multi_gpu flag) and the same code
spans hosts (DCN between slices).

The product path (`learn/runner.py`) calls `auto_shard(train_state,
num_envs)` after agent init: on one device it is a no-op; on N devices the
TrainState's env-axis leaves (env state, obs, rollout buffers) are laid
out over the mesh and the params/optimizer/normalizers replicated, so
`python train.py task=Ant` uses every local chip (reference parity:
torchrun multi-GPU is a first-class CLI path, reference train.py:74-82).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(n_devices: Optional[int] = None, axis: str = ENV_AXIS) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


# TrainState subtrees that are never env-batched: network/optimizer
# tensors whose first axis COINCIDENTALLY equals num_envs (e.g. a Dense
# kernel with units == num_envs) must not be laid out along the env axis
# — still correct under GSPMD, but it forces collectives in every matmul.
REPLICATED_SUBTREES = frozenset(
    {"params", "cv_params", "opt_state", "lr", "epoch", "key"})


def shard_batched(tree, mesh: Mesh, batch_size: int, axis: str = ENV_AXIS):
    """Place every env-batched leaf (leading dim == batch_size, outside the
    known param/optimizer subtrees) on the env axis; replicate everything
    else (params, optimizer, normalizers, scalars)."""
    env_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def place(path, x):
        head = path[0] if path else None
        name = getattr(head, "name",
                       getattr(head, "key", getattr(head, "idx", None)))
        if (name not in REPLICATED_SUBTREES
                and hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1
                and x.shape[0] == batch_size):
            return jax.device_put(x, env_sharding)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map_with_path(place, tree)


def auto_shard(tree, batch_size: int, n_devices: Optional[int] = None):
    """Product-path entry: shard over all local devices when there are
    several, no-op on one. batch_size must divide the device count."""
    n = n_devices or jax.device_count()
    if n <= 1:
        return tree, None
    if batch_size % n:
        raise ValueError(
            f"num_envs={batch_size} not divisible by device count {n}; "
            f"pass num_envs as a multiple of {n}")
    mesh = make_mesh(n)
    return shard_batched(tree, mesh, batch_size), mesh


def pmean_if_distributed(x, axis: str = ENV_AXIS):
    """Metric reduction helper for shard_map-style code paths."""
    try:
        return jax.lax.pmean(x, axis)
    except NameError:
        return x
