"""Multi-device sharding tests (SURVEY.md §2.8).

Runs on the 8-virtual-CPU-device mesh from conftest. Asserts the product
path's env-axis sharding (`learn/runner.py` -> `parallel/mesh.auto_shard`)
computes the SAME training epoch as a single device: identical seed, same
metrics and parameters to float tolerance (XLA partitions the very same
jitted graph; only reduction orders may differ).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isaacgymenvs_tpu
from isaacgymenvs_tpu.learn.ppo import PPO, PPOConfig
from isaacgymenvs_tpu.parallel.mesh import auto_shard, make_mesh, \
    shard_batched


def _small_ppo(num_envs=64):
    env = isaacgymenvs_tpu.make(task="Cartpole", num_envs=num_envs)
    cfg = PPOConfig(horizon_length=8, minibatch_size=num_envs * 8 // 2,
                    mini_epochs=2, units=(32, 32), mixed_precision=False,
                    reward_shaper_scale=0.1)
    return env, PPO(env, cfg, seed=0)


def test_requires_eight_devices():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"


def test_sharded_epoch_matches_single_device():
    env, ppo = _small_ppo()
    ts0 = ppo.init()

    # single device (default placement)
    ts1, m1 = ppo.epoch_fn(ts0)

    # sharded over all 8 virtual devices via the product-path helper
    ts_sh, mesh = auto_shard(ppo.init(), env.num_envs)
    assert mesh is not None and mesh.devices.size == jax.device_count()
    ts2, m2 = ppo.epoch_fn(ts_sh)

    for k in ("loss", "kl", "a_loss", "c_loss"):
        np.testing.assert_allclose(np.asarray(m1[k]), np.asarray(m2[k]),
                                   rtol=2e-4, atol=2e-5, err_msg=k)
    # parameters after the epoch agree leaf-for-leaf
    flat1 = jax.tree_util.tree_leaves(ts1.params)
    flat2 = jax.tree_util.tree_leaves(ts2.params)
    for a, b in zip(flat1, flat2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_sharded_epoch_keeps_env_axis_sharding():
    env, ppo = _small_ppo()
    ts, mesh = auto_shard(ppo.init(), env.num_envs)
    ts2, _ = ppo.epoch_fn(ts)
    jax.block_until_ready(ts2.obs)
    # output env state stays distributed (no silent gather onto one device)
    shardings = {len(d.device_set) for d in
                 (ts2.obs.sharding, ts2.env_state.art.q.sharding)}
    assert shardings == {jax.device_count()}


def test_auto_shard_rejects_indivisible():
    env, ppo = _small_ppo(num_envs=64)
    ts = ppo.init()
    with pytest.raises(ValueError):
        auto_shard(ts, 63, n_devices=8)


def test_runner_trains_sharded(tmp_path):
    """End-to-end: Runner.train shards automatically on a multi-device
    host (the `python train.py task=X` path)."""
    from isaacgymenvs_tpu.learn.runner import Runner
    env = isaacgymenvs_tpu.make(task="Cartpole", num_envs=64)
    params = {"params": {
        "algo": {"name": "a2c_continuous"},
        "network": {"mlp": {"units": [32, 32]}},
        "config": {"horizon_length": 8, "minibatch_size": 256,
                   "mini_epochs": 2, "max_epochs": 3,
                   "reward_shaper": {"scale_value": 0.1},
                   "save_frequency": 0},
    }}
    r = Runner(env, params, seed=0, logdir=str(tmp_path / "run"))
    ts = r.train()
    assert int(ts.epoch) == 3
    assert len(ts.obs.sharding.device_set) == jax.device_count()
