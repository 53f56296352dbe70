"""Statistical physics validation against MuJoCo (the MJCF authority).

Rolls the SAME random-torque excitation on nv_ant in our solver and in
MuJoCo (via the oracle backend) and asserts the aggregate dynamics
statistics agree within tolerance bands. Guards against silent solver
drift that per-step goldens can't judge (chaos) and documents the
measured equivalence (round 2: mean |dof_vel| 9.1 vs 9.05 rad/s).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isaacgymenvs_tpu

mujoco = pytest.importorskip("mujoco")

N, T = 48, 200


def _stats(env, seed=0):
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(123)
    dv, h, deaths = [], [], 0
    for t in range(T):
        key, k = jax.random.split(key)
        a = jnp.clip(jax.random.normal(k, (N, 8)), -1, 1)
        state, ts = step(state, a)
        dv.append(float(jnp.abs(state.art.qd[:, 6:]).mean()))
        h.append(float(state.art.q[:, 2].mean()))
        deaths += int(ts.done.sum())
    return np.mean(dv), np.mean(h), deaths


def test_ant_random_torque_stats_match_mujoco():
    ours = isaacgymenvs_tpu.make(task="Ant", num_envs=N)
    dv0, h0, d0 = _stats(ours)

    from isaacgymenvs_tpu.utils.mj_oracle import mujoco_ant
    oracle = mujoco_ant(num_envs=N)
    dv1, h1, d1 = _stats(oracle)

    # thrash intensity: mean |dof_vel| within 40%
    assert abs(dv0 - dv1) / max(dv1, 1e-6) < 0.40, (dv0, dv1)
    # hop height: mean torso z within 25%
    assert abs(h0 - h1) / max(h1, 1e-6) < 0.25, (h0, h1)
    # mortality within a factor ~2.5 (counting semantics equal here)
    assert d1 == 0 or 0.3 < (d0 + 1) / (d1 + 1) < 3.0, (d0, d1)
