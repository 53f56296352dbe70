#!/usr/bin/env python
"""A1 step-1 catapult isolation: which dof, and is it the limit rows?

Run: JAX_PLATFORMS=cpu python scripts/a1_diag2.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import isaacgymenvs_tpu
from isaacgymenvs_tpu.core import types as T


def probe(env, tag, q_override=None):
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    if q_override is not None:
        import dataclasses
        q = state.art.q.at[:, 7:].set(q_override)
        state = dataclasses.replace(
            state, art=T.ArtState(q=q, qd=state.art.qd * 0))
    q0 = np.asarray(state.art.q)
    zero = jnp.zeros((env.num_envs, env.num_acts))
    state, t = jax.jit(env.step)(state, zero)
    qd = np.asarray(state.art.qd)
    q1 = np.asarray(state.art.q)
    # worst env/dof
    flat = np.abs(qd)
    ei, di = np.unravel_index(np.argmax(flat), flat.shape)
    lo, hi = env.model.dof_limits()
    lo, hi = np.asarray(lo), np.asarray(hi)
    names = env.dof_names
    print(f"--- {tag}: qd_max {flat.max():.2f} at env {ei} dof {di}")
    if di >= 6:
        j = di - 6
        print(f"    dof name {names[j]}, q0 {q0[ei, 7 + j]:.4f}, "
              f"q1 {q1[ei, 7 + j]:.4f}, limits [{lo[di]:.4f}, {hi[di]:.4f}]")
    # dump worst env's joint state vs limits
    with np.printoptions(precision=3, suppress=True):
        print("    q0 dofs:", q0[ei, 7:])
        print("    qd dofs:", qd[ei, 6:])
        print("    lo:", lo[6:])
        print("    hi:", hi[6:])
    # count dofs exactly at a limit after reset
    at_lim = np.sum((np.abs(q0[:, 7:] - lo[None, 6:]) < 1e-6)
                    | (np.abs(q0[:, 7:] - hi[None, 6:]) < 1e-6))
    print(f"    dofs at limit after reset: {at_lim} / {q0[:, 7:].size}")
    # correlation: |qd| by at-limit status
    atl = (np.abs(q0[:, 7:] - lo[None, 6:]) < 1e-6) \
        | (np.abs(q0[:, 7:] - hi[None, 6:]) < 1e-6)
    j_qd = np.abs(qd[:, 6:])
    if atl.any():
        print(f"    mean |qd| at-limit dofs: {j_qd[atl].mean():.3f}, "
              f"others: {j_qd[~atl].mean():.3f}, "
              f"max at-limit: {j_qd[atl].max():.3f}, "
              f"max others: {j_qd[~atl].max():.3f}")


env = isaacgymenvs_tpu.make(task="A1Terrain", num_envs=64,
                            cfg={"env": {}, "sim": {}})
probe(env, "randomized reset (default path)")
# default angles, zero velocity: the nominal spawn
dq = jnp.asarray(np.array(env.default_dof_pos))
probe(env, "default angles, qd=0", q_override=dq)
