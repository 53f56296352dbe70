"""Cartpole — the minimal exemplar task.

Parity with reference `tasks/cartpole.py` (196 LoC): effort drive on the
cart only (`cartpole.py:110-114, 161-165`), uniform DOF-state resets
(`:144-157`), reward kernel (`:180-196`). Config `cfg/task/Cartpole.yaml`:
512 envs, resetDist 3.0, maxEffort 400, episode 500, obs clip 5.0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import types as T
from ..io.urdf import load_urdf
from .base import VecTask
from ..utils.assets import asset_path

_ASSET = asset_path("urdf/cartpole.urdf")


class Cartpole(VecTask):
    num_obs = 4
    num_acts = 1

    def __init__(self, cfg=None, num_envs=512, asset_root=None):
        super().__init__(cfg, num_envs)
        env_cfg = (cfg or {}).get("env", {})
        self.reset_dist = env_cfg.get("resetDist", 3.0)
        self.max_push_effort = env_cfg.get("maxEffort", 400.0)
        self.max_episode_length = env_cfg.get("maxEpisodeLength", 500)
        self.clip_obs = env_cfg.get("clipObservations", 5.0)
        self.clip_actions = env_cfg.get("clipActions", 1.0)

        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 60.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        asset = asset_root or _ASSET
        self.model = load_urdf(asset, fix_base=True)
        # cart slides 2m above ground (visual; no contacts in this task)
        self.model = self.model  # slider base at origin is fine: no geoms hit

    # ---- physics: effort on cart dof only (cartpole.py:161-165) ----------
    def _physics(self, state, actions):
        from ..physics.collide import ContactSet
        from ..physics.step import physics_step
        no_contacts = ContactSet(body=np.zeros(0, np.int32),
                                 offset=np.zeros((0, 3), np.float32),
                                 radius=np.zeros(0, np.float32),
                                 geom=np.zeros(0, np.int32))
        model, sim = self.model, self.sim
        params = state.params

        def one(art, act):
            tau = jnp.zeros(model.nv).at[0].set(act[0] * self.max_push_effort)
            return physics_step(model, sim, params, art, extra_tau=tau,
                                contacts=no_contacts)

        return jax.vmap(one, in_axes=(0, 0))(state.art, actions)

    def _sample_reset(self, state, keys):
        # dof pos ~ 0.2*(U−0.5), dof vel ~ 0.5*(U−0.5)  (cartpole.py:144-148)
        def one(key):
            kp, kv = jax.random.split(key)
            q = 0.2 * (jax.random.uniform(kp, (2,)) - 0.5)
            qd = 0.5 * (jax.random.uniform(kv, (2,)) - 0.5)
            return q, qd

        q, qd = jax.vmap(one)(keys)
        return q, qd, {}

    def _observe(self, state, info):
        # [cart_pos, cart_vel, pole_angle, pole_vel] (cartpole.py:136-140)
        q, qd = state.art.q, state.art.qd
        return jnp.stack([q[:, 0], qd[:, 0], q[:, 1], qd[:, 1]], axis=-1), {}

    def _reward_done(self, state, obs, actions, info):
        cart_pos, cart_vel = obs[:, 0], obs[:, 1]
        pole_angle, pole_vel = obs[:, 2], obs[:, 3]
        reward = (1.0 - pole_angle * pole_angle - 0.01 * jnp.abs(cart_vel)
                  - 0.005 * jnp.abs(pole_vel))
        fail = (jnp.abs(cart_pos) > self.reset_dist) | \
               (jnp.abs(pole_angle) > np.pi / 2)
        reward = jnp.where(fail, -2.0, reward)
        done = fail | (state.progress >= self.max_episode_length - 1)
        return reward, done, {}
