"""FactoryTaskInsertion + FactoryTaskGears: non-RL task templates.

Parity with reference `factory/factory_task_insertion.py` (199 LoC) and
`factory_task_gears.py` (226 LoC): per docs/rl_examples.md:401 these
ship the ENVIRONMENT only — "training a successful RL policy is an open
research problem left to the user".  Rewards are zero, episodes end on
timeout, observations are zero-padded to numObservations=32.  One
usability improvement over the reference (whose `pre_physics_step`
stores actions without applying them): actions drive the fingertip
pose targets exactly as in the RL tasks, so scripted/random policies
exercise the full control + contact stack.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .env_gears import FactoryEnvGears
from .env_insertion import FactoryEnvInsertion


class _TemplateTask:
    """Mixin: action plumbing + zero reward + timeout episodes."""

    num_obs = 32
    num_acts = 12
    refresh_kin_on_reset = True

    def _template_init(self, cfg):
        c = cfg or {}
        rnd = c.get("randomize", {})
        self.arm_initial = jnp.asarray(rnd.get(
            "franka_arm_initial_dof_pos",
            [0.0, -0.196, 0.0, -1.976, 0.0, 1.78, 0.785]), jnp.float32)
        self.gripper_width_max = \
            self.asset_info["franka_gripper_width_max"]

    def _sample_reset(self, state, keys):
        def one(key):
            q = self.init_q.at[:7].set(self.arm_initial)
            q = q.at[7:9].set(self.gripper_width_max / 2)
            return q, jnp.zeros(self.model.nv)

        q, qd = jax.vmap(one)(keys)
        return q, qd, {}

    def _physics(self, state, actions):
        def one(art, act, params):
            from ...physics.kinematics import forward_kinematics
            kin = forward_kinematics(self.model, params, art.q, art.qd)
            ft_pos, ft_quat, _, _ = self._fingertip_state(kin)
            tgt_pos, tgt_quat, wrench = self._targets_from_actions(
                ft_pos, ft_quat, act, do_scale=True)
            return self._sim_one(art, params, tgt_pos, tgt_quat,
                                 self.gripper_width_max / 2, wrench)

        in_axes = (0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(state.art, actions,
                                              state.params)

    def _observe(self, state, info):
        ft_pos, ft_quat, ft_lv, ft_av = jax.vmap(
            self._fingertip_state)(info.kin)
        obs = jnp.concatenate([ft_pos, ft_quat, ft_lv, ft_av], axis=-1)
        pad = self.num_obs - obs.shape[-1]
        return jnp.concatenate(
            [obs, jnp.zeros(obs.shape[:-1] + (pad,), obs.dtype)], -1), {}

    def _reward_done(self, state, obs, actions, info):
        done = state.progress >= self.max_episode_length - 1
        return jnp.zeros(self.num_envs, obs.dtype), done, {}


class FactoryTaskInsertion(_TemplateTask, FactoryEnvInsertion):
    def __init__(self, cfg=None, num_envs=128):
        super().__init__(cfg, num_envs)
        self._template_init(cfg)


class FactoryTaskGears(_TemplateTask, FactoryEnvGears):
    def __init__(self, cfg=None, num_envs=128):
        super().__init__(cfg, num_envs)
        self._template_init(cfg)
