"""Humanoid locomotion task.

Parity with reference `tasks/humanoid.py` (413 LoC): effort actuation
``actions * motor_efforts * power_scale`` (`humanoid.py:283-285`), 2 foot
force sensors (right_foot, left_foot — `:166-172`), per-DOF force obs
(`acquire_dof_force_tensor`, `:85-89`), 108-D observation
(`compute_humanoid_observations`, `:383-413`), motor-effort-weighted
electricity/limit costs and alive bonus 2.0 (`compute_humanoid_reward`,
`:324-377`), initial DOF pose snapped inside limits (`:100-105`).
Config `cfg/task/Humanoid.yaml`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..io.mjcf import load_mjcf
from .base import VecTask
from ..utils.assets import asset_path

_ASSET = asset_path("mjcf/nv_humanoid.xml")
_FEET = ("right_foot", "left_foot")  # sensor creation order humanoid.py:166-172


class Humanoid(VecTask):
    num_obs = 108

    def __init__(self, cfg=None, num_envs=4096, asset_root=None):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.max_episode_length = env.get("episodeLength", 1000)
        self.power_scale = env.get("powerScale", 1.0)
        self.heading_weight = env.get("headingWeight", 0.5)
        self.up_weight = env.get("upWeight", 0.1)
        self.actions_cost_scale = env.get("actionsCost", 0.01)
        self.energy_cost_scale = env.get("energyCost", 0.05)
        self.joints_at_limit_cost_scale = env.get("jointsAtLimitCost", 0.25)
        self.dof_vel_scale = env.get("dofVelocityScale", 0.1)
        self.angular_velocity_scale = env.get("angularVelocityScale", 0.25)
        self.contact_force_scale = env.get("contactForceScale", 0.01)
        self.death_cost = env.get("deathCost", -1.0)
        self.termination_height = env.get("terminationHeight", 0.8)
        self.clip_actions = env.get("clipActions", 1.0)
        self.control_freq_inv = env.get("controlFrequencyInv", 1)

        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 60.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        self.model = load_mjcf(asset_root or _ASSET)
        self.num_acts = self.model.nu
        self.num_dof = self.model.nv - 6

        self.feet_idx = np.array([self.model.body_index(f) for f in _FEET])
        lo, hi = [], []
        for ji in range(self.model.njnt):
            if self.model.jnt_type[ji] == T.HINGE:
                l, h = self.model.jnt_range[ji]
                lo.append(min(l, h))
                hi.append(max(l, h))
        self.dof_lower = jnp.asarray(np.array(lo, np.float32))
        self.dof_upper = jnp.asarray(np.array(hi, np.float32))

        # start pose z=1.34 (humanoid.py:178-181); initial dof pos snapped
        # inside limits (humanoid.py:100-105)
        init_q = np.array(self.model.init_qpos)
        init_q[2] = 1.34
        init_dof = np.where(np.array(lo) > 0, np.array(lo),
                            np.where(np.array(hi) < 0, np.array(hi), 0.0))
        init_q[7:] = init_dof
        self.init_q = jnp.asarray(init_q, jnp.float32)
        self.init_dof = jnp.asarray(init_dof, jnp.float32)

        self.motor_efforts = jnp.asarray(self.model.act_gear, jnp.float32)
        self.motor_effort_ratio = self.motor_efforts / jnp.max(
            self.motor_efforts)
        self.targets = jnp.asarray([1000.0, 0.0, 0.0])
        self.dt_ctl = self.sim.dt * self.control_freq_inv

    def _initial_params(self, key):
        p = self.model.default_phys_params()
        # fold powerScale into the effective gear (humanoid.py:283-285)
        return dataclasses.replace(p, act_gear=p.act_gear * self.power_scale)

    def _initial_aux(self):
        n = self.num_envs
        init_pot = -1000.0 / self.dt_ctl
        return {
            "actions": jnp.zeros((n, self.num_acts)),
            "potentials": jnp.full((n,), init_pot),
            "prev_potentials": jnp.full((n,), init_pot),
        }

    def _sample_reset(self, state, keys):
        n = self.num_envs

        def one(key):
            kp, kv = jax.random.split(key)
            dq = jax.random.uniform(kp, (self.num_dof,), minval=-0.2,
                                    maxval=0.2)
            dv = jax.random.uniform(kv, (self.num_dof,), minval=-0.1,
                                    maxval=0.1)
            q = self.init_q.at[7:].set(
                jnp.clip(self.init_dof + dq, self.dof_lower, self.dof_upper))
            qd = jnp.zeros(self.model.nv).at[6:].set(dv)
            return q, qd

        q, qd = jax.vmap(one)(keys)
        to_target = self.targets[:2] - q[:, 0:2]
        pot = -jnp.linalg.norm(to_target, axis=-1) / self.dt_ctl
        return q, qd, {
            "actions": jnp.zeros((n, self.num_acts)),
            "potentials": pot,
            "prev_potentials": pot,
        }

    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        pos, quat = q[:, 0:3], q[:, 3:7]
        lin_vel, ang_vel = qd[:, 0:3], qd[:, 3:6]
        dof_pos, dof_vel = q[:, 7:], qd[:, 6:]

        to_target = (self.targets - pos).at[:, 2].set(0.0)
        prev_pot = state.aux["potentials"]
        pot = -jnp.linalg.norm(to_target[:, :2], axis=-1) / self.dt_ctl

        vec0 = jnp.array([1.0, 0, 0])
        vec1 = jnp.array([0.0, 0, 1])
        inv_start = jnp.array([1.0, 0, 0, 0])
        torso_quat, up_proj, heading_proj, _, _ = mx.compute_heading_and_up(
            quat, inv_start, to_target, vec0, vec1, 2)
        vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target = \
            mx.compute_rot(torso_quat, lin_vel, ang_vel,
                           jnp.broadcast_to(self.targets, pos.shape), pos)

        dof_pos_scaled = mx.unscale_transform(dof_pos, self.dof_lower,
                                              self.dof_upper)
        # per-DOF force obs: applied generalized force at each joint dof —
        # the TPU analogue of acquire_dof_force_tensor (humanoid.py:85-89)
        dof_force = info.tau[:, 6:]
        # foot force sensors (N, 2, 6) (humanoid.py:166-172)
        ff = info.body_contact_force[:, self.feet_idx, :]
        ft = info.body_contact_torque[:, self.feet_idx, :]
        sensors = jnp.concatenate([ff, ft], axis=-1).reshape(-1, 12)

        obs = jnp.concatenate([
            pos[:, 2:3], vel_loc, angvel_loc * self.angular_velocity_scale,
            mx.normalize_angle(yaw)[:, None],
            mx.normalize_angle(roll)[:, None],
            mx.normalize_angle(angle_to_target)[:, None],
            up_proj[:, None], heading_proj[:, None],
            dof_pos_scaled, dof_vel * self.dof_vel_scale,
            dof_force * self.contact_force_scale,
            sensors * self.contact_force_scale,
            state.aux["actions"],
        ], axis=-1)
        return obs, {"potentials": pot, "prev_potentials": prev_pot}

    def _reward_done(self, state, obs, actions, info):
        nd = self.num_dof
        pot = state.aux["potentials"]
        prev_pot = state.aux["prev_potentials"]
        heading_proj = obs[:, 11]
        heading_reward = jnp.where(heading_proj > 0.8, self.heading_weight,
                                   self.heading_weight * heading_proj / 0.8)
        up_reward = jnp.where(obs[:, 10] > 0.93, self.up_weight, 0.0)
        actions_cost = jnp.sum(actions ** 2, axis=-1)

        dof_pos_scaled = obs[:, 12:12 + nd]
        dof_vel_obs = obs[:, 12 + nd:12 + 2 * nd]
        mer = self.motor_effort_ratio
        # motor-effort-weighted limit cost (humanoid.py:352-354)
        scaled_cost = self.joints_at_limit_cost_scale * (
            jnp.abs(dof_pos_scaled) - 0.98) / 0.02
        dof_at_limit_cost = jnp.sum(
            (jnp.abs(dof_pos_scaled) > 0.98) * scaled_cost * mer, axis=-1)
        electricity_cost = jnp.sum(
            jnp.abs(actions * dof_vel_obs) * mer, axis=-1)

        alive_reward = 2.0
        progress_reward = pot - prev_pot
        total = (progress_reward + alive_reward + up_reward + heading_reward
                 - self.actions_cost_scale * actions_cost
                 - self.energy_cost_scale * electricity_cost
                 - dof_at_limit_cost)
        fallen = obs[:, 0] < self.termination_height
        total = jnp.where(fallen, self.death_cost, total)
        done = fallen | (state.progress >= self.max_episode_length - 1)
        return total, done, {}
