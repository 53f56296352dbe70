"""Ant locomotion task.

Parity with reference `tasks/ant.py` (401 LoC): effort actuation
``actions * gears * power_scale`` (`ant.py:275-279`), 4 foot force
sensors (`:174-178`), 60-D observation (`compute_ant_observations`,
`:364-401`), potential-based progress reward with heading/up bonuses and
costs (`compute_ant_reward`, `:318-362`), uniform dof resets clamped to
limits (`:246-273`). Config `cfg/task/Ant.yaml`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..io.mjcf import load_mjcf
from .base import VecTask
from ..utils.assets import asset_path

_ASSET = asset_path("mjcf/nv_ant.xml")
_FEET = ("front_left_foot", "front_right_foot", "left_back_foot",
         "right_back_foot")


class Ant(VecTask):
    num_obs = 60

    def __init__(self, cfg=None, num_envs=4096, asset_root=None):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.max_episode_length = env.get("episodeLength", 1000)
        self.power_scale = env.get("powerScale", 1.0)
        self.heading_weight = env.get("headingWeight", 0.5)
        self.up_weight = env.get("upWeight", 0.1)
        self.actions_cost_scale = env.get("actionsCost", 0.005)
        self.energy_cost_scale = env.get("energyCost", 0.05)
        self.joints_at_limit_cost_scale = env.get("jointsAtLimitCost", 0.1)
        self.dof_vel_scale = env.get("dofVelocityScale", 0.2)
        self.contact_force_scale = env.get("contactForceScale", 0.1)
        self.death_cost = env.get("deathCost", -2.0)
        self.termination_height = env.get("terminationHeight", 0.31)
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
        self.num_dof = 8

        self.feet_idx = np.array([self.model.body_index(f) for f in _FEET])
        lo, hi = [], []
        for ji in range(self.model.njnt):
            if self.model.jnt_type[ji] == T.HINGE:
                lo.append(self.model.jnt_range[ji][0])
                hi.append(self.model.jnt_range[ji][1])
        self.dof_lower = jnp.asarray(np.array(lo, np.float32))
        self.dof_upper = jnp.asarray(np.array(hi, np.float32))
        self.init_q = jnp.asarray(self.model.init_qpos)
        # goal 1000m along +x (ant.py targets)
        self.targets = jnp.asarray([1000.0, 0.0, 0.0])
        self.dt_ctl = self.sim.dt * self.control_freq_inv

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
                jnp.clip(self.init_q[7:] + dq, self.dof_lower, self.dof_upper))
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
        inv_start = jnp.array([1.0, 0, 0, 0])  # start heading = +x
        torso_quat, up_proj, heading_proj, _, _ = mx.compute_heading_and_up(
            quat, inv_start, to_target, vec0, vec1, 2)
        vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target = \
            mx.compute_rot(torso_quat, lin_vel, ang_vel,
                           jnp.broadcast_to(self.targets, pos.shape), pos)

        dof_pos_scaled = mx.unscale_transform(dof_pos, self.dof_lower,
                                              self.dof_upper)
        # foot force sensors: (N, 4, 6) force+torque (ant.py:174-178)
        ff = info.body_contact_force[:, self.feet_idx, :]
        ft = info.body_contact_torque[:, self.feet_idx, :]
        sensors = jnp.concatenate([ff, ft], axis=-1).reshape(-1, 24)

        obs = jnp.concatenate([
            pos[:, 2:3], vel_loc, angvel_loc,
            yaw[:, None], roll[:, None], angle_to_target[:, None],
            up_proj[:, None], heading_proj[:, None],
            dof_pos_scaled, dof_vel * self.dof_vel_scale,
            sensors * self.contact_force_scale,
            state.aux["actions"],
        ], axis=-1)
        return obs, {"potentials": pot, "prev_potentials": prev_pot}

    def _reward_done(self, state, obs, actions, info):
        pot = state.aux["potentials"]
        prev_pot = state.aux["prev_potentials"]
        heading_proj = obs[:, 11]
        heading_reward = jnp.where(heading_proj > 0.8, self.heading_weight,
                                   self.heading_weight * heading_proj / 0.8)
        up_reward = jnp.where(obs[:, 10] > 0.93, self.up_weight, 0.0)
        actions_cost = jnp.sum(actions ** 2, axis=-1)
        electricity_cost = jnp.sum(
            jnp.abs(actions * obs[:, 20:28]), axis=-1)
        dof_at_limit_cost = jnp.sum(obs[:, 12:20] > 0.99, axis=-1).astype(
            obs.dtype)
        alive_reward = 0.5
        progress_reward = pot - prev_pot

        total = (progress_reward + alive_reward + up_reward + heading_reward
                 - self.actions_cost_scale * actions_cost
                 - self.energy_cost_scale * electricity_cost
                 - self.joints_at_limit_cost_scale * dof_at_limit_cost)
        fallen = obs[:, 0] < self.termination_height
        total = jnp.where(fallen, self.death_cost, total)
        done = fallen | (state.progress >= self.max_episode_length - 1)
        return total, done, {}
