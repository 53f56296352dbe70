"""Anymal velocity-command locomotion task.

Parity with reference `tasks/anymal.py` (389 LoC): PD position-target
control ``action_scale·a + default_dof_pos`` at Kp=85/Kd=2
(`anymal.py:202-206,229-232`), random (vx, vy, yaw-rate) commands per
episode (`:293-296`), 48-D observation (`compute_anymal_observations`,
`:352-389`), exp-tracking rewards + torque penalty scaled by dt
(`compute_anymal_reward`, `:307-349`), termination on base/knee contact
force (`:344-347`). Asset `urdf/anymal_c` loaded with
collapse_fixed_joints + cylinder→capsule (`:176-177`).
Config `cfg/task/Anymal.yaml`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..core.modeling import add_actuators, hinge_joint_names
from ..io.urdf import load_urdf
from .base import VecTask
from ..utils.assets import asset_path

_ASSET = asset_path("urdf/anymal_c/urdf/anymal.urdf")

_DEFAULT_ANGLES = {
    "LF_HAA": 0.03, "LH_HAA": 0.03, "RF_HAA": -0.03, "RH_HAA": -0.03,
    "LF_HFE": 0.4, "LH_HFE": -0.4, "RF_HFE": 0.4, "RH_HFE": -0.4,
    "LF_KFE": -0.8, "LH_KFE": 0.8, "RF_KFE": -0.8, "RH_KFE": 0.8,
}


class Anymal(VecTask):
    num_obs = 48

    def __init__(self, cfg=None, num_envs=4096, asset_root=None):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        learn = env.get("learn", {})
        control = env.get("control", {})
        self.clip_obs = env.get("clipObservations", 5.0)
        self.clip_actions = env.get("clipActions", 1.0)
        self.lin_vel_scale = learn.get("linearVelocityScale", 2.0)
        self.ang_vel_scale = learn.get("angularVelocityScale", 0.25)
        self.dof_pos_scale = learn.get("dofPositionScale", 1.0)
        self.dof_vel_scale = learn.get("dofVelocityScale", 0.05)
        self.action_scale = control.get("actionScale", 0.5)
        self.kp = control.get("stiffness", 85.0)
        self.kd = control.get("damping", 2.0)
        self.control_freq_inv = control.get("controlFrequencyInv", 1)
        cr = env.get("randomCommandVelocityRanges", {})
        self.cmd_x = tuple(cr.get("linear_x", (-2.0, 2.0)))
        self.cmd_y = tuple(cr.get("linear_y", (-1.0, 1.0)))
        self.cmd_yaw = tuple(cr.get("yaw", (-1.0, 1.0)))
        init = env.get("baseInitState", {})
        self.base_init_pos = tuple(init.get("pos", (0.0, 0.0, 0.62)))

        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 0.02),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        dt_ctl = self.sim.dt * self.control_freq_inv
        self.max_episode_length = int(
            learn.get("episodeLength_s", 50.0) / dt_ctl + 0.5)
        # reward scales, dt-scaled (anymal.py:99-100)
        self.rew_lin_vel_xy = learn.get("linearVelocityXYRewardScale", 1.0) * dt_ctl
        self.rew_ang_vel_z = learn.get("angularVelocityZRewardScale", 0.5) * dt_ctl
        self.rew_torque = learn.get("torqueRewardScale", -0.000025) * dt_ctl

        model = load_urdf(asset_root or _ASSET, fix_base=False,
                          collapse_fixed_joints=True,
                          replace_cylinder_with_capsule=True)
        dof_names = hinge_joint_names(model)
        self.model = add_actuators(model, dof_names, trntype=T.ACT_POSITION,
                                   kp=self.kp, kd=self.kd)
        self.num_acts = len(dof_names)
        self.num_dof = self.num_acts
        self.default_dof_pos = jnp.asarray(
            [_DEFAULT_ANGLES[n] for n in dof_names], jnp.float32)

        self.base_idx = self.model.body_index("base")
        self.knee_idx = np.array(
            [self.model.body_index(n) for n in self.model.body_names
             if "THIGH" in n])
        self.feet_idx = np.array(
            [self.model.body_index(n) for n in self.model.body_names
             if "SHANK" in n])

        init_q = np.array(self.model.init_qpos)
        init_q[0:3] = self.base_init_pos
        init_q[7:] = np.asarray(self.default_dof_pos)
        self.init_q = jnp.asarray(init_q, jnp.float32)
        self.gravity_vec = jnp.array([0.0, 0.0, -1.0])

    def _action_to_ctrl(self, actions):
        return self.action_scale * actions + self.default_dof_pos

    def _initial_aux(self):
        n = self.num_envs
        return {
            "actions": jnp.zeros((n, self.num_acts)),
            "commands": jnp.zeros((n, 3)),
        }

    def _sample_reset(self, state, keys):
        n = self.num_envs

        def one(key):
            kp_, kv, kc = jax.random.split(key, 3)
            scale = jax.random.uniform(kp_, (self.num_dof,), minval=0.5,
                                       maxval=1.5)
            dv = jax.random.uniform(kv, (self.num_dof,), minval=-0.1,
                                    maxval=0.1)
            q = self.init_q.at[7:].set(self.default_dof_pos * scale)
            qd = jnp.zeros(self.model.nv).at[6:].set(dv)
            cmd = jax.random.uniform(
                kc, (3,),
                minval=jnp.array([self.cmd_x[0], self.cmd_y[0],
                                  self.cmd_yaw[0]]),
                maxval=jnp.array([self.cmd_x[1], self.cmd_y[1],
                                  self.cmd_yaw[1]]))
            return q, qd, cmd

        q, qd, cmd = jax.vmap(one)(keys)
        return q, qd, {
            "actions": jnp.zeros((n, self.num_acts)),
            "commands": cmd,
        }

    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        base_quat = q[:, 3:7]
        base_lin_vel = mx.quat_rotate_inv(base_quat, qd[:, 0:3])
        base_ang_vel = mx.quat_rotate_inv(base_quat, qd[:, 3:6])
        projected_gravity = mx.quat_rotate_inv(base_quat, jnp.broadcast_to(
            self.gravity_vec, (self.num_envs, 3)))
        dof_pos_scaled = (q[:, 7:] - self.default_dof_pos) * self.dof_pos_scale
        cmd = state.aux["commands"]
        cmd_scale = jnp.array([self.lin_vel_scale, self.lin_vel_scale,
                               self.ang_vel_scale])
        obs = jnp.concatenate([
            base_lin_vel * self.lin_vel_scale,
            base_ang_vel * self.ang_vel_scale,
            projected_gravity,
            cmd * cmd_scale,
            dof_pos_scaled,
            qd[:, 6:] * self.dof_vel_scale,
            state.aux["actions"],
        ], axis=-1)
        return obs, {}

    def _reward_done(self, state, obs, actions, info):
        q, qd = state.art.q, state.art.qd
        base_quat = q[:, 3:7]
        base_lin_vel = mx.quat_rotate_inv(base_quat, qd[:, 0:3])
        base_ang_vel = mx.quat_rotate_inv(base_quat, qd[:, 3:6])
        cmd = state.aux["commands"]

        lin_vel_error = jnp.sum(
            (cmd[:, :2] - base_lin_vel[:, :2]) ** 2, axis=-1)
        ang_vel_error = (cmd[:, 2] - base_ang_vel[:, 2]) ** 2
        rew_lin = jnp.exp(-lin_vel_error / 0.25) * self.rew_lin_vel_xy
        rew_ang = jnp.exp(-ang_vel_error / 0.25) * self.rew_ang_vel_z
        torques = info.tau[:, 6:]
        rew_torque = jnp.sum(torques ** 2, axis=-1) * self.rew_torque
        total = jnp.clip(rew_lin + rew_ang + rew_torque, 0.0, None)

        cf = info.body_contact_force
        base_contact = jnp.linalg.norm(cf[:, self.base_idx], axis=-1) > 1.0
        knee_contact = jnp.any(
            jnp.linalg.norm(cf[:, self.knee_idx], axis=-1) > 1.0, axis=-1)
        done = (base_contact | knee_contact
                | (state.progress >= self.max_episode_length - 1))
        return total, done, {}
