"""A1Terrain — the RPL-CS-UCL fork's Unitree A1 task.

Parity with reference `tasks/A1_terrain.py` (673 LoC), a refactored clone
of AnymalTerrain: DIRECT torque control ``clip(action_scale·a, ±30)`` at
500 Hz (`A1_terrain.py:486`), 48-D obs without height samples
(`:309-316`, `cfg/task/A1Terrain.yaml:8`), refactored reward helpers —
`_get_reward_foot_air_time` (`:386`), `_get_knee_collision_reward`
(`:396`), `_get_foot_contact_reward` (`:402`), `_get_gait_reward`
(paired-leg symmetry over L pairs, `:409`), `_get_reward_hip` (`:418`) —
base body "trunk" (`:286`), no total-reward clip and no termination
reward (`:367-368`), commands (vx, vy, yaw) with yaw resampled directly
(no heading loop, `:453`). Default terrainType plane, curriculum false.
Config `cfg/task/A1Terrain.yaml`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..physics.collide import build_ground_contacts
from ..physics.step import physics_step
from .anymal_terrain import AnymalTerrain
from ..utils.assets import asset_path

_ASSET = asset_path(
    "urdf/A1/urdf/a1_unitree_modified_no_joint_dynamics.urdf")

_A1_ANGLES = {
    "FR_hip_joint": -0.1, "FR_thigh_joint": 0.8, "FR_calf_joint": -1.5,
    "FL_hip_joint": 0.1, "FL_thigh_joint": 0.8, "FL_calf_joint": -1.5,
    "RR_hip_joint": -0.1, "RR_thigh_joint": 1.0, "RR_calf_joint": -1.5,
    "RL_hip_joint": 0.1, "RL_thigh_joint": 1.0, "RL_calf_joint": -1.5,
}

_REW_TERMS_A1 = ("lin_vel_xy", "ang_vel_z", "lin_vel_z", "ang_vel_xy",
                 "orient", "torques", "joint_acc", "base_height", "air_time",
                 "knee_collision", "foot_contact", "action_rate", "gait",
                 "hip")


class A1Terrain(AnymalTerrain):
    num_obs = 48

    asset_path = _ASSET
    default_angles = _A1_ANGLES
    foot_name = "foot"
    knee_name = "thigh"
    torque_clip = 30.0

    def __init__(self, cfg=None, num_envs=4096, seed: int = 0):
        cfg = cfg or {}
        env = cfg.setdefault("env", {})
        env.setdefault("terrain", {}).setdefault("terrainType", "plane")
        env.setdefault("baseInitState", {}).setdefault(
            "pos", [0.0, 0.0, 0.35])
        env.setdefault("control", {}).setdefault("decimation", 1)
        env["control"].setdefault("actionScale", 9.0)
        cfg.setdefault("sim", {}).setdefault("dt", 0.002)
        super().__init__(cfg, num_envs, seed)

        learn = env.get("learn", {})
        self.proj_grav_scale = learn.get("projectedGravityScale", 1.0)
        self.user_command_scale = jnp.asarray(
            learn.get("userCommandScale", [2.0, 2.0, 0.25]))
        self.rew_scales["gait"] = learn.get("gaitRewardScale", -0.1) \
            * self.dt_ctl
        self.rew_scales["foot_contact"] = \
            learn.get("footcontactRewardScale", -0.05) * self.dt_ctl
        self.rew_scales["air_time"] = \
            learn.get("feetAirTimeRewardScale", 0.3) * self.dt_ctl

        # noise vec without per-channel obs scaling (A1_terrain.py:173-180)
        nl = learn.get("noiseLevel", 1.25)
        nv = np.zeros(self.num_obs, np.float32)
        nv[0:3] = learn.get("linearVelocityNoise", 0.01) * nl
        nv[3:6] = learn.get("angularVelocityNoise", 0.0001) * nl
        nv[6:9] = learn.get("gravityNoise", 0.00002) * nl
        nv[12:24] = learn.get("dofPositionNoise", 0.0005) * nl
        nv[24:36] = learn.get("dofVelocityNoise", 0.01) * nl
        self.noise_vec = jnp.asarray(nv)

        dof_names = self.dof_names
        # L structure: diagonal leg pairs for gait symmetry (:289-293)
        self.gait_pairs = np.array([
            [dof_names.index("FL_thigh_joint"), dof_names.index("RR_thigh_joint")],
            [dof_names.index("FL_calf_joint"), dof_names.index("RR_calf_joint")],
            [dof_names.index("FR_thigh_joint"), dof_names.index("RL_thigh_joint")],
            [dof_names.index("FR_calf_joint"), dof_names.index("RL_calf_joint")],
        ])
        # H structure (:295-298; FL/RR listed twice in the reference)
        self.hip_idx = np.array([
            dof_names.index("FL_hip_joint"), dof_names.index("RR_hip_joint"),
            dof_names.index("FL_hip_joint"), dof_names.index("RR_hip_joint")])
        self.base_idx = self.model.body_index("trunk")

    def _asset_kwargs(self):
        return dict(fix_base=False, collapse_fixed_joints=False)

    # A1 keeps all fixed links (collapseFixedJoints: False)
    def _load_model(self):
        from ..io.urdf import load_urdf
        return load_urdf(self.asset_path, **self._asset_kwargs())

    # ---------------------------------------------------------------- physics
    def _physics(self, state, actions):
        contacts = build_ground_contacts(self.model)
        # direct torque control (A1_terrain.py:486): clip(scale·a, ±30)
        torques = jnp.clip(self.action_scale * actions,
                           -self.torque_clip, self.torque_clip)

        art = state.art
        if self.push_robots:
            do_push = (state.step_count + 1) % self.push_interval == 0
            push_v = jax.vmap(
                lambda kk: jax.random.uniform(jax.random.fold_in(kk, 77),
                                              (2,), minval=-1.0, maxval=1.0)
            )(state.rng)
            qd = jnp.where(do_push, art.qd.at[:, 0:2].set(push_v), art.qd)
            art = T.ArtState(q=art.q, qd=qd)

        def one(art1, tau12, params):
            nv = self.model.nv
            extra = jnp.zeros(nv, art1.q.dtype).at[6:].set(tau12)
            return physics_step(self.model, self.sim, params, art1,
                                extra_tau=extra, contacts=contacts,
                                height_fn=self.height_fn,
                                n_substeps=self.sim.substeps)

        in_axes = (0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(art, torques, state.params)

    # -------------------------------------------------------------------- obs
    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        base_quat = q[:, 3:7]
        base_lin_vel = mx.quat_rotate_inv(base_quat, qd[:, 0:3])
        base_ang_vel = mx.quat_rotate_inv(base_quat, qd[:, 3:6])
        projected_gravity = mx.quat_rotate_inv(
            base_quat, jnp.broadcast_to(self.gravity_vec,
                                        (self.num_envs, 3)))
        cmd = state.aux["commands"]
        obs = jnp.concatenate([
            base_lin_vel * self.lin_vel_scale,
            base_ang_vel * self.ang_vel_scale,
            projected_gravity * self.proj_grav_scale,
            cmd[:, :3] * self.user_command_scale,
            q[:, 7:] * self.dof_pos_scale,
            qd[:, 6:] * self.dof_vel_scale,
            state.aux["actions"],
        ], axis=-1)
        if self.add_noise:
            nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 33))(state.rng)
            noise = jax.vmap(lambda k: jax.random.uniform(
                k, (self.num_obs,), minval=-1.0, maxval=1.0))(nkeys)
            obs = obs + noise * self.noise_vec
        return obs, {}

    # commands: yaw sampled directly into slot 2 (A1_terrain.py:453)
    def _sample_reset(self, state, keys):
        q, qd, aux = super()._sample_reset(state, keys)
        cmd = aux["commands"]
        # superclass puts the heading sample in slot 3; A1 uses it as yaw
        cmd = cmd.at[:, 2].set(cmd[:, 3])
        aux["commands"] = cmd
        aux["ep_sums"] = jnp.zeros((self.num_envs, len(_REW_TERMS_A1)))
        return q, qd, aux

    def _initial_aux(self):
        aux = super()._initial_aux()
        aux["ep_sums"] = jnp.zeros((self.num_envs, len(_REW_TERMS_A1)))
        return aux

    # ----------------------------------------------------------------- reward
    def _reward_done(self, state, obs, actions, info):
        q, qd = state.art.q, state.art.qd
        aux = state.aux
        base_quat = q[:, 3:7]
        base_lin_vel = mx.quat_rotate_inv(base_quat, qd[:, 0:3])
        base_ang_vel = mx.quat_rotate_inv(base_quat, qd[:, 3:6])
        projected_gravity = mx.quat_rotate_inv(
            base_quat, jnp.broadcast_to(self.gravity_vec,
                                        (self.num_envs, 3)))
        cmd = aux["commands"]
        rs = self.rew_scales
        cf = info.body_contact_force

        lin_vel_error = jnp.sum((cmd[:, :2] - base_lin_vel[:, :2]) ** 2, -1)
        ang_vel_error = (cmd[:, 2] - base_ang_vel[:, 2]) ** 2
        r_lin_xy = jnp.exp(-lin_vel_error / 0.25) * rs["lin_vel_xy"]
        r_ang_z = jnp.exp(-ang_vel_error / 0.25) * rs["ang_vel_z"]
        r_lin_z = base_lin_vel[:, 2] ** 2 * rs["lin_vel_z"]
        r_ang_xy = jnp.sum(base_ang_vel[:, :2] ** 2, -1) * rs["ang_vel_xy"]
        r_orient = jnp.sum(projected_gravity[:, :2] ** 2, -1) * rs["orient"]
        r_height = (q[:, 2] - 0.35) ** 2 * rs["base_height"]  # target 0.35

        torques = jnp.clip(self.action_scale * actions,
                           -self.torque_clip, self.torque_clip)
        r_torque = jnp.sum(torques ** 2, -1) * rs["torques"]
        r_jacc = jnp.sum((aux["last_dof_vel"] - qd[:, 6:]) ** 2, -1) \
            * rs["joint_acc"]
        r_act_rate = jnp.sum((aux["last_actions"] - actions) ** 2, -1) \
            * rs["action_rate"]

        # air time (_get_reward_foot_air_time :386)
        contact = cf[:, self.feet_idx, 2] > 1.0
        air = aux["feet_air_time"]
        first_contact = (air > 0.0) & contact
        air = air + self.dt_ctl
        r_air = jnp.sum((air - 0.5) * first_contact, -1) * rs["air_time"]
        r_air = r_air * (jnp.linalg.norm(cmd[:, :2], axis=-1) > 0.1)
        air = air * (~contact)

        knee_contact = jnp.linalg.norm(cf[:, self.knee_idx], axis=-1) > 1.0
        r_knee = jnp.sum(knee_contact, -1) * rs["collision"]
        # feet NOT in contact count (_get_foot_contact_reward :402)
        r_foot_contact = jnp.sum(~contact, -1).astype(obs.dtype) \
            * rs["foot_contact"]
        # paired-leg gait symmetry (_get_gait_reward :409)
        dof_pos = q[:, 7:]
        r_gait = jnp.sum(jnp.abs(dof_pos[:, self.gait_pairs[:, 0]]
                                 - dof_pos[:, self.gait_pairs[:, 1]]), -1) \
            * rs["gait"]
        r_hip = jnp.sum(jnp.abs(self.default_dof_pos[self.hip_idx]
                                - dof_pos[:, self.hip_idx]), -1) * rs["hip"]

        terms = jnp.stack([r_lin_xy, r_ang_z, r_lin_z, r_ang_xy, r_orient,
                           r_torque, r_jacc, r_height, r_air, r_knee,
                           r_foot_contact, r_act_rate, r_gait, r_hip],
                          axis=-1)
        # NO clip-to-positive, NO termination reward (A1_terrain.py:367)
        total = jnp.sum(terms, -1)

        base_contact = jnp.linalg.norm(cf[:, self.base_idx], axis=-1) > 1.0
        done = base_contact
        if not self.allow_knee_contacts:
            done = done | jnp.any(knee_contact, -1)
        done = done | (state.progress >= self.max_episode_length - 1)

        ep_sums = aux["ep_sums"] + terms
        # done-gated per-term channel — see anymal_terrain._reward_done
        task_info = {"terrain_level_mean":
                     jnp.mean(aux["terrain_levels"].astype(jnp.float32))}
        for i, name in enumerate(_REW_TERMS_A1):
            task_info["final/rew_" + name] = \
                ep_sums[:, i] / self.max_episode_length_s

        aux_up = {"feet_air_time": air, "last_actions": actions,
                  "last_dof_vel": qd[:, 6:], "ep_sums": ep_sums}
        return total, done, task_info, aux_up
