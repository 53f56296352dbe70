"""FactoryTaskNutBoltPlace: carry the grasped nut to the bolt tip.

Parity with reference `factory/factory_task_nut_bolt_place.py` (462 LoC)
and `cfg/task/FactoryTaskNutBoltPlace.yaml`:
  * actions (12,), gripper commanded closed during the policy
    (`pre_physics_step` :122-133);
  * obs (27,) = [ft_pos, ft_quat, ft_linvel, ft_angvel, nut_pos,
    nut_quat, bolt_pos, bolt_quat] (+ bolt_tip_pos_local when
    `add_obs_bolt_tip_pos`) (`compute_observations` :146-163);
  * keypoint reward between the NUT BASE frame and the BOLT TIP frame
    (`_acquire_task_tensors` :84-105, `_refresh_task_tensors` :107-120);
    success = summed keypoint distance < `close_error_thresh` on the
    final step (`_check_nut_close_to_bolt` :389-399);
  * reset (`reset_idx` :197-290): nut is placed INSIDE the gripper
    (base plane at the fingertip midpoint, relative yaw pi/2 + noise),
    bolt XY randomized on the table, gripper moved to a random pose.
    The reference closes the gripper over 50 gravity-disabled sim steps
    and then drags everything through a 40-step controller move; here
    the randomized gripper pose is solved kinematically (DLS IK) and
    the nut is placed in the resulting fingertip frame with the fingers
    set just inside the across-flats width, so the grip establishes on
    the first policy step (the gripper is commanded closed throughout).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import maths as mx
from . import control as ctl
from .env_nut_bolt import FactoryEnvNutBolt
from .task_nut_bolt_pick import keypoint_offsets


class FactoryTaskNutBoltPlace(FactoryEnvNutBolt):
    num_acts = 12
    refresh_kin_on_reset = True

    def __init__(self, cfg=None, num_envs=128):
        super().__init__(cfg, num_envs)
        c = cfg or {}
        rl = c.get("rl", {})
        rnd = c.get("randomize", {})
        self.add_obs_bolt_tip_pos = rl.get("add_obs_bolt_tip_pos", False)
        self.num_obs = 30 if self.add_obs_bolt_tip_pos else 27
        self.num_keypoints = rl.get("num_keypoints", 4)
        self.keypoint_scale = rl.get("keypoint_scale", 0.5)
        self.keypoint_reward_scale = rl.get("keypoint_reward_scale", 1.0)
        self.action_penalty_scale = rl.get("action_penalty_scale", 0.0)
        self.success_bonus = rl.get("success_bonus", 0.0)
        self.close_error_thresh = rl.get("close_error_thresh", 0.1)

        self.arm_initial = jnp.asarray(rnd.get(
            "franka_arm_initial_dof_pos",
            [0.3413, -0.8011, -0.067, -1.8299, 0.0266, 1.0185, 1.0927]),
            jnp.float32)
        self.ft_pos_initial = jnp.asarray(rnd.get(
            "fingertip_midpoint_pos_initial", [0.0, 0.0, 0.2]),
            jnp.float32)
        self.ft_pos_noise = jnp.asarray(rnd.get(
            "fingertip_midpoint_pos_noise", [0.2, 0.2, 0.1]), jnp.float32)
        self.ft_rot_initial = jnp.asarray(rnd.get(
            "fingertip_midpoint_rot_initial", [3.1416, 0.0, 3.1416]),
            jnp.float32)
        self.ft_rot_noise = jnp.asarray(rnd.get(
            "fingertip_midpoint_rot_noise", [0.3, 0.3, 1.0]), jnp.float32)
        self.nut_noise_pos_in_gripper = jnp.asarray(rnd.get(
            "nut_noise_pos_in_gripper", [0.0, 0.0, 0.01]), jnp.float32)
        self.nut_noise_rot_in_gripper = rnd.get(
            "nut_noise_rot_in_gripper", 0.0)
        self.bolt_pos_xy_initial = jnp.asarray(rnd.get(
            "bolt_pos_xy_initial", [0.0, 0.0]), jnp.float32)
        self.bolt_pos_xy_noise = jnp.asarray(rnd.get(
            "bolt_pos_xy_noise", [0.1, 0.1]), jnp.float32)

        self.keypoint_offs = keypoint_offsets(self.num_keypoints) \
            * self.keypoint_scale
        info = self.nut_bolt_info
        # nut base plane / bolt tip local frames (:84-105)
        self.nut_base_pos_local = jnp.array(
            [0.0, 0.0, info["bolt_head_height"]])
        self.bolt_tip_pos_local = jnp.array(
            [0.0, 0.0, info["bolt_head_height"]
             + info["bolt_shank_length"]])

    # ---------------------------------------------------------------- reset
    def _sample_reset(self, state, keys):
        th = self.table_height
        info = self.nut_bolt_info
        grip_open = info["nut_width_max"] * 0.5 * 1.1
        grip_hold = info["nut_width_min"] * 0.5 * 0.98

        def one(key):
            ks = jax.random.split(key, 5)
            q = self.init_q.at[:7].set(self.arm_initial)
            q = q.at[7:9].set(grip_open)
            # bolt on the table with XY noise
            bolt_xy = self.bolt_pos_xy_initial + self.bolt_pos_xy_noise \
                * (2 * jax.random.uniform(ks[0], (2,)) - 1)
            q = q.at[self.bolt_q:self.bolt_q + 3].set(
                jnp.array([bolt_xy[0], bolt_xy[1], th]))
            q = q.at[self.bolt_q + 3:self.bolt_q + 7].set(
                jnp.array([1.0, 0, 0, 0]))
            # gripper to a random pose (kinematic IK)
            tgt_pos = jnp.array([0.0, 0.0, th]) + self.ft_pos_initial \
                + self.ft_pos_noise * (2 * jax.random.uniform(ks[1], (3,))
                                       - 1)
            eul = self.ft_rot_initial + self.ft_rot_noise \
                * (2 * jax.random.uniform(ks[2], (3,)) - 1)
            tgt_quat = mx.quat_from_euler_xyz(eul[0], eul[1], eul[2])
            params = jax.tree_util.tree_map(
                lambda x: x[0] if self._params_batched() else x,
                state.params)
            q = self._ik_to_pose(q, params, tgt_pos, tgt_quat, iters=12)
            q = q.at[7:9].set(grip_hold)
            # nut into the achieved fingertip frame (:245-265)
            from ...physics.kinematics import forward_kinematics
            kin = forward_kinematics(self.model, params, q,
                                     jnp.zeros(self.model.nv))
            ft_pos, ft_quat, _, _ = self._fingertip_state(kin)
            pos_noise = self.nut_noise_pos_in_gripper \
                * (2 * jax.random.uniform(ks[3], (3,)) - 1)
            nut_pos = ft_pos + pos_noise \
                - jnp.array([0.0, 0.0, info["bolt_head_height"]])
            yaw = mx.calc_heading(ft_quat) - jnp.pi / 2 \
                + self.nut_noise_rot_in_gripper \
                * (2 * jax.random.uniform(ks[4]) - 1)
            nut_quat = mx.quat_from_axis_angle(
                jnp.array([0.0, 0.0, 1.0]), yaw)
            q = q.at[self.nut_q:self.nut_q + 3].set(nut_pos)
            q = q.at[self.nut_q + 3:self.nut_q + 7].set(nut_quat)
            return q, jnp.zeros(self.model.nv)

        q, qd = jax.vmap(one)(keys)
        return q, qd, {}

    # -------------------------------------------------------------- physics
    def _physics(self, state, actions):
        def one(art, act, params):
            from ...physics.kinematics import forward_kinematics
            kin = forward_kinematics(self.model, params, art.q, art.qd)
            ft_pos, ft_quat, _, _ = self._fingertip_state(kin)
            tgt_pos, tgt_quat, wrench = self._targets_from_actions(
                ft_pos, ft_quat, act, do_scale=True)
            return self._sim_one(art, params, tgt_pos, tgt_quat, 0.0,
                                 wrench)

        in_axes = (0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(state.art, actions,
                                              state.params)

    # ------------------------------------------------------------------ obs
    def _observe(self, state, info):
        ft_pos, ft_quat, ft_lv, ft_av = jax.vmap(
            self._fingertip_state)(info.kin)
        nut_pos, nut_quat = jax.vmap(self._nut_pose)(state.art.q)
        bolt_pos, bolt_quat = jax.vmap(self._bolt_pose)(state.art.q)
        parts = [ft_pos, ft_quat, ft_lv, ft_av, nut_pos, nut_quat,
                 bolt_pos, bolt_quat]
        if self.add_obs_bolt_tip_pos:
            parts.append(jnp.broadcast_to(self.bolt_tip_pos_local,
                                          nut_pos.shape))
        return jnp.concatenate(parts, axis=-1), {}

    # --------------------------------------------------------------- reward
    def _keypoint_dist(self, q):
        """Summed nut-base <-> bolt-tip keypoint distance; single env."""
        nut_pos, nut_quat = self._nut_pose(q)
        bolt_pos, bolt_quat = self._bolt_pose(q)
        offs_n = self.keypoint_offs + self.nut_base_pos_local
        offs_b = self.keypoint_offs + self.bolt_tip_pos_local
        kp_n = nut_pos[None] + jax.vmap(mx.quat_rotate,
                                        (None, 0))(nut_quat, offs_n)
        kp_b = bolt_pos[None] + jax.vmap(mx.quat_rotate,
                                         (None, 0))(bolt_quat, offs_b)
        return jnp.sum(jnp.linalg.norm(kp_b - kp_n, axis=-1))

    def _reward_done(self, state, obs, actions, info):
        kdist = jax.vmap(self._keypoint_dist)(state.art.q)
        action_penalty = jnp.linalg.norm(actions, axis=-1) \
            * self.action_penalty_scale
        rew = -kdist * self.keypoint_reward_scale \
            - action_penalty * self.action_penalty_scale
        is_last = state.progress >= self.max_episode_length - 1
        success = (kdist < self.close_error_thresh).astype(jnp.float32)
        rew = rew + jnp.where(is_last, success * self.success_bonus, 0.0)
        # done-gated episode-outcome metric (see learn/ppo.py)
        return rew, is_last, {"final/successes": success}
