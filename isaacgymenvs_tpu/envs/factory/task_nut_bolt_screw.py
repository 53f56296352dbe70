"""FactoryTaskNutBoltScrew: turn the nut down the bolt thread.

Parity with reference `factory/factory_task_nut_bolt_screw.py` (385 LoC)
and `cfg/task/FactoryTaskNutBoltScrew.yaml`:
  * actions (12,); with `unidirectional_rot` the z-rotation action is
    remapped to [-1, 0] before scaling (`_apply_actions_as_ctrl_targets`
    :240-247); gripper commanded closed; default controller is
    operational-space motion on the [z, yaw] axes only;
  * obs (32,) = [ft_pos, ft_quat, ft_linvel, ft_angvel, nut_com_pos,
    nut_com_quat, nut_com_linvel, nut_com_angvel] zero-padded
    (+ finger forces when `add_obs_finger_force`)
    (`compute_observations` :130-152);
  * reward = -(nut-target + finger-nut keypoint dist) * scale - action
    penalty + success bonus; keypoints are 4 points on the hand/nut
    z-axes of length hand_length+finger_length (`_get_keypoint_dist`
    :288-335);
  * per-env termination: success = nut COM within one thread pitch of
    the fully-screwed height; failure = expired / far / slipped / fallen
    (`_get_curr_successes` :337-350, `_get_curr_failures` :352-385);
  * reset (:184-226): fixed arm posture straddling the nut, nut at the
    bolt-tip engagement with `nut_rot_initial` yaw; no XY noise.

The thread itself is a screw-joint approximation (hinge + slide +
pinched-range tendon), see `env_nut_bolt.FactoryEnvNutBolt
._nutbolt_screw_model` — the nut cannot cross-thread or detach, so
`is_fallen` never fires here (SDF-only failure mode).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ...core import maths as mx
from . import control as ctl
from .env_nut_bolt import FactoryEnvNutBolt


class FactoryTaskNutBoltScrew(FactoryEnvNutBolt):
    num_obs = 32
    num_acts = 12
    nut_free = False
    refresh_kin_on_reset = True

    def __init__(self, cfg=None, num_envs=128):
        super().__init__(cfg, num_envs)
        c = cfg or {}
        rl = c.get("rl", {})
        rnd = c.get("randomize", {})
        self.unidirectional_rot = rl.get("unidirectional_rot", True)
        self.unidirectional_force = rl.get("unidirectional_force", False)
        self.add_obs_finger_force = rl.get("add_obs_finger_force", False)
        self.keypoint_reward_scale = rl.get("keypoint_reward_scale", 1.0)
        self.action_penalty_scale = rl.get("action_penalty_scale", 0.0)
        self.far_error_thresh = rl.get("far_error_thresh", 0.1)
        self.success_bonus = rl.get("success_bonus", 0.0)
        self.arm_initial = jnp.asarray(rnd.get(
            "franka_arm_initial_dof_pos",
            [1.5178e-3, -0.19651, -1.4364e-3, -1.9761, -2.7717e-4,
             1.7796, 0.78556]), jnp.float32)
        # reference: 30 deg aligns the gripper with the HEX nut's flats
        # (FactoryTaskNutBoltScrew.yaml:22).  Our nut is a box (flats
        # every 90 deg), so the aligned angle depends on the finger-close
        # axis at the initial arm posture; None/absent = auto-align.
        self.nut_rot_initial = rnd.get("nut_rot_initial")
        if self.nut_rot_initial is None:
            self.nut_rot_initial = self._aligned_nut_rot_deg()

        info = self.nut_bolt_info
        # nut COM local offset (origin convention) and target COM height
        self.nut_com_local = jnp.array(
            [0.0, 0.0, info["bolt_head_height"] + info["nut_height"] / 2])
        self.target_pos = jnp.array(
            [0.0, 0.0, self.table_height + info["bolt_head_height"]
             + info["nut_height"] / 2])
        self.axis_length = self.asset_info["franka_hand_length"] \
            + self.asset_info["franka_finger_length"]
        self.gripper_width_max = \
            self.asset_info["franka_gripper_width_max"]

    def _aligned_nut_rot_deg(self):
        """Nut yaw (deg) that faces its flats toward the fingerpads at
        the initial arm posture: the finger slide axis' world azimuth
        mod 90 deg (square nut)."""
        import numpy as np
        from ...physics.kinematics import forward_kinematics
        q = jnp.asarray(self.init_q).at[:7].set(self.arm_initial)
        kin = forward_kinematics(self.model, self.model
                                 .default_phys_params(), q,
                                 jnp.zeros(self.model.nv))
        ji = [i for i in range(self.model.njnt)
              if self.model.jnt_names[i] == "franka/panda_finger_joint1"]
        axis_l = jnp.asarray(self.model.jnt_axis[ji[0]])
        axis_w = mx.quat_rotate(kin.body_quat[self.lf_body], axis_l)
        phi = float(jnp.arctan2(axis_w[1], axis_w[0]))
        return float(np.degrees(np.mod(phi, np.pi / 2)))

    # ---------------------------------------------------------------- reset
    def _sample_reset(self, state, keys):
        info = self.nut_bolt_info
        theta0 = self.nut_rot_initial * jnp.pi / 180.0
        grip = info["nut_width_max"] * 0.5 * 1.1

        def one(key):
            q = self.init_q.at[:7].set(self.arm_initial)
            q = q.at[7:9].set(grip)
            q = q.at[self.thread_rot_q].set(theta0)
            return q, jnp.zeros(self.model.nv)

        q, qd = jax.vmap(one)(keys)
        return q, qd, {}

    # -------------------------------------------------------------- physics
    def _physics(self, state, actions):
        if self.unidirectional_rot:
            actions = actions.at[:, 5].set(
                -(actions[:, 5] + 1.0) * 0.5)
        if self.unidirectional_force:
            actions = actions.at[:, 8].set(
                -(actions[:, 8] + 1.0) * 0.5)

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
    def _nut_com_state(self, kin):
        """(pos, quat, linvel, angvel) of the nut COM frame; single env."""
        p = kin.body_pos[self.nut_body]
        quat = kin.body_quat[self.nut_body]
        com = p + mx.quat_rotate(quat, self.nut_com_local)
        v6 = kin.body_vel[self.nut_body]
        linvel = v6[3:] + jnp.cross(v6[:3], com - kin.ref)
        return com, quat, linvel, v6[:3]

    def _observe(self, state, info):
        ft_pos, ft_quat, ft_lv, ft_av = jax.vmap(
            self._fingertip_state)(info.kin)
        com, cq, clv, cav = jax.vmap(self._nut_com_state)(info.kin)
        parts = [ft_pos, ft_quat, ft_lv, ft_av, com, cq, clv, cav]
        if self.add_obs_finger_force:
            lf = info.body_contact_force[:, self.model.body_index(
                "franka/panda_leftfinger")]
            rf = info.body_contact_force[:, self.model.body_index(
                "franka/panda_rightfinger")]
            parts += [lf, rf]
        obs = jnp.concatenate(parts, axis=-1)
        pad = self.num_obs - obs.shape[-1]
        if pad > 0:
            obs = jnp.concatenate(
                [obs, jnp.zeros(obs.shape[:-1] + (pad,), obs.dtype)], -1)
        return obs, {}

    # --------------------------------------------------------------- reward
    def _axis_keypoint_dist(self, p1, q1, off1, p2t, p2_dir):
        """4-keypoint distance between a body z-axis segment and a target
        segment (`_get_keypoint_dist` :288-335); single env.
        Segment 1: p1 -> p1 + R(q1) z * off1; target: p2t -> p2t + p2_dir.
        """
        k1a = p1
        k1b = ctl.translate_along_local_z(p1, q1, off1)
        k2a = p2t
        k2b = p2t + p2_dir
        d = 0.0
        for t in (0.0, 1.0 / 3.0, 2.0 / 3.0, 1.0):
            d = d + jnp.linalg.norm((k2a + (k2b - k2a) * t)
                                    - (k1a + (k1b - k1a) * t))
        return d

    def _reward_done(self, state, obs, actions, info):
        ft = jax.vmap(self._fingertip_state)(info.kin)
        ft_pos, ft_quat = ft[0], ft[1]
        com, cq, _, _ = jax.vmap(self._nut_com_state)(info.kin)
        L = self.axis_length
        zhat = jnp.array([0.0, 0.0, L])

        # nut axis vs target axis
        nut_kd = jax.vmap(
            lambda p, q: self._axis_keypoint_dist(
                p, q, L, self.target_pos, zhat))(com, cq)
        # fingerpad midpoint axis vs nut axis
        fp_off = self.asset_info["franka_finger_length"] \
            - self.asset_info["franka_fingerpad_length"] * 0.5

        def fp_mid(kin):
            hand_q = kin.body_quat[self.hand_body]
            fm = 0.5 * (kin.body_pos[self.lf_body]
                        + kin.body_pos[self.rf_body])
            return ctl.translate_along_local_z(fm, hand_q, fp_off)

        fpm = jax.vmap(fp_mid)(info.kin)
        finger_nut_kd = jax.vmap(
            lambda p, q, ct, cqt: self._axis_keypoint_dist(
                p, q, -L, ct, mx.quat_rotate(cqt, zhat)))(
                fpm, ft_quat, com, cq)

        nut_dist_to_target = jnp.linalg.norm(
            self.target_pos[None] - com, axis=-1)
        nut_dist_to_fingerpads = jnp.linalg.norm(fpm - com, axis=-1)

        success = nut_dist_to_target < self.nut_bolt_info["thread_pitch"]
        expired = state.progress >= self.max_episode_length
        far = nut_dist_to_target > self.far_error_thresh
        slipped = (nut_dist_to_fingerpads
                   > self.asset_info["franka_fingerpad_length"] * 0.5
                   + self.nut_bolt_info["nut_height"] * 0.5) & ~success
        failure = expired | far | slipped

        rew = -(nut_kd + finger_nut_kd) * self.keypoint_reward_scale \
            - jnp.linalg.norm(actions, axis=-1) \
            * self.action_penalty_scale \
            + success.astype(jnp.float32) * self.success_bonus
        done = success | failure
        # done-gated episode-outcome metric (see learn/ppo.py)
        return rew, done, {"final/successes": success.astype(jnp.float32)}
