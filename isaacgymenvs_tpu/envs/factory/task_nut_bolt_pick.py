"""FactoryTaskNutBoltPick: reach the nut, grasp, lift.

Parity with reference `factory/factory_task_nut_bolt_pick.py` (450 LoC)
and `cfg/task/FactoryTaskNutBoltPick.yaml`:
  * actions (12,) = fingertip pos/rot deltas (+ force/torque targets when
    force control is active), gripper held open during the policy
    (`pre_physics_step` :127-139);
  * obs (20,) = [ft_pos, ft_quat, ft_linvel, ft_angvel, nut_grasp_pos,
    nut_grasp_quat] (`compute_observations` :160-173, wxyz here);
  * reward = -keypoint_dist * scale - |a| * action_penalty; on the final
    step the gripper closes (`num_gripper_close_sim_steps`) and lifts
    (`num_gripper_lift_sim_steps`) open-loop, then lift success (nut
    3x nut-height above table) adds `success_bonus` and the `successes`
    metric (`_update_rew_buf` :186-202, `_close_gripper`/`_lift_gripper`
    :336-366) — realised as a scalar `lax.cond` on the shared episode
    clock, so the 50-step tail compiles once and runs only on the final
    step of each (lockstep) episode;
  * reset (`reset_idx` :204-328): fixed initial arm posture, nut/bolt
    XY noise, gripper moved to a randomized pose — kinematic DLS IK
    replaces the reference's 20 dynamically-simulated controller steps
    (velocities are zeroed afterwards in both).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...core import maths as mx
from ...core import types as T
from . import control as ctl
from .env_nut_bolt import FactoryEnvNutBolt


def keypoint_offsets(num_keypoints, dtype=jnp.float32):
    """Uniform keypoints on a unit z-line centered at 0
    (`_get_keypoint_offsets`, factory_task_nut_bolt_pick.py:336-343)."""
    z = jnp.linspace(0.0, 1.0, num_keypoints, dtype=dtype) - 0.5
    return jnp.stack([jnp.zeros_like(z), jnp.zeros_like(z), z], axis=-1)


class FactoryTaskNutBoltPick(FactoryEnvNutBolt):
    num_obs = 20
    num_acts = 12

    def __init__(self, cfg=None, num_envs=128):
        super().__init__(cfg, num_envs)
        c = cfg or {}
        env = c.get("env", {})
        rl = c.get("rl", {})
        rnd = c.get("randomize", {})
        self.close_and_lift = env.get("close_and_lift", True)
        self.num_gripper_close_steps = env.get(
            "num_gripper_close_sim_steps", 25)
        self.num_gripper_lift_steps = env.get(
            "num_gripper_lift_sim_steps", 25)
        self.num_keypoints = rl.get("num_keypoints", 4)
        self.keypoint_scale = rl.get("keypoint_scale", 0.5)
        self.keypoint_reward_scale = rl.get("keypoint_reward_scale", 1.0)
        self.action_penalty_scale = rl.get("action_penalty_scale", 0.0)
        self.success_bonus = rl.get("success_bonus", 0.0)

        self.arm_initial = jnp.asarray(rnd.get(
            "franka_arm_initial_dof_pos",
            [0.3413, -0.8011, -0.067, -1.8299, 0.0266, 1.0185, 1.0927]),
            jnp.float32)
        self.ft_pos_initial = jnp.asarray(rnd.get(
            "fingertip_midpoint_pos_initial", [0.0, -0.2, 0.2]),
            jnp.float32)
        self.ft_pos_noise = jnp.asarray(rnd.get(
            "fingertip_midpoint_pos_noise", [0.2, 0.2, 0.1]), jnp.float32)
        self.ft_rot_initial = jnp.asarray(rnd.get(
            "fingertip_midpoint_rot_initial", [3.1416, 0.0, 3.1416]),
            jnp.float32)
        self.ft_rot_noise = jnp.asarray(rnd.get(
            "fingertip_midpoint_rot_noise", [0.3, 0.3, 1.0]), jnp.float32)
        self.nut_pos_xy_initial = jnp.asarray(rnd.get(
            "nut_pos_xy_initial", [0.0, -0.3]), jnp.float32)
        self.nut_pos_xy_noise = jnp.asarray(rnd.get(
            "nut_pos_xy_initial_noise", [0.1, 0.1]), jnp.float32)
        self.bolt_pos_xy_initial = jnp.asarray(rnd.get(
            "bolt_pos_xy_initial", [0.0, 0.0]), jnp.float32)
        self.bolt_pos_xy_noise = jnp.asarray(rnd.get(
            "bolt_pos_xy_noise", [0.1, 0.1]), jnp.float32)

        self.keypoint_offs = keypoint_offsets(self.num_keypoints) \
            * self.keypoint_scale
        # nut grasp frame (`_acquire_task_tensors` :85-99): COM height,
        # gripper-down orientation (xyzw (0,1,0,0) -> wxyz (0,0,1,0))
        info = self.nut_bolt_info
        self.nut_grasp_pos_local = jnp.array(
            [0.0, 0.0, info["bolt_head_height"] + info["nut_height"] / 2])
        self.nut_grasp_quat_local = jnp.array([0.0, 0.0, 1.0, 0.0])
        self.gripper_width_max = \
            self.asset_info["franka_gripper_width_max"]

    # ---------------------------------------------------------------- reset
    def _sample_reset(self, state, keys):
        th = self.table_height
        info = self.nut_bolt_info

        def one(key):
            ks = jax.random.split(key, 4)
            q = self.init_q
            arm = self.arm_initial
            grip = jnp.full(2, self.gripper_width_max / 2)
            q = q.at[:7].set(arm).at[7:9].set(grip)
            nut_xy = self.nut_pos_xy_initial + self.nut_pos_xy_noise \
                * (2 * jax.random.uniform(ks[0], (2,)) - 1)
            nut_z = th - info["bolt_head_height"]
            q = q.at[self.nut_q:self.nut_q + 3].set(
                jnp.array([nut_xy[0], nut_xy[1], nut_z]))
            q = q.at[self.nut_q + 3:self.nut_q + 7].set(
                jnp.array([1.0, 0, 0, 0]))
            bolt_xy = self.bolt_pos_xy_initial + self.bolt_pos_xy_noise \
                * (2 * jax.random.uniform(ks[1], (2,)) - 1)
            q = q.at[self.bolt_q:self.bolt_q + 3].set(
                jnp.array([bolt_xy[0], bolt_xy[1], th]))
            q = q.at[self.bolt_q + 3:self.bolt_q + 7].set(
                jnp.array([1.0, 0, 0, 0]))
            # gripper to randomized pose (kinematic IK, see docstring)
            tgt_pos = jnp.array([0.0, 0.0, th]) + self.ft_pos_initial \
                + self.ft_pos_noise * (2 * jax.random.uniform(ks[2], (3,))
                                       - 1)
            eul = self.ft_rot_initial + self.ft_rot_noise \
                * (2 * jax.random.uniform(ks[3], (3,)) - 1)
            tgt_quat = mx.quat_from_euler_xyz(eul[0], eul[1], eul[2])
            params = jax.tree_util.tree_map(
                lambda x: x[0] if self._params_batched() else x,
                state.params)
            q = self._ik_to_pose(q, params, tgt_pos, tgt_quat, iters=12)
            return q, jnp.zeros(self.model.nv)

        q, qd = jax.vmap(one)(keys)
        return q, qd, {}

    # -------------------------------------------------------------- physics
    def _rl_gripper_target(self):
        """Gripper DOF target while the policy acts: held open."""
        return self.gripper_width_max / 2

    refresh_kin_on_reset = True

    def _physics(self, state, actions):
        def one(art, act, params):
            from ...physics.kinematics import forward_kinematics
            kin = forward_kinematics(self.model, params, art.q, art.qd)
            ft_pos, ft_quat, _, _ = self._fingertip_state(kin)
            tgt_pos, tgt_quat, wrench = self._targets_from_actions(
                ft_pos, ft_quat, act, do_scale=True)
            return self._sim_one(art, params, tgt_pos, tgt_quat,
                                 self._rl_gripper_target(), wrench)

        in_axes = (0, 0, 0 if self._params_batched() else None)
        out = jax.vmap(one, in_axes=in_axes)(state.art, actions,
                                             state.params)
        if self.close_and_lift:
            is_last = (state.progress[0] + 1) \
                >= self.max_episode_length - 1
            out = self._close_and_lift(out, state.params, is_last)
        return out

    def _close_and_lift(self, out, params, is_last):
        """Open-loop grasp + lift tail (`_close_gripper`/`_lift_gripper`,
        factory_task_nut_bolt_pick.py:345-366).

        Trip counts are DYNAMIC (0 off-boundary) via `lax.fori_loop`, not
        a `lax.cond` over fixed-length scans: inside the epoch rollout
        scan, XLA:TPU executed BOTH cond branches every step, making each
        of the 120 steps pay the ~50-physics-step tail — measured 600 fps
        at 128/256/512 envs alike vs Screw's 38K fps on the same scene
        (round-5; a CPU boundary-step A/B measured the tail at 60x a
        regular step). A while-form loop with a data-dependent bound can
        never be select-converted, so off-boundary steps cost one loop
        test."""
        art, info = out
        in_axes = (0, 0 if self._params_batched() else None)
        n_close = jnp.where(is_last, self.num_gripper_close_steps, 0)
        n_lift = jnp.where(is_last, self.num_gripper_lift_steps, 0)

        def close_one(art, params):
            from ...physics.kinematics import forward_kinematics
            kin = forward_kinematics(self.model, params, art.q, art.qd)
            ft_pos, ft_quat, _, _ = self._fingertip_state(kin)

            def body(_, a):
                return self._sim_one(a, params, ft_pos, ft_quat, 0.0)[0]
            return jax.lax.fori_loop(0, n_close, body, art)

        def lift_one(art, params):
            # FIXED lift target = start pose + 0.3 z, held for the whole
            # tail. The reference's `_lift_gripper` loop reapplies its
            # delta against a STALE fingertip pose (tensors are not
            # refreshed between `gym.simulate` calls,
            # factory_task_nut_bolt_pick.py:366-376), so its target is
            # likewise fixed; recomputing current+0.3 each step makes a
            # runaway integrator that flails the arm through 7.5 m of
            # commanded travel.
            from ...physics.kinematics import forward_kinematics
            kin = forward_kinematics(self.model, params, art.q, art.qd)
            ft_pos, ft_quat, _, _ = self._fingertip_state(kin)
            tgt = ft_pos + jnp.array([0.0, 0.0, 0.3])

            def body(_, a):
                return self._sim_one(a, params, tgt, ft_quat, 0.0)[0]
            return jax.lax.fori_loop(0, n_lift, body, art)

        art = jax.vmap(close_one, in_axes=in_axes)(art, params)
        art = jax.vmap(lift_one, in_axes=in_axes)(art, params)
        return art, info

    # ------------------------------------------------------------------ obs
    def _grasp_frame(self, q):
        nut_pos, nut_quat = self._nut_pose(q)
        gp = nut_pos + mx.quat_rotate(nut_quat, self.nut_grasp_pos_local)
        gq = mx.quat_mul(nut_quat, self.nut_grasp_quat_local)
        return gp, gq

    def _observe(self, state, info):
        ft_pos, ft_quat, ft_lv, ft_av = jax.vmap(
            self._fingertip_state)(info.kin)
        gp, gq = jax.vmap(self._grasp_frame)(state.art.q)
        return jnp.concatenate([ft_pos, ft_quat, ft_lv, ft_av, gp, gq],
                               axis=-1), {}

    # --------------------------------------------------------------- reward
    def _keypoint_dist(self, q, kin_ft):
        """Sum of keypoint distances between the gripper frame and the
        nut grasp frame (`_get_keypoint_dist` :345-351); single env."""
        ft_pos, ft_quat = kin_ft
        gp, gq = self._grasp_frame(q)
        kp_g = ft_pos[None] + jax.vmap(mx.quat_rotate,
                                       (None, 0))(ft_quat,
                                                  self.keypoint_offs)
        kp_n = gp[None] + jax.vmap(mx.quat_rotate,
                                   (None, 0))(gq, self.keypoint_offs)
        return jnp.sum(jnp.linalg.norm(kp_n - kp_g, axis=-1))

    def _lift_success(self, q):
        """Nut lifted 3x its height above the table (`_check_lift_success`
        :368-377); single env."""
        nut_z = q[self.nut_q + 2] + self.nut_grasp_pos_local[2]
        thresh = self.table_height \
            + self.nut_bolt_info["nut_height"] * 3.0
        return (nut_z > thresh).astype(jnp.float32)

    def _reward_done(self, state, obs, actions, info):
        ft_pos, ft_quat, _, _ = jax.vmap(self._fingertip_state)(info.kin)
        kdist = jax.vmap(self._keypoint_dist)(state.art.q,
                                              (ft_pos, ft_quat))
        action_penalty = jnp.linalg.norm(actions, axis=-1) \
            * self.action_penalty_scale
        rew = -kdist * self.keypoint_reward_scale \
            - action_penalty * self.action_penalty_scale

        is_last = state.progress >= self.max_episode_length - 1
        success = jax.vmap(self._lift_success)(state.art.q)
        rew = rew + jnp.where(is_last, success * self.success_bonus, 0.0)
        done = is_last
        # "final/" = done-gated episode-outcome metric (see learn/ppo.py):
        # the learner averages it over episodes, not rollout steps
        return rew, done, {"final/successes": success}
