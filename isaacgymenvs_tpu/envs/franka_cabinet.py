"""FrankaCabinet: open the top drawer of a sektion cabinet.

Parity with reference `tasks/franka_cabinet.py` (566 LoC):
  * Franka (fixed base at (1,0,0) rotated 180° about z, `:208-210`) +
    4-DoF cabinet at (0,0,0.4) (`:212-213`), mesh collisions approximated
    by bounding boxes;
  * PD position drives: arm kp 400 / kd 80, fingers kp 1e6 / kd 100 with
    effort 200 (`:162-196`), cabinet joint damping 10 (`:199-201`);
  * velocity-integrated targets `targets += speed_scale·dt·a·action_scale`
    clamped to limits, gripper speed scale 0.1 (`pre_physics_step`
    `:421-428`);
  * 23-D obs `[dof_pos_scaled(9), dof_vel·scale(9), to_target(3),
    drawer_pos(1), drawer_vel(1)]` (`compute_observations` `:396-418`);
  * grasp-frame reward: squared-inverse distance, alignment dots, around-
    handle and finger-distance bonuses, open reward + staged bonuses,
    penalty when the gripper reaches behind the handle
    (`compute_franka_reward` `:488-566`).
`numProps` 8cm clutter boxes gridded around the drawer (:261-286).
Config `cfg/task/FrankaCabinet.yaml`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..core.modeling import add_actuators, compose_models, hinge_joint_names
from ..io.urdf import load_urdf
from ..physics.collide import build_ground_contacts, build_pair_contacts
from ..physics.step import physics_step
from .base import VecTask
from ..utils.assets import asset_path

_FRANKA = asset_path("urdf/franka_description/robots/franka_panda.urdf")
_CABINET = asset_path("urdf/sektion_cabinet_model/urdf/sektion_cabinet_2.urdf")

_DEFAULT_DOF = np.array([1.157, -1.066, -0.155, -2.239, -1.841, 1.003,
                         0.469, 0.035, 0.035], np.float32)


class FrankaCabinet(VecTask):
    num_obs = 23
    num_acts = 9

    def __init__(self, cfg=None, num_envs=4096):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.max_episode_length = env.get("episodeLength", 500)
        self.action_scale = env.get("actionScale", 7.5)
        self.dof_vel_scale = env.get("dofVelocityScale", 0.1)
        self.dist_reward_scale = env.get("distRewardScale", 2.0)
        self.rot_reward_scale = env.get("rotRewardScale", 0.5)
        self.around_handle_reward_scale = env.get("aroundHandleRewardScale",
                                                  10.0)
        self.open_reward_scale = env.get("openRewardScale", 7.5)
        self.finger_dist_reward_scale = env.get("fingerDistRewardScale",
                                                100.0)
        self.action_penalty_scale = env.get("actionPenaltyScale", 0.01)
        self.start_position_noise = env.get("startPositionNoise", 0.0)
        self.clip_obs = env.get("clipObservations", 5.0)
        self.clip_actions = env.get("clipActions", 1.0)
        self.distX_offset = 0.04

        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 60.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        self.dt = self.sim.dt

        franka = load_urdf(_FRANKA, fix_base=True)
        franka = add_actuators(
            franka, hinge_joint_names(franka), trntype=T.ACT_POSITION)
        # per-dof gains (franka_cabinet.py:162-196)
        kp = np.array([400.0] * 7 + [1.0e6] * 2, np.float32)
        kd = np.array([80.0] * 7 + [100.0] * 2, np.float32)
        fr = np.array([[-87, 87]] * 4 + [[-12, 12]] * 3 + [[-200, 200]] * 2,
                      np.float32)
        franka = dataclasses.replace(franka, act_kp=kp, act_kd=kd,
                                     act_forcerange=fr)
        cabinet = load_urdf(_CABINET, fix_base=True)
        # cabinet dof damping 10 (:199-201)
        cabinet = dataclasses.replace(
            cabinet, dof_damping=np.full(cabinet.nv, 10.0, np.float32))

        actors = [
            ("franka", franka, [1.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]),
            ("cabinet", cabinet, [0.0, 0.0, 0.4]),
        ]
        # prop clutter: numProps 8cm boxes (density 400) gridded around
        # the drawer pose, reset to defaults with the env
        # (franka_cabinet.py:67-71,204-206,261-286,401-407)
        self.num_props = env.get("numProps", 16)
        if self.num_props > 0:
            from ..physics.kinematics import forward_kinematics
            from .factory.base import box_model_xml
            from ..io.mjcf import load_mjcf
            scene0 = compose_models(actors)
            kin0 = forward_kinematics(
                scene0, scene0.default_phys_params(),
                jnp.asarray(scene0.init_qpos), jnp.zeros(scene0.nv))
            dp = np.asarray(
                kin0.body_pos[scene0.body_index("cabinet/drawer_top")])
            spacing, size = 0.09, 0.08
            ppr = int(np.ceil(np.sqrt(self.num_props)))
            xmin = yzmin = -0.5 * spacing * (ppr - 1)
            self._prop_grid = []
            count = 0
            for j in range(ppr):
                for k in range(ppr):
                    if count >= self.num_props:
                        break
                    pos = [dp[0] + xmin + k * spacing,
                           dp[1] + yzmin + j * spacing, dp[2]]
                    prop = load_mjcf(box_model_xml(
                        f"prop{count}", (size,) * 3, density=400.0))
                    actors.append((f"prop{count}", prop, pos,
                                   [1.0, 0, 0, 0]))
                    self._prop_grid.append((j, k))
                    count += 1
        scene = compose_models(actors)
        sl = scene.actor_slices
        self.model = scene
        self.nf = sl["franka"]["v"][1]          # 9 franka dofs first
        self.cab_v = sl["cabinet"]["v"][0]
        names_cab = [n for n in scene.jnt_names if n.startswith("cabinet/")]
        self.drawer_dof = self.cab_v + names_cab.index(
            "cabinet/drawer_top_joint")

        lo, hi = [], []
        for ji in range(scene.njnt):
            if scene.jnt_type[ji] in (T.HINGE, T.SLIDE):
                lo.append(scene.jnt_range[ji][0])
                hi.append(scene.jnt_range[ji][1])
        self.dof_lower = jnp.asarray(np.array(lo, np.float32))
        self.dof_upper = jnp.asarray(np.array(hi, np.float32))
        self.speed_scales = jnp.asarray(
            np.array([1.0] * 7 + [0.1] * 2, np.float32))

        self.hand_body = scene.body_index("franka/panda_link7")
        self.lfinger = scene.body_index("franka/panda_leftfinger")
        self.rfinger = scene.body_index("franka/panda_rightfinger")
        self.drawer_body = scene.body_index("cabinet/drawer_top")
        self.handle_body = scene.body_index("cabinet/drawer_handle_top")

        # grasp frames from default-pose FK (franka_cabinet.py:302-336)
        init_q = np.array(scene.init_qpos)
        init_q[:9] = _DEFAULT_DOF
        self.init_q = jnp.asarray(init_q, jnp.float32)
        from ..physics.kinematics import forward_kinematics
        params = scene.default_phys_params()
        kin0 = forward_kinematics(scene, params, self.init_q,
                                  jnp.zeros(scene.nv))
        hp = np.asarray(kin0.body_pos[self.hand_body])
        hq = np.asarray(kin0.body_quat[self.hand_body])
        lp = np.asarray(kin0.body_pos[self.lfinger])
        rp = np.asarray(kin0.body_pos[self.rfinger])
        lq = np.asarray(kin0.body_quat[self.lfinger])
        finger_p = 0.5 * (lp + rp)
        # hand-local grasp frame + 0.04 along local y (grasp_pose_axis=1)
        inv_p, inv_q = mx.transform_inv(jnp.asarray(hp), jnp.asarray(hq))
        gp = np.asarray(mx.transform_apply(inv_p, inv_q,
                                           jnp.asarray(finger_p)))
        gq = np.asarray(mx.quat_mul(inv_q, jnp.asarray(lq)))
        gp = gp + np.array([0.0, 0.04, 0.0])
        self.local_grasp_pos = jnp.asarray(gp, jnp.float32)
        self.local_grasp_rot = jnp.asarray(gq / np.linalg.norm(gq),
                                           jnp.float32)
        self.drawer_local_grasp_pos = jnp.array([0.3, 0.01, 0.0])
        self.drawer_local_grasp_rot = jnp.array([1.0, 0.0, 0.0, 0.0])
        self.gripper_forward = jnp.array([0.0, 0.0, 1.0])
        self.gripper_up = jnp.array([0.0, 1.0, 0.0])
        self.drawer_inward = jnp.array([-1.0, 0.0, 0.0])
        self.drawer_up = jnp.array([0.0, 0.0, 1.0])

        bp = [(f, d) for f in ("franka/panda_leftfinger",
                               "franka/panda_rightfinger",
                               "franka/panda_hand")
              for d in ("cabinet/drawer_handle_top", "cabinet/drawer_top")]
        if self.num_props > 0:
            # props rest on the drawer; grid-NEIGHBOR prop pairs bound the
            # candidate count (full pairwise would be 120 box-box pairs)
            grid = {jk: i for i, jk in enumerate(self._prop_grid)}
            for i, (j, k) in enumerate(self._prop_grid):
                bp.append((f"prop{i}/prop{i}", "cabinet/drawer_top"))
                for nb in ((j, k + 1), (j + 1, k)):
                    if nb in grid:
                        m = grid[nb]
                        bp.append((f"prop{i}/prop{i}",
                                   f"prop{m}/prop{m}"))
        self.pair_contacts = build_pair_contacts(scene, body_pairs=bp)

    # ------------------------------------------------------------------- aux
    def _initial_aux(self):
        n = self.num_envs
        return {"dof_targets": jnp.tile(jnp.asarray(_DEFAULT_DOF), (n, 1))}

    def _sample_reset(self, state, keys):
        n = self.num_envs

        def one(key):
            dq = 0.25 * (jax.random.uniform(key, (9,)) - 0.5)
            pos = jnp.clip(jnp.asarray(_DEFAULT_DOF) + dq,
                           self.dof_lower[:9], self.dof_upper[:9])
            q = self.init_q.at[:9].set(pos)
            return q, jnp.zeros(self.model.nv), pos

        q, qd, pos = jax.vmap(one)(keys)
        return q, qd, {"dof_targets": pos}

    # --------------------------------------------------------------- physics
    def _physics(self, state, actions):
        contacts = build_ground_contacts(self.model)
        tgt = state.aux["dof_targets"] \
            + self.speed_scales * self.dt * actions * self.action_scale
        tgt = jnp.clip(tgt, self.dof_lower[:9], self.dof_upper[:9])
        state.aux["dof_targets"] = tgt

        def one(art, ctrl, params):
            return physics_step(self.model, self.sim, params, art, ctrl=ctrl,
                                contacts=contacts,
                                n_substeps=self.sim.substeps,
                                pair_contacts=self.pair_contacts)

        in_axes = (0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(state.art, tgt,
                                                   state.params)

    # ------------------------------------------------------------------- obs
    def _grasp_frames(self, info):
        kin = info.kin
        hq = kin.body_quat[:, self.hand_body]
        hp = kin.body_pos[:, self.hand_body]
        gq = mx.quat_mul(hq, jnp.broadcast_to(self.local_grasp_rot,
                                              hq.shape))
        gp = hp + mx.quat_rotate(hq, jnp.broadcast_to(self.local_grasp_pos,
                                                      hp.shape))
        dq = kin.body_quat[:, self.drawer_body]
        dp = kin.body_pos[:, self.drawer_body]
        dgq = mx.quat_mul(dq, jnp.broadcast_to(self.drawer_local_grasp_rot,
                                               dq.shape))
        dgp = dp + mx.quat_rotate(dq, jnp.broadcast_to(
            self.drawer_local_grasp_pos, dp.shape))
        return gp, gq, dgp, dgq

    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        gp, gq, dgp, dgq = self._grasp_frames(info)
        dof_pos_scaled = 2.0 * (q[:, :9] - self.dof_lower[:9]) \
            / (self.dof_upper[:9] - self.dof_lower[:9]) - 1.0
        to_target = dgp - gp
        # fixed-base scene: q index == dof index
        drawer_pos = q[:, self.drawer_dof][:, None]
        drawer_vel = qd[:, self.drawer_dof][:, None]
        obs = jnp.concatenate([
            dof_pos_scaled, qd[:, :9] * self.dof_vel_scale, to_target,
            drawer_pos, drawer_vel,
        ], axis=-1)
        return obs, {}

    # ---------------------------------------------------------------- reward
    def _reward_done(self, state, obs, actions, info):
        q = state.art.q
        kin = info.kin
        gp, gq, dgp, dgq = self._grasp_frames(info)
        lf = kin.body_pos[:, self.lfinger]
        rf = kin.body_pos[:, self.rfinger]

        d = jnp.linalg.norm(gp - dgp, axis=-1)
        dist_reward = (1.0 / (1.0 + d ** 2)) ** 2
        dist_reward = jnp.where(d <= 0.02, dist_reward * 2, dist_reward)

        ax1 = mx.quat_rotate(gq, jnp.broadcast_to(self.gripper_forward,
                                                  gp.shape))
        ax2 = mx.quat_rotate(dgq, jnp.broadcast_to(self.drawer_inward,
                                                   gp.shape))
        ax3 = mx.quat_rotate(gq, jnp.broadcast_to(self.gripper_up, gp.shape))
        ax4 = mx.quat_rotate(dgq, jnp.broadcast_to(self.drawer_up, gp.shape))
        dot1 = jnp.sum(ax1 * ax2, -1)
        dot2 = jnp.sum(ax3 * ax4, -1)
        rot_reward = 0.5 * (jnp.sign(dot1) * dot1 ** 2
                            + jnp.sign(dot2) * dot2 ** 2)

        around = jnp.where((lf[:, 2] > dgp[:, 2]) & (rf[:, 2] < dgp[:, 2]),
                           0.5, 0.0)
        lfd = jnp.abs(lf[:, 2] - dgp[:, 2])
        rfd = jnp.abs(rf[:, 2] - dgp[:, 2])
        finger_dist = jnp.where(
            (lf[:, 2] > dgp[:, 2]) & (rf[:, 2] < dgp[:, 2]),
            (0.04 - lfd) + (0.04 - rfd), 0.0)

        action_penalty = jnp.sum(actions ** 2, -1)
        drawer_pos = q[:, self.drawer_dof]
        open_reward = drawer_pos * around + drawer_pos

        rewards = (self.dist_reward_scale * dist_reward
                   + self.rot_reward_scale * rot_reward
                   + self.around_handle_reward_scale * around
                   + self.open_reward_scale * open_reward
                   + self.finger_dist_reward_scale * finger_dist
                   - self.action_penalty_scale * action_penalty)
        rewards = jnp.where(drawer_pos > 0.01, rewards + 0.5, rewards)
        rewards = jnp.where(drawer_pos > 0.2, rewards + around, rewards)
        rewards = jnp.where(drawer_pos > 0.39, rewards + 2.0 * around,
                            rewards)
        rewards = jnp.where(lf[:, 0] < dgp[:, 0] - self.distX_offset, -1.0,
                            rewards)
        rewards = jnp.where(rf[:, 0] < dgp[:, 0] - self.distX_offset, -1.0,
                            rewards)

        done = (drawer_pos > 0.39) \
            | (state.progress >= self.max_episode_length - 1)
        return rewards, done, {"drawer_pos_mean": jnp.mean(drawer_pos)}
