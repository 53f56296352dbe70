"""ShadowHand: in-hand object reorientation to goal orientations.

Parity with reference `tasks/shadow_hand.py` (812 LoC):
  * 24-DoF hand (MJCF open_ai_assets incl. distal-coupling tendons with
    range limits, `:254-266`) + free object (block), goal pose tracked
    logically (the reference's goal actor is collision-free visual,
    `:302-303`);
  * dual reset buffers: full env reset vs goal-only reset on success
    (`reset_target_pose`/`reset_idx` `:586-668`, `pre_physics_step`
    `:669-683`);
  * absolute position-target control `scale(a, lo, hi)` with EMA
    `act_moving_average`, or relative `prev + speed·dt·a` (`:685-697`);
  * random object force perturbations with per-env log-uniform
    probability and exponential decay (`:699-709`);
  * obs types openai/42, full_no_vel/77, full/157, full_state/211 and
    asymmetric states 211 (`compute_*_observations` `:473-584`);
  * reward: dist + 1/(|rot_dist|+eps) + action penalty, reach-goal bonus,
    fall penalty, consecutive-successes metric (`compute_hand_reward`
    `:746-801`).
Config `cfg/task/ShadowHand.yaml`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..core.modeling import compose_models
from ..io.mjcf import load_mjcf
from ..io.urdf import load_urdf
from ..physics.collide import build_ground_contacts, build_pair_contacts
from ..physics.step import physics_step
from .base import VecTask
from ..utils.assets import asset_path

_HAND_ASSET = asset_path("mjcf/open_ai_assets/hand/shadow_hand.xml")
_BLOCK_ASSET = asset_path("urdf/objects/cube_multicolor.urdf")

_FINGERTIPS = ("robot0:ffdistal", "robot0:mfdistal", "robot0:rfdistal",
               "robot0:lfdistal", "robot0:thdistal")

_NUM_OBS = {"openai": 42, "full_no_vel": 77, "full": 157, "full_state": 211}


def _randomize_rotation(r0, r1):
    """quat = rot(r0·π, x) ⊗ rot(r1·π, y) (shadow_hand.py:804-807)."""
    qx = mx.quat_from_axis_angle(jnp.array([1.0, 0, 0]), r0 * jnp.pi)
    qy = mx.quat_from_axis_angle(jnp.array([0.0, 1, 0]), r1 * jnp.pi)
    return mx.quat_mul(qx, qy)


class ShadowHand(VecTask):
    num_acts = 20

    hand_asset = _HAND_ASSET
    joint_prefix = "robot0:"
    hand_start_z = 0.5
    object_offset = (0.0, -0.39, 0.10)   # dy, dz rel. hand (:312-315)
    obs_dims = _NUM_OBS
    states_dim = 211

    def __init__(self, cfg=None, num_envs=16384):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.obs_type = env.get("observationType", "full_state")
        self.num_obs = self.obs_dims[self.obs_type]
        # block / egg / pen (reference shadow_hand.py:86-94); pen doubles
        # the success tolerance (`ignore_z_rot`, :757-758)
        self.object_type = env.get("objectType", "block")
        assert self.object_type in ("block", "egg", "pen")
        self.ignore_z = self.object_type == "pen"
        self.asymmetric_obs = env.get("asymmetric_observations", False)
        self.num_states = self.states_dim if self.asymmetric_obs else 0
        self.max_episode_length = env.get("episodeLength", 600)
        # OpenAI variants: resetTime [s] overrides episodeLength
        # (reference shadow_hand.py reset_time handling,
        # cfg/task/ShadowHandOpenAI_FF.yaml:11-12)
        reset_time = env.get("resetTime", -1)
        if reset_time > 0:
            dt = (cfg or {}).get("sim", {}).get("dt", 1.0 / 60.0)
            self.max_episode_length = int(round(
                reset_time / (env.get("controlFrequencyInv", 1) * dt)))
        self.dist_reward_scale = env.get("distRewardScale", -10.0)
        self.rot_reward_scale = env.get("rotRewardScale", 1.0)
        self.rot_eps = env.get("rotEps", 0.1)
        self.action_penalty_scale = env.get("actionPenaltyScale", -0.0002)
        self.success_tolerance = env.get("successTolerance", 0.1)
        if env.get("objectType", "block") == "pen":
            self.success_tolerance *= 2.0  # ignore_z_rot (:757-758)
        self.reach_goal_bonus = env.get("reachGoalBonus", 250.0)
        self.fall_dist = env.get("fallDistance", 0.24)
        self.fall_penalty = env.get("fallPenalty", 0.0)
        self.max_consecutive_successes = env.get("maxConsecutiveSuccesses", 0)
        self.av_factor = env.get("averFactor", 0.1)
        self.reset_position_noise = env.get("resetPositionNoise", 0.01)
        self.reset_dof_pos_noise = env.get("resetDofPosRandomInterval", 0.2)
        self.reset_dof_vel_noise = env.get("resetDofVelRandomInterval", 0.0)
        self.use_relative_control = env.get("useRelativeControl", False)
        self.dof_speed_scale = env.get("dofSpeedScale", 20.0)
        self.act_moving_average = env.get("actionsMovingAverage", 1.0)
        self.force_scale = env.get("forceScale", 0.0)
        self.force_prob_range = tuple(env.get("forceProbRange",
                                              (0.001, 0.1)))
        self.force_decay = env.get("forceDecay", 0.99)
        self.force_decay_interval = env.get("forceDecayInterval", 0.08)
        self.vel_obs_scale = 0.2
        self.ft_obs_scale = 10.0
        self.control_freq_inv = env.get("controlFrequencyInv", 1)
        self.clip_obs = env.get("clipObservations", 5.0)
        self.clip_actions = env.get("clipActions", 1.0)

        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 60.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        self.dt = self.sim.dt

        hand, hand_quat = self._load_hand()
        obj = self._load_object()

        obj_start = (self.object_offset[0],
                     self.object_offset[1],
                     self.hand_start_z + self.object_offset[2])
        scene = compose_models([
            ("hand", hand, [0, 0, self.hand_start_z], hand_quat),
            ("object", obj, list(obj_start)),
        ])
        sl = scene.actor_slices
        self.obj_q = sl["object"]["q"][0]
        self.obj_v = sl["object"]["v"][0]
        self.nh_dof = sl["hand"]["v"][1]  # hand dof count (fixed base)
        self.model = scene
        self.obj_start = jnp.asarray(obj_start)
        # goal position = object spawn − 4cm in z (shadow_hand.py:401-402);
        # the (−0.2,−0.06,0.12) displacement only places the VISUAL marker
        self.goal_pos = jnp.asarray(obj_start) + jnp.array([0.0, 0.0, -0.04])

        # hand dof limits + actuated indices
        lo, hi, names = [], [], []
        for ji in range(scene.njnt):
            if scene.jnt_type[ji] == T.HINGE:
                lo.append(scene.jnt_range[ji][0])
                hi.append(scene.jnt_range[ji][1])
                names.append(scene.jnt_names[ji])
        self.dof_lower = jnp.asarray(np.array(lo, np.float32))
        self.dof_upper = jnp.asarray(np.array(hi, np.float32))
        self.actuated = self._actuated_indices(scene, names)
        self.fingertip_bodies = self._fingertip_indices(scene)
        self.obj_body = scene.body_index(
            f"object/{obj.body_names[0]}")

        # hand↔object contacts + hand self-collision pairs (shared.xml)
        bp_pairs = [(f"object/{obj.body_names[0]}", f"hand/{bn}")
                    for bn in self._contact_bodies(hand)]
        self.pair_contacts = build_pair_contacts(scene, body_pairs=bp_pairs)
        self.obj_mass = float(np.asarray(obj.body_mass).sum())

    # ------------------------------------------------------ subclass hooks
    def _load_object(self):
        """Manipulated object model per objectType.

        block: cube_multicolor.urdf as the reference; egg/pen:
        open_ai_assets/hand/egg.xml (ellipsoid 0.03x0.03x0.04 -> capsule
        r=0.03 hl=0.01, same extents) and pen.xml (capsule r=0.008
        hl=0.1), free joints, MuJoCo default density."""
        if self.object_type == "block":
            return load_urdf(_BLOCK_ASSET, fix_base=False, density=567.0)
        r, hl = ((0.03, 0.01) if self.object_type == "egg"
                 else (0.008, 0.1))
        xml = f"""<mujoco model="object">
        <compiler inertiafromgeom="true"/>
        <worldbody><body name="object">
          <joint type="free" name="object_joint" damping="0.01"/>
          <geom type="capsule" size="{r} {hl}" density="1000"/>
        </body></worldbody></mujoco>"""
        return load_mjcf(xml)

    def _load_hand(self):
        hand = load_mjcf(self.hand_asset)
        # Isaac's importer drops the asset root-body offset (actor frame =
        # root frame); keep its orientation (shadow_hand.py:305-307)
        bp = np.array(hand.body_pos)
        bp[0] = 0.0
        hand = dataclasses.replace(hand, body_pos=bp)
        return hand, [1.0, 0.0, 0.0, 0.0]

    def _actuated_indices(self, scene, hinge_names):
        # actuator → dof index (J0 joints are tendon-coupled, unactuated);
        # scene actuator names look like "hand/robot0:A_WRJ1"
        act_joint_names = [n.replace(":A_", ":") for n in scene.act_names]
        return np.array([hinge_names.index(a) for a in act_joint_names])

    def _fingertip_indices(self, scene):
        return np.array([scene.body_index(f"hand/{f}") for f in _FINGERTIPS])

    def _contact_bodies(self, hand):
        return [bn for bn in hand.body_names
                if any(k in bn for k in
                       ("distal", "middle", "proximal", "palm",
                        "knuckle", "lfmetacarpal"))]

    # ------------------------------------------------------------------- aux
    def _initial_aux(self):
        n = self.num_envs
        return {
            "actions": jnp.zeros((n, self.num_acts)),
            "prev_targets": jnp.zeros((n, self.nh_dof)),
            "goal_rot": jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 1)),
            "goal_reset": jnp.zeros(n, bool),
            "successes": jnp.zeros(n),
            "consecutive_successes": jnp.zeros(n),
            "force_prob": jnp.full((n,), 0.01),
            "rb_force": jnp.zeros((n, 3)),
        }

    def _sample_goal_rot(self, keys):
        def one(k):
            r = jax.random.uniform(k, (2,), minval=-1.0, maxval=1.0)
            return _randomize_rotation(r[0], r[1])
        return jax.vmap(one)(keys)

    def _sample_reset(self, state, keys):
        n = self.num_envs
        nh = self.nh_dof

        def one(key):
            ks = jax.random.split(key, 6)
            # object pose noise (shadow_hand.py:617-633)
            dp = jax.random.uniform(ks[0], (3,), minval=-1.0, maxval=1.0) \
                * self.reset_position_noise
            r = jax.random.uniform(ks[1], (2,), minval=-1.0, maxval=1.0)
            obj_rot = _randomize_rotation(r[0], r[1])
            # hand dofs (delta toward limits, :646-652)
            rand01 = 0.5 * (jax.random.uniform(
                ks[2], (nh,), minval=-1.0, maxval=1.0) + 1.0)
            delta = self.dof_lower[:nh] + rand01 \
                * (self.dof_upper[:nh] - self.dof_lower[:nh])
            pos = self.reset_dof_pos_noise * delta
            vel = self.reset_dof_vel_noise * jax.random.uniform(
                ks[3], (nh,), minval=-1.0, maxval=1.0)
            q = jnp.asarray(self.model.init_qpos)
            q = q.at[:nh].set(pos)
            q = q.at[self.obj_q:self.obj_q + 3].set(self.obj_start + dp)
            q = q.at[self.obj_q + 3:self.obj_q + 7].set(obj_rot)
            qd = jnp.zeros(self.model.nv).at[:nh].set(vel)
            # per-env force probability (log-uniform, :640-643)
            lo, hi = self.force_prob_range
            u = jax.random.uniform(ks[4])
            fp = jnp.exp((jnp.log(lo) - jnp.log(hi)) * u + jnp.log(hi))
            return q, qd, pos, fp, ks[5]

        q, qd, pos, fp, gk = jax.vmap(one)(keys)
        return q, qd, {
            "actions": jnp.zeros((n, self.num_acts)),
            "prev_targets": pos,
            "goal_rot": self._sample_goal_rot(gk),
            "goal_reset": jnp.zeros(n, bool),
            "successes": jnp.zeros(n),
            "force_prob": fp,
            "rb_force": jnp.zeros((n, 3)),
        }

    # --------------------------------------------------------------- physics
    def _physics(self, state, actions):
        contacts = build_ground_contacts(self.model)
        nh = self.nh_dof
        aux = state.aux
        lo = self.dof_lower[self.actuated]
        hi = self.dof_upper[self.actuated]

        # goal-only reset (reset_target_pose, applied before control)
        gkeys = jax.vmap(lambda k: jax.random.fold_in(k, 21))(state.rng)
        new_goal = self._sample_goal_rot(gkeys)
        gr = aux["goal_reset"]
        goal_rot = jnp.where(gr[:, None], new_goal, aux["goal_rot"])
        successes = aux["successes"]

        prev = aux["prev_targets"]
        if self.use_relative_control:
            tgt_a = prev[:, self.actuated] \
                + self.dof_speed_scale * self.dt * actions
        else:
            tgt_a = mx.scale_transform(actions, lo, hi)
            tgt_a = self.act_moving_average * tgt_a \
                + (1.0 - self.act_moving_average) * prev[:, self.actuated]
        tgt_a = jnp.clip(tgt_a, lo, hi)
        targets = prev.at[:, self.actuated].set(tgt_a)

        # random object force perturbations (:699-709)
        rbf = aux["rb_force"] * (self.force_decay
                                 ** (self.dt / self.force_decay_interval))
        if self.force_scale > 0.0:
            fkeys = jax.vmap(lambda k: jax.random.fold_in(k, 22))(state.rng)
            def sample_force(k):
                ku, kn = jax.random.split(k)
                hit = jax.random.uniform(ku)
                f = jax.random.normal(kn, (3,)) * self.obj_mass \
                    * self.force_scale
                return hit, f
            hit, f_new = jax.vmap(sample_force)(fkeys)
            rbf = jnp.where((hit < aux["force_prob"])[:, None], f_new, rbf)

        aux["prev_targets"] = targets
        aux["goal_rot"] = goal_rot
        aux["rb_force"] = rbf

        nb = self.model.nbody
        ob = self.obj_body

        def one(art, ctrl, f_obj, params):
            def force_fn(kin):
                f = jnp.zeros((nb, 6), art.q.dtype)
                fw = mx.quat_rotate(kin.body_quat[ob], f_obj)  # LOCAL_SPACE
                return f.at[ob, 3:].set(fw)

            return physics_step(self.model, self.sim, params, art, ctrl=ctrl,
                                contacts=contacts,
                                n_substeps=self.sim.substeps
                                * self.control_freq_inv,
                                pair_contacts=self.pair_contacts,
                                force_fn=force_fn)

        # ctrl is per-ACTUATOR (nu=20); unactuated J0 dofs follow via tendons
        in_axes = (0, 0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(
            state.art, targets[:, self.actuated], rbf, state.params)

    # ------------------------------------------------------------------- obs
    def _obs_pieces(self, state, info):
        q, qd = state.art.q, state.art.qd
        nh = self.nh_dof
        oq, ov = self.obj_q, self.obj_v
        dof_pos = mx.unscale_transform(q[:, :nh], self.dof_lower[:nh],
                                       self.dof_upper[:nh])
        dof_vel = qd[:, :nh] * self.vel_obs_scale
        obj_pose = q[:, oq:oq + 7]
        obj_linvel = qd[:, ov:ov + 3]
        obj_angvel = qd[:, ov + 3:ov + 6] * self.vel_obs_scale
        goal_rot = state.aux["goal_rot"]
        goal_pos = self.goal_pos
        goal_pose = jnp.concatenate(
            [jnp.tile(goal_pos, (self.num_envs, 1)), goal_rot], axis=-1)
        quat_diff = mx.quat_mul(obj_pose[:, 3:7], mx.quat_conj(goal_rot))
        ft = self.fingertip_bodies
        kin = info.kin
        # body-origin linear velocity from the ref-point spatial velocity
        omega = kin.body_vel[:, ft, :3]
        v_origin = kin.body_vel[:, ft, 3:] + jnp.cross(
            omega, kin.body_pos[:, ft] - kin.ref[:, None, :])
        ft_state = jnp.concatenate([
            kin.body_pos[:, ft], kin.body_quat[:, ft], v_origin, omega,
        ], axis=-1)  # (N,5,13) rigid-body-state layout pos/quat/linvel/angvel
        ft_pos = kin.body_pos[:, ft]
        ft_force = jnp.concatenate([
            info.body_contact_force[:, ft], info.body_contact_torque[:, ft],
        ], axis=-1)
        dof_force = info.tau[:, :nh] * self.ft_obs_scale
        return (dof_pos, dof_vel, obj_pose, obj_linvel, obj_angvel,
                goal_pose, quat_diff, ft_state, ft_pos, ft_force, dof_force)

    def _full_state(self, pieces, actions):
        (dof_pos, dof_vel, obj_pose, obj_linvel, obj_angvel, goal_pose,
         quat_diff, ft_state, ft_pos, ft_force, dof_force) = pieces
        n = self.num_envs
        return jnp.concatenate([
            dof_pos, dof_vel, dof_force,
            obj_pose, obj_linvel, obj_angvel,
            goal_pose, quat_diff,
            ft_state.reshape(n, -1),
            ft_force.reshape(n, -1) * self.ft_obs_scale,
            actions,
        ], axis=-1)

    def _observe(self, state, info):
        pieces = self._obs_pieces(state, info)
        (dof_pos, dof_vel, obj_pose, obj_linvel, obj_angvel, goal_pose,
         quat_diff, ft_state, ft_pos, ft_force, dof_force) = pieces
        n = self.num_envs
        actions = state.aux["actions"]
        if self.obs_type == "openai":
            obs = jnp.concatenate([
                ft_pos.reshape(n, -1), obj_pose[:, 0:3], quat_diff, actions,
            ], axis=-1)
        elif self.obs_type == "full_no_vel":
            obs = jnp.concatenate([
                dof_pos, obj_pose, goal_pose, quat_diff,
                ft_pos.reshape(n, -1), actions,
            ], axis=-1)
        elif self.obs_type == "full":
            obs = jnp.concatenate([
                dof_pos, dof_vel, obj_pose, obj_linvel, obj_angvel,
                goal_pose, quat_diff, ft_state.reshape(n, -1), actions,
            ], axis=-1)
        else:  # full_state
            obs = self._full_state(pieces, actions)
        self._pieces_cache = pieces
        return obs, {}

    def _states(self, state, info):
        if not self.asymmetric_obs:
            return None
        return self._full_state(self._pieces_cache, state.aux["actions"])

    # ---------------------------------------------------------------- reward
    def _reward_done(self, state, obs, actions, info):
        q, qd = state.art.q, state.art.qd
        oq = self.obj_q
        aux = state.aux
        obj_pos = q[:, oq:oq + 3]
        obj_rot = q[:, oq + 3:oq + 7]
        goal_pos = self.goal_pos
        goal_rot = aux["goal_rot"]

        goal_dist = jnp.linalg.norm(obj_pos - goal_pos, axis=-1)
        quat_diff = mx.quat_mul(obj_rot, mx.quat_conj(goal_rot))
        rot_dist = 2.0 * jnp.arcsin(jnp.clip(
            jnp.linalg.norm(quat_diff[:, 1:4], axis=-1), 0.0, 1.0))

        dist_rew = goal_dist * self.dist_reward_scale
        rot_rew = 1.0 / (jnp.abs(rot_dist) + self.rot_eps) \
            * self.rot_reward_scale
        action_penalty = jnp.sum(actions ** 2, axis=-1)
        reward = dist_rew + rot_rew + action_penalty \
            * self.action_penalty_scale

        goal_resets = jnp.abs(rot_dist) <= self.success_tolerance
        successes = aux["successes"] + goal_resets
        reward = jnp.where(goal_resets, reward + self.reach_goal_bonus,
                           reward)
        fallen = goal_dist >= self.fall_dist
        reward = jnp.where(fallen, reward + self.fall_penalty, reward)

        resets = fallen
        progress = state.progress
        if self.max_consecutive_successes > 0:
            progress = jnp.where(goal_resets, 0, progress)
            resets = resets | (successes >= self.max_consecutive_successes)
        timed_out = progress >= self.max_episode_length - 1
        resets = resets | timed_out
        if self.max_consecutive_successes > 0:
            reward = jnp.where(timed_out, reward + 0.5 * self.fall_penalty,
                               reward)

        # running consecutive-successes metric (:795-799); tracked as the
        # same scalar replicated per env
        num_resets = jnp.sum(resets)
        finished = jnp.sum(successes * resets)
        cons_prev = aux["consecutive_successes"][0]
        cons = jnp.where(
            num_resets > 0,
            self.av_factor * finished / jnp.maximum(num_resets, 1)
            + (1.0 - self.av_factor) * cons_prev,
            cons_prev)

        # direct average over finished envs (reference ShadowHandTest
        # prints exactly this, docs/rl_examples.md:166-168): eval_run.py
        # accumulates final/ channels done-gated, so this reports
        # sum(successes at episode end)/num finished episodes with no
        # EMA warm-up bias (round-4 Weak #7)
        info_out = {"consecutive_successes": cons,
                    "final/successes": successes}
        aux_up = {"successes": successes, "goal_reset": goal_resets,
                  "consecutive_successes":
                  jnp.broadcast_to(cons, successes.shape)}
        return reward, resets, info_out, aux_up
