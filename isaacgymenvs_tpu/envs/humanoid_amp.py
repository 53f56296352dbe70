"""HumanoidAMP: motion-imitation humanoid (AMP discriminator reward).

Parity with reference `tasks/humanoid_amp.py` (332 LoC) +
`tasks/amp/humanoid_amp_base.py` (561 LoC):
  * 28-DoF amp_humanoid (3-hinge groups per spherical joint), PD control
    in action space with offset/scale from widened limits
    (`_build_pd_action_offset_scale` `:262-296`, `_action_to_pd_targets`
    `:419`), gains = MJCF joint stiffness/damping (`:237-241`);
  * 105-D obs `[root_h, root_rot 6D, local vels, dof 6D obs, dof_vel,
    local key-body pos]` (`compute_humanoid_observations` `:495-529`);
  * constant task reward 1.0 (`:531-535` — style comes from the AMP
    discriminator), fall termination via contacts on non-allowed bodies
    below termination height (`compute_humanoid_reset` `:537-561`);
  * state-init Default/Start/Random/Hybrid sampling mocap states via
    MotionLib (`humanoid_amp.py:52-57,184-211`);
  * AMP obs = 2-step window (NUM_AMP_OBS_PER_STEP = 105), exposed per
    step in TimeStep.info["amp_obs"] (`humanoid_amp.py:88-97`), demo
    windows via `fetch_amp_obs_demo` (`:109-135`).
Config `cfg/task/HumanoidAMP.yaml`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..io.mjcf import load_mjcf
from ..io.motion import MotionLib
from .base import VecTask
from ..utils.assets import asset_path

_ASSET = asset_path("mjcf/amp_humanoid.xml")
_MOTION_DIR = asset_path("amp/motions")

KEY_BODY_NAMES = ("right_hand", "left_hand", "right_foot", "left_foot")
CONTACT_BODIES = ("right_foot", "left_foot")
# 12 joint groups over 28 dofs (humanoid_amp_base.py DOF_OFFSETS)
DOF_OFFSETS = (0, 3, 6, 9, 10, 13, 14, 17, 18, 21, 24, 25, 28)
NUM_AMP_OBS_PER_STEP = 13 + 52 + 28 + 12  # = 105


def dof_to_obs(pose):
    """28 dofs → 52-D obs: 3-dof groups as tan-norm of the intrinsic-xyz
    rotation, 1-dof as the raw angle (humanoid_amp_base.py:462-493)."""
    pieces = []
    for j in range(len(DOF_OFFSETS) - 1):
        o, sz = DOF_OFFSETS[j], DOF_OFFSETS[j + 1] - DOF_OFFSETS[j]
        jp = pose[..., o:o + sz]
        if sz == 3:
            q = mx.quat_from_euler_xyz(jp[..., 0], jp[..., 1], jp[..., 2])
            pieces.append(mx.quat_to_tan_norm(q))
        else:
            pieces.append(jp)
    return jnp.concatenate(pieces, axis=-1)


def build_amp_observations(root_pos, root_rot, root_vel, root_ang_vel,
                           dof_pos, dof_vel, key_body_pos, local_root_obs):
    """105-D AMP features (humanoid_amp.py:283-332). Quats are wxyz."""
    root_h = root_pos[..., 2:3]
    heading_rot = mx.calc_heading_quat_inv(root_rot)
    root_rot_obs = mx.quat_mul(heading_rot, root_rot) if local_root_obs \
        else root_rot
    root_rot_obs = mx.quat_to_tan_norm(root_rot_obs)
    local_vel = mx.quat_rotate(heading_rot, root_vel)
    local_ang_vel = mx.quat_rotate(heading_rot, root_ang_vel)
    local_key = key_body_pos - root_pos[..., None, :]
    local_key = mx.quat_rotate(heading_rot[..., None, :], local_key)
    flat_key = local_key.reshape(local_key.shape[:-2] + (-1,))
    return jnp.concatenate([
        root_h, root_rot_obs, local_vel, local_ang_vel,
        dof_to_obs(dof_pos), dof_vel, flat_key], axis=-1)


class HumanoidAMP(VecTask):
    num_obs = 105
    num_acts = 28

    def __init__(self, cfg=None, num_envs=4096):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.max_episode_length = env.get("episodeLength", 300)
        self.pd_control = env.get("pdControl", True)
        self.power_scale = env.get("powerScale", 1.0)
        self.control_freq_inv = env.get("controlFrequencyInv", 2)
        self.state_init = env.get("stateInit", "Random")
        self.hybrid_init_prob = env.get("hybridInitProb", 0.5)
        self.num_amp_obs_steps = env.get("numAMPObsSteps", 2)
        self.local_root_obs = env.get("localRootObs", False)
        self.termination_height = env.get("terminationHeight", 0.5)
        self.enable_early_termination = env.get("enableEarlyTermination",
                                                True)
        motion_file = env.get("motion_file", "amp_humanoid_run.npy")

        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 60.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        self.dt_ctl = self.sim.dt * self.control_freq_inv

        model = load_mjcf(_ASSET)
        if self.pd_control:
            # DOF_MODE_POS with MJCF joint stiffness/damping as drive gains
            # (humanoid_amp_base.py:237-241); zero passive spring to avoid
            # double-counting
            from ..core.modeling import hinge_joint_names
            names = hinge_joint_names(model)
            nu = len(names)
            act_jnt = np.array([model.jnt_index(n) for n in names], np.int32)
            kp = np.array([model.dof_stiffness[model.jnt_vadr[j]]
                           for j in act_jnt], np.float32)
            kd = np.array([model.dof_damping[model.jnt_vadr[j]]
                           for j in act_jnt], np.float32)
            model = dataclasses.replace(
                model,
                act_jnt=act_jnt,
                act_trntype=np.full(nu, T.ACT_POSITION, np.int32),
                act_gear=np.ones(nu, np.float32),
                act_ctrlrange=np.tile(np.array([-np.inf, np.inf],
                                               np.float32), (nu, 1)),
                act_forcerange=np.tile(np.array([-np.inf, np.inf],
                                                np.float32), (nu, 1)),
                act_kp=kp * self.power_scale,
                act_kd=kd,
                act_names=tuple(names),
                dof_stiffness=np.zeros_like(model.dof_stiffness),
                dof_damping=np.zeros_like(model.dof_damping),
            )
        self.model = model
        self.num_dof = model.nv - 6

        self.key_body_ids = np.array(
            [model.body_index(n) for n in KEY_BODY_NAMES])
        # allowed-contact bodies are configurable: HumanoidAMPHands adds
        # right_hand/left_hand (reference cfg/task/HumanoidAMPHands.yaml:22)
        contact_bodies = env.get("contactBodies", list(CONTACT_BODIES))
        self.contact_body_ids = np.array(
            [model.body_index(n) for n in contact_bodies])

        lo, hi = [], []
        for ji in range(model.njnt):
            if model.jnt_type[ji] == T.HINGE:
                lo.append(model.jnt_range[ji][0])
                hi.append(model.jnt_range[ji][1])
        lo, hi = np.array(lo, np.float32), np.array(hi, np.float32)
        self.dof_lower, self.dof_upper = jnp.asarray(lo), jnp.asarray(hi)
        # PD action offset/scale (humanoid_amp_base.py:262-296)
        lim_lo, lim_hi = lo.copy(), hi.copy()
        for j in range(len(DOF_OFFSETS) - 1):
            o, sz = DOF_OFFSETS[j], DOF_OFFSETS[j + 1] - DOF_OFFSETS[j]
            if sz == 3:
                lim_lo[o:o + 3], lim_hi[o:o + 3] = -np.pi, np.pi
            else:
                mid = 0.5 * (lim_hi[o] + lim_lo[o])
                sc = 0.7 * (lim_hi[o] - lim_lo[o])
                lim_lo[o], lim_hi[o] = mid - sc, mid + sc
        self.pd_offset = jnp.asarray(0.5 * (lim_hi + lim_lo))
        self.pd_scale = jnp.asarray(0.5 * (lim_hi - lim_lo))

        self.motion_lib = MotionLib(
            motion_file if "/" in motion_file
            else f"{_MOTION_DIR}/{motion_file}",
            model, KEY_BODY_NAMES)
        self.num_amp_obs = self.num_amp_obs_steps * NUM_AMP_OBS_PER_STEP

        init_q = np.array(model.init_qpos)
        init_q[2] = 0.89  # asset pelvis spawn height
        self.init_q = jnp.asarray(init_q, jnp.float32)

    @property
    def amp_observation_space(self):
        return ("Box", (-np.inf, np.inf), (self.num_amp_obs,))

    # --------------------------------------------------------------- control
    def _action_to_ctrl(self, actions):
        return self.pd_offset + self.pd_scale * actions

    # ------------------------------------------------------------------- aux
    def _initial_aux(self):
        n = self.num_envs
        return {
            "amp_hist": jnp.zeros((n, self.num_amp_obs_steps,
                                   NUM_AMP_OBS_PER_STEP)),
        }

    def _motion_state_to_qqd(self, ms):
        (root_pos, root_rot, dof_pos, root_vel, root_ang_vel, dof_vel,
         key_pos) = ms
        n = root_pos.shape[0]
        q = jnp.concatenate([root_pos, root_rot, dof_pos], axis=-1)
        qd = jnp.concatenate([root_vel, root_ang_vel, dof_vel], axis=-1)
        return q, qd

    def _sample_reset(self, state, keys):
        n = self.num_envs
        k0 = keys[0]
        km, kt, kh = jax.random.split(jax.random.fold_in(k0, 3), 3)
        motion_ids = self.motion_lib.sample_motions(km, n)
        if self.state_init == "Start":
            motion_times = jnp.zeros(n)
        else:
            motion_times = self.motion_lib.sample_time(kt, motion_ids)
        ms = self.motion_lib.get_motion_state(motion_ids, motion_times)
        q_ref, qd_ref = self._motion_state_to_qqd(ms)

        q_def = jnp.tile(self.init_q, (n, 1))
        qd_def = jnp.zeros((n, self.model.nv))
        if self.state_init == "Default":
            q, qd = q_def, qd_def
        elif self.state_init == "Hybrid":
            use_ref = jax.random.uniform(kh, (n,)) < self.hybrid_init_prob
            q = jnp.where(use_ref[:, None], q_ref, q_def)
            qd = jnp.where(use_ref[:, None], qd_ref, qd_def)
            motion_times = jnp.where(use_ref, motion_times, 0.0)
        else:  # Start / Random
            q, qd = q_ref, qd_ref

        # init amp history with demo windows at t − k·dt (humanoid_amp.py
        # _init_amp_obs_ref :239-258); Default envs replicate the current obs
        hist = [self._amp_obs_from_qqd(q, qd)]
        for k in range(1, self.num_amp_obs_steps):
            tk = jnp.maximum(motion_times - k * self.dt_ctl, 0.0)
            msk = self.motion_lib.get_motion_state(motion_ids, tk)
            qk, qdk = self._motion_state_to_qqd(msk)
            # key_pos via OUR FK, not the motion's stored key_pos — see
            # fetch_amp_obs_demo
            hist.append(self._amp_obs_from_qqd(qk, qdk))
        amp_hist = jnp.stack(hist, axis=1)
        return q, qd, {"amp_hist": amp_hist}

    # ------------------------------------------------------------------- obs
    def _key_body_pos(self, info):
        return info.kin.body_pos[:, self.key_body_ids]

    def _amp_obs_from_qqd(self, q, qd, key_pos=None):
        if key_pos is None:
            # FK for key bodies (host-free: reuse batched FK)
            from ..physics.kinematics import forward_kinematics
            params = self.model.default_phys_params()
            kin = jax.vmap(
                lambda qq, dd: forward_kinematics(self.model, params, qq, dd)
            )(q, qd)
            key_pos = kin.body_pos[:, self.key_body_ids]
        return build_amp_observations(
            q[:, 0:3], q[:, 3:7], qd[:, 0:3], qd[:, 3:6],
            q[:, 7:], qd[:, 6:], key_pos, self.local_root_obs)

    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        key_pos = self._key_body_pos(info)
        obs = build_amp_observations(
            q[:, 0:3], q[:, 3:7], qd[:, 0:3], qd[:, 3:6],
            q[:, 7:], qd[:, 6:], key_pos, self.local_root_obs)
        # roll AMP history window (humanoid_amp.py:88-97)
        hist = state.aux["amp_hist"]
        hist = jnp.concatenate([obs[:, None], hist[:, :-1]], axis=1)
        return obs, {"amp_hist": hist}

    # ---------------------------------------------------------------- reward
    def _reward_done(self, state, obs, actions, info):
        reward = jnp.ones(self.num_envs)
        done = state.progress >= self.max_episode_length - 1
        terminated = jnp.zeros(self.num_envs, bool)
        if self.enable_early_termination:
            cf = jnp.linalg.norm(info.body_contact_force, axis=-1)
            cf = cf.at[:, self.contact_body_ids].set(0.0)
            fall_contact = jnp.any(cf > 0.1, axis=-1)
            bh = info.kin.body_pos[..., 2]
            low = bh < self.termination_height
            low = low.at[:, self.contact_body_ids].set(False)
            fall_height = jnp.any(low, axis=-1)
            terminated = fall_contact & fall_height & (state.progress > 1)
            done = done | terminated
        amp_obs = state.aux["amp_hist"].reshape(self.num_envs, -1)
        return reward, done, {"amp_obs": amp_obs,
                              "terminate": terminated}

    # --------------------------------------------------------------- AMP API
    def fetch_amp_obs_demo(self, key, num_samples):
        """Demo windows for the discriminator (humanoid_amp.py:109-135).

        key_pos comes from OUR model's FK on the motion's (q, qd) — NOT
        the motion file's stored global key positions. The two disagree
        by 1.7 cm mean / 28 cm max over the walk clip (retarget/FK
        convention gap), which handed the discriminator an always-on
        systematic feature separating any simulated state from any demo
        state: disc_acc_demo pinned at exactly 1.00 from epoch ~18 and
        the policy plateaued at ~134/300 ep len for two rounds. In the
        reference the two sources coincide because the motion was
        retargeted onto the same skeleton the sim loads; routing demo
        obs through the agent's own FK restores that consistency by
        construction."""
        km, kt = jax.random.split(key)
        ids = self.motion_lib.sample_motions(km, num_samples)
        t0 = self.motion_lib.sample_time(kt, ids)
        obs = []
        for k in range(self.num_amp_obs_steps):
            tk = jnp.maximum(t0 - k * self.dt_ctl, 0.0)
            ms = self.motion_lib.get_motion_state(ids, tk)
            qk, qdk = self._motion_state_to_qqd(ms)
            obs.append(self._amp_obs_from_qqd(qk, qdk))
        return jnp.concatenate(obs, axis=-1)
