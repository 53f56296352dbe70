"""FrankaCubeStack: pick up cubeA and stack it on cubeB.

Parity with reference `tasks/franka_cube_stack.py` (748 LoC):
  * Franka-with-gripper on a table stand; table 1.2×1.2×0.05 at z=1.0,
    cubeA 5 cm / cubeB 7 cm free boxes on the tabletop (`:205-295`);
  * OSC control (`controlType: osc`): per-step task-space impedance
    `u = Jᵀ Λ (kp·dpose − kd·eef_vel)` with nullspace posture torques,
    from `acquire_jacobian_tensor`/`acquire_mass_matrix_tensor`
    (`_compute_osc_torques` `:602-628`) — here computed analytically from
    the batched CRBA mass matrix and point jacobian; `joint_tor` mode
    applies scaled joint torques directly;
  * binary gripper: position targets snap to open/close limits (`:643-650`,
    PD kp 5000 / kd 100 / effort 200, `:207-208,266-267`);
  * obs 19 (OSC) `[cubeA_quat, cubeA_pos, cubeA_to_cubeB, eef_pos,
    eef_quat, q_gripper]` (`:450-456`);
  * staged reward: tanh grasp distance, lift, align, stack-success with
    gripper-away condition; episode ends on stack (`compute_franka_reward`
    `:700-758`).
Config `cfg/task/FrankaCubeStack.yaml`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..core.modeling import add_actuators, compose_models
from ..io.mjcf import load_mjcf
from ..io.urdf import load_urdf
from ..physics.collide import build_ground_contacts, build_pair_contacts
from ..physics.dynamics import crba
from ..physics.kinematics import forward_kinematics
from ..physics.step import physics_step
from .base import VecTask
from ..utils.assets import asset_path

_FRANKA = asset_path(
    "urdf/franka_description/robots/franka_panda_gripper.urdf")

_DEFAULT_DOF = np.array([0, 0.1963, 0, -2.6180, 0, 2.9416, 0.7854,
                         0.035, 0.035], np.float32)


def _box_xml(name, size, density=100.0, free=True, pos=(0, 0, 0)):
    joint = f'<joint type="free" name="{name}_free"/>' if free else ""
    return f"""<mujoco model="{name}"><compiler inertiafromgeom="true"/>
    <worldbody><body name="{name}" pos="{pos[0]} {pos[1]} {pos[2]}">{joint}
    <geom type="box" size="{size[0]/2} {size[1]/2} {size[2]/2}"
          density="{density}"/></body></worldbody></mujoco>"""


class FrankaCubeStack(VecTask):
    num_acts = 7  # OSC: 6 dpose + 1 gripper

    def __init__(self, cfg=None, num_envs=8192):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.control_type = env.get("controlType", "osc")
        self.num_obs = 19 if self.control_type == "osc" else 26
        self.num_acts = 7 if self.control_type == "osc" else 8
        self.max_episode_length = env.get("episodeLength", 300)
        self.action_scale = env.get("actionScale", 1.0)
        self.franka_dof_noise = env.get("frankaDofNoise", 0.25)
        self.start_position_noise = env.get("startPositionNoise", 0.25)
        self.reward_settings = {
            "r_dist_scale": env.get("distRewardScale", 0.1),
            "r_lift_scale": env.get("liftRewardScale", 1.5),
            "r_align_scale": env.get("alignRewardScale", 2.0),
            "r_stack_scale": env.get("stackRewardScale", 16.0),
        }
        self.clip_obs = env.get("clipObservations", 5.0)
        self.clip_actions = env.get("clipActions", 1.0)

        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 60.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            # light-cube contact rows under-converge at the default 16
            # APGD sweeps inside the stiff franka system (~15 mm rest
            # penetration); 48 brings it under 1 mm
            solver_iterations=sim_cfg.get("num_solver_iterations", 48),
        )
        self.dt = self.sim.dt

        franka = load_urdf(_FRANKA, fix_base=True,
                           collapse_fixed_joints=True)
        # arm dofs effort-driven via OSC; grippers PD kp 5000/kd 100 ±200N
        franka = add_actuators(
            franka, ["panda_finger_joint1", "panda_finger_joint2"],
            trntype=T.ACT_POSITION, kp=5000.0, kd=100.0,
            forcerange=(-200.0, 200.0))

        table_thick, stand_h = 0.05, 0.1
        self.cubeA_size, self.cubeB_size = 0.05, 0.07
        table = load_mjcf(_box_xml("table", (1.2, 1.2, table_thick),
                                   free=False))
        stand = load_mjcf(_box_xml("stand", (0.2, 0.2, stand_h),
                                   free=False))
        cubeA = load_mjcf(_box_xml("cubeA", (self.cubeA_size,) * 3))
        cubeB = load_mjcf(_box_xml("cubeB", (self.cubeB_size,) * 3))
        self.table_height = 1.0 + table_thick / 2

        scene = compose_models([
            ("franka", franka,
             [-0.45, 0.0, 1.0 + table_thick / 2 + stand_h]),
            ("table", table, [0.0, 0.0, 1.0]),
            ("stand", stand, [-0.5, 0.0, 1.0 + table_thick / 2
                              + stand_h / 2]),
            ("cubeA", cubeA, [0.0, 0.0, self.table_height
                              + self.cubeA_size / 2]),
            ("cubeB", cubeB, [0.0, 0.15, self.table_height
                              + self.cubeB_size / 2]),
        ])
        sl = scene.actor_slices
        self.model = scene
        self.cubeA_q = sl["cubeA"]["q"][0]
        self.cubeA_v = sl["cubeA"]["v"][0]
        self.cubeB_q = sl["cubeB"]["q"][0]
        self.cubeB_v = sl["cubeB"]["v"][0]

        self.eef_body = scene.body_index("franka/panda_grip_site")
        self.lf_body = scene.body_index("franka/panda_leftfinger_tip")
        self.rf_body = scene.body_index("franka/panda_rightfinger_tip")
        self.hand_body = scene.body_index("franka/panda_hand")

        lo, hi, eff = [], [], []
        for ji in range(scene.njnt):
            if scene.jnt_type[ji] in (T.HINGE, T.SLIDE) \
                    and scene.jnt_names[ji].startswith("franka/"):
                lo.append(scene.jnt_range[ji][0])
                hi.append(scene.jnt_range[ji][1])
        self.dof_lower = jnp.asarray(np.array(lo, np.float32))
        self.dof_upper = jnp.asarray(np.array(hi, np.float32))
        self.effort_limit = jnp.asarray(
            [87, 87, 87, 87, 12, 12, 12], jnp.float32)

        # OSC gains (franka_cube_stack.py:154-157)
        self.kp = jnp.full(6, 150.0)
        self.kd = 2 * jnp.sqrt(self.kp)
        self.kp_null = jnp.full(7, 10.0)
        self.kd_null = 2 * jnp.sqrt(self.kp_null)
        self.cmd_limit = jnp.asarray([0.1, 0.1, 0.1, 0.5, 0.5, 0.5])

        init_q = np.array(scene.init_qpos)
        init_q[:9] = _DEFAULT_DOF
        self.init_q = jnp.asarray(init_q, jnp.float32)

        bp = []
        for cube in ("cubeA", "cubeB"):
            bp += [(f"{cube}/{cube}", "table/table"),
                   (f"{cube}/{cube}", "franka/panda_leftfinger"),
                   (f"{cube}/{cube}", "franka/panda_rightfinger"),
                   (f"{cube}/{cube}", "franka/panda_hand")]
        bp.append(("cubeA/cubeA", "cubeB/cubeB"))
        self.pair_contacts = build_pair_contacts(scene, body_pairs=bp)

    # ------------------------------------------------------------------- aux
    def _initial_aux(self):
        n = self.num_envs
        return {"gripper_targets": jnp.full((n, 2), 0.035)}

    def _sample_reset(self, state, keys):
        n = self.num_envs
        th = self.table_height

        def one(key):
            ks = jax.random.split(key, 4)
            dq = self.franka_dof_noise * 1.25 * (
                jax.random.uniform(ks[0], (9,)) - 0.5)
            arm = jnp.clip(jnp.asarray(_DEFAULT_DOF) + dq,
                           self.dof_lower, self.dof_upper)
            arm = arm.at[7:].set(jnp.asarray(_DEFAULT_DOF[7:]))
            q = self.init_q.at[:9].set(arm)
            # cubeB center-table ± noise; cubeA offset ≥ min distance
            bxy = self.start_position_noise * (
                jax.random.uniform(ks[1], (2,)) - 0.5)
            q = q.at[self.cubeB_q:self.cubeB_q + 3].set(
                jnp.array([bxy[0], bxy[1], th + self.cubeB_size / 2]))
            q = q.at[self.cubeB_q + 3:self.cubeB_q + 7].set(
                jnp.array([1.0, 0, 0, 0]))
            # cubeA: polar offset from cubeB, radius ≥ sum of half-diagonals
            r_min = (self.cubeA_size + self.cubeB_size) * 1.1
            ang = jax.random.uniform(ks[2], minval=0.0, maxval=2 * jnp.pi)
            rad = r_min + self.start_position_noise \
                * jax.random.uniform(ks[3])
            axy = bxy + rad * jnp.array([jnp.cos(ang), jnp.sin(ang)])
            axy = jnp.clip(axy, -0.5, 0.5)
            q = q.at[self.cubeA_q:self.cubeA_q + 3].set(
                jnp.array([axy[0], axy[1], th + self.cubeA_size / 2]))
            q = q.at[self.cubeA_q + 3:self.cubeA_q + 7].set(
                jnp.array([1.0, 0, 0, 0]))
            return q, jnp.zeros(self.model.nv)

        q, qd = jax.vmap(one)(keys)
        return q, qd, {"gripper_targets": jnp.full((n, 2), 0.035)}

    # --------------------------------------------------------------- physics
    def _eef_state(self, kin):
        p = kin.body_pos[self.eef_body]
        quat = kin.body_quat[self.eef_body]
        v6 = kin.body_vel[self.eef_body]
        v_lin = v6[3:] + jnp.cross(v6[:3], p - kin.ref)
        return p, quat, jnp.concatenate([v_lin, v6[:3]])

    def _osc_torques(self, art, dpose, params):
        """Task-space impedance + nullspace (franka_cube_stack.py:602-628),
        single env."""
        from ..physics.dynamics import jacobian_body
        kin = forward_kinematics(self.model, params, art.q, art.qd)
        p, quat, eef_vel = self._eef_state(kin)
        J6 = jacobian_body(self.model, params, kin, self.eef_body, p)
        # rows [ω; v] about the point → reference layout is [v; ω]
        J = jnp.concatenate([J6[3:], J6[:3]], axis=0)[:, :7]   # (6,7)
        mm = crba(self.model, params, kin)[:7, :7]
        from ..physics.linalg import spd_inverse
        mm_inv = spd_inverse(mm)
        m_eef_inv = J @ mm_inv @ J.T
        m_eef = spd_inverse(m_eef_inv + 1e-6 * jnp.eye(6))
        u = J.T @ (m_eef @ (self.kp * dpose - self.kd * eef_vel))
        # nullspace posture torque
        q7, qd7 = art.q[:7], art.qd[:7]
        u_null = self.kd_null * -qd7 + self.kp_null * (
            (jnp.asarray(_DEFAULT_DOF[:7]) - q7 + jnp.pi)
            % (2 * jnp.pi) - jnp.pi)
        u_null = mm @ u_null
        j_eef_inv = m_eef @ J @ mm_inv
        u = u + (jnp.eye(7) - J.T @ j_eef_inv) @ u_null
        return jnp.clip(u, -self.effort_limit, self.effort_limit)

    def _physics(self, state, actions):
        contacts = build_ground_contacts(self.model)
        u_arm_cmd = actions[:, :-1]
        u_gripper = actions[:, -1]
        u_arm_cmd = u_arm_cmd * self.cmd_limit / self.action_scale

        # binary gripper targets (:643-650)
        open_t = jnp.stack([self.dof_upper[7], self.dof_upper[8]])
        close_t = jnp.stack([self.dof_lower[7], self.dof_lower[8]])
        grip_t = jnp.where(u_gripper[:, None] >= 0.0, open_t, close_t)
        state.aux["gripper_targets"] = grip_t

        nv = self.model.nv

        def one(art, dpose, gt, params):
            if self.control_type == "osc":
                u7 = self._osc_torques(art, dpose, params)
            else:
                u7 = jnp.clip(dpose[:7] if dpose.shape[0] >= 7 else dpose,
                              -self.effort_limit, self.effort_limit)
            extra = jnp.zeros(nv, art.q.dtype).at[:7].set(u7)
            return physics_step(self.model, self.sim, params, art,
                                ctrl=gt, extra_tau=extra,
                                contacts=contacts,
                                n_substeps=self.sim.substeps,
                                pair_contacts=self.pair_contacts)

        in_axes = (0, 0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(
            state.art, u_arm_cmd, grip_t, state.params)

    # ------------------------------------------------------------------- obs
    def _observe(self, state, info):
        q = state.art.q
        kin = info.kin
        eef_p = kin.body_pos[:, self.eef_body]
        eef_q = kin.body_quat[:, self.eef_body]
        cubeA_pos = q[:, self.cubeA_q:self.cubeA_q + 3]
        cubeA_quat = q[:, self.cubeA_q + 3:self.cubeA_q + 7]
        cubeB_pos = q[:, self.cubeB_q:self.cubeB_q + 3]
        a_to_b = cubeB_pos - cubeA_pos
        if self.control_type == "osc":
            obs = jnp.concatenate([
                cubeA_quat, cubeA_pos, a_to_b, eef_p, eef_q, q[:, 7:9],
            ], axis=-1)
        else:
            obs = jnp.concatenate([
                cubeA_quat, cubeA_pos, a_to_b, eef_p, eef_q, q[:, 0:9],
            ], axis=-1)
        return obs, {}

    # ---------------------------------------------------------------- reward
    def _reward_done(self, state, obs, actions, info):
        q = state.art.q
        kin = info.kin
        rs = self.reward_settings
        eef_p = kin.body_pos[:, self.eef_body]
        lf = kin.body_pos[:, self.lf_body]
        rf = kin.body_pos[:, self.rf_body]
        cubeA_pos = q[:, self.cubeA_q:self.cubeA_q + 3]
        cubeB_pos = q[:, self.cubeB_q:self.cubeB_q + 3]
        a_to_b = cubeB_pos - cubeA_pos

        d = jnp.linalg.norm(cubeA_pos - eef_p, axis=-1)
        d_lf = jnp.linalg.norm(cubeA_pos - lf, axis=-1)
        d_rf = jnp.linalg.norm(cubeA_pos - rf, axis=-1)
        dist_reward = 1 - jnp.tanh(10.0 * (d + d_lf + d_rf) / 3)

        cubeA_height = cubeA_pos[:, 2] - self.table_height
        cubeA_lifted = (cubeA_height - self.cubeA_size) > 0.04
        lift_reward = cubeA_lifted.astype(obs.dtype)

        offset = jnp.array([0.0, 0.0,
                            (self.cubeA_size + self.cubeB_size) / 2])
        d_ab = jnp.linalg.norm(a_to_b + offset, axis=-1)
        align_reward = (1 - jnp.tanh(10.0 * d_ab)) * lift_reward
        dist_reward = jnp.maximum(dist_reward, align_reward)

        target_height = self.cubeB_size + self.cubeA_size / 2
        aligned = jnp.linalg.norm(a_to_b[:, :2], axis=-1) < 0.02
        on_top = jnp.abs(cubeA_height - target_height) < 0.02
        gripper_away = d > 0.04
        stack = aligned & on_top & gripper_away

        rewards = jnp.where(
            stack, rs["r_stack_scale"],
            rs["r_dist_scale"] * dist_reward
            + rs["r_lift_scale"] * lift_reward
            + rs["r_align_scale"] * align_reward)
        done = stack | (state.progress >= self.max_episode_length - 1)
        return rewards, done, {"stack_rate": jnp.mean(stack.astype(
            jnp.float32))}
