"""FactoryBase: Franka-on-table scene + low-level controller plumbing.

Parity with reference `factory/factory_base.py` (535 LoC):
  * Franka + table import (`import_franka_assets` :107-162): franka
    fixed-base at (franka_depth, 0, 0) yawed 180deg, gravity-disabled,
    armature 0.01; table = fixed box depth x width x table_height;
  * fingertip-midpoint kinematics (`refresh_base_tensors` :249-272):
    finger-origin midpoint translated `franka_finger_length` along the
    hand z-axis; velocities and the point jacobian are taken exactly at
    that point on the hand body (the reference averages the two finger
    jacobians as an approximation);
  * `parse_controller_spec` (:273-417) -> `factory/control.py`;
  * `generate_ctrl_signals` (:418-480): gym mode drives PD position
    actuators; manual mode computes DOF torques via
    `control.compute_dof_torque` and applies them as `extra_tau`.

TPU-native deviations (documented): the franka asset's rigid-body
gravity disable is realised with a per-substep anti-gravity `force_fn`;
`add_damping` body drag is approximated by joint damping on the arm;
"kinematic" actors (the bolt / socket / base plate, which the reference
teleports through the root-state tensor despite fix_base) are free
roots that are pose-restored after every control step.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core import maths as mx
from ...core import types as T
from ...core.modeling import add_actuators, compose_models
from ...io.mjcf import load_mjcf
from ...io.urdf import load_urdf
from ...physics.collide import build_ground_contacts
from ...physics.dynamics import crba, jacobian_body
from ...physics.kinematics import forward_kinematics
from ...physics.step import physics_step
from ..base import VecTask
from . import control as ctl
from ...utils.assets import asset_path

_FRANKA = asset_path(
    "urdf/franka_description/robots/franka_panda_gripper.urdf")

# assets/factory/yaml/factory_asset_info_franka_table.yaml
ASSET_INFO_FRANKA_TABLE = {
    "franka_hand_length": 0.0584,
    "franka_finger_length": 0.053671,
    "franka_fingerpad_length": 0.017608,
    "franka_gripper_width_max": 0.080,
    "table_depth": 0.6,
    "table_width": 1.0,
}

_FRANKA_EFFORT = np.array([87, 87, 87, 87, 12, 12, 12, 100, 100],
                          np.float32)


# re-exported for back-compat; lives with the other model-authoring helpers
from ...core.modeling import box_model_xml  # noqa: E402,F401


class FactoryBase(VecTask):
    """Franka + table scene shared by all factory envs."""

    def __init__(self, cfg=None, num_envs=128):
        super().__init__(cfg, num_envs)
        c = cfg or {}
        self.cfg_task = c
        env = c.get("env", {})
        # FactoryBase values arrive either composed into the top level
        # (defaults: [FactoryEnv*, _self_] -> cfg/task/FactoryBase.yaml)
        # or under the legacy inlined `base:` block
        base = c.get("base", {})
        base_env = {**env, **base.get("env", {})}
        base_sim = {**c.get("sim", {}), **base.get("sim", {})}
        self.asset_info = dict(ASSET_INFO_FRANKA_TABLE)
        self.table_height = base_env.get("table_height", 0.4)
        self.franka_depth = base_env.get("franka_depth", 0.5)
        self.franka_friction = base_env.get("franka_friction", 1.0)
        self.table_friction = base_env.get("table_friction", 0.3)

        sim_cfg = c.get("sim", {})
        add_damping = base_sim.get("add_damping", True)
        self.sim = T.SimParams(
            dt=base_sim.get("dt", 1.0 / 60.0),
            substeps=base_sim.get("substeps", 2),
            gravity=(0.0, 0.0, 0.0) if sim_cfg.get("disable_gravity", False)
            else (0.0, 0.0, -9.81),
            max_angular_velocity=2 * np.pi if add_damping else 64.0,
            max_linear_velocity=1.0 if add_damping else 1000.0,
            # the light nut's contact rows need more APGD sweeps to
            # converge inside the stiff franka constraint system (the
            # reference runs 16 PhysX TGS position iterations,
            # FactoryBase.yaml:physx.num_position_iterations)
            solver_iterations=base_sim.get("num_solver_iterations", 64),
            # factory manipulation needs near-rigid contact (m16 nut
            # pinched between fingerpads; the reference's SDF contacts
            # run 16 TGS position iterations at contact_offset 0.005) —
            # the MuJoCo-style compliance that helps locomotion makes
            # the grasp slip, so keep the hard-contact path here
            contact_timeconst=base_sim.get("contact_timeconst", 0.0),
            # speculative margin (PhysX contact_offset, reference
            # FactoryBase.yaml:27): thread crests are thinner than one
            # substep of travel — activate contacts before touching
            contact_margin=base_sim.get("contact_margin", 0.005),
        )
        self.dt = self.sim.dt
        self.cfg_ctrl = ctl.parse_controller_spec(c.get("ctrl", {}))

        rl = c.get("rl", {})
        self.pos_action_scale = jnp.asarray(
            rl.get("pos_action_scale", [0.1] * 3), jnp.float32)
        self.rot_action_scale = jnp.asarray(
            rl.get("rot_action_scale", [0.1] * 3), jnp.float32)
        self.force_action_scale = jnp.asarray(
            rl.get("force_action_scale", [1.0] * 3), jnp.float32)
        self.torque_action_scale = jnp.asarray(
            rl.get("torque_action_scale", [1.0] * 3), jnp.float32)
        self.clamp_rot = rl.get("clamp_rot", True)
        self.clamp_rot_thresh = rl.get("clamp_rot_thresh", 1.0e-6)
        self.max_episode_length = rl.get("max_episode_length", 100)

        self._build_scene()

    # ------------------------------------------------------------- scene
    def _env_actors(self):
        """Subclass hook: extra (prefix, model, pos, quat) actors."""
        return []

    def _build_scene(self):
        franka = load_urdf(_FRANKA, fix_base=True,
                           collapse_fixed_joints=True)
        # armature 0.01 as the reference franka asset.  The reference
        # ZEROES passive DOF stiffness/damping in manual control mode
        # (factory_base.py:464-480) — the URDF's damping=10 would swamp
        # the deliberately weak task-space controllers (Lambda_yaw~0.02).
        # Keep 0.1 as the `add_damping` rigid-body-drag equivalent.
        franka = dataclasses.replace(
            franka,
            dof_armature=np.full(franka.nv, 0.01, np.float64),
            dof_damping=np.full(franka.nv, 0.1, np.float64),
            dof_stiffness=np.zeros(franka.nv, np.float64))
        if self.cfg_ctrl["motor_ctrl_mode"] == "gym":
            kp = np.concatenate([
                np.asarray(self.cfg_ctrl["joint_prop_gains"]),
                np.asarray(self.cfg_ctrl["gripper_prop_gains"])])
            kd = np.concatenate([
                np.asarray(self.cfg_ctrl["joint_deriv_gains"]),
                np.asarray(self.cfg_ctrl["gripper_deriv_gains"])])
            names = [f"panda_joint{i}" for i in range(1, 8)] + \
                ["panda_finger_joint1", "panda_finger_joint2"]
            for nm, p, d, eff in zip(names, kp, kd, _FRANKA_EFFORT):
                franka = add_actuators(franka, [nm], trntype=T.ACT_POSITION,
                                       kp=float(p), kd=float(d),
                                       forcerange=(-float(eff), float(eff)))

        table = load_mjcf(box_model_xml(
            "table", (self.asset_info["table_depth"],
                      self.asset_info["table_width"], self.table_height),
            free=False))
        actors = [
            # reference pose: (franka_depth, 0, 0), xyzw (0,0,1,0) = yaw pi
            ("franka", franka, [self.franka_depth, 0.0, 0.0],
             [0.0, 0.0, 0.0, 1.0]),
            ("table", table, [0.0, 0.0, self.table_height * 0.5],
             [1.0, 0.0, 0.0, 0.0]),
        ] + self._env_actors()
        scene = compose_models(actors)
        # kinematic actors (pose restored post-step) must also be
        # immovable DURING the step: with real inertia, a nut resting on
        # the bolt accelerates the bolt downward all control step before
        # the teleport-back, and the nut tracks it — a steady
        # m_nut/m_bolt·g·dt ≈ 0.04 m/s downward creep THROUGH the thread
        # contacts. Huge mass/inertia makes the solver treat them as
        # static (the reference marks these actors fix_base and
        # teleports the root tensor, factory_env_nut_bolt.py).
        kin_bodies = [bi for bi, nm in enumerate(scene.body_names)
                      if any(nm.startswith(p + "/")
                             for p in self._kinematic_actors())]
        if kin_bodies:
            bm = np.array(scene.body_mass, np.float64)
            bi_ = np.array(scene.body_inertia, np.float64)
            bm[kin_bodies] = 1.0e6
            bi_[kin_bodies] = np.eye(3) * 1.0e4
            object.__setattr__(scene, "body_mass", bm)
            object.__setattr__(scene, "body_inertia", bi_)
        self.actor_slices = dict(scene.actor_slices)
        self.model = scene

        self.hand_body = scene.body_index("franka/panda_hand")
        self.lf_body = scene.body_index("franka/panda_leftfinger")
        self.rf_body = scene.body_index("franka/panda_rightfinger")

        lo, hi = [], []
        for ji in range(scene.njnt):
            if scene.jnt_type[ji] in (T.HINGE, T.SLIDE) \
                    and scene.jnt_names[ji].startswith("franka/"):
                lo.append(scene.jnt_range[ji][0])
                hi.append(scene.jnt_range[ji][1])
        self.dof_lower = jnp.asarray(np.array(lo, np.float32))
        self.dof_upper = jnp.asarray(np.array(hi, np.float32))
        self.effort_limit = jnp.asarray(_FRANKA_EFFORT)

        # rigid-body gravity disable (franka asset + kinematic actors)
        mask = np.zeros(scene.nbody, np.float32)
        for bi, nm in enumerate(scene.body_names):
            if nm.startswith("franka/") or any(
                    nm.startswith(p + "/") for p in self._nograv_actors()):
                mask[bi] = 1.0
        self._nograv_mask = jnp.asarray(mask)

        # kinematic actors: free roots whose pose is restored post-step
        self._kin_slices = [
            (self.actor_slices[p]["q"][0], self.actor_slices[p]["v"][0])
            for p in self._kinematic_actors()]

        self.ground_contacts = build_ground_contacts(scene)
        self.pair_contacts = None
        self.init_q = jnp.asarray(np.array(scene.init_qpos), jnp.float32)

    def _nograv_actors(self):
        """Actor prefixes with rigid-body gravity disabled."""
        return list(self._kinematic_actors())

    def _kinematic_actors(self):
        """Actor prefixes treated as kinematic (pose held per env)."""
        return []

    # ------------------------------------------------- fingertip kinematics
    def _fingertip_state(self, kin):
        """(pos, quat, linvel, angvel) of the fingertip midpoint
        (refresh_base_tensors, factory_base.py:249-272); single env."""
        hand_q = kin.body_quat[self.hand_body]
        finger_mid = 0.5 * (kin.body_pos[self.lf_body]
                            + kin.body_pos[self.rf_body])
        ft_pos = ctl.translate_along_local_z(
            finger_mid, hand_q, self.asset_info["franka_finger_length"])
        v6 = kin.body_vel[self.hand_body]
        linvel = v6[3:] + jnp.cross(v6[:3], ft_pos - kin.ref)
        return ft_pos, hand_q, linvel, v6[:3]

    def _fingertip_jacobian(self, kin, params):
        """(6,7) point jacobian rows [v; w] at the fingertip midpoint."""
        ft_pos, _, _, _ = self._fingertip_state(kin)
        J6 = jacobian_body(self.model, params, kin, self.hand_body, ft_pos)
        return jnp.concatenate([J6[3:], J6[:3]], axis=0)[:, :7]

    # ----------------------------------------------------------- controller
    def _targets_from_actions(self, ft_pos, ft_quat, actions, do_scale):
        """Actions -> fingertip pose (+wrench) targets
        (`_apply_actions_as_ctrl_targets`, factory_task_nut_bolt_pick.py
        :292-334); single env."""
        pos_a = actions[0:3] * (self.pos_action_scale if do_scale else 1.0)
        tgt_pos = ft_pos + pos_a
        rot_a = actions[3:6] * (self.rot_action_scale if do_scale else 1.0)
        angle = jnp.linalg.norm(rot_a)
        axis = rot_a / jnp.maximum(angle, 1e-9)
        dq = mx.quat_from_axis_angle(axis, angle)
        if self.clamp_rot:
            dq = jnp.where(angle > self.clamp_rot_thresh, dq,
                           jnp.array([1.0, 0.0, 0.0, 0.0]))
        tgt_quat = mx.quat_mul(dq, ft_quat)
        if self.cfg_ctrl["do_force_ctrl"] and actions.shape[0] >= 12:
            wrench = jnp.concatenate([
                actions[6:9] * (self.force_action_scale if do_scale
                                else 1.0),
                actions[9:12] * (self.torque_action_scale if do_scale
                                 else 1.0)])
        else:
            wrench = jnp.zeros(6, actions.dtype)
        return tgt_pos, tgt_quat, wrench

    def _franka_ctrl(self, art, kin, params, tgt_pos, tgt_quat, tgt_grip,
                     tgt_wrench, finger_force):
        """(ctrl, extra_tau) for one env (`generate_ctrl_signals`,
        factory_base.py:418-480)."""
        ft_pos, ft_quat, ft_lv, ft_av = self._fingertip_state(kin)
        J = self._fingertip_jacobian(kin, params)
        if self.cfg_ctrl["motor_ctrl_mode"] == "gym":
            tgt = ctl.compute_dof_pos_target(
                self.cfg_ctrl, art.q[:7], ft_pos, ft_quat, J,
                tgt_pos, tgt_quat, tgt_grip)
            return tgt, jnp.zeros(self.model.nv, art.q.dtype)
        mm = crba(self.model, params, kin)[:7, :7]
        tau9 = ctl.compute_dof_torque(
            self.cfg_ctrl, art.q[:9], art.qd[:9], ft_pos, ft_quat,
            ft_lv, ft_av, finger_force, J, mm, tgt_grip,
            tgt_pos, tgt_quat, tgt_wrench)
        tau9 = jnp.clip(tau9, -self.effort_limit, self.effort_limit)
        return None, jnp.zeros(self.model.nv, art.q.dtype).at[:9].set(tau9)

    def _antigrav_force_fn(self, params):
        """Rigid-body gravity disable for masked bodies; per-substep
        kin -> (nb,6) wrench about each body origin (world axes)."""
        g = jnp.asarray(self.sim.gravity)
        f_lin = -self._nograv_mask[:, None] * params.body_mass[:, None] \
            * g[None, :]

        def fn(kin):
            com_w = jax.vmap(mx.quat_rotate)(kin.body_quat,
                                             params.body_com)
            return jnp.concatenate([jnp.cross(com_w, f_lin), f_lin],
                                   axis=-1)
        return fn

    def _sim_one(self, art, params, tgt_pos, tgt_quat, tgt_grip,
                 tgt_wrench=None, finger_force=None):
        """One control step for one env with fixed fingertip targets."""
        kin = forward_kinematics(self.model, params, art.q, art.qd)
        if tgt_wrench is None:
            tgt_wrench = jnp.zeros(6, art.q.dtype)
        if finger_force is None:
            finger_force = jnp.zeros(3, art.q.dtype)
        ctrl, extra = self._franka_ctrl(art, kin, params, tgt_pos,
                                        tgt_quat, tgt_grip, tgt_wrench,
                                        finger_force)
        new_art, info = physics_step(
            self.model, self.sim, params, art, ctrl=ctrl, extra_tau=extra,
            contacts=self.ground_contacts,
            n_substeps=self.sim.substeps,
            pair_contacts=self.pair_contacts,
            force_fn=self._antigrav_force_fn(params))
        # restore kinematic actor poses (teleported fixed-base actors)
        q, qd = new_art.q, new_art.qd
        for qa, va in self._kin_slices:
            q = q.at[qa:qa + 7].set(art.q[qa:qa + 7])
            qd = qd.at[va:va + 6].set(0.0)
        return T.ArtState(q=q, qd=qd), info

    # ------------------------------------------------------------ reset IK
    def _ik_to_pose(self, q0, params, tgt_pos, tgt_quat, iters=10):
        """Damped-least-squares IK to a fingertip pose; kinematic
        replacement for `_randomize_gripper_pose`
        (factory_task_nut_bolt_pick.py:389-450), which runs the dls
        controller dynamically for `num_gripper_move_sim_steps` and then
        zeroes velocities; single env."""
        zero_v = jnp.zeros(self.model.nv, q0.dtype)

        def body(q, _):
            kin = forward_kinematics(self.model, params, q, zero_v)
            ft_pos, ft_quat, _, _ = self._fingertip_state(kin)
            J = self._fingertip_jacobian(kin, params)
            pe, ae = ctl.get_pose_error(ft_pos, ft_quat, tgt_pos, tgt_quat)
            dq = ctl.get_delta_dof_pos(jnp.concatenate([pe, ae]), "dls", J)
            arm = jnp.clip(q[:7] + dq, self.dof_lower[:7],
                           self.dof_upper[:7])
            return q.at[:7].set(arm), None

        q, _ = jax.lax.scan(body, q0, None, length=iters)
        return q
