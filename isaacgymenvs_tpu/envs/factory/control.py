"""Factory low-level controllers (reference `factory/factory_control.py`).

Eight controller modes from `parse_controller_spec`
(factory_base.py:273-417) and the pose/IK/impedance math of
factory_control.py:40-330, re-written as pure single-env JAX functions
(the caller vmaps over envs). Quaternions are wxyz (framework
convention; the reference uses xyzw).

Wrench/pose-error layout matches the reference: `[linear(3); angular(3)]`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...core import maths as mx
from ...physics.linalg import spd_inverse


# --------------------------------------------------------------- rotations
def axis_angle_from_quat(q, eps: float = 1e-6):
    """Rotation-vector (axis*angle) from a wxyz quaternion
    (factory_control.py:368-381); shortest arc via sin-magnitude form."""
    mag = jnp.linalg.norm(q[1:], axis=-1)
    half = jnp.arctan2(mag, q[0])
    angle = 2.0 * half
    sin_half2 = jnp.sin(half) ** 2
    small = jnp.abs(angle) < eps
    scale = jnp.where(small, 1.0 + angle ** 2 / 12.0,
                      angle / jnp.sqrt(jnp.maximum(sin_half2, eps ** 2)))
    return q[1:] * scale


def translate_along_local_z(pos, quat, offset):
    """Point at `offset` along the body z-axis (factory_control.py:345-355)."""
    return pos + mx.quat_rotate(quat, jnp.array([0.0, 0.0, 1.0])) * offset


def get_pose_error(pos, quat, target_pos, target_quat,
                   jacobian_type: str = "geometric",
                   rot_error_type: str = "axis_angle"):
    """Task-space pose error (factory_control.py:178-211).

    geometric: difference quaternion -> axis-angle; analytic: difference
    of rotation vectors.
    """
    pos_error = target_pos - pos
    if jacobian_type == "geometric":
        quat_error = mx.quat_mul(target_quat, mx.quat_inv(quat))
        aa_error = axis_angle_from_quat(quat_error)
    elif jacobian_type == "analytic":
        quat_error = mx.quat_mul(target_quat, mx.quat_inv(quat))
        aa_error = axis_angle_from_quat(target_quat) \
            - axis_angle_from_quat(quat)
    else:
        raise ValueError(jacobian_type)
    if rot_error_type == "quat":
        return pos_error, quat_error
    return pos_error, aa_error


# ---------------------------------------------------------------------- IK
def get_delta_dof_pos(delta_pose, ik_method: str, jacobian):
    """Delta arm DOF from a 6-D pose error (factory_control.py:232-267).

    jacobian: (6, 7) point jacobian rows [v; w].  Methods: pinv
    (pseudoinverse), trans (transpose), dls (damped least squares,
    lambda=0.1), svd (adaptive SVD with 1e-5 cutoff).
    """
    J, d = jacobian, delta_pose
    if ik_method == "pinv":
        JJt = J @ J.T
        return J.T @ (spd_inverse(JJt + 1e-10 * jnp.eye(6)) @ d)
    if ik_method == "trans":
        return J.T @ d
    if ik_method == "dls":
        lam = 0.1
        return J.T @ (spd_inverse(J @ J.T + lam ** 2 * jnp.eye(6)) @ d)
    if ik_method == "svd":
        U, S, Vh = jnp.linalg.svd(J, full_matrices=False)
        S_inv = jnp.where(S > 1.0e-5, 1.0 / jnp.maximum(S, 1e-12), 0.0)
        return Vh.T @ (S_inv * (U.T @ d))
    raise ValueError(ik_method)


def apply_task_space_gains(delta_pose, linvel, angvel, kp, kd):
    """PD in task space -> 6-D wrench (factory_control.py:270-289)."""
    return jnp.concatenate([
        kp[:3] * delta_pose[:3] + kd[:3] * (0.0 - linvel),
        kp[3:] * delta_pose[3:] + kd[3:] * (0.0 - angvel)])


# -------------------------------------------------------------- controllers
def compute_dof_pos_target(cfg_ctrl, arm_dof_pos, ft_pos, ft_quat, jacobian,
                           target_ft_pos, target_ft_quat, target_gripper):
    """Franka (9,) DOF position targets via IK (factory_control.py:40-70)."""
    pe, ae = get_pose_error(ft_pos, ft_quat, target_ft_pos, target_ft_quat,
                            cfg_ctrl["jacobian_type"], "axis_angle")
    delta = get_delta_dof_pos(jnp.concatenate([pe, ae]),
                              cfg_ctrl["ik_method"], jacobian)
    return jnp.concatenate([arm_dof_pos + delta,
                            jnp.broadcast_to(target_gripper, (2,))])


def compute_dof_torque(cfg_ctrl, dof_pos, dof_vel, ft_pos, ft_quat,
                       ft_linvel, ft_angvel, finger_force, jacobian,
                       arm_mass_matrix, target_gripper,
                       target_ft_pos, target_ft_quat,
                       target_wrench=None):
    """Franka (9,) DOF torques (factory_control.py:73-175).

    Joint-space gains (IK-mapped PD, optional inertial compensation) or
    task-space gains (impedance / operational-space / force / hybrid).
    finger_force: (3,) summed net contact force on the two fingers, used
    by closed-loop force control.
    """
    J = jacobian
    if cfg_ctrl["gain_space"] == "joint":
        pe, ae = get_pose_error(ft_pos, ft_quat, target_ft_pos,
                                target_ft_quat, cfg_ctrl["jacobian_type"],
                                "axis_angle")
        delta = get_delta_dof_pos(jnp.concatenate([pe, ae]),
                                  cfg_ctrl["ik_method"], J)
        tau_arm = cfg_ctrl["joint_prop_gains"] * delta \
            + cfg_ctrl["joint_deriv_gains"] * (0.0 - dof_vel[:7])
        if cfg_ctrl["do_inertial_comp"]:
            tau_arm = arm_mass_matrix @ tau_arm
    else:  # task-space gains
        wrench = jnp.zeros(6, dof_pos.dtype)
        if cfg_ctrl["do_motion_ctrl"]:
            pe, ae = get_pose_error(ft_pos, ft_quat, target_ft_pos,
                                    target_ft_quat,
                                    cfg_ctrl["jacobian_type"], "axis_angle")
            w_motion = apply_task_space_gains(
                jnp.concatenate([pe, ae]), ft_linvel, ft_angvel,
                cfg_ctrl["task_prop_gains"], cfg_ctrl["task_deriv_gains"])
            if cfg_ctrl["do_inertial_comp"]:
                # Lambda = (J M^-1 J^T)^-1 (ETH RD eq. 3.86)
                m_inv = spd_inverse(arm_mass_matrix)
                lam = spd_inverse(J @ m_inv @ J.T + 1e-6 * jnp.eye(6))
                w_motion = lam @ w_motion
            wrench = wrench + cfg_ctrl["motion_ctrl_axes"] * w_motion
        if cfg_ctrl["do_force_ctrl"]:
            w_force = target_wrench
            if cfg_ctrl["force_ctrl_method"] == "closed":
                # measured fingertip wrench ~ -(net finger contact force)
                measured = jnp.concatenate(
                    [finger_force, jnp.zeros(3, dof_pos.dtype)])
                w_force = w_force + cfg_ctrl["wrench_prop_gains"] * (
                    target_wrench + measured)
            wrench = wrench + cfg_ctrl["force_ctrl_axes"] * w_force
        tau_arm = J.T @ wrench

    tau_grip = cfg_ctrl["gripper_prop_gains"] * (
        target_gripper - dof_pos[7:9]) \
        + cfg_ctrl["gripper_deriv_gains"] * (0.0 - dof_vel[7:9])
    return jnp.clip(jnp.concatenate([tau_arm, tau_grip]), -100.0, 100.0)


# ------------------------------------------------------------ spec parsing
def parse_controller_spec(ctrl_cfg: dict, dtype=jnp.float32) -> dict:
    """Controller name -> low-level flags + gain arrays
    (factory_base.py:273-417).  Static python flags select the traced
    branch at compile time; gains are (7,)/(6,)/(2,) arrays shared
    across envs."""
    ctrl_type = ctrl_cfg.get("ctrl_type", "joint_space_id")
    allc = ctrl_cfg.get("all", {})

    def arr(x):
        return jnp.asarray(np.array(x, np.float32), dtype)

    cfg = {
        "ctrl_type": ctrl_type,
        "jacobian_type": allc.get("jacobian_type", "geometric"),
        "gripper_prop_gains": arr(allc.get("gripper_prop_gains", [50, 50])),
        "gripper_deriv_gains": arr(allc.get("gripper_deriv_gains", [2, 2])),
        "motor_ctrl_mode": "manual", "gain_space": None, "ik_method": None,
        "joint_prop_gains": None, "joint_deriv_gains": None,
        "do_motion_ctrl": False, "task_prop_gains": None,
        "task_deriv_gains": None, "do_inertial_comp": False,
        "motion_ctrl_axes": None, "do_force_ctrl": False,
        "force_ctrl_method": None, "wrench_prop_gains": None,
        "force_ctrl_axes": None,
    }
    sub = ctrl_cfg.get(ctrl_type, {})
    if ctrl_type == "gym_default":
        cfg.update(motor_ctrl_mode="gym", gain_space="joint",
                   ik_method=sub.get("ik_method", "dls"),
                   joint_prop_gains=arr(sub.get("joint_prop_gains", [40] * 7)),
                   joint_deriv_gains=arr(sub.get("joint_deriv_gains",
                                                 [8] * 7)),
                   gripper_prop_gains=arr(sub.get("gripper_prop_gains",
                                                  [500, 500])),
                   gripper_deriv_gains=arr(sub.get("gripper_deriv_gains",
                                                   [20, 20])))
    elif ctrl_type in ("joint_space_ik", "joint_space_id"):
        cfg.update(gain_space="joint", ik_method=sub.get("ik_method", "dls"),
                   joint_prop_gains=arr(sub.get("joint_prop_gains")),
                   joint_deriv_gains=arr(sub.get("joint_deriv_gains")),
                   do_inertial_comp=(ctrl_type == "joint_space_id"))
    elif ctrl_type in ("task_space_impedance", "operational_space_motion"):
        cfg.update(gain_space="task", do_motion_ctrl=True,
                   task_prop_gains=arr(sub.get("task_prop_gains")),
                   task_deriv_gains=arr(sub.get("task_deriv_gains")),
                   motion_ctrl_axes=arr(sub.get("motion_ctrl_axes",
                                                [1] * 6)),
                   do_inertial_comp=(
                       ctrl_type == "operational_space_motion"))
    elif ctrl_type in ("open_loop_force", "closed_loop_force"):
        cfg.update(gain_space="task", do_force_ctrl=True,
                   force_ctrl_method=("open" if ctrl_type == "open_loop_force"
                                      else "closed"),
                   force_ctrl_axes=arr(sub.get("force_ctrl_axes",
                                               [0, 0, 1, 0, 0, 0])))
        if ctrl_type == "closed_loop_force":
            cfg["wrench_prop_gains"] = arr(sub.get("wrench_prop_gains",
                                                   [0.1] * 6))
    elif ctrl_type == "hybrid_force_motion":
        cfg.update(gain_space="task", do_motion_ctrl=True,
                   do_inertial_comp=True, do_force_ctrl=True,
                   force_ctrl_method="closed",
                   task_prop_gains=arr(sub.get("task_prop_gains")),
                   task_deriv_gains=arr(sub.get("task_deriv_gains")),
                   motion_ctrl_axes=arr(sub.get("motion_ctrl_axes")),
                   wrench_prop_gains=arr(sub.get("wrench_prop_gains")),
                   force_ctrl_axes=arr(sub.get("force_ctrl_axes")))
    else:
        raise ValueError(f"unknown ctrl_type: {ctrl_type}")
    return cfg
