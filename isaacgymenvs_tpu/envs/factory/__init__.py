"""Factory subsystem: contact-rich manipulation (nut-bolt, insertion, gears).

TPU-native re-design of the reference's `tasks/factory/` package
(factory_base.py / factory_env_*.py / factory_task_*.py, ~4.3k LoC, see
docs/factory.md). The three-level hierarchy (base -> env -> task) is kept;
the PhysX SDF mesh collisions are replaced by primitive approximations
(hex nut -> box, bolt -> box stack, thread engagement -> screw joint),
documented per task.
"""

from .control import (axis_angle_from_quat, compute_dof_pos_target,
                      compute_dof_torque, get_delta_dof_pos, get_pose_error,
                      parse_controller_spec, translate_along_local_z)

__all__ = [
    "axis_angle_from_quat", "compute_dof_pos_target", "compute_dof_torque",
    "get_delta_dof_pos", "get_pose_error", "parse_controller_spec",
    "translate_along_local_z",
]
