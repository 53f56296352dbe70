"""Model editing helpers: attach actuators / tweak parsed models.

URDF has no <actuator> elements; the reference configures drives via
`gym.set_actor_dof_properties` (driveMode/stiffness/damping — e.g.
`tasks/anymal.py:202-206`). The TPU analogue: rebuild the static
ArticulationModel with actuator rows before the first trace.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from . import types as T


def add_actuators(model: T.ArticulationModel, joint_names,
                  trntype: int = T.ACT_POSITION,
                  gear: float = 1.0, kp: float = 0.0, kd: float = 0.0,
                  ctrlrange=(-np.inf, np.inf),
                  forcerange=(-np.inf, np.inf)) -> T.ArticulationModel:
    """Return a copy of `model` with one actuator per named joint."""
    nu = len(joint_names)
    act_jnt = np.array([model.jnt_index(n) for n in joint_names], np.int32)
    return dataclasses.replace(
        model,
        act_jnt=act_jnt,
        act_trntype=np.full(nu, trntype, np.int32),
        act_gear=np.full(nu, gear, np.float32),
        act_ctrlrange=np.tile(np.asarray(ctrlrange, np.float32), (nu, 1)),
        act_forcerange=np.tile(np.asarray(forcerange, np.float32), (nu, 1)),
        act_kp=np.full(nu, kp, np.float32),
        act_kd=np.full(nu, kd, np.float32),
        act_names=tuple(joint_names),
    )


def hinge_joint_names(model: T.ArticulationModel) -> list:
    """Names of all 1-dof (hinge/slide) joints in tree order."""
    return [model.jnt_names[ji] for ji in range(model.njnt)
            if int(model.jnt_type[ji]) in (T.HINGE, T.SLIDE)]
