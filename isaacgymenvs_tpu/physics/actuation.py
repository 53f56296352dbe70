"""Actuator models: ctrl (nu,) → generalized torque (nv,).

Covers the reference's drive modes: effort (`tasks/ant.py:275-279` —
``actions * gears * power_scale`` via DOF_MODE_EFFORT), position-servo PD
(`tasks/anymal.py:229-232`), and velocity drives. Gains/gears live in
PhysParams so domain randomization can batch them per env.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core import types as T


def actuation_terms(model: T.ArticulationModel, params: T.PhysParams,
                    ctrl: jnp.ndarray, q: jnp.ndarray, qd: jnp.ndarray):
    """Split actuation into (tau_explicit (nv,), d_implicit (nv,)).

    PD position/velocity drives are integrated IMPLICITLY (PhysX-style):
    their velocity-proportional part (kd, plus the h·kp Rayleigh term added
    by the caller) goes into d_implicit, making stiff drives (kp≈4000 on
    light links, `tasks/ball_balance.py:243-249`) unconditionally stable —
    an explicit kp that large diverges at 120 Hz substeps.

    tau_explicit:  MOTOR   gear·ctrl
                   POSITION kp·(gear·ctrl − q)
                   VELOCITY kd·gear·ctrl
    d_implicit:    POSITION kd (h·kp added by integrator), VELOCITY kd.
    """
    dtype = qd.dtype
    nv, nu = model.nv, model.nu
    tau = jnp.zeros(nv, dtype)
    d_kd = jnp.zeros(nv, dtype)   # coefficient of -qd (implicit)
    d_kp = jnp.zeros(nv, dtype)   # position-gain (integrator adds h·)
    if nu == 0:
        return tau, d_kd, d_kp
    # static per-actuator index/mask arrays — one batched gather/scatter
    act_jnt = np.asarray(model.act_jnt)
    act_qadr = np.asarray(model.jnt_qadr)[act_jnt]
    act_vadr = np.asarray(model.jnt_vadr)[act_jnt]
    trn = np.asarray(model.act_trntype)
    is_motor = jnp.asarray(trn == T.ACT_MOTOR, dtype)
    is_pos = jnp.asarray(trn == T.ACT_POSITION, dtype)
    is_vel = jnp.asarray(trn == T.ACT_VELOCITY, dtype)

    ctrlrange = jnp.asarray(model.act_ctrlrange, dtype)
    ctrl = jnp.clip(ctrl, ctrlrange[:, 0], ctrlrange[:, 1])
    gear = params.act_gear.astype(dtype)
    kp = params.act_kp.astype(dtype)
    kd = params.act_kd.astype(dtype)

    f_motor = gear * ctrl
    f_pos = kp * (gear * ctrl - q[act_qadr])
    f_vel = kd * gear * ctrl
    f = is_motor * f_motor + is_pos * f_pos + is_vel * f_vel
    fr = jnp.asarray(np.nan_to_num(model.act_forcerange,
                                   neginf=-3.4e38, posinf=3.4e38), dtype)
    f = jnp.clip(f, fr[:, 0], fr[:, 1])

    tau = tau.at[act_vadr].add(f)
    d_kd = d_kd.at[act_vadr].add((is_pos + is_vel) * kd)
    d_kp = d_kp.at[act_vadr].add(is_pos * kp)
    return tau, d_kd, d_kp


def actuator_torque(model: T.ArticulationModel, params: T.PhysParams,
                    ctrl: jnp.ndarray, q: jnp.ndarray,
                    qd: jnp.ndarray) -> jnp.ndarray:
    """Single-env actuation. ctrl is clipped to ctrlrange; output force to
    forcerange. Only 1-dof joints (hinge/slide) can be actuated."""
    dtype = qd.dtype
    tau = jnp.zeros(model.nv, dtype)
    if model.nu == 0:
        return tau
    ctrlrange = jnp.asarray(model.act_ctrlrange, dtype)
    ctrl = jnp.clip(ctrl, ctrlrange[:, 0], ctrlrange[:, 1])
    for a in range(model.nu):
        ji = int(model.act_jnt[a])
        qa, va = int(model.jnt_qadr[ji]), int(model.jnt_vadr[ji])
        trn = int(model.act_trntype[a])
        gear = params.act_gear[a]
        if trn == T.ACT_MOTOR:
            f = gear * ctrl[a]
        elif trn == T.ACT_POSITION:
            f = params.act_kp[a] * (gear * ctrl[a] - q[qa]) \
                - params.act_kd[a] * qd[va]
        else:  # ACT_VELOCITY
            f = params.act_kd[a] * (gear * ctrl[a] - qd[va])
        lo, hi = (float(model.act_forcerange[a][0]),
                  float(model.act_forcerange[a][1]))
        if math.isfinite(lo) or math.isfinite(hi):
            f = jnp.clip(f, lo, hi)
        tau = tau.at[va].add(f)
    return tau
