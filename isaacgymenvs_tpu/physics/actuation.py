"""Actuator models: ctrl (nu,) → generalized torque (nv,).

Covers the reference's drive modes: effort (`tasks/ant.py:275-279` —
``actions * gears * power_scale`` via DOF_MODE_EFFORT), position-servo PD
(`tasks/anymal.py:229-232`), and velocity drives. Gains/gears live in
PhysParams so domain randomization can batch them per env.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

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
    tau = jnp.zeros(model.nv, dtype)
    d_kd = jnp.zeros(model.nv, dtype)   # coefficient of -qd (implicit)
    d_kp = jnp.zeros(model.nv, dtype)   # position-gain (integrator adds h·)
    if model.nu == 0:
        return tau, d_kd, d_kp
    ctrlrange = jnp.asarray(model.act_ctrlrange, dtype)
    ctrl = jnp.clip(ctrl, ctrlrange[:, 0], ctrlrange[:, 1])
    for a in range(model.nu):
        ji = int(model.act_jnt[a])
        qa, va = int(model.jnt_qadr[ji]), int(model.jnt_vadr[ji])
        trn = int(model.act_trntype[a])
        gear = params.act_gear[a]
        if trn == T.ACT_MOTOR:
            f = gear * ctrl[a]
            lo, hi = (float(model.act_forcerange[a][0]),
                      float(model.act_forcerange[a][1]))
            if math.isfinite(lo) or math.isfinite(hi):
                f = jnp.clip(f, lo, hi)
            tau = tau.at[va].add(f)
        elif trn == T.ACT_POSITION:
            f = params.act_kp[a] * (gear * ctrl[a] - q[qa])
            lo, hi = (float(model.act_forcerange[a][0]),
                      float(model.act_forcerange[a][1]))
            if math.isfinite(lo) or math.isfinite(hi):
                f = jnp.clip(f, lo, hi)  # effort limit on the explicit part
            tau = tau.at[va].add(f)
            d_kd = d_kd.at[va].add(params.act_kd[a])
            d_kp = d_kp.at[va].add(params.act_kp[a])
        else:  # ACT_VELOCITY
            tau = tau.at[va].add(params.act_kd[a] * gear * ctrl[a])
            d_kd = d_kd.at[va].add(params.act_kd[a])
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
