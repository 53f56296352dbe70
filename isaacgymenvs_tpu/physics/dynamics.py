"""Batched rigid-body dynamics: world-frame CRBA + RNEA + integration.

Replaces the reference's native PhysX step (`gym.simulate`,
`vec_task.py:332-339`) and its jacobian/mass-matrix tensors
(`tasks/factory/factory_base.py:163-249`).

TPU-first structure: everything is written single-env and vmapped. The
mass matrix is assembled as ONE (nv,6)x(6,nv) matmul masked by a static
ancestor matrix — batched over envs it lands on the MXU; the composite-
inertia accumulation and tree walks unroll over the static model at trace
time.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import types as T
from ..core.maths import (quat_integrate, quat_mul, quat_normalize,
                          quat_to_mat, spatial_force_cross,
                          spatial_motion_cross)


@functools.lru_cache(maxsize=None)
def dof_structure(model: T.ArticulationModel):
    """Static (numpy) dof ancestry: returns (dof_parent, ancestor_mask)
    where ancestor_mask[k, j] = 1 if dof k is an ancestor-or-self of dof j.
    """
    nb, nv = model.nbody, model.nv
    jnts_of = [[] for _ in range(nb)]
    for ji in range(model.njnt):
        jnts_of[int(model.jnt_body[ji])].append(ji)

    last_dof = [-1] * nb  # last dof index at-or-above each body
    dof_parent = np.full(nv, -1, dtype=np.int32)
    for i in range(nb):
        p = int(model.body_parent[i])
        prev = last_dof[p] if p >= 0 else -1
        for ji in jnts_of[i]:
            va = int(model.jnt_vadr[ji])
            for k in range(va, va + T.JOINT_NV[int(model.jnt_type[ji])]):
                dof_parent[k] = prev
                prev = k
        last_dof[i] = prev

    mask = np.zeros((nv, nv), dtype=np.float32)
    for j in range(nv):
        k = j
        while k >= 0:
            mask[k, j] = 1.0
            k = dof_parent[k]
    return dof_parent, mask, tuple(last_dof)


def _spatial_inertias(model, params, kin):
    """(nb, 6, 6) world-axes spatial inertia of each body about kin.ref."""
    dtype = kin.body_pos.dtype
    R = quat_to_mat(kin.body_quat)                        # (nb,3,3)
    I_world = R @ params.body_inertia.astype(dtype) @ jnp.swapaxes(R, -1, -2)
    from ..core.maths import spatial_inertia
    return spatial_inertia(params.body_mass.astype(dtype),
                           kin.com - kin.ref, I_world)


def crba(model: T.ArticulationModel, params: T.PhysParams,
         kin: T.Kinematics) -> jnp.ndarray:
    """Composite-rigid-body mass matrix (nv, nv), armature included."""
    nb, nv = model.nbody, model.nv
    _, mask_np, _ = dof_structure(model)
    I_b = _spatial_inertias(model, params, kin)           # (nb,6,6)

    # composite inertias: reversed static tree walk
    Ic = [I_b[i] for i in range(nb)]
    for i in range(nb - 1, -1, -1):
        p = int(model.body_parent[i])
        if p >= 0:
            Ic[p] = Ic[p] + Ic[i]

    # F[j] = Ic[body(j)] @ S[j]
    Ic_dof = jnp.stack([Ic[int(model.jnt_body[int(model.dof_jnt[k])])]
                        for k in range(nv)])              # (nv,6,6)
    S = kin.dof_S                                         # (nv,6)
    F = jnp.einsum("vij,vj->vi", Ic_dof, S)               # (nv,6)
    G = S @ F.T                                           # (nv,nv): G[k,j]=S_k·F_j
    mask = jnp.asarray(mask_np)
    M = G * mask + (G * (mask - jnp.eye(nv, dtype=mask.dtype))).T
    M = M + jnp.diag(params.dof_armature.astype(M.dtype))
    return M


def rnea_bias(model: T.ArticulationModel, params: T.PhysParams,
              kin: T.Kinematics, qd: jnp.ndarray, gravity,
              f_ext: jnp.ndarray | None = None) -> jnp.ndarray:
    """Bias force C(q, qd) − τ_ext: the generalized force such that
    M qdd = τ − C. Includes gravity, Coriolis/centrifugal and (minus)
    external spatial forces f_ext (nb, 6) about kin.ref.
    """
    nb, nv = model.nbody, model.nv
    dtype = kin.body_pos.dtype
    I_b = _spatial_inertias(model, params, kin)

    jnts_of = [[] for _ in range(nb)]
    for ji in range(model.njnt):
        jnts_of[int(model.jnt_body[ji])].append(ji)

    a0 = jnp.concatenate([jnp.zeros(3, dtype),
                          -jnp.asarray(gravity, dtype)])  # gravity trick

    # forward pass: accelerations with qdd = 0
    body_acc = [None] * nb
    for i in range(nb):
        p = int(model.body_parent[i])
        a = body_acc[p] if p >= 0 else a0
        for ji in jnts_of[i]:
            va = int(model.jnt_vadr[ji])
            for k in range(va, va + T.JOINT_NV[int(model.jnt_type[ji])]):
                a = a + kin.dof_Sdot[k] * qd[k]
        body_acc[i] = a

    # net force per body: f = I a + v ×* (I v) − f_ext
    f = []
    for i in range(nb):
        Iv = I_b[i] @ kin.body_vel[i]
        fi = I_b[i] @ body_acc[i] + spatial_force_cross(kin.body_vel[i], Iv)
        if f_ext is not None:
            fi = fi - f_ext[i]
        f.append(fi)

    # backward accumulate
    for i in range(nb - 1, -1, -1):
        p = int(model.body_parent[i])
        if p >= 0:
            f[p] = f[p] + f[i]

    # project: C_k = S_k · f_body(k)
    f_dof = jnp.stack([f[int(model.jnt_body[int(model.dof_jnt[k])])]
                       for k in range(nv)])
    return jnp.einsum("vi,vi->v", kin.dof_S, f_dof)


def passive_forces(model: T.ArticulationModel, params: T.PhysParams,
                   sim: T.SimParams, q: jnp.ndarray, qd: jnp.ndarray,
                   include_limits: bool = True,
                   include_viscous: bool = True) -> jnp.ndarray:
    """Joint damping, springs, limit penalties, dry friction → τ (nv,).

    include_limits=False when the impulse solver handles limits as
    unilateral constraint rows (the default path). include_viscous=False
    when the integrator applies joint damping implicitly (step.py)."""
    dtype = qd.dtype
    tau = jnp.zeros_like(qd)
    if include_viscous:
        tau = -params.dof_damping.astype(dtype) * qd
    # dry friction (smooth): −frictionloss · tanh(qd / eps)
    tau = tau - params.dof_frictionloss.astype(dtype) * jnp.tanh(qd / 0.05)

    # joint springs & limits act on 1-dof joints only
    nv = model.nv
    qpos_of_dof = jnp.zeros(nv, dtype)
    limited = np.zeros(nv, dtype=bool)
    lo = np.zeros(nv, dtype=np.float32)
    hi = np.zeros(nv, dtype=np.float32)
    col = []
    for k in range(nv):
        ji = int(model.dof_jnt[k])
        jt = int(model.jnt_type[ji])
        if jt in (T.HINGE, T.SLIDE):
            qa = int(model.jnt_qadr[ji])
            col.append(q[qa])
            limited[k] = bool(model.jnt_limited[ji])
            lo[k], hi[k] = model.jnt_range[ji]
        else:
            col.append(jnp.zeros((), dtype))
    qpos_of_dof = jnp.stack(col)

    # springs toward 0 (MJCF joint stiffness, springref=0)
    tau = tau - params.dof_stiffness.astype(dtype) * qpos_of_dof

    if include_limits and limited.any():
        k_lim = sim.limit_stiffness
        d_lim = sim.limit_damping_ratio * 2.0 * jnp.sqrt(k_lim)
        below = jnp.maximum(jnp.asarray(lo) - qpos_of_dof, 0.0)
        above = jnp.maximum(qpos_of_dof - jnp.asarray(hi), 0.0)
        viol = (below > 0) | (above > 0)
        tau_lim = k_lim * (below - above) - jnp.where(viol, d_lim * qd, 0.0)
        tau = tau + jnp.where(jnp.asarray(limited), tau_lim, 0.0)
    return tau


def forward_dynamics(model: T.ArticulationModel, params: T.PhysParams,
                     kin: T.Kinematics, qd: jnp.ndarray, tau: jnp.ndarray,
                     gravity, f_ext=None) -> jnp.ndarray:
    """qdd = M⁻¹ (τ − C)."""
    M = crba(model, params, kin)
    C = rnea_bias(model, params, kin, qd, gravity, f_ext)
    L = jnp.linalg.cholesky(M)
    return jax.scipy.linalg.cho_solve((L, True), tau - C)


def integrate(model: T.ArticulationModel, q: jnp.ndarray, qd: jnp.ndarray,
              qdd: jnp.ndarray, dt) -> tuple:
    """Semi-implicit Euler (PhysX-style): v ← v + h a; q ← q ⊕ h v."""
    qd_new = qd + dt * qdd
    return integrate_position(model, q, qd_new, dt), qd_new


def integrate_position(model: T.ArticulationModel, q: jnp.ndarray,
                       qd_new: jnp.ndarray, dt) -> jnp.ndarray:
    """q ← q ⊕ h v (quaternion exponential for free/ball joints)."""
    q_new = q
    for ji in range(model.njnt):
        jt = int(model.jnt_type[ji])
        qa, va = int(model.jnt_qadr[ji]), int(model.jnt_vadr[ji])
        if jt == T.FREE:
            pos = q[qa:qa + 3] + dt * qd_new[va:va + 3]
            quat = quat_integrate(q[qa + 3:qa + 7], qd_new[va + 3:va + 6], dt)
            q_new = q_new.at[qa:qa + 3].set(pos).at[qa + 3:qa + 7].set(quat)
        elif jt == T.BALL:
            quat = quat_integrate(q[qa:qa + 4], qd_new[va:va + 3], dt)
            q_new = q_new.at[qa:qa + 4].set(quat)
        else:
            q_new = q_new.at[qa].set(q[qa] + dt * qd_new[va])
    return q_new


def mass_matrix(model, params, q):
    """Public helper (OSC / factory controllers): M(q) for a single env."""
    from .kinematics import forward_kinematics
    kin = forward_kinematics(model, params, q, jnp.zeros(model.nv, q.dtype))
    return crba(model, params, kin)


def jacobian_body(model, params, kin, body_idx: int, point_w):
    """6×nv world jacobian of a point on a body: rows [ω; v_point].

    Replaces `gym.acquire_jacobian_tensor` (factory_base.py:195)."""
    _, mask_np, last_dof = dof_structure(model)
    # dofs affecting body = ancestors of body's last dof
    nv = model.nv
    ld = last_dof[body_idx]
    col_mask = jnp.asarray(mask_np[:, ld] if ld >= 0 else np.zeros(nv),
                           kin.body_pos.dtype)
    S = kin.dof_S                                          # (nv,6) about ref
    omega = S[:, :3]
    v_pt = S[:, 3:] + jnp.cross(omega, (point_w - kin.ref)[None, :])
    J = jnp.concatenate([omega, v_pt], axis=-1) * col_mask[:, None]
    return J.T                                             # (6, nv)
