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
                          quat_to_mat, skew, spatial_force_cross,
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
    """(nb, 6, 6) world-axes spatial inertia of each body about kin.ref.

    All tensor contractions are written as broadcast-multiply-sums, NOT
    `@`/dot: XLA:TPU lowers batched 3x3 dot_generals to MXU passes padded
    to full tiles, and this block measured 715 us of the 6.8 ms Ant-4096
    step (round-3 on-chip stage profile); the elementwise form runs on
    the VPU at 123 us, numerically identical (max err 1.5e-8). The
    skew-square uses the identity cx@cx = c c^T - |c|^2 I."""
    dtype = kin.body_pos.dtype
    R = quat_to_mat(kin.body_quat)                        # (...,nb,3,3)
    I0 = params.body_inertia.astype(dtype)
    # R @ I0 @ R^T as two broadcast-sum contractions (VPU, no dot_general)
    RI = jnp.sum(R[..., :, :, None] * I0[..., None, :, :], axis=-2)
    I_world = jnp.sum(RI[..., :, None, :] * R[..., None, :, :], axis=-1)
    c = kin.com - kin.ref
    m = params.body_mass.astype(dtype)[..., None, None]
    ccT = c[..., :, None] * c[..., None, :]
    c2 = jnp.sum(c * c, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=dtype)
    cx = skew(c)
    top = jnp.concatenate([I_world - m * (ccT - c2 * eye), m * cx], axis=-1)
    bot = jnp.concatenate([-m * cx, m * jnp.broadcast_to(eye, cx.shape)],
                          axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def crba(model: T.ArticulationModel, params: T.PhysParams,
         kin: T.Kinematics, I_b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Composite-rigid-body mass matrix (nv, nv), armature included.

    Composite-inertia accumulation runs as a reversed LEVEL sweep
    (batched scatter-add per depth) instead of a per-body unrolled walk.

    I_b: optional precomputed world spatial inertias (nb,6,6) — the
    round-3 on-chip stage profile put `_spatial_inertias` at ~700 us of
    the 6.8 ms Ant-4096 step, and it was evaluated TWICE per substep
    (here and in rnea_bias); the substep loop now computes it once and
    passes it to both."""
    from .structure import TreeStructure
    nb, nv = model.nbody, model.nv
    _, mask_np, _ = dof_structure(model)
    st = TreeStructure(model)
    if I_b is None:
        I_b = _spatial_inertias(model, params, kin)       # (nb,6,6)

    # composite inertia via the static descendant mask — broadcast-sum
    # over the small body dim instead of per-level scatter-adds (TPU
    # scatters serialize; tiny dots pad MXU tiles — linalg.mv_small)
    anc = jnp.asarray(st.body_anc, I_b.dtype)             # (nb,nb)
    Ic = jnp.sum(anc[:, :, None, None] * I_b[..., None, :, :, :], axis=-3)

    Ic_dof = Ic[st.dof_body]                              # (nv,6,6)
    S = kin.dof_S                                         # (nv,6)
    # small-dim contractions as broadcast-sums (VPU; see linalg.mv_small)
    F = jnp.sum(Ic_dof * S[..., None, :], axis=-1)        # (nv,6)
    G = jnp.sum(S[:, None, :] * F[None, :, :], axis=-1)   # G[k,j]=S_k·F_j
    mask = jnp.asarray(mask_np)
    M = G * mask + (G * (mask - jnp.eye(nv, dtype=mask.dtype))).T
    M = M + jnp.diag(params.dof_armature.astype(M.dtype))
    return M


def rnea_bias(model: T.ArticulationModel, params: T.PhysParams,
              kin: T.Kinematics, qd: jnp.ndarray, gravity,
              f_ext: jnp.ndarray | None = None,
              I_b: jnp.ndarray | None = None) -> jnp.ndarray:
    """Bias force C(q, qd) − τ_ext: the generalized force such that
    M qdd = τ − C. Includes gravity, Coriolis/centrifugal and (minus)
    external spatial forces f_ext (nb, 6) about kin.ref.

    I_b: optional precomputed spatial inertias — see crba().
    """
    from .structure import TreeStructure
    nb, nv = model.nbody, model.nv
    dtype = kin.body_pos.dtype
    st = TreeStructure(model)
    if I_b is None:
        I_b = _spatial_inertias(model, params, kin)
    parent = np.asarray(model.body_parent)

    a0 = jnp.concatenate([jnp.zeros(3, dtype),
                          -jnp.asarray(gravity, dtype)])  # gravity trick

    # forward pass via the static ancestor mask: acceleration with qdd = 0
    # is a0 plus the accumulated velocity-product terms of all ancestor
    # dofs — one mask matmul (no tree sweep)
    sdot_qd = kin.dof_Sdot * qd[:, None]                  # (nv,6)
    dbm = jnp.asarray(st.dof_body_mask, dtype)            # (nv,nb)
    acc = a0[None, :] + jnp.sum(dbm[:, :, None] * sdot_qd[:, None, :],
                                axis=0)

    # net force per body: f = I a + v ×* (I v) − f_ext  (fully batched;
    # 6x6 matvecs as broadcast-sums — see linalg.mv_small)
    Iv = jnp.sum(I_b * kin.body_vel[..., None, :], axis=-1)
    f = jnp.sum(I_b * acc[..., None, :], axis=-1) \
        + spatial_force_cross(kin.body_vel, Iv)
    if f_ext is not None:
        f = f - f_ext

    # backward accumulate = descendant sum (broadcast-sum over nb)
    f = jnp.sum(jnp.asarray(st.body_anc, dtype)[:, :, None]
                * f[None, :, :], axis=1)

    # project: C_k = S_k · f_body(k)
    return jnp.einsum("vi,vi->v", kin.dof_S, f[st.dof_body])


def passive_forces(model: T.ArticulationModel, params: T.PhysParams,
                   sim: T.SimParams, q: jnp.ndarray, qd: jnp.ndarray,
                   include_limits: bool = True,
                   include_viscous: bool = True) -> jnp.ndarray:
    """Joint damping, springs, limit penalties, dry friction → τ (nv,).

    include_limits=False when the impulse solver handles limits as
    unilateral constraint rows (the default path). include_viscous=False
    when the integrator applies joint damping implicitly (step.py)."""
    from .structure import TreeStructure
    dtype = qd.dtype
    st = TreeStructure(model)
    tau = jnp.zeros_like(qd)
    if include_viscous:
        tau = -params.dof_damping.astype(dtype) * qd
    # dry friction (smooth): −frictionloss · tanh(qd / eps)
    tau = tau - params.dof_frictionloss.astype(dtype) * jnp.tanh(qd / 0.05)

    # joint springs & limits act on 1-dof joints only (batched gather)
    nv = model.nv
    qpos_of_dof = q[st.dof_qpos_idx] * jnp.asarray(st.dof_is_1d, dtype)
    limited = np.zeros(nv, dtype=bool)
    lo = np.zeros(nv, dtype=np.float32)
    hi = np.zeros(nv, dtype=np.float32)
    for k in range(nv):
        ji = int(model.dof_jnt[k])
        if int(model.jnt_type[ji]) in (T.HINGE, T.SLIDE, T.SCREW):
            limited[k] = bool(model.jnt_limited[ji])
            lo[k], hi[k] = model.jnt_range[ji]

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
    """q ← q ⊕ h v (quaternion exponential for free/ball joints).

    Batched: one scatter for all 1-dof joints, one batched quaternion
    update for all free roots."""
    from .structure import TreeStructure
    st = TreeStructure(model)
    if st.has_ball:
        return _integrate_position_unrolled(model, q, qd_new, dt)
    q_new = q
    if len(st.int1_qadr):
        q_new = q_new.at[st.int1_qadr].add(dt * qd_new[st.int1_vadr])
    if st.n_free:
        qa, va = st.free_qadr, st.free_vadr
        pos_idx = np.stack([qa, qa + 1, qa + 2], -1)          # (nf,3)
        quat_idx = np.stack([qa + 3, qa + 4, qa + 5, qa + 6], -1)
        vlin_idx = np.stack([va, va + 1, va + 2], -1)
        vang_idx = np.stack([va + 3, va + 4, va + 5], -1)
        q_new = q_new.at[pos_idx].add(dt * qd_new[vlin_idx])
        quat = quat_integrate(q[quat_idx], qd_new[vang_idx], dt)
        q_new = q_new.at[quat_idx].set(quat)
    return q_new


def _integrate_position_unrolled(model, q, qd_new, dt):
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
