"""Forward kinematics + velocity propagation (single env; vmap over envs).

World-frame spatial algebra about the world origin, angular-first [ω; v_o].
The kinematic tree is static (ArticulationModel, numpy) so the body loop
unrolls at trace time; every op below becomes a `[num_envs, …]` vector op
after vmap — the TPU replacement for the reference's native
`gym.refresh_*_tensor` views (`tasks/base/vec_task.py:254-277`).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import types as T
from ..core.maths import (quat_mul, quat_rotate, quat_from_axis_angle)


def forward_kinematics(model: T.ArticulationModel, params: T.PhysParams,
                       q: jnp.ndarray, qd: jnp.ndarray) -> T.Kinematics:
    """Compute body poses, spatial velocities, COMs and dof motion subspaces.

    q: (nq,), qd: (nv,) single-env. All outputs world-frame.
    """
    nb, nv = model.nbody, model.nv
    dtype = q.dtype

    body_pos = [None] * nb
    body_quat = [None] * nb

    # joints grouped by body (static python structure)
    jnts_of = [[] for _ in range(nb)]
    for ji in range(model.njnt):
        jnts_of[int(model.jnt_body[ji])].append(ji)

    # ---- pose pass -------------------------------------------------------
    for i in range(nb):
        p = int(model.body_parent[i])
        if p < 0:
            pos = jnp.asarray(model.body_pos[i], dtype)
            quat = jnp.asarray(model.body_quat[i], dtype)
        else:
            off_p = jnp.asarray(model.body_pos[i], dtype)
            off_q = jnp.asarray(model.body_quat[i], dtype)
            pos = body_pos[p] + quat_rotate(body_quat[p], off_p)
            quat = quat_mul(body_quat[p], off_q)
        for ji in jnts_of[i]:
            jt = int(model.jnt_type[ji])
            qa = int(model.jnt_qadr[ji])
            if jt == T.FREE:
                pos = q[qa:qa + 3]
                quat = q[qa + 3:qa + 7]
            elif jt == T.HINGE:
                axis = jnp.asarray(model.jnt_axis[ji], dtype)
                anchor = jnp.asarray(model.jnt_pos[ji], dtype)
                rq = quat_from_axis_angle(axis, q[qa])
                new_quat = quat_mul(quat, rq)
                pos = pos + quat_rotate(quat, anchor) - quat_rotate(new_quat, anchor)
                quat = new_quat
            elif jt == T.SLIDE:
                axis = jnp.asarray(model.jnt_axis[ji], dtype)
                pos = pos + quat_rotate(quat, axis) * q[qa]
            elif jt == T.BALL:
                bq = q[qa:qa + 4]
                anchor = jnp.asarray(model.jnt_pos[ji], dtype)
                new_quat = quat_mul(quat, bq)
                pos = pos + quat_rotate(quat, anchor) - quat_rotate(new_quat, anchor)
                quat = new_quat
        body_pos[i] = pos
        body_quat[i] = quat

    # ---- spatial reference point ------------------------------------------
    # All spatial vectors below are expressed about `ref` (the first body's
    # position), NOT the world origin: about-origin algebra cancels
    # catastrophically once bodies are far from the origin (lever arms grow
    # as |p|, the generalized inertia emerges from O(|p|²) term differences)
    # — fatal in bf16/TPU-default matmul precision, and wrong even in f32
    # for locomotion tasks that walk hundreds of meters. The dynamics are
    # invariant to this choice, so gradients through `ref` cancel exactly;
    # stop_gradient removes them for free.
    import jax
    ref = jax.lax.stop_gradient(body_pos[0])

    # ---- motion subspaces (about ref, from FINAL body poses) --------------
    S = [None] * nv  # each (6,)
    for ji in range(model.njnt):
        i = int(model.jnt_body[ji])
        jt = int(model.jnt_type[ji])
        va = int(model.jnt_vadr[ji])
        pos, quat = body_pos[i], body_quat[i]
        if jt == T.FREE:
            zero = jnp.zeros(3, dtype)
            for k in range(3):
                e = jnp.zeros(3, dtype).at[k].set(1.0)
                S[va + k] = jnp.concatenate([zero, e])          # translation
            for k in range(3):
                e = jnp.zeros(3, dtype).at[k].set(1.0)
                S[va + 3 + k] = jnp.concatenate([e, jnp.cross(pos - ref, e)])  # rotation about body origin
        elif jt == T.HINGE:
            a_w = quat_rotate(quat, jnp.asarray(model.jnt_axis[ji], dtype))
            anchor_w = (pos - ref) + quat_rotate(
                quat, jnp.asarray(model.jnt_pos[ji], dtype))
            S[va] = jnp.concatenate([a_w, jnp.cross(anchor_w, a_w)])
        elif jt == T.SLIDE:
            a_w = quat_rotate(quat, jnp.asarray(model.jnt_axis[ji], dtype))
            S[va] = jnp.concatenate([jnp.zeros(3, dtype), a_w])
        elif jt == T.BALL:
            anchor_w = (pos - ref) + quat_rotate(
                quat, jnp.asarray(model.jnt_pos[ji], dtype))
            for k in range(3):
                e = quat_rotate(quat, jnp.zeros(3, dtype).at[k].set(1.0))
                S[va + k] = jnp.concatenate([e, jnp.cross(anchor_w, e)])

    # ---- velocity pass (also S time-derivative bias, Featherstone) -------
    # body spatial velocity V_i = V_parent + Σ S_k qd_k; the per-dof
    # velocity-product term uses the PARTIAL velocity accumulated before the
    # dof (exact — matches MuJoCo mj_comVel / Featherstone ṡ = v × s).
    from ..core.maths import spatial_motion_cross

    body_vel = [None] * nb
    Sdot = [None] * nv
    for i in range(nb):
        p = int(model.body_parent[i])
        v = body_vel[p] if p >= 0 else jnp.zeros(6, dtype)
        for ji in jnts_of[i]:
            va = int(model.jnt_vadr[ji])
            nvj = T.JOINT_NV[int(model.jnt_type[ji])]
            for k in range(va, va + nvj):
                Sdot[k] = spatial_motion_cross(v, S[k])
                v = v + S[k] * qd[k]
        body_vel[i] = v

    # ---- COM positions ----------------------------------------------------
    com = [body_pos[i] + quat_rotate(body_quat[i],
                                     params.body_com[i].astype(dtype))
           for i in range(nb)]

    return T.Kinematics(
        body_pos=jnp.stack(body_pos),
        body_quat=jnp.stack(body_quat),
        body_vel=jnp.stack(body_vel),
        com=jnp.stack(com),
        dof_S=jnp.stack(S) if nv else jnp.zeros((0, 6), dtype),
        dof_Sdot=jnp.stack(Sdot) if nv else jnp.zeros((0, 6), dtype),
        ref=ref,
    )


def body_point_velocity(kin: T.Kinematics, body_idx: int, point_w):
    """Velocity of a world-space point rigidly attached to a body."""
    v6 = kin.body_vel[body_idx]
    return v6[3:] + jnp.cross(v6[:3], point_w - kin.ref)
