"""The simulator step: substeps scanned under jit, single env (vmap over envs).

This is the TPU-native replacement for the reference's hot loop
(`vec_task.py:332-339`: ``for i in range(control_freq_inv): gym.simulate``):
one pure function ``(params, state, ctrl) → (state, info)`` whose substep
loop is a `lax.scan`, traced once and fused by XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core import types as T
from .actuation import actuation_terms
from .collide import (ContactSet, PairSet, build_ground_contacts,
                      ground_contact_forces, pair_contact_geometry)
from .dynamics import (_spatial_inertias, crba, integrate_position,
                       passive_forces, rnea_bias)
from .kinematics import forward_kinematics
from .solver import solve_constraints


import functools


@functools.lru_cache(maxsize=None)
def _vmax_np(model: T.ArticulationModel, max_ang: float, max_lin: float):
    """(nv,) per-dof velocity bound: linear dofs get max_lin, angular
    dofs (free-joint rotation, ball, hinge) get max_ang."""
    import numpy as np
    v = np.full(model.nv, max_ang, np.float32)
    for ji in range(model.njnt):
        jt = int(model.jnt_type[ji])
        va = int(model.jnt_vadr[ji])
        if jt == T.FREE:
            v[va:va + 3] = max_lin
        elif jt == T.SLIDE:
            v[va] = max_lin
    return v


def _vmax_vec(model, sim):
    return jnp.asarray(_vmax_np(model, sim.max_angular_velocity,
                                sim.max_linear_velocity))


@functools.lru_cache(maxsize=None)
def dof_components(model: T.ArticulationModel) -> tuple:
    """Static partition of the dof index range by connected component of
    the body tree (root = ancestor whose parent is world). Composed
    scenes (actor A + free props B, C, …) have EXACTLY block-diagonal
    mass matrices over this partition — the basis for
    linalg.spd_inverse_blocked/mm_blocked."""
    import numpy as np
    nb = model.nbody
    root = np.arange(nb)
    parent = np.asarray(model.body_parent)
    for b in range(nb):
        r = b
        while parent[r] >= 0:
            r = parent[r]
        root[b] = r
    comps: dict = {}
    for ji in range(model.njnt):
        r = int(root[model.jnt_body[ji]])
        va = int(model.jnt_vadr[ji])
        comps.setdefault(r, []).extend(
            range(va, va + T.JOINT_NV[int(model.jnt_type[ji])]))
    return tuple(tuple(sorted(v)) for _, v in sorted(comps.items()))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class StepInfo:
    """Post-step products (world frame) — replaces the reference's
    refresh_*_tensor calls (`tasks/ant.py:281-290`)."""

    kin: Any                 # Kinematics at final substep
    body_contact_force: Any  # (nb,3) net contact force per body
    body_contact_torque: Any  # (nb,3) contact torque about body origin
    qdd: Any                 # (nv,) last-substep acceleration
    tau: Any                 # (nv,) applied generalized force (actuation+extra)


def physics_step(model: T.ArticulationModel, sim: T.SimParams,
                 params: T.PhysParams, state: T.ArtState,
                 ctrl: jnp.ndarray | None = None,
                 extra_tau: jnp.ndarray | None = None,
                 extra_force: jnp.ndarray | None = None,
                 contacts: ContactSet | None = None,
                 height_fn: Callable | None = None,
                 n_substeps: int | None = None,
                 tau_fn: Callable | None = None,
                 gravity=None,
                 pair_contacts: PairSet | None = None,
                 attractors=None,
                 force_fn: Callable | None = None) -> tuple:
    """Advance one control step = ``substeps`` physics substeps.

    ctrl: (nu,) actuator controls, held constant over substeps (reference
      semantics: actions applied once per `step`, `vec_task.py:324-339`).
    extra_tau: (nv,) additional generalized torque (env-level PD loops).
    extra_force: (nb,6) additional spatial forces [torque; force], each
      about ITS OWN body origin, world axes (pushes, thrusters — replaces
      `apply_rigid_body_force_tensors`). Converted internally to the
      kinematics reference point.
    tau_fn: optional (q, qd) → (nv,) torque recomputed EVERY substep
      (AnymalTerrain-style decimated PD, `anymal_terrain.py:441-449`).
    force_fn: optional kin → (nb,6) spatial forces about each body origin,
      world axes, recomputed every substep — used for LOCAL_SPACE thrust
      (`apply_rigid_body_force_tensors(..., LOCAL_SPACE)`,
      `tasks/ingenuity.py:359`: rotate a body-frame thrust by the body's
      current orientation).
    """
    if contacts is None:
        contacts = build_ground_contacts(model)
    nsub = n_substeps if n_substeps is not None else sim.substeps
    h = sim.dt / nsub
    # gravity may be a traced override (DR sim_params group)
    gravity = sim.gravity if gravity is None else gravity

    impulse = sim.solver == "impulse"

    # frozen mass matrix (PhysX-style once-per-control-step assembly):
    # static graph structure so the saving survives vmap (a lax.cond
    # would lower to select under vmap and run both branches)
    comps = dof_components(model)
    Minv_frozen = None
    if impulse and sim.freeze_mass_matrix:
        from .linalg import spd_inverse_blocked
        kin0 = forward_kinematics(model, params, state.q, state.qd)
        dimp0 = params.dof_damping.astype(state.q.dtype)
        if ctrl is not None and model.nu:
            _, d_kd0, d_kp0 = actuation_terms(model, params, ctrl,
                                              state.q, state.qd)
            dimp0 = dimp0 + d_kd0 + h * d_kp0
        Minv_frozen = spd_inverse_blocked(
            crba(model, params, kin0) + h * jnp.diag(dimp0), comps)

    def substep(carry, _):
        q, qd = carry[0], carry[1]
        kin = forward_kinematics(model, params, q, qd)
        # world spatial inertias ONCE per substep, shared by CRBA and
        # RNEA — the stage profile measured this block at ~700 us of the
        # 6.8 ms Ant-4096 step and it used to run twice per substep
        I_b = _spatial_inertias(model, params, kin)
        body_ct = jnp.zeros((model.nbody, 3), q.dtype)
        ef_ref = None
        ef_body = extra_force
        if force_fn is not None:
            ef_dyn = force_fn(kin)
            ef_body = ef_dyn if ef_body is None else ef_body + ef_dyn
        if ef_body is not None:
            # re-express about kin.ref: n_ref = n_body + (p_body − ref) × f
            arm = kin.body_pos - kin.ref
            f_lin = ef_body[:, 3:]
            ef_ref = jnp.concatenate(
                [ef_body[:, :3] + jnp.cross(arm, f_lin), f_lin], axis=-1)
        if impulse:
            f_ext, body_cf = ef_ref, jnp.zeros((model.nbody, 3), q.dtype)
        else:
            f_ext, body_cf = ground_contact_forces(model, params, sim, kin,
                                                   contacts, height_fn)
            if ef_ref is not None:
                f_ext = f_ext + ef_ref
        tau = passive_forces(model, params, sim, q, qd,
                             include_limits=not impulse,
                             include_viscous=False)
        # implicit velocity-proportional terms: joint damping + PD drives
        # (M + h·D) qdd = τ_expl − C − D·qd  — unconditionally stable for
        # stiff gains (PhysX integrates DOF drives implicitly too)
        dimp = params.dof_damping.astype(q.dtype)
        if ctrl is not None and model.nu:
            tau_a, d_kd, d_kp = actuation_terms(model, params, ctrl, q, qd)
            tau = tau + tau_a
            dimp = dimp + d_kd + h * d_kp
        if extra_tau is not None:
            tau = tau + extra_tau
        if tau_fn is not None:
            tau = tau + tau_fn(q, qd)
        C = rnea_bias(model, params, kin, qd, gravity, f_ext, I_b=I_b)
        if Minv_frozen is not None:
            Minv = Minv_frozen
        else:
            M = crba(model, params, kin, I_b=I_b)
            # explicit SPD inverse via unrolled Cholesky: XLA:TPU's
            # cholesky custom-call dominated the step (59% in the round-1
            # profiler); M⁻¹ turns the solve AND the solver's Delassus
            # columns into MXU matmuls. Blocked over the scene's
            # disconnected actors (exact for block-diagonal M).
            from .linalg import spd_inverse_blocked
            Minv = spd_inverse_blocked(M + h * jnp.diag(dimp), comps)
        from .linalg import mv_small
        qdd = mv_small(Minv, tau - C - dimp * qd)
        qd_free = qd + h * qdd
        if impulse:
            pg = (pair_contact_geometry(model, params, kin, pair_contacts,
                                        h=h)
                  if pair_contacts is not None and pair_contacts.count
                  else None)
            qd_new, body_cf, body_ct, lam = solve_constraints(
                model, params, sim, kin, contacts, q, qd_free, Minv, h,
                height_fn, pair_geom=pg, attractors=attractors,
                lam_init=carry[6] if sim.warmstart_solver else None)
        else:
            qd_new = qd_free
            lam = carry[6]
        # PhysX-style velocity clamps — bound runaway energy under extreme
        # actions exactly like max_angular_velocity does in the reference
        qd_new = jnp.clip(qd_new, -_vmax_vec(model, sim),
                          _vmax_vec(model, sim))
        q_new = integrate_position(model, q, qd_new, h)
        # carry the last substep's reporting products instead of stacking
        # them for every substep (only the final values feed StepInfo;
        # stacking burned HBM bandwidth for nothing)
        return (q_new, qd_new, body_cf, body_ct, (qd_new - qd) / h, tau,
                lam), None

    zero3 = jnp.zeros((model.nbody, 3), state.q.dtype)
    zerov = jnp.zeros((model.nv,), state.q.dtype)
    from .solver import constraint_row_count
    lam0 = jnp.zeros((constraint_row_count(model, sim, contacts,
                                           pair_contacts, attractors),),
                     state.q.dtype)
    (q, qd, cf, ct, qdd, tau, _lam), _ = jax.lax.scan(
        substep, (state.q, state.qd, zero3, zero3, zerov, zerov, lam0),
        None, length=nsub)

    kin = forward_kinematics(model, params, q, qd)
    info = StepInfo(kin=kin, body_contact_force=cf,
                    body_contact_torque=ct, qdd=qdd, tau=tau)
    return T.ArtState(q=q, qd=qd), info
