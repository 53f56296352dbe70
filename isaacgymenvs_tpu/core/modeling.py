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


def box_model_xml(name, size, density=1000.0, free=True, geoms=None):
    """Tiny MJCF for a primitive actor (the TPU analogue of the
    reference's procedural asset authoring, `tasks/ball_balance.py:135`).
    `geoms`: list of (type, size3, pos3) overriding the single centered
    box; `size` is the full extent of that default box."""
    joint = f'<joint type="free" name="{name}_free"/>' if free else ""
    if geoms is None:
        geoms = [("box", (size[0] / 2, size[1] / 2, size[2] / 2),
                  (0, 0, 0))]
    gx = "".join(
        f'<geom type="{t}" size="{s[0]} {s[1]} {s[2]}" '
        f'pos="{p[0]} {p[1]} {p[2]}" density="{density}"/>'
        for t, s, p in geoms)
    return (f'<mujoco model="{name}"><compiler inertiafromgeom="true"/>'
            f'<worldbody><body name="{name}">{joint}{gx}</body>'
            f'</worldbody></mujoco>')


def hinge_joint_names(model: T.ArticulationModel) -> list:
    """Names of all 1-dof (hinge/slide) joints in tree order."""
    return [model.jnt_names[ji] for ji in range(model.njnt)
            if int(model.jnt_type[ji]) in (T.HINGE, T.SLIDE)]


def compose_models(actors, name="scene") -> T.ArticulationModel:
    """Merge several actors into one scene model (a kinematic forest).

    `actors`: list of (prefix, model, root_pos, root_quat) — the TPU
    analogue of multiple `gym.create_actor` calls per env
    (`tasks/ball_balance.py` tray + ball, hands + object): one batched
    articulation with block-diagonal mass structure, ONE solve per env.
    Names are prefixed "<prefix>/"; root body offsets place each actor.
    """
    out = dict(body_parent=[], body_pos=[], body_quat=[], body_mass=[],
               body_com=[], body_inertia=[], body_names=[],
               jnt_body=[], jnt_type=[], jnt_axis=[], jnt_pos=[],
               jnt_qadr=[], jnt_vadr=[], jnt_range=[], jnt_limited=[],
               jnt_names=[], dof_armature=[], dof_damping=[],
               dof_stiffness=[], dof_frictionloss=[], dof_jnt=[],
               act_jnt=[], act_trntype=[], act_gear=[], act_ctrlrange=[],
               act_forcerange=[], act_kp=[], act_kd=[], act_names=[],
               geom_body=[], geom_type=[], geom_size=[], geom_pos=[],
               geom_quat=[], geom_friction=[], geom_contype=[],
               geom_conaffinity=[], geom_names=[], init_qpos=[])
    aliases = {}
    actor_slices = {}
    ten_adr, ten_jnt, ten_coef, ten_range, ten_names = [0], [], [], [], []
    ten_kp_all, ten_kd_all, geom_rest_all = [], [], []
    nb = nj = nq = nv = ng_cnt = nt_cnt = 0
    for entry in actors:
        prefix, m = entry[0], entry[1]
        root_pos = np.asarray(entry[2] if len(entry) > 2 else np.zeros(3),
                              np.float64)
        root_quat = np.asarray(entry[3] if len(entry) > 3
                               else [1.0, 0, 0, 0], np.float64)
        p = np.asarray(m.body_parent)
        out["body_parent"].append(np.where(p < 0, -1, p + nb))
        bp = np.array(m.body_pos, np.float64)
        bq = np.array(m.body_quat, np.float64)
        # offset each root body by the actor placement
        from ..io.mjcf import _quat_mul_np, _quat_to_mat_np
        R = _quat_to_mat_np(root_quat)
        for i in range(m.nbody):
            if p[i] < 0:
                bp[i] = root_pos + R @ bp[i]
                bq[i] = _quat_mul_np(root_quat, bq[i])
        out["body_pos"].append(bp)
        out["body_quat"].append(bq)
        out["body_mass"].append(m.body_mass)
        out["body_com"].append(m.body_com)
        out["body_inertia"].append(m.body_inertia)
        out["body_names"] += [f"{prefix}/{n}" for n in m.body_names]
        for k, v in m.body_aliases.items():
            aliases[f"{prefix}/{k}"] = f"{prefix}/{v}"

        out["jnt_body"].append(np.asarray(m.jnt_body) + nb)
        out["jnt_type"].append(m.jnt_type)
        out["jnt_axis"].append(m.jnt_axis)
        out["jnt_pos"].append(m.jnt_pos)
        out["jnt_qadr"].append(np.asarray(m.jnt_qadr) + nq)
        out["jnt_vadr"].append(np.asarray(m.jnt_vadr) + nv)
        out["jnt_range"].append(m.jnt_range)
        out["jnt_limited"].append(m.jnt_limited)
        out.setdefault("jnt_pitch", []).append(m.jnt_pitch_arr())
        out["jnt_names"] += [f"{prefix}/{n}" for n in m.jnt_names]
        out["dof_armature"].append(m.dof_armature)
        out["dof_damping"].append(m.dof_damping)
        out["dof_stiffness"].append(m.dof_stiffness)
        out["dof_frictionloss"].append(m.dof_frictionloss)
        out["dof_jnt"].append(np.asarray(m.dof_jnt) + nj)
        out["act_jnt"].append(np.asarray(m.act_jnt) + nj)
        out["act_trntype"].append(m.act_trntype)
        out["act_gear"].append(m.act_gear)
        out["act_ctrlrange"].append(m.act_ctrlrange)
        out["act_forcerange"].append(m.act_forcerange)
        out["act_kp"].append(m.act_kp)
        out["act_kd"].append(m.act_kd)
        out["act_names"] += [f"{prefix}/{n}" for n in m.act_names]
        out["geom_body"].append(np.asarray(m.geom_body) + nb)
        out["geom_type"].append(m.geom_type)
        out["geom_size"].append(m.geom_size)
        out["geom_pos"].append(m.geom_pos)
        out["geom_quat"].append(m.geom_quat)
        out["geom_friction"].append(m.geom_friction)
        out["geom_contype"].append(m.geom_contype)
        out["geom_conaffinity"].append(m.geom_conaffinity)
        out["geom_names"] += [f"{prefix}/{n}" for n in m.geom_names]
        # free-joint init qpos carries the actor placement
        iq = np.array(m.init_qpos, np.float64)
        for ji in range(m.njnt):
            if int(m.jnt_type[ji]) == T.FREE:
                qa = int(m.jnt_qadr[ji])
                iq[qa:qa + 3] = root_pos + R @ iq[qa:qa + 3]
                iq[qa + 3:qa + 7] = _quat_mul_np(root_quat, iq[qa + 3:qa + 7])
        out["init_qpos"].append(iq)
        # fixed tendons (coupled-joint limit rows) with joint offsets
        for t in range(m.ntendon):
            a0, a1 = int(m.ten_adr[t]), int(m.ten_adr[t + 1])
            ten_jnt += [int(j) + nj for j in m.ten_jnt[a0:a1]]
            ten_coef += [float(c) for c in m.ten_coef[a0:a1]]
            ten_adr.append(len(ten_jnt))
            ten_range.append(np.asarray(m.ten_range[t], np.float32))
            ten_names.append(f"{prefix}/{m.ten_names[t]}")
        actor_slices[prefix] = dict(
            body=(nb, nb + m.nbody),
            q=(nq, nq + m.nq), v=(nv, nv + m.nv),
            geom=(ng_cnt, ng_cnt + m.ngeom),
            ten=(nt_cnt, nt_cnt + m.ntendon))
        ten_kp_all.append(m.ten_kp_arr())
        ten_kd_all.append(m.ten_kd_arr())
        geom_rest_all.append(m.geom_restitution_arr())
        nb += m.nbody
        nj += m.njnt
        nq += m.nq
        nv += m.nv
        ng_cnt += m.ngeom
        nt_cnt += m.ntendon

    def cat(key, dtype=None, width=None):
        arrs = out[key]
        if not arrs or sum(len(a) for a in arrs) == 0:
            shape = (0,) if width is None else (0, *width)
            return np.zeros(shape, dtype or np.float32)
        return np.concatenate([np.asarray(a) for a in arrs]).astype(
            dtype or np.asarray(arrs[0]).dtype)

    model = T.ArticulationModel(
        name=name,
        body_parent=cat("body_parent", np.int32),
        body_pos=cat("body_pos", np.float32),
        body_quat=cat("body_quat", np.float32),
        body_mass=cat("body_mass", np.float32),
        body_com=cat("body_com", np.float32),
        body_inertia=cat("body_inertia", np.float32),
        body_names=tuple(out["body_names"]),
        jnt_body=cat("jnt_body", np.int32),
        jnt_type=cat("jnt_type", np.int32),
        jnt_axis=cat("jnt_axis", np.float32, (3,)),
        jnt_pos=cat("jnt_pos", np.float32, (3,)),
        jnt_qadr=cat("jnt_qadr", np.int32),
        jnt_vadr=cat("jnt_vadr", np.int32),
        jnt_range=cat("jnt_range", np.float32, (2,)),
        jnt_limited=cat("jnt_limited", bool),
        jnt_pitch=cat("jnt_pitch", np.float32),
        jnt_names=tuple(out["jnt_names"]),
        dof_armature=cat("dof_armature", np.float32),
        dof_damping=cat("dof_damping", np.float32),
        dof_stiffness=cat("dof_stiffness", np.float32),
        dof_frictionloss=cat("dof_frictionloss", np.float32),
        dof_jnt=cat("dof_jnt", np.int32),
        act_jnt=cat("act_jnt", np.int32),
        act_trntype=cat("act_trntype", np.int32),
        act_gear=cat("act_gear", np.float32),
        act_ctrlrange=cat("act_ctrlrange", np.float32, (2,)),
        act_forcerange=cat("act_forcerange", np.float32, (2,)),
        act_kp=cat("act_kp", np.float32),
        act_kd=cat("act_kd", np.float32),
        act_names=tuple(out["act_names"]),
        geom_body=cat("geom_body", np.int32),
        geom_type=cat("geom_type", np.int32),
        geom_size=cat("geom_size", np.float32, (3,)),
        geom_pos=cat("geom_pos", np.float32, (3,)),
        geom_quat=cat("geom_quat", np.float32, (4,)),
        geom_friction=cat("geom_friction", np.float32, (3,)),
        geom_contype=cat("geom_contype", np.int32),
        geom_conaffinity=cat("geom_conaffinity", np.int32),
        geom_names=tuple(out["geom_names"]),
        init_qpos=cat("init_qpos", np.float32),
        body_aliases=aliases,
        ten_adr=np.asarray(ten_adr, np.int32),
        ten_jnt=np.asarray(ten_jnt, np.int32),
        ten_coef=np.asarray(ten_coef, np.float32),
        ten_range=(np.stack(ten_range).astype(np.float32) if ten_range
                   else np.zeros((0, 2), np.float32)),
        ten_names=tuple(ten_names),
        ten_kp=(np.concatenate(ten_kp_all) if ten_kp_all
                else np.zeros(0, np.float32)),
        ten_kd=(np.concatenate(ten_kd_all) if ten_kd_all
                else np.zeros(0, np.float32)),
        geom_restitution_=(np.concatenate(geom_rest_all) if geom_rest_all
                           else np.zeros(0, np.float32)),
    )
    # stash per-actor index ranges for env code (not part of the pytree)
    object.__setattr__(model, "actor_slices", actor_slices)
    return model
