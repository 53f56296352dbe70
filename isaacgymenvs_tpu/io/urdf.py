"""URDF → ArticulationModel parser.

Replaces native `gym.load_asset` for URDF assets (`tasks/cartpole.py`,
Anymal/A1/Franka/Allegro). Pure Python + numpy at scene-construction time.

Supported subset:
  * links: <inertial> (mass, origin xyz/rpy, full inertia); when inertia is
    missing, it is derived from the collision geometry at the given mass
    (matching Isaac Gym asset-import behavior for e.g. cartpole.urdf)
  * collision geoms: box, cylinder, sphere, capsule; mesh geoms are recorded
    as GEOM_MESH placeholders (envs supply primitive contact approximations —
    the TPU analogue of Isaac Gym's convex decomposition)
  * joints: revolute, continuous, prismatic, fixed, floating; origin,
    axis, limits, <dynamics damping friction>
  * fix_base: when False, a FREE joint is injected at the root link
    (Isaac Gym's `asset_options.fix_base_link` equivalent)
"""

from __future__ import annotations

import math
import os
import xml.etree.ElementTree as ET

import numpy as np

from ..core import types as T
from .mjcf import (_geom_mass_inertia, _parse_vec, _quat_mul_np,
                   _quat_to_mat_np)


def _quat_from_rpy(rpy):
    r, p, y = rpy
    cr, sr = math.cos(r / 2), math.sin(r / 2)
    cp, sp = math.cos(p / 2), math.sin(p / 2)
    cy, sy = math.cos(y / 2), math.sin(y / 2)
    # extrinsic xyz == intrinsic zyx: q = qz ⊗ qy ⊗ qx
    qx = np.array([cr, sr, 0, 0])
    qy = np.array([cp, 0, sp, 0])
    qz = np.array([cy, 0, 0, sy])
    return _quat_mul_np(_quat_mul_np(qz, qy), qx)


def _origin(el):
    if el is None:
        return np.zeros(3), np.array([1.0, 0, 0, 0])
    o = el.find("origin")
    if o is None:
        return np.zeros(3), np.array([1.0, 0, 0, 0])
    xyz = _parse_vec(o.get("xyz"), 3, np.zeros(3))
    rpy = _parse_vec(o.get("rpy"), 3, np.zeros(3))
    return xyz, _quat_from_rpy(rpy)


def _parse_geometry(geo_el):
    """→ (gtype, size) in our conventions (half-sizes for box)."""
    if geo_el is None:
        return None
    for g in geo_el:
        if g.tag == "box":
            full = _parse_vec(g.get("size"), 3, np.ones(3))
            return T.GEOM_BOX, 0.5 * full
        if g.tag == "cylinder":
            return T.GEOM_CYLINDER, np.array(
                [float(g.get("radius", 0.1)), 0.5 * float(g.get("length", 0.1)), 0.0])
        if g.tag == "capsule":
            return T.GEOM_CAPSULE, np.array(
                [float(g.get("radius", 0.1)), 0.5 * float(g.get("length", 0.1)), 0.0])
        if g.tag == "sphere":
            return T.GEOM_SPHERE, np.array([float(g.get("radius", 0.1)), 0.0, 0.0])
        if g.tag == "mesh":
            return ("mesh", g.get("filename"),
                    _parse_vec(g.get("scale"), 3, np.ones(3)))
    return None


_JTYPE = {"revolute": T.HINGE, "continuous": T.HINGE, "prismatic": T.SLIDE,
          "floating": T.FREE, "fixed": None, "planar": None}


def _compose(p1, q1, p2, q2):
    """Rigid-transform composition (numpy)."""
    R1 = _quat_to_mat_np(q1)
    return p1 + R1 @ p2, _quat_mul_np(q1, q2)


def _collapse_fixed(bodies, joints, geoms):
    """Merge joint-less (welded) bodies into their parents — Isaac Gym's
    `asset_options.collapse_fixed_joints` (reference `tasks/anymal.py:176`).

    Mass properties are composed (mass sum, COM barycenter, parallel-axis
    inertia transport); geoms are re-parented with composed transforms.
    Returns (alias map: merged link name → surviving link name). Bodies are
    in DFS order (parents precede children), so one forward pass suffices.
    """
    jointed = {j["body"] for j in joints}
    n = len(bodies)
    # target body + transform of each ORIGINAL body frame in its target frame
    target = list(range(n))
    t_pos = [np.zeros(3) for _ in range(n)]
    t_quat = [np.array([1.0, 0, 0, 0]) for _ in range(n)]
    dead = [False] * n
    aliases = {}

    for bid in range(n):
        b = bodies[bid]
        p = b["parent"]
        if p < 0:
            continue
        # express this body's frame in its (possibly merged) parent's target
        pt = target[p]
        base_pos, base_quat = _compose(t_pos[p], t_quat[p], b["pos"], b["quat"])
        if bid in jointed:
            if pt != p or dead[p]:
                b["parent"], b["pos"], b["quat"] = pt, base_pos, base_quat
            continue
        # welded: merge into parent's target
        dead[bid] = True
        target[bid] = pt
        t_pos[bid], t_quat[bid] = base_pos, base_quat
        aliases[b["name"]] = bodies[pt]["name"]
        tgt = bodies[pt]
        R = _quat_to_mat_np(base_quat)
        m_c = b["mass"]
        com_c = base_pos + R @ b["com"]         # child COM in target frame
        I_c = R @ b["inertia"] @ R.T
        M = tgt["mass"] + m_c
        if M > 0:
            com = (tgt["mass"] * tgt["com"] + m_c * com_c) / M
        else:
            com = tgt["com"]
        def _shift(I, m, d):
            return I + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
        tgt["inertia"] = (_shift(tgt["inertia"], tgt["mass"], tgt["com"] - com)
                          + _shift(I_c, m_c, com_c - com))
        tgt["mass"], tgt["com"] = M, com

    for g in geoms:
        b = g["body"]
        if dead[b]:
            g["pos"], g["quat"] = _compose(t_pos[b], t_quat[b],
                                           g["pos"], g["quat"])
            g["body"] = target[b]

    # compact indices
    new_id = {}
    out_bodies = []
    for bid in range(n):
        if not dead[bid]:
            new_id[bid] = len(out_bodies)
            out_bodies.append(bodies[bid])
    for b in out_bodies:
        if b["parent"] >= 0:
            b["parent"] = new_id[b["parent"]]
    for j in joints:
        j["body"] = new_id[j["body"]]
    for g in geoms:
        g["body"] = new_id[g["body"]]
    # resolve alias chains to surviving names
    for k in list(aliases):
        v = aliases[k]
        while v in aliases:
            v = aliases[v]
        aliases[k] = v
    return out_bodies, aliases


def load_urdf(path: str, *, fix_base: bool = True,
              density: float = 1000.0,
              collapse_fixed_joints: bool = False,
              replace_cylinder_with_capsule: bool = False) -> T.ArticulationModel:
    tree = ET.parse(path)
    robot = tree.getroot()
    name = robot.get("name", "urdf")

    links = {}
    for el in robot.findall("link"):
        lname = el.get("name")
        inertial = el.find("inertial")
        mass, com, icom = 0.0, np.zeros(3), np.zeros((3, 3))
        has_matrix = False
        if inertial is not None:
            com, iq = _origin(inertial)
            m_el = inertial.find("mass")
            mass = float(m_el.get("value", 0.0)) if m_el is not None else 0.0
            i_el = inertial.find("inertia")
            if i_el is not None:
                ixx = float(i_el.get("ixx", 0)); iyy = float(i_el.get("iyy", 0))
                izz = float(i_el.get("izz", 0)); ixy = float(i_el.get("ixy", 0))
                ixz = float(i_el.get("ixz", 0)); iyz = float(i_el.get("iyz", 0))
                icom = np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])
                has_matrix = np.abs(icom).sum() > 0
                R = _quat_to_mat_np(iq)
                icom = R @ icom @ R.T
        cols = []
        for c in el.findall("collision"):
            gp, gq = _origin(c)
            parsed = _parse_geometry(c.find("geometry"))
            if parsed is None:
                continue
            if parsed[0] == "mesh":
                # mesh collision → bounding-box primitive (the TPU analogue
                # of PhysX convex decomposition; Allegro/Franka assets)
                from .mesh import mesh_bounding_box, resolve_mesh_path
                mp = resolve_mesh_path(parsed[1], os.path.dirname(
                    os.path.abspath(path)))
                if mp is None:
                    continue
                center, half = mesh_bounding_box(mp, parsed[2])
                gtype, size = T.GEOM_BOX, half
                gp = gp + _quat_to_mat_np(gq) @ center
            else:
                gtype, size = parsed
            cols.append(dict(type=gtype, size=size, pos=gp, quat=gq,
                             name=f"{lname}_col{len(cols)}"))
        if not has_matrix and cols:
            # derive inertia from collision geoms; rescale to declared mass
            tot_m, acc_com = 0.0, np.zeros(3)
            parts = []
            for c in cols:
                m_g, i_g = _geom_mass_inertia(c["type"], c["size"], density)
                parts.append((m_g, i_g, c["pos"], c["quat"]))
                tot_m += m_g
                acc_com += m_g * c["pos"]
            if tot_m > 0:
                scale = (mass / tot_m) if mass > 0 else 1.0
                if mass <= 0:
                    mass = tot_m
                com = acc_com / tot_m
                icom = np.zeros((3, 3))
                for m_g, i_g, p, q in parts:
                    R = _quat_to_mat_np(q)
                    ig = R @ i_g @ R.T
                    d = p - com
                    icom += scale * (ig + m_g * (np.dot(d, d) * np.eye(3)
                                                 - np.outer(d, d)))
        links[lname] = dict(mass=mass, com=com, inertia=icom, cols=cols)

    jels = robot.findall("joint")
    children = {j.find("child").get("link") for j in jels if j.find("child") is not None}
    roots = [ln for ln in links if ln not in children]
    if len(roots) != 1:
        raise ValueError(f"{path}: expected 1 root link, got {roots}")

    # build tree
    by_parent = {}
    for j in jels:
        by_parent.setdefault(j.find("parent").get("link"), []).append(j)

    bodies, joints, geoms = [], [], []

    def add_body(parent_id, link_name, pos, quat):
        lk = links[link_name]
        bodies.append(dict(parent=parent_id, name=link_name, pos=pos, quat=quat,
                           mass=lk["mass"], com=lk["com"], inertia=lk["inertia"]))
        bid = len(bodies) - 1
        for c in lk["cols"]:
            geoms.append(dict(body=bid, type=c["type"], size=c["size"],
                              pos=c["pos"], quat=c["quat"],
                              friction=np.array([1.0, 0.005, 0.0001]),
                              contype=1, conaffinity=1, name=c["name"]))
        return bid

    def walk(link_name, body_id):
        for j in by_parent.get(link_name, []):
            child = j.find("child").get("link")
            jpos, jquat = _origin(j)
            bid = add_body(body_id, child, jpos, jquat)
            jt = _JTYPE.get(j.get("type"))
            if jt is not None:
                axis_el = j.find("axis")
                axis = _parse_vec(axis_el.get("xyz"), 3) if axis_el is not None \
                    else np.array([1.0, 0, 0])
                lim = j.find("limit")
                lower = float(lim.get("lower", 0)) if lim is not None else 0.0
                upper = float(lim.get("upper", 0)) if lim is not None else 0.0
                effort = float(lim.get("effort", np.inf)) if lim is not None else np.inf
                limited = j.get("type") in ("revolute", "prismatic") and lim is not None \
                    and lim.get("lower") is not None
                dyn = j.find("dynamics")
                damping = float(dyn.get("damping", 0)) if dyn is not None else 0.0
                fric = float(dyn.get("friction", 0)) if dyn is not None else 0.0
                joints.append(dict(
                    body=bid, type=jt, name=j.get("name"),
                    pos=np.zeros(3), axis=axis,
                    range=np.array([lower, upper]), limited=limited,
                    damping=damping, armature=0.0, stiffness=0.0,
                    frictionloss=fric, effort=effort))
            walk(child, bid)

    root_id = add_body(-1, roots[0], np.zeros(3), np.array([1.0, 0, 0, 0]))
    if not fix_base:
        joints.insert(0, dict(body=root_id, type=T.FREE, name=f"{roots[0]}_free",
                              pos=np.zeros(3), axis=np.array([0.0, 0, 1]),
                              range=np.zeros(2), limited=False, damping=0.0,
                              armature=0.0, stiffness=0.0, frictionloss=0.0,
                              effort=np.inf))
    walk(roots[0], root_id)

    # re-sort joints in body (tree) order — walk appended root-free first, then DFS
    joints.sort(key=lambda jj: jj["body"])

    aliases = {}
    if collapse_fixed_joints:
        bodies, aliases = _collapse_fixed(bodies, joints, geoms)

    if replace_cylinder_with_capsule:
        # Isaac Gym asset option (reference `tasks/anymal.py:177`): capsules
        # roll/contact far better; keep total extent (hl_cap + r = hl_cyl)
        for g in geoms:
            if g["type"] == T.GEOM_CYLINDER:
                r, hl = g["size"][0], g["size"][1]
                g["type"] = T.GEOM_CAPSULE
                g["size"] = np.array([r, max(hl - r, 1e-3), 0.0])

    from .mjcf import _finalize

    class _B:  # minimal shim matching _finalize's expectations
        pass

    b = _B()
    b.bodies = [dict(parent=x["parent"], name=x["name"], pos=x["pos"],
                     quat=x["quat"], mass=x["mass"], com=x["com"],
                     inertia=x["inertia"], explicit_inertial=True)
                for x in bodies]
    b.joints = joints
    b.geoms = geoms
    model = _finalize(name, b, [], None)
    if aliases:
        model = __import__("dataclasses").replace(model, body_aliases=aliases)
    # URDF has no <actuator>; envs attach drives via effort limits per dof.
    return model


def urdf_effort_limits(path: str) -> dict:
    """joint name → effort limit (for envs that build torque drives)."""
    tree = ET.parse(path)
    out = {}
    for j in tree.getroot().findall("joint"):
        lim = j.find("limit")
        if lim is not None and lim.get("effort") is not None:
            out[j.get("name")] = float(lim.get("effort"))
    return out
