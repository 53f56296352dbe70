"""MJCF → ArticulationModel parser.

Replaces the reference's native `gym.load_asset` for MJCF assets
(`tasks/ant.py:154-160`, `tasks/humanoid.py`, AMP humanoid). Pure Python +
numpy, runs at scene-construction time (host side, before jit tracing).

Supported subset (everything the reference's MJCF assets use):
  * nested <default> classes with childclass inheritance
  * <compiler angle="degree|radian" inertiafromgeom>
  * bodies with pos/quat, multiple <joint> per body, <freejoint>
  * geoms: plane, sphere, capsule (fromto or pos), box, cylinder;
    density-based mass/inertia when no <inertial>
  * <inertial> overrides (pos, mass, diaginertia/fullinertia, quat)
  * actuators: <motor gear ctrlrange>, <position kp>, <velocity kv>
  * <custom><numeric name="init_qpos"> initial pose
"""

from __future__ import annotations

import math
import xml.etree.ElementTree as ET

import numpy as np

from ..core import types as T

_DEG2RAD = math.pi / 180.0


def _parse_vec(s, n=None, default=None):
    if s is None:
        return default
    v = np.array([float(x) for x in s.split()], dtype=np.float64)
    if n is not None and len(v) < n:
        v = np.concatenate([v, np.zeros(n - len(v))])
    return v


def _quat_from_zaxis(z):
    """Quaternion (wxyz) rotating +z onto unit vector z."""
    z = z / np.linalg.norm(z)
    ez = np.array([0.0, 0.0, 1.0])
    c = float(np.dot(ez, z))
    if c > 1 - 1e-10:
        return np.array([1.0, 0, 0, 0])
    if c < -1 + 1e-10:
        return np.array([0.0, 1.0, 0, 0])  # 180° about x
    axis = np.cross(ez, z)
    axis /= np.linalg.norm(axis)
    half = 0.5 * math.acos(max(-1.0, min(1.0, c)))
    return np.array([math.cos(half), *(math.sin(half) * axis)])


def _quat_mul_np(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ])


def _quat_rotate_np(q, v):
    w, x, y, z = q
    qv = np.array([x, y, z])
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def _quat_to_mat_np(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _orient_from_attrs(el, angle_scale):
    """Resolve MJCF orientation attributes → wxyz quaternion."""
    if el.get("quat") is not None:
        q = _parse_vec(el.get("quat"), 4)
        return q / np.linalg.norm(q)
    if el.get("zaxis") is not None:
        return _quat_from_zaxis(_parse_vec(el.get("zaxis"), 3))
    if el.get("axisangle") is not None:
        aa = _parse_vec(el.get("axisangle"), 4)
        ax = aa[:3] / max(np.linalg.norm(aa[:3]), 1e-12)
        half = 0.5 * aa[3] * angle_scale
        return np.array([math.cos(half), *(math.sin(half) * ax)])
    if el.get("euler") is not None:
        e = _parse_vec(el.get("euler"), 3) * angle_scale
        q = np.array([1.0, 0, 0, 0])
        for ang, ax in zip(e, np.eye(3)):  # mjcf default eulerseq xyz, intrinsic
            h = 0.5 * ang
            q = _quat_mul_np(q, np.array([math.cos(h), *(math.sin(h) * ax)]))
        return q
    return np.array([1.0, 0, 0, 0])


_GEOM_TYPES = {
    "plane": T.GEOM_PLANE,
    "sphere": T.GEOM_SPHERE,
    "capsule": T.GEOM_CAPSULE,
    "box": T.GEOM_BOX,
    "cylinder": T.GEOM_CYLINDER,
    "hfield": T.GEOM_HFIELD,
    "mesh": T.GEOM_MESH,
    "ellipsoid": T.GEOM_SPHERE,  # approximated
}


def _geom_mass_inertia(gtype, size, density):
    """(mass, com-frame diag inertia 3x3) for a geom about its own frame."""
    if gtype == T.GEOM_SPHERE:
        r = size[0]
        m = density * 4.0 / 3.0 * math.pi * r ** 3
        i = 0.4 * m * r * r
        return m, np.diag([i, i, i])
    if gtype == T.GEOM_CAPSULE:
        r, hc = size[0], size[1]
        m_c = density * math.pi * r * r * (2 * hc)
        m_s = density * 4.0 / 3.0 * math.pi * r ** 3
        izz = 0.5 * m_c * r * r + 0.4 * m_s * r * r
        ixx = (m_c * ((2 * hc) ** 2 / 12.0 + r * r / 4.0)
               + m_s * (0.4 * r * r + hc * hc + 0.75 * hc * r))
        return m_c + m_s, np.diag([ixx, ixx, izz])
    if gtype == T.GEOM_BOX:
        a, b, c = size[:3]  # half-sizes
        m = density * 8.0 * a * b * c
        return m, np.diag([m * (b * b + c * c) / 3.0,
                           m * (a * a + c * c) / 3.0,
                           m * (a * a + b * b) / 3.0])
    if gtype == T.GEOM_CYLINDER:
        r, hc = size[0], size[1]
        m = density * math.pi * r * r * (2 * hc)
        ixx = m * (3 * r * r + 4 * hc * hc) / 12.0
        return m, np.diag([ixx, ixx, 0.5 * m * r * r])
    return 0.0, np.zeros((3, 3))


class _Defaults:
    """MJCF default-class resolution."""

    def __init__(self):
        self.classes = {"": {}}  # class name -> {tag -> {attr: val}}

    def parse(self, el, parent=""):
        name = el.get("class", "" if parent == "" else None) or parent
        base = {k: dict(v) for k, v in self.classes.get(parent, {}).items()}
        for child in el:
            if child.tag == "default":
                continue
            base.setdefault(child.tag, {})
            base[child.tag].update(child.attrib)
        cname = el.get("class", "")
        if cname or parent == "":
            self.classes[cname] = base
        for child in el:
            if child.tag == "default":
                self.parse(child, cname)

    def resolve(self, el, cls):
        """Merged attributes: defaults[cls][tag] overridden by el.attrib."""
        d = dict(self.classes.get(cls, self.classes[""]).get(el.tag, {}))
        # fall back through root class for tags missing in cls
        if cls and el.tag not in self.classes.get(cls, {}):
            d = dict(self.classes[""].get(el.tag, {}))
        d.update(el.attrib)
        return d


class _Builder:
    def __init__(self, angle_scale, density_default, defaults):
        self.angle = angle_scale
        self.density = density_default
        self.defs = defaults
        self.bodies = []   # dicts
        self.joints = []
        self.geoms = []
        self.acts = []

    def add_body(self, parent, name, pos, quat):
        self.bodies.append(dict(parent=parent, name=name, pos=pos, quat=quat,
                                mass=0.0, com=np.zeros(3),
                                inertia=np.zeros((3, 3)), explicit_inertial=False))
        return len(self.bodies) - 1

    def walk(self, el, body_id, cls):
        cls = el.get("childclass", cls)
        for child in el:
            if child.tag == "body":
                a = child.attrib
                pos = _parse_vec(a.get("pos"), 3, np.zeros(3))
                quat = _orient_from_attrs(child, self.angle)
                bid = self.add_body(body_id, a.get("name", f"body{len(self.bodies)}"), pos, quat)
                self.walk(child, bid, cls)
            elif child.tag in ("joint", "freejoint"):
                self._joint(child, body_id, cls)
            elif child.tag == "geom":
                self._geom(child, body_id, cls)
            elif child.tag == "inertial":
                self._inertial(child, body_id)

    def _joint(self, el, body_id, cls):
        if body_id < 0:
            raise ValueError("joint outside body")
        a = self.defs.resolve(el, el.get("class", cls))
        jtype = "free" if el.tag == "freejoint" else a.get("type", "hinge")
        tmap = {"free": T.FREE, "ball": T.BALL, "hinge": T.HINGE, "slide": T.SLIDE}
        # extension: screw_pitch="<m/turn>" on a hinge makes a SCREW joint
        # (structural thread coupling z = pitch/(2π)·θ, Factory nut-bolt)
        pitch = float(a.get("screw_pitch", 0.0))
        jt = T.SCREW if (jtype == "hinge" and pitch != 0.0) else tmap[jtype]
        limited = a.get("limited", "false") in ("true", "1") and a.get("range") is not None
        rng = _parse_vec(a.get("range"), 2, np.zeros(2))
        if jtype == "hinge":  # screw q is also an angle
            rng = rng * self.angle
        self.joints.append(dict(
            body=body_id, type=jt, pitch=pitch,
            name=el.get("name", f"jnt{len(self.joints)}"),
            pos=_parse_vec(a.get("pos"), 3, np.zeros(3)),
            axis=_parse_vec(a.get("axis"), 3, np.array([0.0, 0, 1])),
            range=rng, limited=limited,
            damping=float(a.get("damping", 0.0)),
            armature=float(a.get("armature", 0.0)),
            stiffness=float(a.get("stiffness", 0.0)),
            frictionloss=float(a.get("frictionloss", 0.0)),
        ))

    def _geom(self, el, body_id, cls):
        a = self.defs.resolve(el, el.get("class", cls))
        gtype = _GEOM_TYPES[a.get("type", "sphere")]
        size = _parse_vec(a.get("size"), 3, np.zeros(3))
        pos = _parse_vec(a.get("pos"), 3, np.zeros(3))
        quat = _orient_from_attrs(el, self.angle)
        if a.get("fromto") is not None:
            ft = _parse_vec(a.get("fromto"), 6)
            p1, p2 = ft[:3], ft[3:]
            pos = 0.5 * (p1 + p2)
            d = p2 - p1
            quat = _quat_from_zaxis(d) if np.linalg.norm(d) > 1e-12 else np.array([1.0, 0, 0, 0])
            size = np.array([size[0], 0.5 * np.linalg.norm(d), 0.0])
        density = float(a.get("density", self.density))
        mass_attr = a.get("mass")
        m, icom = _geom_mass_inertia(gtype, size, density)
        if mass_attr is not None and m > 0:
            scale = float(mass_attr) / m
            m, icom = float(mass_attr), icom * scale
        friction = _parse_vec(a.get("friction"), 3, np.array([1.0, 0.005, 0.0001]))
        self.geoms.append(dict(
            body=body_id, type=gtype, size=size, pos=pos, quat=quat,
            mass=m, inertia=icom, friction=friction,
            contype=int(a.get("contype", 1)), conaffinity=int(a.get("conaffinity", 1)),
            name=el.get("name", f"geom{len(self.geoms)}"),
        ))

    def _inertial(self, el, body_id):
        a = el.attrib
        b = self.bodies[body_id]
        b["explicit_inertial"] = True
        b["mass"] = float(a.get("mass", 0.0))
        b["com"] = _parse_vec(a.get("pos"), 3, np.zeros(3))
        q = _orient_from_attrs(el, self.angle)
        if a.get("diaginertia") is not None:
            ic = np.diag(_parse_vec(a.get("diaginertia"), 3))
        elif a.get("fullinertia") is not None:
            f = _parse_vec(a.get("fullinertia"), 6)
            ic = np.array([[f[0], f[3], f[4]], [f[3], f[1], f[5]], [f[4], f[5], f[2]]])
        else:
            ic = np.zeros((3, 3))
        R = _quat_to_mat_np(q)
        b["inertia"] = R @ ic @ R.T


def _resolve_includes(el, base_dir):
    """Recursively splice `<include file=…>` contents (OpenAI hand assets:
    shadow_hand.xml includes shared.xml / robot.xml)."""
    import os
    i = 0
    children = list(el)
    for child in children:
        if child.tag == "include":
            inc_path = os.path.join(base_dir, child.get("file"))
            inc_root = ET.parse(inc_path).getroot()
            _resolve_includes(inc_root, os.path.dirname(inc_path))
            idx = list(el).index(child)
            el.remove(child)
            # an included <mujoco> splices its children; other roots splice
            # themselves
            nodes = list(inc_root) if inc_root.tag == "mujoco" else [inc_root]
            for off, node in enumerate(nodes):
                el.insert(idx + off, node)
        else:
            _resolve_includes(child, base_dir)
        i += 1


def load_mjcf(path: str, *, density: float = 1000.0) -> T.ArticulationModel:
    """Parse an MJCF file into an ArticulationModel (forest incl. world geoms).

    `path` may also be a raw XML string (procedurally-authored assets —
    the reference writes balance_bot.xml / ingenuity MJCF at runtime,
    `tasks/ball_balance.py:135-224`)."""
    import os
    if isinstance(path, str) and path.lstrip().startswith("<"):
        root = ET.fromstring(path)
        base_dir = "."
    else:
        root = ET.parse(path).getroot()
        base_dir = os.path.dirname(os.path.abspath(path))
    _resolve_includes(root, base_dir)

    compiler = root.find("compiler")
    angle_scale = _DEG2RAD
    if compiler is not None and compiler.get("angle", "degree") == "radian":
        angle_scale = 1.0

    defaults = _Defaults()
    for d in root.findall("default"):
        defaults.parse(d)

    builder = _Builder(angle_scale, density, defaults)
    world = root.find("worldbody")
    if world is None:
        raise ValueError(f"{path}: no worldbody")
    builder.walk(world, -1, "")

    # accumulate geom masses into bodies without explicit <inertial>
    for g in builder.geoms:
        if g["body"] < 0:
            continue
        b = builder.bodies[g["body"]]
        if b["explicit_inertial"]:
            continue
        m_old, m_g = b["mass"], g["mass"]
        if m_g <= 0:
            continue
        com_new = (b["com"] * m_old + (g["pos"]) * m_g) / max(m_old + m_g, 1e-12)
        # move both inertias to new COM (parallel axis), rotate geom inertia
        R = _quat_to_mat_np(g["quat"])
        ig = R @ g["inertia"] @ R.T
        d1 = b["com"] - com_new
        d2 = g["pos"] - com_new
        def _pa(i, m, d):
            return i + m * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
        b["inertia"] = _pa(b["inertia"], m_old, d1) + _pa(ig, m_g, d2)
        b["com"] = com_new
        b["mass"] = m_old + m_g

    # actuators
    acts = []
    act_root = root.find("actuator")
    if act_root is not None:
        for el in act_root:
            a = defaults.resolve(el, el.get("class", ""))
            kind = {"motor": T.ACT_MOTOR, "position": T.ACT_POSITION,
                    "velocity": T.ACT_VELOCITY, "general": T.ACT_MOTOR}.get(el.tag)
            if kind is None:
                continue
            ctrlrange = _parse_vec(a.get("ctrlrange"), 2, np.array([-1.0, 1.0]))
            if a.get("ctrllimited", "true") in ("false", "0"):
                ctrlrange = np.array([-np.inf, np.inf])
            acts.append(dict(
                joint=a.get("joint"), trntype=kind,
                gear=float(_parse_vec(a.get("gear"), 1, np.array([1.0]))[0]),
                ctrlrange=ctrlrange,
                forcerange=_parse_vec(a.get("forcerange"), 2,
                                      np.array([-np.inf, np.inf])),
                kp=float(a.get("kp", 0.0)), kd=float(a.get("kv", a.get("kd", 0.0))),
                name=el.get("name", a.get("joint", f"act{len(acts)}")),
            ))

    # fixed tendons (linear joint couplings with range limits)
    tendons = []
    for tsec in root.findall("tendon"):
        for fx in tsec.findall("fixed"):
            if fx.get("limited", "false") not in ("true", "1") \
                    or fx.get("range") is None:
                continue
            joints_coefs = [(j.get("joint"), float(j.get("coef", 1.0)))
                            for j in fx.findall("joint")]
            tendons.append(dict(
                name=fx.get("name", f"tendon{len(tendons)}"),
                range=_parse_vec(fx.get("range"), 2),
                joints=joints_coefs))

    # custom init_qpos
    init_qpos = None
    custom = root.find("custom")
    if custom is not None:
        for num in custom.findall("numeric"):
            if num.get("name") == "init_qpos":
                init_qpos = _parse_vec(num.get("data"))

    return _finalize(root.get("model", "mjcf"), builder, acts, init_qpos,
                     tendons)


def _finalize(name, builder, acts, init_qpos,
              tendons=()) -> T.ArticulationModel:
    bodies, joints, geoms = builder.bodies, builder.joints, builder.geoms
    nb = len(bodies)

    # joint addressing (joints already in tree order: walk is depth-first and
    # joints appear under their body)
    qadr, vadr = [], []
    nq = nv = 0
    for j in joints:
        qadr.append(nq)
        vadr.append(nv)
        nq += T.JOINT_NQ[j["type"]]
        nv += T.JOINT_NV[j["type"]]

    # dof-level arrays
    dof_damping = np.zeros(nv)
    dof_armature = np.zeros(nv)
    dof_stiffness = np.zeros(nv)
    dof_frictionloss = np.zeros(nv)
    dof_jnt = np.zeros(nv, dtype=np.int32)
    for ji, j in enumerate(joints):
        for k in range(T.JOINT_NV[j["type"]]):
            v = vadr[ji] + k
            dof_damping[v] = j["damping"]
            dof_armature[v] = j["armature"]
            dof_stiffness[v] = j["stiffness"]
            dof_frictionloss[v] = j["frictionloss"]
            dof_jnt[v] = ji

    jnt_name_to_idx = {j["name"]: i for i, j in enumerate(joints)}

    default_qpos = np.zeros(nq)
    for ji, j in enumerate(joints):
        if j["type"] == T.FREE:
            default_qpos[qadr[ji] + 3] = 1.0  # unit quat
        elif j["type"] == T.BALL:
            default_qpos[qadr[ji]] = 1.0
    if init_qpos is not None and len(init_qpos) == nq:
        default_qpos = np.asarray(init_qpos, dtype=np.float64)

    f32 = lambda x: np.asarray(x, dtype=np.float32)

    return T.ArticulationModel(
        name=name,
        body_parent=np.array([b["parent"] for b in bodies], dtype=np.int32),
        body_pos=f32([b["pos"] for b in bodies]).reshape(nb, 3),
        body_quat=f32([b["quat"] for b in bodies]).reshape(nb, 4),
        body_mass=f32([max(b["mass"], 1e-6) for b in bodies]),
        body_com=f32([b["com"] for b in bodies]).reshape(nb, 3),
        body_inertia=f32([b["inertia"] + np.eye(3) * 1e-7 for b in bodies]).reshape(nb, 3, 3),
        body_names=tuple(b["name"] for b in bodies),
        jnt_body=np.array([j["body"] for j in joints], dtype=np.int32),
        jnt_type=np.array([j["type"] for j in joints], dtype=np.int32),
        jnt_axis=f32([j["axis"] / max(np.linalg.norm(j["axis"]), 1e-12)
                      for j in joints]).reshape(len(joints), 3),
        jnt_pos=f32([j["pos"] for j in joints]).reshape(len(joints), 3),
        jnt_qadr=np.array(qadr, dtype=np.int32),
        jnt_vadr=np.array(vadr, dtype=np.int32),
        jnt_range=f32([j["range"] for j in joints]).reshape(len(joints), 2),
        jnt_limited=np.array([j["limited"] for j in joints], dtype=bool),
        jnt_pitch=f32([j.get("pitch", 0.0) for j in joints]),
        jnt_names=tuple(j["name"] for j in joints),
        dof_armature=f32(dof_armature),
        dof_damping=f32(dof_damping),
        dof_stiffness=f32(dof_stiffness),
        dof_frictionloss=f32(dof_frictionloss),
        dof_jnt=dof_jnt,
        act_jnt=np.array([jnt_name_to_idx[a["joint"]] for a in acts], dtype=np.int32),
        act_trntype=np.array([a["trntype"] for a in acts], dtype=np.int32),
        act_gear=f32([a["gear"] for a in acts]),
        act_ctrlrange=f32([a["ctrlrange"] for a in acts]).reshape(len(acts), 2),
        act_forcerange=f32([a["forcerange"] for a in acts]).reshape(len(acts), 2),
        act_kp=f32([a["kp"] for a in acts]),
        act_kd=f32([a["kd"] for a in acts]),
        act_names=tuple(a["name"] for a in acts),
        geom_body=np.array([g["body"] for g in geoms], dtype=np.int32),
        geom_type=np.array([g["type"] for g in geoms], dtype=np.int32),
        geom_size=f32([g["size"] for g in geoms]).reshape(len(geoms), 3),
        geom_pos=f32([g["pos"] for g in geoms]).reshape(len(geoms), 3),
        geom_quat=f32([g["quat"] for g in geoms]).reshape(len(geoms), 4),
        geom_friction=f32([g["friction"] for g in geoms]).reshape(len(geoms), 3),
        geom_contype=np.array([g["contype"] for g in geoms], dtype=np.int32),
        geom_conaffinity=np.array([g["conaffinity"] for g in geoms], dtype=np.int32),
        geom_names=tuple(g["name"] for g in geoms),
        init_qpos=f32(default_qpos),
        ten_adr=np.array(
            [0] + list(np.cumsum([len(t["joints"]) for t in tendons])),
            np.int32),
        ten_jnt=np.array([jnt_name_to_idx[jn] for t in tendons
                          for jn, _ in t["joints"]], np.int32),
        ten_coef=f32([c for t in tendons for _, c in t["joints"]]),
        ten_range=f32([t["range"] for t in tendons]).reshape(
            len(tendons), 2),
        ten_names=tuple(t["name"] for t in tendons),
    )
