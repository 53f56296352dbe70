"""Collision candidate generation + compliant contact forces.

TPU-first collision scheme: the set of potential contacts is enumerated
STATICALLY at model-build time (fixed shapes — no dynamic contact counts,
which would defeat XLA). Phase 1 covers ground contacts (plane or
heightfield) via per-geom candidate point sets:

  sphere  → 1 point (center, radius r)
  capsule → 2 points (axis endpoints, radius r)
  box     → 8 points (corners, radius 0)
  cylinder→ 8 points (rim samples of both caps, radius 0)

plus sphere↔sphere / capsule↔capsule body-pair candidates for explicitly
registered pairs (phase 2: hands/self-collision).

Forces use a compliant (Kelvin–Voigt) normal model with critical damping
scaled per contact by body mass, and regularized Coulomb friction — the
jit-friendly replacement for PhysX's iterative contact solver
(reference `docs/factory.md:142-158` knobs map onto
SimParams.contact_stiffness / friction_regularization).

Net per-body contact forces are also returned, replacing
`acquire_net_contact_force_tensor` (`tasks/anymal.py:112`) and force
sensors (`tasks/ant.py:174-178`).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import types as T
from ..core.maths import quat_rotate, point_force_to_spatial


@dataclasses.dataclass(frozen=True)
class ContactSet:
    """Static ground-contact candidates (numpy)."""

    body: np.ndarray      # (nc,) body index per candidate
    offset: np.ndarray    # (nc,3) point in body frame
    radius: np.ndarray    # (nc,)
    geom: np.ndarray      # (nc,) source geom index (for friction lookup)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @property
    def count(self):
        return len(self.body)


_BOX_CORNERS = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1)
                         for sz in (-1, 1)], dtype=np.float32)

# box-box candidates use the full surface lattice (corners + edge
# midpoints + face centers, 26 points): pure corner decomposition misses
# "cross" face-face configurations where neither box has a corner inside
# the other (e.g. gripper fingerpad faces clamping a nut flat)
_BOX_LATTICE = np.array([[sx, sy, sz] for sx in (-1, 0, 1)
                         for sy in (-1, 0, 1) for sz in (-1, 0, 1)
                         if (sx, sy, sz) != (0, 0, 0)], dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class PairSet:
    """Static body-pair contact candidates, decomposed into two primitive
    kinds at build time (fixed shapes for XLA):

      spheres : sphere(A) vs sphere(B)       — covers sphere-sphere, box
                corners / capsule endpoints as r-spheres where applicable
      segs    : capsule segment(A) vs capsule segment(B) — covers
                capsule-capsule and sphere-capsule (degenerate segment)
      sbox    : sphere(A) vs box(B)          — covers sphere-box,
                capsule-box (endpoint spheres), box-box (corner spheres)

    The TPU replacement for PhysX broadphase+narrowphase over registered
    actor pairs (hand↔object, ball↔tray): the candidate set is enumerated
    once at model build; inactive candidates are masked by depth.
    """

    # sphere-sphere: body/geom indices + body-frame centers + radii
    ss_body: np.ndarray    # (n,2) int32
    ss_geom: np.ndarray    # (n,2)
    ss_off: np.ndarray     # (n,2,3)
    ss_rad: np.ndarray     # (n,2)
    # segment-segment: body-frame endpoints (a0,a1,b0,b1) + radii
    cc_body: np.ndarray    # (m,2)
    cc_geom: np.ndarray    # (m,2)
    cc_pts: np.ndarray     # (m,4,3)
    cc_rad: np.ndarray     # (m,2)
    # sphere-box: sphere (body-frame center, radius) vs box (pose, half-size)
    sb_body: np.ndarray    # (k,2)
    sb_geom: np.ndarray    # (k,2)
    sb_off: np.ndarray     # (k,3) sphere center in body_a frame
    sb_rad: np.ndarray     # (k,)
    sb_pos: np.ndarray     # (k,3) box origin in body_b frame
    sb_quat: np.ndarray    # (k,4)
    sb_half: np.ndarray    # (k,3)
    # sphere-cylinder: sphere vs SOLID flat cylinder (tray discs)
    sc_body: np.ndarray = None   # (j,2)
    sc_geom: np.ndarray = None   # (j,2)
    sc_off: np.ndarray = None    # (j,3)
    sc_rad: np.ndarray = None    # (j,)
    sc_pos: np.ndarray = None    # (j,3) cylinder origin in body_b frame
    sc_quat: np.ndarray = None   # (j,4)
    sc_size: np.ndarray = None   # (j,2) radius, half-length
    # mesh-SDF: surface samples of body A vs a voxel SDF carried by body
    # B (the TPU equivalent of PhysX SDF mesh collision, reference
    # docs/factory.md:95-128; cooking in io/sdf.py / native/fastsdf.c).
    # Static shapes: the sample count is fixed at build; depth-ranked
    # capping (SimParams.max_contact_points) bounds solver rows.
    sdf_body: np.ndarray = None   # (p,2) int32
    sdf_geom: np.ndarray = None   # (p,2) friction/restitution source geoms
    sdf_off: np.ndarray = None    # (p,3) sample point in body_a frame
    sdf_grid_id: np.ndarray = None  # (p,) index into sdf_grids
    sdf_grids: tuple = None       # G × (n,n,n) float32, +outside/−inside
    sdf_origin: np.ndarray = None  # (G,3) voxel(0,0,0) in grid frame
    sdf_spacing: np.ndarray = None  # (G,)
    sdf_pos: np.ndarray = None     # (G,3) grid frame origin in body_b frame
    sdf_quat: np.ndarray = None    # (G,4) grid frame rotation (wxyz)
    sdf_sweep: int = 16            # CCD taps along each sample's path/substep

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @property
    def count(self):
        n = len(self.ss_body) + len(self.cc_body) + len(self.sb_body)
        if self.sc_body is not None:
            n += len(self.sc_body)
        if self.sdf_body is not None:
            n += len(self.sdf_body)
        return n


def build_pair_contacts(model: T.ArticulationModel,
                        pairs=None, body_pairs=None) -> PairSet:
    """Enumerate body-pair candidates.

    pairs: list of (geom_name_a, geom_name_b). body_pairs: list of
    (body_name_a, body_name_b) — expands to all geom pairs between the two
    bodies. None = all geom pairs whose bodies are distinct, not
    parent-child, and pass the contype/conaffinity filter
    ((ca & cb') | (cb & ca')) — MuJoCo-style, matching how the reference
    relies on PhysX collision filtering per actor (`create_actor`
    collision groups, `tasks/ant.py:190`)."""
    ss, cc, sb = [], [], []

    def geom_of(name):
        return model.geom_index(name)

    if body_pairs is not None:
        cand = []
        for na_, nb_ in body_pairs:
            ba_ = model.body_index(na_)
            bb_ = model.body_index(nb_)
            for ga in range(model.ngeom):
                if int(model.geom_body[ga]) != ba_:
                    continue
                for gb in range(model.ngeom):
                    if int(model.geom_body[gb]) == bb_:
                        cand.append((ga, gb))
    elif pairs is None:
        cand = []
        parent = model.body_parent
        for ga in range(model.ngeom):
            for gb in range(ga + 1, model.ngeom):
                ba, bb = int(model.geom_body[ga]), int(model.geom_body[gb])
                if ba == bb or ba < 0 or bb < 0:
                    continue
                if int(parent[ba]) == bb or int(parent[bb]) == ba:
                    continue
                ta, tb = int(model.geom_contype[ga]), int(model.geom_contype[gb])
                fa, fb = (int(model.geom_conaffinity[ga]),
                          int(model.geom_conaffinity[gb]))
                if not ((ta & fb) or (tb & fa)):
                    continue
                cand.append((ga, gb))
    else:
        cand = [(geom_of(a), geom_of(b)) for a, b in pairs]

    def seg_of(g):
        """Capsule/cylinder → body-frame endpoints + radius."""
        r, hl = float(model.geom_size[g][0]), float(model.geom_size[g][1])
        p, q = model.geom_pos[g], model.geom_quat[g]
        w, x, y, z = q
        axis = np.array([2 * (x * z + w * y), 2 * (y * z - w * x),
                         1 - 2 * (x * x + y * y)])  # R @ ez
        return p - hl * axis, p + hl * axis, r

    sc = []
    for ga, gb in cand:
        ta, tb = int(model.geom_type[ga]), int(model.geom_type[gb])
        ba, bb = int(model.geom_body[ga]), int(model.geom_body[gb])

        def sphere(g):
            return model.geom_pos[g], float(model.geom_size[g][0])

        # sphere vs cylinder: exact solid-cylinder narrowphase (tray discs)
        if {ta, tb} == {T.GEOM_SPHERE, T.GEOM_CYLINDER}:
            if ta == T.GEOM_CYLINDER:
                ga, gb, ta, tb, ba, bb = gb, ga, tb, ta, bb, ba
            ca, ra = sphere(ga)
            sc.append((ba, bb, ga, gb, ca, ra, model.geom_pos[gb],
                       model.geom_quat[gb], model.geom_size[gb][:2]))
            continue
        # other cylinder pairings approximate as capsule
        ta = T.GEOM_CAPSULE if ta == T.GEOM_CYLINDER else ta
        tb = T.GEOM_CAPSULE if tb == T.GEOM_CYLINDER else tb

        if (ta, tb) == (T.GEOM_SPHERE, T.GEOM_SPHERE):
            ca, ra = sphere(ga)
            cb, rb = sphere(gb)
            ss.append((ba, bb, ga, gb, ca, cb, ra, rb))
        elif {ta, tb} == {T.GEOM_SPHERE, T.GEOM_CAPSULE}:
            if ta == T.GEOM_CAPSULE:
                ga, gb, ta, tb, ba, bb = gb, ga, tb, ta, bb, ba
            ca, ra = sphere(ga)
            b0, b1, rb = seg_of(gb)
            cc.append((ba, bb, ga, gb, ca, ca, b0, b1, ra, rb))
        elif (ta, tb) == (T.GEOM_CAPSULE, T.GEOM_CAPSULE):
            a0, a1, ra = seg_of(ga)
            b0, b1, rb = seg_of(gb)
            cc.append((ba, bb, ga, gb, a0, a1, b0, b1, ra, rb))
        elif T.GEOM_BOX in (ta, tb) and T.GEOM_SPHERE in (ta, tb):
            if ta == T.GEOM_BOX:
                ga, gb, ta, tb, ba, bb = gb, ga, tb, ta, bb, ba
            ca, ra = sphere(ga)
            sb.append((ba, bb, ga, gb, ca, ra, model.geom_pos[gb],
                       model.geom_quat[gb], model.geom_size[gb]))
        elif T.GEOM_BOX in (ta, tb) and T.GEOM_CAPSULE in (ta, tb):
            if ta == T.GEOM_BOX:
                ga, gb, ta, tb, ba, bb = gb, ga, tb, ta, bb, ba
            a0, a1, ra = seg_of(ga)
            for pt in (a0, a1):
                sb.append((ba, bb, ga, gb, pt, ra, model.geom_pos[gb],
                           model.geom_quat[gb], model.geom_size[gb]))
        elif (ta, tb) == (T.GEOM_BOX, T.GEOM_BOX):
            def corners(g):
                from ..io.mjcf import _quat_to_mat_np
                R = _quat_to_mat_np(model.geom_quat[g])
                return [model.geom_pos[g] + R @ (c * model.geom_size[g])
                        for c in _BOX_LATTICE]
            for pt in corners(ga):
                sb.append((ba, bb, ga, gb, pt, 0.0, model.geom_pos[gb],
                           model.geom_quat[gb], model.geom_size[gb]))
            for pt in corners(gb):
                sb.append((bb, ba, gb, ga, pt, 0.0, model.geom_pos[ga],
                           model.geom_quat[ga], model.geom_size[ga]))
        # plane/hfield/mesh pairs unsupported (ground handles plane/hfield)

    f32 = np.float32
    return PairSet(
        ss_body=np.array([(a[0], a[1]) for a in ss], np.int32).reshape(-1, 2),
        ss_geom=np.array([(a[2], a[3]) for a in ss], np.int32).reshape(-1, 2),
        ss_off=np.array([(a[4], a[5]) for a in ss], f32).reshape(-1, 2, 3),
        ss_rad=np.array([(a[6], a[7]) for a in ss], f32).reshape(-1, 2),
        cc_body=np.array([(a[0], a[1]) for a in cc], np.int32).reshape(-1, 2),
        cc_geom=np.array([(a[2], a[3]) for a in cc], np.int32).reshape(-1, 2),
        cc_pts=np.array([(a[4], a[5], a[6], a[7]) for a in cc],
                        f32).reshape(-1, 4, 3),
        cc_rad=np.array([(a[8], a[9]) for a in cc], f32).reshape(-1, 2),
        sb_body=np.array([(a[0], a[1]) for a in sb], np.int32).reshape(-1, 2),
        sb_geom=np.array([(a[2], a[3]) for a in sb], np.int32).reshape(-1, 2),
        sb_off=np.array([a[4] for a in sb], f32).reshape(-1, 3),
        sb_rad=np.array([a[5] for a in sb], f32).reshape(-1),
        sb_pos=np.array([a[6] for a in sb], f32).reshape(-1, 3),
        sb_quat=np.array([a[7] for a in sb], f32).reshape(-1, 4),
        sb_half=np.array([a[8] for a in sb], f32).reshape(-1, 3),
        sc_body=np.array([(a[0], a[1]) for a in sc], np.int32).reshape(-1, 2),
        sc_geom=np.array([(a[2], a[3]) for a in sc], np.int32).reshape(-1, 2),
        sc_off=np.array([a[4] for a in sc], f32).reshape(-1, 3),
        sc_rad=np.array([a[5] for a in sc], f32).reshape(-1),
        sc_pos=np.array([a[6] for a in sc], f32).reshape(-1, 3),
        sc_quat=np.array([a[7] for a in sc], f32).reshape(-1, 4),
        sc_size=np.array([a[8] for a in sc], f32).reshape(-1, 2),
    )


def _closest_seg_seg(p1, q1, p2, q2):
    """Closest points between segments [p1,q1], [p2,q2] (branchless,
    Ericson 5.1.9). All (..., 3). Returns (c1, c2)."""
    d1 = q1 - p1
    d2 = q2 - p2
    r = p1 - p2
    a = jnp.sum(d1 * d1, -1)
    e = jnp.sum(d2 * d2, -1)
    f = jnp.sum(d2 * r, -1)
    c = jnp.sum(d1 * r, -1)
    b = jnp.sum(d1 * d2, -1)
    denom = a * e - b * b
    s = jnp.where(denom > 1e-12, jnp.clip((b * f - c * e)
                                          / jnp.maximum(denom, 1e-12),
                                          0.0, 1.0), 0.0)
    t = (b * s + f) / jnp.maximum(e, 1e-12)
    t_cl = jnp.clip(t, 0.0, 1.0)
    # re-clamp s for clamped t
    s = jnp.clip((t_cl * b - c) / jnp.maximum(a, 1e-12), 0.0, 1.0)
    c1 = p1 + s[..., None] * d1
    c2 = p2 + t_cl[..., None] * d2
    return c1, c2


def pair_contact_geometry(model: T.ArticulationModel, params: T.PhysParams,
                          kin: T.Kinematics, ps: PairSet, h=None):
    """Runtime narrowphase for the static candidates: returns
    (depth (npc,), normal (npc,3) pointing B→A, cpt (npc,3),
     body_a, body_b (npc,), mu (npc,), e (npc,) restitution) —
    concatenated over the contact kinds. Radii/offsets are scaled at
    runtime by params.geom_scale (per-env actor `scale` DR — the
    reference could only do this setup_only, docs/domain_randomization.md:
    96-100); restitution combines by average (PhysX default mode)."""
    dtype = kin.body_pos.dtype
    depths, normals, cpts, bas, bbs, mus, es = [], [], [], [], [], [], []
    gf = params.geom_friction.astype(dtype)
    gs = (params.geom_scale.astype(dtype) if params.geom_scale is not None
          else jnp.ones_like(gf))
    gr = (params.geom_restitution.astype(dtype)
          if params.geom_restitution is not None else jnp.zeros_like(gf))

    def world_pt(body, off):
        return kin.body_pos[body] + quat_rotate(kin.body_quat[body], off)

    if len(ps.ss_body):
        ba, bb = ps.ss_body[:, 0], ps.ss_body[:, 1]
        ga, gb = jnp.asarray(ps.ss_geom[:, 0]), jnp.asarray(ps.ss_geom[:, 1])
        sa, sb_ = gs[ga], gs[gb]
        pa = world_pt(jnp.asarray(ba),
                      jnp.asarray(ps.ss_off[:, 0], dtype) * sa[:, None])
        pb = world_pt(jnp.asarray(bb),
                      jnp.asarray(ps.ss_off[:, 1], dtype) * sb_[:, None])
        d = pa - pb
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(dist, 1e-9)[..., None]
        ra = jnp.asarray(ps.ss_rad[:, 0], dtype) * sa
        rb = jnp.asarray(ps.ss_rad[:, 1], dtype) * sb_
        depth = ra + rb - dist
        cpt = pb + n * (rb - 0.5 * depth)[..., None]
        depths.append(depth); normals.append(n); cpts.append(cpt)
        bas.append(jnp.asarray(ba)); bbs.append(jnp.asarray(bb))
        mus.append(0.5 * (gf[ga] + gf[gb]))
        es.append(0.5 * (gr[ga] + gr[gb]))

    if len(ps.cc_body):
        ba, bb = ps.cc_body[:, 0], ps.cc_body[:, 1]
        ga, gb = jnp.asarray(ps.cc_geom[:, 0]), jnp.asarray(ps.cc_geom[:, 1])
        sa, sb_ = gs[ga], gs[gb]
        a0 = world_pt(jnp.asarray(ba),
                      jnp.asarray(ps.cc_pts[:, 0], dtype) * sa[:, None])
        a1 = world_pt(jnp.asarray(ba),
                      jnp.asarray(ps.cc_pts[:, 1], dtype) * sa[:, None])
        b0 = world_pt(jnp.asarray(bb),
                      jnp.asarray(ps.cc_pts[:, 2], dtype) * sb_[:, None])
        b1 = world_pt(jnp.asarray(bb),
                      jnp.asarray(ps.cc_pts[:, 3], dtype) * sb_[:, None])
        c1, c2 = _closest_seg_seg(a0, a1, b0, b1)
        d = c1 - c2
        dist = jnp.linalg.norm(d, axis=-1)
        n = d / jnp.maximum(dist, 1e-9)[..., None]
        ra = jnp.asarray(ps.cc_rad[:, 0], dtype) * sa
        rb = jnp.asarray(ps.cc_rad[:, 1], dtype) * sb_
        depth = ra + rb - dist
        cpt = c2 + n * (rb - 0.5 * depth)[..., None]
        depths.append(depth); normals.append(n); cpts.append(cpt)
        bas.append(jnp.asarray(ba)); bbs.append(jnp.asarray(bb))
        mus.append(0.5 * (gf[ga] + gf[gb]))
        es.append(0.5 * (gr[ga] + gr[gb]))

    if len(ps.sb_body):
        from ..core.maths import quat_mul, quat_conj, quat_rotate_inv
        ba, bb = ps.sb_body[:, 0], ps.sb_body[:, 1]
        ga, gb = jnp.asarray(ps.sb_geom[:, 0]), jnp.asarray(ps.sb_geom[:, 1])
        sa, sb_ = gs[ga], gs[gb]
        pa = world_pt(jnp.asarray(ba),
                      jnp.asarray(ps.sb_off, dtype) * sa[:, None])
        # box world pose
        bq = quat_mul(kin.body_quat[jnp.asarray(bb)],
                      jnp.asarray(ps.sb_quat, dtype))
        bp = world_pt(jnp.asarray(bb),
                      jnp.asarray(ps.sb_pos, dtype) * sb_[:, None])
        # sphere center in box frame
        local = quat_rotate_inv(bq, pa - bp)
        half = jnp.asarray(ps.sb_half, dtype) * sb_[:, None]
        clamped = jnp.clip(local, -half, half)
        outside = jnp.linalg.norm(local - clamped, axis=-1) > 1e-9
        # inside: push out along min-penetration axis. One-hot select, NOT
        # .at[arange, ax].set(): that scatter serialized on TPU — the
        # round-3 stage profile measured this narrowphase at 61 ms of the
        # 457 ms ShadowHand-16384 step, dominated by these two scatters.
        pen_ax = half - jnp.abs(local)                  # (k,3) ≥0 inside
        ax = jnp.argmin(pen_ax, axis=-1)
        oh = jax.nn.one_hot(ax, 3, dtype=local.dtype)   # (k,3)
        loc_ax = jnp.sum(local * oh, axis=-1)
        sign = jnp.sign(loc_ax + 1e-30)
        half_ax = jnp.sum(half * oh, axis=-1)
        surf_in = local * (1.0 - oh) + (sign * half_ax)[:, None] * oh
        n_in = sign[:, None] * oh
        surf = jnp.where(outside[:, None], clamped, surf_in)
        d_out = local - clamped
        n_loc = jnp.where(
            outside[:, None],
            d_out / jnp.maximum(jnp.linalg.norm(d_out, axis=-1,
                                                keepdims=True), 1e-9),
            n_in)
        rad = jnp.asarray(ps.sb_rad, dtype) * sa
        dist = jnp.where(outside, jnp.linalg.norm(d_out, axis=-1),
                         -jnp.min(pen_ax, axis=-1))
        depth = rad - dist
        n = quat_rotate(bq, n_loc)
        cpt_w = bp + quat_rotate(bq, surf)
        depths.append(depth); normals.append(n); cpts.append(cpt_w)
        bas.append(jnp.asarray(ba)); bbs.append(jnp.asarray(bb))
        mus.append(0.5 * (gf[ga] + gf[gb]))
        es.append(0.5 * (gr[ga] + gr[gb]))

    if ps.sc_body is not None and len(ps.sc_body):
        from ..core.maths import quat_mul, quat_rotate_inv
        ba, bb = ps.sc_body[:, 0], ps.sc_body[:, 1]
        ga, gb = jnp.asarray(ps.sc_geom[:, 0]), jnp.asarray(ps.sc_geom[:, 1])
        sa, sb_ = gs[ga], gs[gb]
        pa = world_pt(jnp.asarray(ba),
                      jnp.asarray(ps.sc_off, dtype) * sa[:, None])
        cq = quat_mul(kin.body_quat[jnp.asarray(bb)],
                      jnp.asarray(ps.sc_quat, dtype))
        cp = world_pt(jnp.asarray(bb),
                      jnp.asarray(ps.sc_pos, dtype) * sb_[:, None])
        local = quat_rotate_inv(cq, pa - cp)          # sphere center, cyl frame
        R = jnp.asarray(ps.sc_size[:, 0], dtype) * sb_
        H = jnp.asarray(ps.sc_size[:, 1], dtype) * sb_
        rxy = jnp.linalg.norm(local[:, :2], axis=-1)
        dir_xy = local[:, :2] / jnp.maximum(rxy, 1e-9)[:, None]
        out_r = rxy > R
        out_z = jnp.abs(local[:, 2]) > H
        outside = out_r | out_z
        cl_r = jnp.minimum(rxy, R)
        cl_z = jnp.clip(local[:, 2], -H, H)
        surf_out = jnp.concatenate([dir_xy * cl_r[:, None],
                                    cl_z[:, None]], axis=-1)
        # inside: push out via the smaller of radial / axial penetration
        pen_r = R - rxy
        pen_z = H - jnp.abs(local[:, 2])
        axial = pen_z <= pen_r
        sgn = jnp.sign(local[:, 2] + 1e-12)
        surf_in = jnp.where(
            axial[:, None],
            jnp.concatenate([local[:, :2], (sgn * H)[:, None]], -1),
            jnp.concatenate([dir_xy * R[:, None], local[:, 2:3]], -1))
        n_in = jnp.where(
            axial[:, None],
            jnp.concatenate([jnp.zeros_like(dir_xy), sgn[:, None]], -1),
            jnp.concatenate([dir_xy, jnp.zeros_like(sgn)[:, None]], -1))
        surf = jnp.where(outside[:, None], surf_out, surf_in)
        d_out = local - surf
        n_loc = jnp.where(
            outside[:, None],
            d_out / jnp.maximum(jnp.linalg.norm(d_out, axis=-1,
                                                keepdims=True), 1e-9),
            n_in)
        rad = jnp.asarray(ps.sc_rad, dtype) * sa
        dist = jnp.where(outside, jnp.linalg.norm(d_out, axis=-1),
                         -jnp.minimum(pen_r, pen_z))
        depth = rad - dist
        n = quat_rotate(cq, n_loc)
        cpt_w = cp + quat_rotate(cq, surf)
        depths.append(depth); normals.append(n); cpts.append(cpt_w)
        bas.append(jnp.asarray(ba)); bbs.append(jnp.asarray(bb))
        mus.append(0.5 * (gf[ga] + gf[gb]))
        es.append(0.5 * (gr[ga] + gr[gb]))

    if ps.sdf_body is not None and len(ps.sdf_body):
        from ..core.maths import quat_mul, quat_rotate_inv
        # static unroll over grids (G is tiny — one per SDF mesh)
        for g_id, grid_np in enumerate(ps.sdf_grids):
            sel = np.where(np.asarray(ps.sdf_grid_id) == g_id)[0]
            if not len(sel):
                continue
            grid = jnp.asarray(grid_np, dtype)
            dims_hi = jnp.asarray(
                np.asarray(grid_np.shape, np.float64) - 1 - 1e-4, dtype)
            dims_i2 = jnp.asarray(
                np.asarray(grid_np.shape, np.int32) - 2)
            spacing = float(ps.sdf_spacing[g_id])
            origin = jnp.asarray(ps.sdf_origin[g_id], dtype)
            ba = ps.sdf_body[sel, 0]
            bb = ps.sdf_body[sel, 1]
            ga = jnp.asarray(ps.sdf_geom[sel, 0])
            gb = jnp.asarray(ps.sdf_geom[sel, 1])
            sa, sb_ = gs[ga], gs[gb]
            pa = world_pt(jnp.asarray(ba),
                          jnp.asarray(ps.sdf_off[sel], dtype) * sa[:, None])
            gq = quat_mul(kin.body_quat[jnp.asarray(bb)],
                          jnp.broadcast_to(
                              jnp.asarray(ps.sdf_quat[g_id], dtype), (len(sel), 4)))
            gp = world_pt(jnp.asarray(bb),
                          jnp.broadcast_to(
                              jnp.asarray(ps.sdf_pos[g_id], dtype), (len(sel), 3)))
            # per-env geom scale of the SDF carrier rescales the field
            # (divide query, multiply distance)
            local = quat_rotate_inv(gq, pa - gp) / sb_[:, None]

            def _tri(uu, with_grad=False):
                """Trilinear SDF value at voxel coords uu (...,3) plus
                the clamped out-of-grid excess (distance units); with
                with_grad also the analytic gradient (voxel coords).
                Single source of truth for clamping/excess — the sweep
                and the final row evaluation must agree or the chosen
                tap's φ wouldn't match the reported depth."""
                uuc = jnp.clip(uu, 0.0, dims_hi)
                ii = jnp.clip(jnp.floor(uuc).astype(jnp.int32), 0, dims_i2)
                ff = uuc - ii
                val = jnp.zeros(uu.shape[:-1], dtype)
                g = [jnp.zeros(uu.shape[:-1], dtype) for _ in range(3)]
                for dx_ in (0, 1):
                    for dy_ in (0, 1):
                        for dz_ in (0, 1):
                            wx_ = ff[..., 0] if dx_ else 1 - ff[..., 0]
                            wy_ = ff[..., 1] if dy_ else 1 - ff[..., 1]
                            wz_ = ff[..., 2] if dz_ else 1 - ff[..., 2]
                            c = grid[ii[..., 0] + dx_, ii[..., 1] + dy_,
                                     ii[..., 2] + dz_]
                            val = val + c * wx_ * wy_ * wz_
                            if with_grad:
                                g[0] = g[0] + c * (2 * dx_ - 1) * wy_ * wz_
                                g[1] = g[1] + c * wx_ * (2 * dy_ - 1) * wz_
                                g[2] = g[2] + c * wx_ * wy_ * (2 * dz_ - 1)
                val = val + jnp.linalg.norm(uu - uuc, axis=-1) * spacing
                if not with_grad:
                    return val
                return val, jnp.stack(g, axis=-1)

            # swept sampling (PhysX speculative-CCD analogue): thread
            # crests are ~0.5 mm thin while a free-falling sample moves
            # several mm per substep, so the substep-START distance
            # misses barriers the path crosses. March each sample along
            # its relative displacement over the substep in grid space
            # and take the minimum-φ tap; the row's depth/normal then
            # describe the worst point on the path, which the solver's
            # speculative bias stops BEFORE it tunnels.
            taps = int(getattr(ps, "sdf_sweep", 0) or 0)
            if taps > 1 and h is not None:
                bv_a = kin.body_vel[jnp.asarray(ba)]
                bv_b = kin.body_vel[jnp.asarray(bb)]
                rel = pa - kin.ref
                v_rel = (bv_a[:, 3:] + jnp.cross(bv_a[:, :3], rel)
                         - bv_b[:, 3:] - jnp.cross(bv_b[:, :3], rel))
                dloc = quat_rotate_inv(gq, v_rel) * (h / sb_[:, None])
                ts = jnp.linspace(0.0, 1.0, taps, dtype=dtype)
                u_sw = (local[None] + ts[:, None, None] * dloc[None]
                        - origin) / spacing                 # (K,p,3)
                phi_sw = _tri(u_sw)                         # (K,p)
                # FIRST surface crossing, not deepest point: at a thin
                # crest the deepest tap's gradient points out the FAR
                # side half the time (an active downward ratchet for a
                # nut on threads); the entry tap's gradient always
                # points back toward the approach side. No crossing ⇒
                # closest approach (pure speculative row).
                crossed = phi_sw < 0.0
                tstar = jnp.where(crossed.any(axis=0),
                                  jnp.argmax(crossed, axis=0),
                                  jnp.argmin(phi_sw, axis=0))  # (p,)
                u = jnp.take_along_axis(
                    u_sw, tstar[None, :, None], axis=0)[0]
                pa = pa + ts[tstar, None] * v_rel * h       # swept point
            else:
                u = (local - origin) / spacing
            # value (incl. the out-of-grid excess that ranks far samples
            # as deeply separated, so they never win the top-k cap) +
            # analytic gradient at the selected position
            phi, grad = _tri(u, with_grad=True)
            phi_w = phi * sb_
            n_loc = grad / jnp.maximum(
                jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-9)
            n = quat_rotate(gq, n_loc)
            depth = -phi_w
            cpt = pa - phi_w[:, None] * n      # project onto the surface
            depths.append(depth); normals.append(n); cpts.append(cpt)
            bas.append(jnp.asarray(ba)); bbs.append(jnp.asarray(bb))
            mus.append(0.5 * (gf[ga] + gf[gb]))
            es.append(0.5 * (gr[ga] + gr[gb]))

    return (jnp.concatenate(depths), jnp.concatenate(normals),
            jnp.concatenate(cpts), jnp.concatenate(bas),
            jnp.concatenate(bbs), jnp.concatenate(mus),
            jnp.concatenate(es))


def add_sdf_pairs(ps: PairSet, model: T.ArticulationModel, specs) -> PairSet:
    """Attach mesh-SDF contact candidates to a PairSet.

    specs: iterable of dicts —
      body_a / geom_a : names; surface-sampled side (points)
      mesh_a          : OBJ/STL path sampled for contact points
      pts_a           : explicit (n,3) body-frame sample points —
                        replaces mesh_a sampling (primitive bodies,
                        e.g. a cube's corners vs an arena boundary)
      body_b / geom_b : names; SDF-carrying side
      mesh_b          : OBJ/STL path voxelized to a signed distance grid
      scale_a/scale_b : mesh scale factors (default 1.0)
      npts            : surface sample count (default 256; static shape)
      grid_n          : cubic SDF resolution (default 64)
      spacing         : explicit voxel spacing — switches to the cropped
                        per-axis-dims cook (io/sdf.mesh_sdf_cropped);
                        with crop_lo / crop_hi bounding the region of
                        interest (e.g. a bolt's threaded shank, whose
                        ~1 mm thread profile a coarse cubic grid blurs
                        into nothing)
      seed            : sampling seed (default 0)
      keep_fn         : optional f(pts (n,3)) -> bool mask restricting
                        samples to a region (e.g. a nut's threaded bore);
                        kept samples are tiled back up to npts.

    The TPU analogue of PhysX SDF mesh collision (reference
    docs/factory.md:95-128): cook once host-side (io/sdf.py), sample
    with static shapes under jit."""
    from ..io.sdf import mesh_sdf, mesh_sdf_cropped, mesh_surface_points
    bodies, geoms, offs, gids = [], [], [], []
    grids, origins, spacings, gposs, gquats = [], [], [], [], []
    def _bidx(v):
        return int(v) if isinstance(v, (int, np.integer)) \
            else model.body_index(v)

    def _gidx(v):
        return int(v) if isinstance(v, (int, np.integer)) \
            else model.geom_index(v)

    for spec in specs:
        ba = _bidx(spec["body_a"])
        bb = _bidx(spec["body_b"])
        ga = _gidx(spec["geom_a"])
        gb = _gidx(spec["geom_b"])
        if spec.get("pts_a") is not None:
            pts = np.asarray(spec["pts_a"], np.float32)
            npts = len(pts)
        else:
            npts = int(spec.get("npts", 256))
            pts, _nrm = mesh_surface_points(
                spec["mesh_a"], spec.get("scale_a", 1.0), npts,
                int(spec.get("seed", 0)))
        keep = spec.get("keep_fn")
        if keep is not None:
            mask = np.asarray(keep(pts), bool)
            if not mask.any():
                raise ValueError(
                    f"keep_fn rejected all {npts} surface samples of "
                    f"{spec['mesh_a']} — region predicate mis-sized?")
            kept = pts[mask]
            reps = int(np.ceil(npts / len(kept)))
            pts = np.tile(kept, (reps, 1))[:npts]
        if spec.get("spacing"):
            sdf, origin, spacing = mesh_sdf_cropped(
                spec["mesh_b"], spec.get("scale_b", 1.0),
                float(spec["spacing"]), spec.get("crop_lo"),
                spec.get("crop_hi"))
        else:
            sdf, origin, spacing = mesh_sdf(
                spec["mesh_b"], spec.get("scale_b", 1.0),
                int(spec.get("grid_n", 64)))
        gid = len(grids)
        grids.append(np.asarray(sdf, np.float32))
        origins.append(np.asarray(origin, np.float32))
        spacings.append(float(spacing))
        gposs.append(np.asarray(spec.get("grid_pos", (0, 0, 0)), np.float32))
        gquats.append(np.asarray(spec.get("grid_quat", (1, 0, 0, 0)),
                                 np.float32))
        n_s = len(pts)
        bodies.append(np.stack([np.full(n_s, ba), np.full(n_s, bb)], 1))
        geoms.append(np.stack([np.full(n_s, ga), np.full(n_s, gb)], 1))
        offs.append(np.asarray(pts, np.float32))
        gids.append(np.full(n_s, gid, np.int32))
    return dataclasses.replace(
        ps,
        sdf_body=np.concatenate(bodies).astype(np.int32),
        sdf_geom=np.concatenate(geoms).astype(np.int32),
        sdf_off=np.concatenate(offs),
        sdf_grid_id=np.concatenate(gids),
        sdf_grids=tuple(grids),
        sdf_origin=np.stack(origins),
        sdf_spacing=np.asarray(spacings, np.float32),
        sdf_pos=np.stack(gposs),
        sdf_quat=np.stack(gquats),
        sdf_sweep=max(int(s.get("sweep", 16)) for s in specs))


@functools.lru_cache(maxsize=None)
def build_ground_contacts(model: T.ArticulationModel) -> ContactSet:
    """Enumerate candidate points of all body geoms vs the ground.

    Bodies rigidly fixed to the world (no joint anywhere on their
    ancestor chain — fixed-base roots, static table/stage actors) are
    skipped: their dof-mask column is all-zero so a ground row on them
    can never move anything, but it would still occupy solver rows and
    compete for the max_contact_points cap."""
    bodies, offsets, radii, geoms = [], [], [], []

    def _quat_rotate_np(q, v):
        w = q[0]
        qv = q[1:4]
        t = 2.0 * np.cross(qv, v)
        return v + w * t + np.cross(qv, t)

    parent = np.asarray(model.body_parent)
    jnt_body = np.asarray(model.jnt_body)
    dynamic = np.zeros(model.nbody, bool)
    for b in range(model.nbody):  # topological order: parents first
        dynamic[b] = (jnt_body == b).any() or \
            (parent[b] >= 0 and dynamic[parent[b]])

    for g in range(model.ngeom):
        b = int(model.geom_body[g])
        if b < 0:
            continue  # static world geom
        if not dynamic[b]:
            continue  # world-fixed body: ground rows would be inert
        gt = int(model.geom_type[g])
        gpos, gquat = model.geom_pos[g], model.geom_quat[g]
        size = model.geom_size[g]
        if gt == T.GEOM_SPHERE:
            pts, r = [np.zeros(3)], size[0]
        elif gt == T.GEOM_CAPSULE:
            pts, r = [np.array([0, 0, size[1]]), np.array([0, 0, -size[1]])], size[0]
        elif gt == T.GEOM_BOX:
            pts, r = list(_BOX_CORNERS * size[None, :3]), 0.0
        elif gt == T.GEOM_CYLINDER:
            ring = []
            for sz in (-1.0, 1.0):
                for ang in (0, np.pi / 2, np.pi, 3 * np.pi / 2):
                    ring.append(np.array([size[0] * np.cos(ang),
                                          size[0] * np.sin(ang), sz * size[1]]))
            pts, r = ring, 0.0
        else:
            continue  # mesh/plane/hfield: no auto ground candidates
        for p in pts:
            bodies.append(b)
            offsets.append(gpos + _quat_rotate_np(gquat, p))
            radii.append(r)
            geoms.append(g)

    return ContactSet(
        body=np.asarray(bodies, dtype=np.int32),
        offset=np.asarray(offsets, dtype=np.float32).reshape(len(bodies), 3),
        radius=np.asarray(radii, dtype=np.float32),
        geom=np.asarray(geoms, dtype=np.int32),
    )


def ground_contact_forces(model: T.ArticulationModel, params: T.PhysParams,
                          sim: T.SimParams, kin: T.Kinematics,
                          contacts: ContactSet,
                          height_fn=None):
    """Compute contact forces against the ground (plane z=0 or heightfield).

    height_fn: optional (x, y) → (height, normal(3,)) vectorized over
    candidates (terrain support). Defaults to flat plane.

    Returns (f_ext (nb,6) spatial forces about origin,
             body_contact_force (nb,3) net world contact force per body).
    """
    nb = model.nbody
    dtype = kin.body_pos.dtype
    if contacts.count == 0:
        z = jnp.zeros((nb, 6), dtype)
        return z, jnp.zeros((nb, 3), dtype)

    b = jnp.asarray(contacts.body)
    off = jnp.asarray(contacts.offset, dtype)
    rad = jnp.asarray(contacts.radius, dtype)

    pos_b = kin.body_pos[b]                       # (nc,3)
    quat_b = kin.body_quat[b]
    p = pos_b + quat_rotate(quat_b, off)          # candidate centers, world

    if height_fn is None:
        ground_h = jnp.zeros(p.shape[:-1], dtype)
        normal = jnp.zeros_like(p).at[..., 2].set(1.0)
    else:
        ground_h, normal = height_fn(p[..., 0], p[..., 1])

    # vertical-gap penetration: exact for the plane, good approximation for
    # mostly-vertical terrain normals
    depth = rad + ground_h - p[..., 2]

    contact_pt = p - normal * rad[..., None]
    cpt_rel = contact_pt - kin.ref                # about the spatial ref point

    # velocity of the material point
    v6 = kin.body_vel[b]                          # (nc,6)
    v_pt = v6[..., 3:] + jnp.cross(v6[..., :3], cpt_rel)

    vn = jnp.einsum("...i,...i->...", v_pt, normal)
    vt = v_pt - vn[..., None] * normal

    # compliant normal force with mass-scaled critical damping
    m_body = params.body_mass.astype(dtype)[b]
    k = jnp.asarray(sim.contact_stiffness, dtype)
    c = sim.contact_damping_ratio * 2.0 * jnp.sqrt(k * m_body)
    active = depth > 0.0
    fn = jnp.where(active, k * depth - c * vn, 0.0)
    fn = jnp.clip(fn, 0.0, None)

    # regularized Coulomb friction
    # ft = -mu*fn * vt/|vt| * min(1, |vt|/v_reg)
    mu = params.geom_friction.astype(dtype)[jnp.asarray(contacts.geom)]
    gmat = int(getattr(sim, "ground_material_geom", -1))
    if gmat >= 0:  # plane material combine (average, PhysX default)
        mu = 0.5 * (mu + params.geom_friction.astype(dtype)[gmat])
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    ft_mag = mu * fn * jnp.minimum(vt_norm / sim.friction_regularization, 1.0)
    ft = -ft_mag[..., None] * vt / jnp.maximum(vt_norm, 1e-6)[..., None]

    force = fn[..., None] * normal + ft           # (nc,3)
    f_spatial = point_force_to_spatial(force, cpt_rel)  # (nc,6) about ref

    f_ext = jax.ops.segment_sum(f_spatial, b, num_segments=nb)
    body_cf = jax.ops.segment_sum(force, b, num_segments=nb)
    return f_ext, body_cf
