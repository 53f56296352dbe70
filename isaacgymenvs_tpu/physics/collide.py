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


@functools.lru_cache(maxsize=None)
def build_ground_contacts(model: T.ArticulationModel) -> ContactSet:
    """Enumerate candidate points of all body geoms vs the ground."""
    bodies, offsets, radii, geoms = [], [], [], []

    def _quat_rotate_np(q, v):
        w = q[0]
        qv = q[1:4]
        t = 2.0 * np.cross(qv, v)
        return v + w * t + np.cross(qv, t)

    for g in range(model.ngeom):
        b = int(model.geom_body[g])
        if b < 0:
            continue  # static world geom
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
    vt_norm = jnp.linalg.norm(vt, axis=-1)
    ft_mag = mu * fn * jnp.minimum(vt_norm / sim.friction_regularization, 1.0)
    ft = -ft_mag[..., None] * vt / jnp.maximum(vt_norm, 1e-6)[..., None]

    force = fn[..., None] * normal + ft           # (nc,3)
    f_spatial = point_force_to_spatial(force, cpt_rel)  # (nc,6) about ref

    f_ext = jax.ops.segment_sum(f_spatial, b, num_segments=nb)
    body_cf = jax.ops.segment_sum(force, b, num_segments=nb)
    return f_ext, body_cf
