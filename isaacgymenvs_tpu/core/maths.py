"""Quaternion / rotation / spatial-vector algebra for the TPU physics core.

Pure jax.numpy, unbatched (operates on trailing dims) so every function is
`vmap`- and broadcast-friendly. Quaternions are **wxyz** throughout the
framework (MuJoCo convention; note the reference Isaac Gym API uses xyzw —
see /root/reference/isaacgymenvs/utils/torch_jit_utils.py for the kernels
these replace).

Spatial (6D) vectors follow Featherstone with **angular-first** ordering
``[omega(3); v(3)]`` for motion and ``[torque(3); force(3)]`` for forces,
expressed in the world frame about a common origin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions (wxyz)
# ---------------------------------------------------------------------------


def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b (trailing dim 4, wxyz)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jax.Array) -> jax.Array:
    """Inverse for unit quaternions (== conjugate)."""
    return quat_conj(q)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector v by unit quaternion q (world = q ⊗ local)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    # v' = v + 2 qv × (qv × v + qw v)
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate v by q⁻¹ (world → local)."""
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * jnp.cross(qv, v)
    return v - qw * t + jnp.cross(qv, t)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit quaternion for rotation of `angle` about unit `axis`."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def quat_to_mat(q: jax.Array) -> jax.Array:
    """3x3 rotation matrix from unit quaternion (trailing dims (...,3,3))."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_mat(m: jax.Array) -> jax.Array:
    """Unit quaternion (wxyz) from a rotation matrix. Branch-free Shepperd."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    # Four candidate constructions; pick the numerically best by max pivot.
    qw = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                    1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    qw = jnp.sqrt(jnp.maximum(qw, 1e-12)) * 0.5
    w0, x1, y2, z3 = qw[..., 0], qw[..., 1], qw[..., 2], qw[..., 3]
    cand = jnp.stack(
        [
            jnp.stack([w0, (m21 - m12) / (4 * w0), (m02 - m20) / (4 * w0),
                       (m10 - m01) / (4 * w0)], axis=-1),
            jnp.stack([(m21 - m12) / (4 * x1), x1, (m01 + m10) / (4 * x1),
                       (m02 + m20) / (4 * x1)], axis=-1),
            jnp.stack([(m02 - m20) / (4 * y2), (m01 + m10) / (4 * y2), y2,
                       (m12 + m21) / (4 * y2)], axis=-1),
            jnp.stack([(m10 - m01) / (4 * z3), (m02 + m20) / (4 * z3),
                       (m12 + m21) / (4 * z3), z3], axis=-1),
        ],
        axis=-2,
    )
    idx = jnp.argmax(qw, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1), -2)
    q = q[..., 0, :]
    return quat_normalize(q)


def quat_normalize(q: jax.Array, eps: float = 1e-9) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_integrate(q: jax.Array, omega_world: jax.Array, dt) -> jax.Array:
    """Integrate unit quaternion by world angular velocity over dt.

    Exponential-map update: q' = exp(ω dt / 2) ⊗ q (exact for constant ω).
    """
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    # sinc-safe axis
    axis = omega_world / jnp.maximum(angle, 1e-9)
    dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
    return quat_normalize(quat_mul(dq, q))


def quat_to_angle_axis(q: jax.Array):
    """(angle, axis) with angle in [0, pi]. Mirrors reference
    torch_jit_utils.quat_to_angle_axis (which is xyzw; ours is wxyz)."""
    w = q[..., 0]
    v = q[..., 1:4]
    sin_half = jnp.linalg.norm(v, axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, w)
    axis = v / jnp.maximum(sin_half, 1e-9)[..., None]
    return angle, axis


def quat_to_exp_map(q: jax.Array) -> jax.Array:
    """Exponential-map (angle*axis) encoding. Ref: torch_jit_utils.py:230."""
    angle, axis = quat_to_angle_axis(q)
    return angle[..., None] * axis


def quat_to_tan_norm(q: jax.Array) -> jax.Array:
    """6D rotation encoding: rotated x-axis (tangent) and z-axis (normal).

    Ref: torch_jit_utils.py:245 (quat_to_tan_norm)."""
    ex = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 0].set(1.0)
    ez = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    return jnp.concatenate([quat_rotate(q, ex), quat_rotate(q, ez)], axis=-1)


def quat_diff_rad(a: jax.Array, b: jax.Array) -> jax.Array:
    """Rotation angle between two quaternions. Ref: torch_jit_utils.py:141."""
    d = quat_mul(a, quat_conj(b))
    return 2.0 * jnp.arcsin(
        jnp.clip(jnp.linalg.norm(d[..., 1:4], axis=-1), 0.0, 1.0)
    )


def quat_axis(q: jax.Array, axis: int) -> jax.Array:
    """World direction of a body-frame basis axis. Ref: torch_jit_utils.py:66."""
    v = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., axis].set(1.0)
    return quat_rotate(q, v)


def slerp(a: jax.Array, b: jax.Array, t) -> jax.Array:
    """Spherical interpolation. Ref: torch_jit_utils.py:297."""
    d = jnp.sum(a * b, axis=-1, keepdims=True)
    b = jnp.where(d < 0, -b, b)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_theta = jnp.sin(theta)
    t = jnp.asarray(t)[..., None] if jnp.ndim(t) == a.ndim - 1 else jnp.asarray(t)
    lin = (1 - t) * a + t * b  # fall back to lerp near parallel
    sl = (jnp.sin((1 - t) * theta) * a + jnp.sin(t * theta) * b) / jnp.maximum(
        sin_theta, 1e-7
    )
    return quat_normalize(jnp.where(sin_theta < 1e-4, lin, sl))


def calc_heading(q: jax.Array) -> jax.Array:
    """Yaw of the body x-axis. Ref: torch_jit_utils.py:332."""
    d = quat_axis(q, 0)
    return jnp.arctan2(d[..., 1], d[..., 0])


def calc_heading_quat(q: jax.Array) -> jax.Array:
    h = calc_heading(q)
    z = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    return quat_from_axis_angle(z, h)


def calc_heading_quat_inv(q: jax.Array) -> jax.Array:
    h = calc_heading(q)
    z = jnp.zeros(q.shape[:-1] + (3,), q.dtype).at[..., 2].set(1.0)
    return quat_from_axis_angle(z, -h)


# ---------------------------------------------------------------------------
# Scale / clamp helpers (reference torch_jit_utils.py:79-139)
# ---------------------------------------------------------------------------


def scale_transform(x, lower, upper):
    """[-1,1]-normalized → [lower, upper]. Ref: torch_jit_utils.py:79."""
    offset = (lower + upper) * 0.5
    return x * (upper - lower) * 0.5 + offset


def unscale_transform(x, lower, upper):
    """[lower, upper] → [-1,1]-normalized. Ref: torch_jit_utils.py:100."""
    offset = (lower + upper) * 0.5
    return (x - offset) * 2.0 / (upper - lower)


def saturate(x, lower, upper):
    return jnp.clip(x, lower, upper)


def tensor_clamp(x, lower, upper):
    return jnp.clip(x, lower, upper)


def normalize_angle(x):
    """Wrap angle to [-pi, pi]."""
    return jnp.arctan2(jnp.sin(x), jnp.cos(x))


def compute_heading_and_up(torso_quat, inv_start_rot, to_target, vec0, vec1,
                           up_idx):
    """Heading/up projections used by Ant/Humanoid obs.

    Ref: torch_jit_utils.py:34 (compute_heading_and_up)."""
    num_shape = torso_quat.shape[:-1]
    target_dirs = to_target / jnp.maximum(
        jnp.linalg.norm(to_target, axis=-1, keepdims=True), 1e-9)
    torso_quat = quat_mul(torso_quat, inv_start_rot)
    up_vec = quat_rotate(torso_quat, vec1)
    heading_vec = quat_rotate(torso_quat, vec0)
    up_proj = up_vec[..., up_idx]
    heading_proj = jnp.sum(heading_vec * target_dirs, axis=-1)
    del num_shape
    return torso_quat, up_proj, heading_proj, up_vec, heading_vec


def compute_rot(torso_quat, velocity, ang_velocity, targets, torso_positions):
    """Body-local velocities + roll/pitch/yaw + angle-to-target.

    Ref: torch_jit_utils.py:52 (compute_rot)."""
    vel_loc = quat_rotate_inv(torso_quat, velocity)
    angvel_loc = quat_rotate_inv(torso_quat, ang_velocity)
    roll, pitch, yaw = get_euler_xyz(torso_quat)
    walk_target_angle = jnp.arctan2(
        targets[..., 2] - torso_positions[..., 2],
        targets[..., 0] - torso_positions[..., 0],
    )
    angle_to_target = walk_target_angle - yaw
    return vel_loc, angvel_loc, roll, pitch, yaw, angle_to_target


def get_euler_xyz(q: jax.Array):
    """Intrinsic xyz euler angles (roll, pitch, yaw) from wxyz quaternion."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sinr_cosp = 2.0 * (w * x + y * z)
    cosr_cosp = 1.0 - 2.0 * (x * x + y * y)
    roll = jnp.arctan2(sinr_cosp, cosr_cosp)
    sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
    pitch = jnp.arcsin(sinp)
    siny_cosp = 2.0 * (w * z + x * y)
    cosy_cosp = 1.0 - 2.0 * (y * y + z * z)
    yaw = jnp.arctan2(siny_cosp, cosy_cosp)
    return roll, pitch, yaw


def quat_from_euler_xyz(roll, pitch, yaw):
    cr, sr = jnp.cos(roll * 0.5), jnp.sin(roll * 0.5)
    cp, sp = jnp.cos(pitch * 0.5), jnp.sin(pitch * 0.5)
    cy, sy = jnp.cos(yaw * 0.5), jnp.sin(yaw * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Spatial (6D) algebra — world frame, angular-first [ω; v] / [τ; f]
# ---------------------------------------------------------------------------


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric cross-product matrix of trailing-3 vector."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def spatial_motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """crm(v) @ m — motion × motion (Featherstone vx)."""
    w, vo = v[..., :3], v[..., 3:]
    mw, mv = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, mw), jnp.cross(w, mv) + jnp.cross(vo, mw)], axis=-1
    )


def spatial_force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """crf(v) @ f — motion ×* force (dual cross)."""
    w, vo = v[..., :3], v[..., 3:]
    tau, fo = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(w, tau) + jnp.cross(vo, fo), jnp.cross(w, fo)], axis=-1
    )


def spatial_inertia(mass, com, inertia_com):
    """6x6 spatial inertia about the world origin.

    mass: (...,); com: (...,3) world position of COM; inertia_com: (...,3,3)
    rotational inertia about COM in world axes. For velocity [ω; v_o]:
      I = [[I_c − m·cx·cx,  m·cx],
           [−m·cx,          m·1 ]]
    """
    cx = skew(com)
    m = mass[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=cx.dtype), cx.shape)
    top = jnp.concatenate([inertia_com - m * (cx @ cx), m * cx], axis=-1)
    bot = jnp.concatenate([-m * cx, m * eye], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def point_force_to_spatial(force: jax.Array, point: jax.Array,
                           torque: jax.Array | None = None) -> jax.Array:
    """Spatial force about origin from a point force (+optional couple)."""
    tau = jnp.cross(point, force)
    if torque is not None:
        tau = tau + torque
    return jnp.concatenate([tau, force], axis=-1)


def transform_apply(pos: jax.Array, quat: jax.Array, p: jax.Array) -> jax.Array:
    """Apply rigid transform (pos, quat) to point p."""
    return pos + quat_rotate(quat, p)


def transform_compose(p1, q1, p2, q2):
    """(p1,q1) ∘ (p2,q2): first apply 2 then 1."""
    return transform_apply(p1, q1, p2), quat_mul(q1, q2)


def transform_inv(pos, quat):
    qi = quat_conj(quat)
    return -quat_rotate(qi, pos), qi
