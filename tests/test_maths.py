import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.core import maths as m


def rand_quat(rng, n=()):
    q = rng.standard_normal(n + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_quat_mul_identity(rng):
    q = rand_quat(rng, (5,))
    e = jnp.tile(m.quat_identity(), (5, 1))
    np.testing.assert_allclose(m.quat_mul(q, e), q, atol=1e-6)
    np.testing.assert_allclose(m.quat_mul(e, q), q, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = rand_quat(rng, (7,))
    v = rng.standard_normal((7, 3)).astype(np.float32)
    R = m.quat_to_mat(jnp.asarray(q))
    np.testing.assert_allclose(
        m.quat_rotate(jnp.asarray(q), jnp.asarray(v)),
        jnp.einsum("nij,nj->ni", R, v), atol=1e-5)


def test_quat_rotate_inverse_roundtrip(rng):
    q = jnp.asarray(rand_quat(rng, (4,)))
    v = jnp.asarray(rng.standard_normal((4, 3)).astype(np.float32))
    np.testing.assert_allclose(
        m.quat_rotate_inv(q, m.quat_rotate(q, v)), v, atol=1e-5)


def test_quat_mat_roundtrip(rng):
    q = jnp.asarray(rand_quat(rng, (6,)).astype(np.float32))
    q2 = m.quat_from_mat(m.quat_to_mat(q))
    # q and -q are the same rotation
    sign = jnp.sign(jnp.sum(q * q2, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-5)


def test_quat_integrate_constant_omega():
    q = m.quat_identity()
    omega = jnp.array([0.0, 0.0, np.pi])  # half-turn/sec about z
    for _ in range(100):
        q = m.quat_integrate(q, omega, 0.01)
    # after 1s: 180° about z → (0,0,0,1)
    expect = jnp.array([0.0, 0.0, 0.0, 1.0])
    assert min(np.linalg.norm(q - expect), np.linalg.norm(q + expect)) < 1e-4


def test_axis_angle_roundtrip(rng):
    axis = np.array([0.0, 1.0, 0.0])
    q = m.quat_from_axis_angle(jnp.asarray(axis), jnp.asarray(0.7))
    ang, ax = m.quat_to_angle_axis(q)
    np.testing.assert_allclose(ang, 0.7, atol=1e-6)
    np.testing.assert_allclose(ax, axis, atol=1e-6)


def test_heading(rng):
    z = jnp.array([0.0, 0.0, 1.0])
    q = m.quat_from_axis_angle(z, jnp.asarray(0.5))
    np.testing.assert_allclose(m.calc_heading(q), 0.5, atol=1e-6)
    hq = m.calc_heading_quat_inv(q)
    np.testing.assert_allclose(m.calc_heading(m.quat_mul(hq, q)), 0.0, atol=1e-6)


def test_scale_unscale_roundtrip(rng):
    lo = jnp.asarray([-1.0, 0.0, -3.0])
    hi = jnp.asarray([2.0, 5.0, 3.0])
    x = jnp.asarray(rng.uniform(-1, 1, (10, 3)).astype(np.float32))
    y = m.scale_transform(x, lo, hi)
    assert (y >= lo - 1e-5).all() and (y <= hi + 1e-5).all()
    np.testing.assert_allclose(m.unscale_transform(y, lo, hi), x, atol=1e-5)


def test_slerp_endpoints(rng):
    a = jnp.asarray(rand_quat(rng).astype(np.float32))
    b = jnp.asarray(rand_quat(rng).astype(np.float32))
    np.testing.assert_allclose(m.slerp(a, b, jnp.asarray(0.0)), a, atol=1e-5)
    s1 = m.slerp(a, b, jnp.asarray(1.0))
    assert min(np.linalg.norm(s1 - b), np.linalg.norm(s1 + b)) < 1e-5


def test_spatial_cross_identities(rng):
    v = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    f = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    mvec = jnp.asarray(rng.standard_normal(6).astype(np.float32))
    # duality: (v × m) · f = −m · (v ×* f)
    lhs = jnp.dot(m.spatial_motion_cross(v, mvec), f)
    rhs = -jnp.dot(mvec, m.spatial_force_cross(v, f))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_spatial_inertia_kinetic_energy(rng):
    # KE via spatial inertia == KE via point-mass formula
    mass = jnp.asarray(2.5)
    com = jnp.asarray([0.3, -0.2, 1.0])
    I_c = jnp.asarray(np.diag([0.1, 0.2, 0.3]).astype(np.float32))
    I6 = m.spatial_inertia(mass, com, I_c)
    omega = jnp.asarray([0.2, -0.4, 0.1])
    v_o = jnp.asarray([1.0, 0.5, -0.3])
    V = jnp.concatenate([omega, v_o])
    ke_spatial = 0.5 * jnp.dot(V, I6 @ V)
    v_com = v_o + jnp.cross(omega, com)
    ke_point = 0.5 * mass * jnp.dot(v_com, v_com) + 0.5 * jnp.dot(omega, I_c @ omega)
    np.testing.assert_allclose(ke_spatial, ke_point, rtol=1e-5)
