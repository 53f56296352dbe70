"""Body-pair collision tests: compose_models + narrowphase + solver rows.

Replaces-verification for the PhysX actor-pair collisions the reference
relies on (hand↔object, ball↔tray — e.g. tasks/ball_balance.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isaacgymenvs_tpu.core import types as T
from isaacgymenvs_tpu.core.modeling import compose_models
from isaacgymenvs_tpu.physics.collide import (build_pair_contacts,
                                              pair_contact_geometry)
from isaacgymenvs_tpu.physics.kinematics import forward_kinematics
from isaacgymenvs_tpu.physics.step import physics_step


def _free_sphere(name, radius=0.1, mass=1.0, z0=1.0):
    i = 0.4 * mass * radius ** 2
    return T.ArticulationModel(
        name=name,
        body_parent=np.array([-1], np.int32),
        body_pos=np.zeros((1, 3), np.float32),
        body_quat=np.array([[1, 0, 0, 0]], np.float32),
        body_mass=np.array([mass], np.float32),
        body_com=np.zeros((1, 3), np.float32),
        body_inertia=(np.eye(3) * i)[None].astype(np.float32),
        body_names=("ball",),
        jnt_body=np.array([0], np.int32),
        jnt_type=np.array([T.FREE], np.int32),
        jnt_axis=np.array([[0, 0, 1]], np.float32),
        jnt_pos=np.zeros((1, 3), np.float32),
        jnt_qadr=np.array([0], np.int32),
        jnt_vadr=np.array([0], np.int32),
        jnt_range=np.zeros((1, 2), np.float32),
        jnt_limited=np.array([False]),
        jnt_names=("free",),
        dof_armature=np.zeros(6, np.float32),
        dof_damping=np.zeros(6, np.float32),
        dof_stiffness=np.zeros(6, np.float32),
        dof_frictionloss=np.zeros(6, np.float32),
        dof_jnt=np.zeros(6, np.int32),
        act_jnt=np.zeros(0, np.int32),
        act_trntype=np.zeros(0, np.int32),
        act_gear=np.zeros(0, np.float32),
        act_ctrlrange=np.zeros((0, 2), np.float32),
        act_forcerange=np.zeros((0, 2), np.float32),
        act_kp=np.zeros(0, np.float32),
        act_kd=np.zeros(0, np.float32),
        act_names=(),
        geom_body=np.array([0], np.int32),
        geom_type=np.array([T.GEOM_SPHERE], np.int32),
        geom_size=np.array([[radius, 0, 0]], np.float32),
        geom_pos=np.zeros((1, 3), np.float32),
        geom_quat=np.array([[1, 0, 0, 0]], np.float32),
        geom_friction=np.array([[1.0, 0.005, 0.0001]], np.float32),
        geom_contype=np.ones(1, np.int32),
        geom_conaffinity=np.ones(1, np.int32),
        geom_names=(f"{name}_geom",),
        init_qpos=np.array([0, 0, z0, 1, 0, 0, 0], np.float32),
    )


def test_compose_models_indices():
    a = _free_sphere("a")
    b = _free_sphere("b")
    scene = compose_models([("a", a, [0, 0, 1.0]), ("b", b, [0.5, 0, 1.0])])
    assert scene.nbody == 2 and scene.nq == 14 and scene.nv == 12
    assert scene.body_index("a/ball") == 0 and scene.body_index("b/ball") == 1
    np.testing.assert_allclose(scene.init_qpos[0:3], [0, 0, 2.0])
    np.testing.assert_allclose(scene.init_qpos[7:10], [0.5, 0, 2.0])


def test_sphere_sphere_narrowphase():
    a = _free_sphere("a", radius=0.1)
    b = _free_sphere("b", radius=0.1)
    scene = compose_models([("a", a), ("b", b)])
    ps = build_pair_contacts(scene)
    assert ps.count == 1
    params = scene.default_phys_params()
    # overlap: centers 0.15 apart, radii 0.1+0.1
    q = jnp.asarray(np.concatenate([
        [0, 0, 1.0, 1, 0, 0, 0], [0.15, 0, 1.0, 1, 0, 0, 0]]), jnp.float32)
    kin = forward_kinematics(scene, params, q, jnp.zeros(12))
    depth, n, cpt, ba, bb, mu, rest = pair_contact_geometry(scene, params, kin, ps)
    np.testing.assert_allclose(float(depth[0]), 0.05, atol=1e-6)
    # normal points from B to A = -x
    np.testing.assert_allclose(np.asarray(n[0]), [-1, 0, 0], atol=1e-6)


def test_spheres_bounce_apart():
    """Two overlapping free spheres in zero gravity separate; momentum is
    conserved."""
    a = _free_sphere("a", radius=0.1)
    b = _free_sphere("b", radius=0.1)
    scene = compose_models([("a", a), ("b", b)])
    ps = build_pair_contacts(scene)
    sim = T.SimParams(dt=0.01, substeps=1, gravity=(0.0, 0.0, 0.0))
    params = scene.default_phys_params()
    q0 = jnp.asarray(np.concatenate([
        [0, 0, 1.0, 1, 0, 0, 0], [0.18, 0, 1.0, 1, 0, 0, 0]]), jnp.float32)
    # A moving +x at 1 m/s toward B at rest
    qd0 = jnp.zeros(12).at[0].set(1.0)
    state = T.ArtState(q=q0, qd=qd0)
    step = jax.jit(lambda s: physics_step(scene, sim, params, s,
                                          pair_contacts=ps)[0])
    for _ in range(20):
        state = step(state)
    va = float(state.qd[0])
    vb = float(state.qd[6])
    # momentum conserved (equal masses): va + vb == 1
    np.testing.assert_allclose(va + vb, 1.0, atol=1e-3)
    # B pushed forward, A slowed
    assert vb > 0.3 and va < 0.7
    # no NaNs, no vertical motion
    assert abs(float(state.qd[2])) < 1e-4
    assert not bool(jnp.any(jnp.isnan(state.q)))


def test_sphere_rests_on_box():
    """Free sphere dropped on a big static box settles on its top face."""
    ball = _free_sphere("ball", radius=0.1, z0=0.5)
    # static box: a body welded to the world (no joints)
    box = T.ArticulationModel(
        name="box",
        body_parent=np.array([-1], np.int32),
        body_pos=np.zeros((1, 3), np.float32),
        body_quat=np.array([[1, 0, 0, 0]], np.float32),
        body_mass=np.array([100.0], np.float32),
        body_com=np.zeros((1, 3), np.float32),
        body_inertia=(np.eye(3) * 10.0)[None].astype(np.float32),
        body_names=("slab",),
        jnt_body=np.zeros(0, np.int32),
        jnt_type=np.zeros(0, np.int32),
        jnt_axis=np.zeros((0, 3), np.float32),
        jnt_pos=np.zeros((0, 3), np.float32),
        jnt_qadr=np.zeros(0, np.int32),
        jnt_vadr=np.zeros(0, np.int32),
        jnt_range=np.zeros((0, 2), np.float32),
        jnt_limited=np.zeros(0, bool),
        jnt_names=(),
        dof_armature=np.zeros(0, np.float32),
        dof_damping=np.zeros(0, np.float32),
        dof_stiffness=np.zeros(0, np.float32),
        dof_frictionloss=np.zeros(0, np.float32),
        dof_jnt=np.zeros(0, np.int32),
        act_jnt=np.zeros(0, np.int32),
        act_trntype=np.zeros(0, np.int32),
        act_gear=np.zeros(0, np.float32),
        act_ctrlrange=np.zeros((0, 2), np.float32),
        act_forcerange=np.zeros((0, 2), np.float32),
        act_kp=np.zeros(0, np.float32),
        act_kd=np.zeros(0, np.float32),
        act_names=(),
        geom_body=np.array([0], np.int32),
        geom_type=np.array([T.GEOM_BOX], np.int32),
        geom_size=np.array([[1.0, 1.0, 0.1]], np.float32),
        geom_pos=np.zeros((1, 3), np.float32),
        geom_quat=np.array([[1, 0, 0, 0]], np.float32),
        geom_friction=np.array([[1.0, 0.005, 0.0001]], np.float32),
        geom_contype=np.ones(1, np.int32),
        geom_conaffinity=np.ones(1, np.int32),
        geom_names=("slab_geom",),
        init_qpos=np.zeros(0, np.float32),
    )
    scene = compose_models([("ball", ball), ("box", box, [0, 0, 0.1])])
    ps = build_pair_contacts(scene)
    assert len(ps.sb_body) == 1
    sim = T.SimParams(dt=0.01, substeps=2)
    params = scene.default_phys_params()
    state = T.ArtState(q=jnp.asarray(scene.init_qpos), qd=jnp.zeros(6))
    step = jax.jit(lambda s: physics_step(scene, sim, params, s,
                                          pair_contacts=ps)[0])
    for _ in range(100):
        state = step(state)
    # box top at z = 0.2; sphere radius 0.1 → center settles at ≈0.3
    z = float(state.q[2])
    np.testing.assert_allclose(z, 0.3, atol=0.02)
    assert abs(float(state.qd[2])) < 0.05
