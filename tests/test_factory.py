"""Factory subsystem tests: controller math + NutBoltPick mechanics
(reference test strategy: docs/factory.md, factory_control.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isaacgymenvs_tpu
from isaacgymenvs_tpu.core import maths as mx
from isaacgymenvs_tpu.envs.factory import control as ctl


# ------------------------------------------------------------- control math
def test_axis_angle_from_quat_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        axis = rng.randn(3)
        axis /= np.linalg.norm(axis)
        angle = rng.uniform(-2.5, 2.5)
        q = mx.quat_from_axis_angle(jnp.asarray(axis), angle)
        aa = ctl.axis_angle_from_quat(q)
        np.testing.assert_allclose(np.asarray(aa), axis * angle, atol=1e-5)


def test_axis_angle_small_angle_stable():
    aa = ctl.axis_angle_from_quat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    assert np.allclose(np.asarray(aa), 0.0)
    assert not np.isnan(np.asarray(aa)).any()


@pytest.mark.parametrize("method", ["pinv", "trans", "dls", "svd"])
def test_ik_methods_reduce_error(method):
    """One IK step must reduce the pose error for a random jacobian."""
    rng = np.random.RandomState(1)
    J = jnp.asarray(rng.randn(6, 7) * 0.5)
    err = jnp.asarray(rng.randn(6) * 0.1)
    dq = ctl.get_delta_dof_pos(err, method, J)
    assert dq.shape == (7,)
    new_err = err - J @ dq * (0.1 if method == "trans" else 1.0)
    assert float(jnp.linalg.norm(new_err)) < float(jnp.linalg.norm(err))


def test_parse_controller_spec_modes():
    base = {"all": {"jacobian_type": "geometric",
                    "gripper_prop_gains": [50, 50],
                    "gripper_deriv_gains": [2, 2]},
            "joint_space_id": {"ik_method": "dls",
                               "joint_prop_gains": [40] * 7,
                               "joint_deriv_gains": [8] * 7},
            "task_space_impedance": {"motion_ctrl_axes": [1] * 6,
                                     "task_prop_gains": [40] * 6,
                                     "task_deriv_gains": [8] * 6},
            "hybrid_force_motion": {"motion_ctrl_axes": [1, 1, 0, 1, 1, 1],
                                    "task_prop_gains": [40] * 6,
                                    "task_deriv_gains": [8] * 6,
                                    "force_ctrl_axes": [0, 0, 1, 0, 0, 0],
                                    "wrench_prop_gains": [0.1] * 6}}
    for ct, gain_space, inertial, force in [
            ("joint_space_id", "joint", True, False),
            ("task_space_impedance", "task", False, False),
            ("hybrid_force_motion", "task", True, True)]:
        cfg = ctl.parse_controller_spec({**base, "ctrl_type": ct})
        assert cfg["gain_space"] == gain_space
        assert cfg["do_inertial_comp"] == inertial
        assert cfg["do_force_ctrl"] == force


def test_compute_dof_torque_joint_space():
    cfg = ctl.parse_controller_spec({
        "ctrl_type": "joint_space_id",
        "all": {"gripper_prop_gains": [50, 50],
                "gripper_deriv_gains": [2, 2]},
        "joint_space_id": {"ik_method": "dls",
                           "joint_prop_gains": [40] * 7,
                           "joint_deriv_gains": [8] * 7}})
    rng = np.random.RandomState(2)
    J = jnp.asarray(rng.randn(6, 7) * 0.3)
    mm = jnp.eye(7)
    tau = ctl.compute_dof_torque(
        cfg, jnp.zeros(9), jnp.zeros(9), jnp.zeros(3),
        jnp.array([1.0, 0, 0, 0]), jnp.zeros(3), jnp.zeros(3),
        jnp.zeros(3), J, mm, 0.04,
        jnp.array([0.1, 0.0, 0.0]), jnp.array([1.0, 0, 0, 0]))
    assert tau.shape == (9,)
    assert float(jnp.abs(tau).max()) <= 100.0
    # gripper torque pulls fingers open toward 0.04
    assert float(tau[7]) > 0 and float(tau[8]) > 0


# ---------------------------------------------------------------- pick env
@pytest.fixture(scope="module")
def pick_env():
    return isaacgymenvs_tpu.make(task="FactoryTaskNutBoltPick", num_envs=2)


def test_pick_constructs(pick_env):
    env = pick_env
    assert env.num_obs == 20 and env.num_acts == 12
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 20)
    assert not bool(jnp.isnan(obs).any())
    # nut origin convention: bolt_head_height below its bottom face
    nut_z = state.art.q[:, env.nut_q + 2]
    np.testing.assert_allclose(
        np.asarray(nut_z),
        env.table_height - env.nut_bolt_info["bolt_head_height"],
        atol=1e-5)


def test_pick_nut_rests_on_table(pick_env):
    env = pick_env
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    a = jnp.zeros((2, 12))
    for _ in range(20):
        state, ts = step(state, a)
    nut_z = np.asarray(state.art.q[:, env.nut_q + 2])
    assert not bool(jnp.isnan(state.art.q).any())
    # bottom face within 2 mm of the table top
    bottom = nut_z + env.nut_bolt_info["bolt_head_height"]
    np.testing.assert_allclose(bottom, env.table_height, atol=2e-3)
    # arm holds pose under zero action (anti-gravity exact)
    assert float(jnp.abs(state.art.qd[:, :7]).max()) < 1e-4


def test_pick_grasp_and_lift(pick_env):
    """Teleport the gripper to the grasp frame, close, lift: the nut must
    come up (the contact-richest path: finger<->nut<->table boxes)."""
    env = pick_env
    state, obs = env.reset(jax.random.PRNGKey(3))
    params = state.params

    def to_grasp(q):
        gp, gq = env._grasp_frame(q)
        return env._ik_to_pose(q, params, gp, gq, iters=40)

    q = jax.vmap(to_grasp)(state.art.q)
    art = dataclasses.replace(state.art, q=q)
    art2, _ = env._close_and_lift((art, 0.0), params, True)
    lifted = jax.vmap(env._lift_success)(art2.q)
    assert not bool(jnp.isnan(art2.q).any())
    # seed 3 env 0 has a reachable grasp (IK residual < 1e-6)
    assert float(lifted[0]) == 1.0


# --------------------------------------------------------------- screw joint
def _screw_model(pitch=0.002):
    from isaacgymenvs_tpu.io.mjcf import load_mjcf
    return load_mjcf(f"""<mujoco model="s">
    <compiler inertiafromgeom="true" angle="radian"/>
    <worldbody><body name="base">
      <geom type="box" size="0.05 0.05 0.01" density="1000"/>
      <body name="nut" pos="0 0 0.1">
        <joint type="hinge" name="thr" axis="0 0 1" screw_pitch="{pitch}"
               limited="true" range="-100 100"/>
        <geom type="box" size="0.012 0.012 0.0065" density="7850"/>
      </body>
    </body></worldbody></mujoco>""")


def test_screw_joint_fk_coupling():
    """FK: screw q -> rotation q AND translation pitch/(2pi)*q, in both
    the level-sweep and unrolled implementations."""
    from isaacgymenvs_tpu.physics.kinematics import (
        forward_kinematics, _forward_kinematics_unrolled)
    m = _screw_model()
    params = m.default_phys_params()
    theta = 4.0 * np.pi  # two turns
    q = jnp.asarray(m.init_qpos).at[0].set(theta)
    qd = jnp.zeros(m.nv)
    kin = forward_kinematics(m, params, q, qd)
    assert m.jnt_type[0] == 4  # SCREW
    np.testing.assert_allclose(float(kin.body_pos[1, 2]),
                               0.1 + 0.002 / (2 * np.pi) * theta,
                               atol=1e-6)
    kin_u = _forward_kinematics_unrolled(m, params, q, qd)
    np.testing.assert_allclose(np.asarray(kin.body_pos),
                               np.asarray(kin_u.body_pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(kin.dof_S),
                               np.asarray(kin_u.dof_S), atol=1e-5)


def test_screw_joint_gravity_backdrive():
    """A frictionless screw back-drives under gravity: theta falls at
    qdd = -coef*m*g / (I_zz + m*coef^2); with frictionloss it holds."""
    from isaacgymenvs_tpu.core import types as T
    from isaacgymenvs_tpu.physics.step import physics_step
    m = _screw_model()
    params = m.default_phys_params()
    sim = T.SimParams(dt=1 / 60, substeps=2)
    art = T.ArtState(q=jnp.asarray(m.init_qpos), qd=jnp.zeros(m.nv))
    stepf = jax.jit(lambda a: physics_step(m, sim, params, a,
                                           n_substeps=2)[0])
    for _ in range(30):
        art = stepf(art)
    coef = 0.002 / (2 * np.pi)
    mass = float(m.body_mass[1])
    Izz = float(m.body_inertia[1][2, 2])
    qdd_expect = -coef * mass * 9.81 / (Izz + mass * coef ** 2)
    t = 0.5
    np.testing.assert_allclose(float(art.qd[0]), qdd_expect * t, rtol=0.05)
    # z follows the coupling exactly (structural, no constraint drift)
    from isaacgymenvs_tpu.physics.kinematics import forward_kinematics
    kin = forward_kinematics(m, params, art.q, art.qd)
    np.testing.assert_allclose(float(kin.body_pos[1, 2]),
                               0.1 + coef * float(art.q[0]), atol=1e-6)


# ------------------------------------------------------------ place + screw
def test_place_constructs_and_grips():
    env = isaacgymenvs_tpu.make(task="FactoryTaskNutBoltPlace", num_envs=2)
    assert env.num_obs == 27 and env.num_acts == 12
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 27) and not bool(jnp.isnan(obs).any())
    # nut base plane sits at the fingertip midpoint (in-gripper reset)
    ft_z, nut_z = obs[:, 2], state.art.q[:, env.nut_q + 2]
    np.testing.assert_allclose(
        np.asarray(nut_z + env.nut_bolt_info["bolt_head_height"]),
        np.asarray(ft_z), atol=0.015)
    step = jax.jit(env.step)
    for _ in range(10):
        state, ts = step(state, jnp.zeros((2, 12)))
    # grip holds: nut still within 2 cm of the fingertip frame
    d = jnp.linalg.norm(ts.obs[:, 0:3] - ts.obs[:, 13:16], axis=-1)
    assert float(d.max()) < 0.035
    assert not bool(jnp.isnan(ts.obs).any())


def test_screw_env_thread_advances():
    env = isaacgymenvs_tpu.make(task="FactoryTaskNutBoltScrew", num_envs=2)
    assert env.num_obs == 32 and env.num_acts == 12
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert not bool(jnp.isnan(obs).any())
    step = jax.jit(env.step)
    a = jnp.zeros((2, 12)).at[:, 5].set(1.0)  # full unidirectional yaw
    th0 = state.art.q[0, env.thread_rot_q]
    for _ in range(40):
        state, ts = step(state, a)
    th = state.art.q[0, env.thread_rot_q]
    assert float(th) < float(th0) - 0.5  # nut turned > 0.5 rad down
    assert not bool(jnp.isnan(state.art.q).any())


# ------------------------------------------------------- templates (non-RL)
@pytest.mark.parametrize("task,check", [
    ("FactoryTaskInsertion", "plug_q"), ("FactoryTaskGears", "base_q")])
def test_template_tasks_step(task, check):
    """Insertion/Gears ship as environment templates (zero reward,
    timeout episodes) — the scene must construct and step stably."""
    env = isaacgymenvs_tpu.make(task=task, num_envs=2)
    assert env.num_obs == 32 and env.num_acts == 12
    assert hasattr(env, check)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 32) and not bool(jnp.isnan(obs).any())
    step = jax.jit(env.step)
    k = jax.random.PRNGKey(1)
    for _ in range(10):
        k, sk = jax.random.split(k)
        state, ts = step(state, 0.3 * jax.random.normal(sk, (2, 12)))
    assert not bool(jnp.isnan(state.art.q).any())
    assert float(jnp.abs(ts.reward).max()) == 0.0
