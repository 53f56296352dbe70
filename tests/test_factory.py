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
    art2, _ = env._close_and_lift((art, 0.0), params)
    lifted = jax.vmap(env._lift_success)(art2.q)
    assert not bool(jnp.isnan(art2.q).any())
    # seed 3 env 0 has a reachable grasp (IK residual < 1e-6)
    assert float(lifted[0]) == 1.0
