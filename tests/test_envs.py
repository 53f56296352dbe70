"""Env-layer tests: reset/step contract, auto-reset, obs/reward parity checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isaacgymenvs_tpu


@pytest.fixture(scope="module")
def cartpole():
    return isaacgymenvs_tpu.make(task="Cartpole", num_envs=16)


@pytest.fixture(scope="module")
def ant():
    return isaacgymenvs_tpu.make(task="Ant", num_envs=8)


def test_cartpole_api(cartpole):
    env = cartpole
    assert env.num_obs == 4 and env.num_acts == 1
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (16, 4)
    # reset distribution: dof pos in ±0.1, vel in ±0.25
    assert float(jnp.abs(obs[:, [0, 2]]).max()) <= 0.1 + 1e-6
    assert float(jnp.abs(obs[:, [1, 3]]).max()) <= 0.25 + 1e-6

    step = jax.jit(env.step)
    actions = jnp.zeros((16, 1))
    state, ts = step(state, actions)
    assert ts.obs.shape == (16, 4)
    assert ts.reward.shape == (16,)
    assert ts.done.dtype == bool
    assert not jnp.isnan(ts.obs).any()


def test_cartpole_termination_and_autoreset(cartpole):
    env = cartpole
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    # push hard right → cart exceeds resetDist → done, reward −2
    push = jnp.ones((16, 1))
    done_seen = False
    for i in range(400):
        state, ts = step(state, push)
        if bool(ts.done.any()):
            done_seen = True
            idx = int(jnp.argmax(ts.done))
            assert float(ts.reward[idx]) == -2.0
            # next step the env must be re-spawned near origin
            state2, ts2 = step(state, jnp.zeros((16, 1)))
            assert abs(float(ts2.obs[idx, 0])) < 0.5
            break
    assert done_seen, "cart never left resetDist under full push"


def test_cartpole_rng_differs(cartpole):
    env = cartpole
    _, obs_a = env.reset(jax.random.PRNGKey(2))
    _, obs_b = env.reset(jax.random.PRNGKey(3))
    assert float(jnp.abs(obs_a - obs_b).max()) > 1e-4
    # per-env randomness: envs differ from each other
    assert float(jnp.std(obs_a[:, 0])) > 1e-3


def test_ant_api_and_rollout(ant):
    env = ant
    assert env.num_obs == 60 and env.num_acts == 8
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (8, 60)
    step = jax.jit(env.step)
    key = jax.random.PRNGKey(42)
    for i in range(30):
        key, k = jax.random.split(key)
        actions = jax.random.uniform(k, (8, 8), minval=-1, maxval=1)
        state, ts = step(state, actions)
    assert not jnp.isnan(ts.obs).any()
    assert not jnp.isnan(ts.reward).any()
    # obs layout: z height first, torsos should still be above ground
    assert (ts.obs[:, 0] > 0.1).all()
    # alive reward present: standing ant with zero actions earns ~>0
    state, ts0 = step(state, jnp.zeros((8, 8)))
    assert float(ts0.reward.mean()) > -2.0


def test_ant_timeout_flag():
    env = isaacgymenvs_tpu.make(task="Ant", num_envs=4,
                                cfg={"env": {"episodeLength": 5}})
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for i in range(4):
        state, ts = step(state, jnp.zeros((4, 8)))
    # at progress 4 ≥ max_len−1 (=4) → done & timeout set (vec_task.py:345)
    assert bool(ts.done.all())
    assert bool(ts.timeout.all())
    # next step: envs were auto-reset, progress back to 0, done cleared
    state, ts2 = step(state, jnp.zeros((4, 8)))
    assert not bool(ts2.done.any())
    assert bool((state.progress == 0).all())  # reset_idx zeroes progress


def test_ant_progress_reward_sign(ant):
    """Ant pushed forward (+x) should receive positive progress reward."""
    env = ant
    state, _ = env.reset(jax.random.PRNGKey(7))
    step = jax.jit(env.step)
    # inject forward velocity directly
    import dataclasses
    from isaacgymenvs_tpu.core.types import ArtState
    qd = state.art.qd.at[:, 0].set(2.0)
    state = dataclasses.replace(state, art=ArtState(q=state.art.q, qd=qd))
    state, ts = step(state, jnp.zeros((8, 8)))
    # progress term ≈ v_x·dt/dt = 2 m/s ⇒ reward > alive only
    assert float(ts.reward.mean()) > 1.0


def test_anymal_api_and_stand():
    """Anymal: PD position control holds the default pose near spawn height
    (reference `tasks/anymal.py:202-232`)."""
    env = isaacgymenvs_tpu.make(task="Anymal", num_envs=4)
    assert env.num_obs == 48 and env.num_acts == 12
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 48)
    step = jax.jit(env.step)
    for _ in range(25):
        state, ts = step(state, jnp.zeros((4, 12)))
    assert not jnp.isnan(ts.obs).any()
    # zero action → PD holds default pose; base should stay well above ground
    z = np.asarray(state.art.q[:, 2])
    assert (z > 0.4).all(), f"anymal collapsed: z={z}"
    assert ts.reward.shape == (4,)


def test_urdf_collapse_fixed_joints():
    from isaacgymenvs_tpu.io.urdf import load_urdf
    m = load_urdf("/root/reference/assets/urdf/anymal_c/urdf/anymal.urdf",
                  fix_base=False, collapse_fixed_joints=True,
                  replace_cylinder_with_capsule=True)
    assert m.nbody == 13 and m.nv == 18
    # total mass preserved by merging (~52.7 kg trunk + legs)
    m_full = load_urdf("/root/reference/assets/urdf/anymal_c/urdf/anymal.urdf",
                       fix_base=False)
    np.testing.assert_allclose(m.body_mass.sum(), m_full.body_mass.sum(),
                               rtol=1e-6)
    # welded foot aliases to its shank
    assert m.body_names[m.body_index("LF_FOOT")] == "LF_SHANK"


def test_humanoid_reset_obs():
    """Humanoid reset produces the 108-D obs layout (heavy jit of the full
    step is exercised by bench/smoke, not unit tests)."""
    env = isaacgymenvs_tpu.make(task="Humanoid", num_envs=4)
    assert env.num_obs == 108 and env.num_acts == 21
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 108)
    assert not jnp.isnan(obs).any()
    # spawn height 1.34 (humanoid.py:178-181) with ±0.2 dof jitter
    z = np.asarray(state.art.q[:, 2])
    assert (np.abs(z - 1.34) < 1e-5).all()


def test_anymal_terrain_smoke():
    """AnymalTerrain on a small curriculum grid: 188-D obs, terrain spawn,
    decimated PD, no NaNs (reference tasks/anymal_terrain.py)."""
    cfg = {"env": {"terrain": {
        "terrainType": "trimesh", "curriculum": True, "maxInitMapLevel": 0,
        "mapLength": 8.0, "mapWidth": 8.0, "numLevels": 2, "numTerrains": 3,
        "terrainProportions": [0.1, 0.1, 0.35, 0.25, 0.2]},
        "learn": {}, "control": {}, "baseInitState": {},
        "randomCommandVelocityRanges": {}},
        "sim": {"dt": 0.005, "substeps": 1}}
    from isaacgymenvs_tpu.envs.anymal_terrain import AnymalTerrain
    env = AnymalTerrain(cfg, num_envs=4)
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 188)
    step = jax.jit(env.step)
    for _ in range(10):
        state, ts = step(state, jnp.zeros((4, 12)))
    assert not jnp.isnan(ts.obs).any()
    assert "terrain_level_mean" in ts.info and "final/rew_lin_vel_xy" in ts.info
    # spawned on terrain cells, settled above its origin
    z_rel = np.asarray(state.art.q[:, 2] - state.aux["env_origins"][:, 2])
    assert (z_rel > 0.2).all()


def test_a1_terrain_smoke():
    """A1Terrain (fork task): 48-D obs, direct torque control, plane."""
    env = isaacgymenvs_tpu.make(task="A1Terrain", num_envs=4)
    assert env.num_obs == 48 and env.num_acts == 12
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(10):
        state, ts = step(state, jnp.zeros((4, 12)))
    assert not jnp.isnan(ts.obs).any()
    assert "final/rew_gait" in ts.info and "final/rew_foot_contact" in ts.info


def test_ball_balance_smoke():
    """BallBalance: multi-actor scene (tray + free ball), attractor-pinned
    feet, implicit PD, sphere-cylinder pair contact (tasks/ball_balance.py)."""
    env = isaacgymenvs_tpu.make(task="BallBalance", num_envs=4)
    assert env.num_obs == 24 and env.num_acts == 3
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(30):
        state, ts = step(state, jnp.zeros((4, 3)))
    assert not jnp.isnan(ts.obs).any()
    # tray held up by pinned legs + PD (z ≈ 0.56, never collapsed)
    z = np.asarray(state.art.q[:, 2])
    assert (z > 0.4).all(), f"tray collapsed: z={z}"
    assert (np.asarray(ts.reward) > 0).all()


def test_aerial_tasks_smoke():
    """Ingenuity + Quadcopter: procedural MJCF models, LOCAL_SPACE thrust
    via per-substep force_fn (tasks/ingenuity.py:359, quadcopter.py:330)."""
    for task, na in [("Ingenuity", 6), ("Quadcopter", 12)]:
        env = isaacgymenvs_tpu.make(task=task, num_envs=2)
        state, obs = env.reset(jax.random.PRNGKey(0))
        step = jax.jit(env.step)
        z0 = np.asarray(state.art.q[:, 2]).copy()
        for _ in range(20):
            a = jnp.zeros((2, na)).at[:, 2].set(0.6).at[:, na - 1].set(0.6)
            state, ts = step(state, a)
        assert not jnp.isnan(ts.obs).any()
        # upward thrust must raise (or hold) the copter vs free fall
        z = np.asarray(state.art.q[:, 2])
        assert (z > z0 - 0.3).all(), f"{task} fell: {z0} -> {z}"


def test_shadow_hand_smoke():
    """ShadowHand: 24-DoF hand + free cube, tendon couplings, goal resets
    (tasks/shadow_hand.py). Object must settle in the palm, not fall."""
    env = isaacgymenvs_tpu.make(task="ShadowHand", num_envs=2)
    assert env.num_obs == 211 and env.num_acts == 20
    state, obs = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(25):
        state, ts = step(state, jnp.zeros((2, 20)))
    assert not jnp.isnan(ts.obs).any()
    # cube rests in the hand (never falls past fall_dist in 25 zero-action
    # steps; spawn 0.6, palm ≈ 0.48)
    z = np.asarray(state.art.q[:, env.obj_q + 2])
    assert (z > 0.4).all(), f"object fell through the hand: z={z}"
    assert "consecutive_successes" in ts.info


def test_allegro_hand_constructs():
    """AllegroHand: mesh→box approximations, 16 actuated dofs, obs 88."""
    env = isaacgymenvs_tpu.make(task="AllegroHand", num_envs=2)
    assert env.num_obs == 88 and env.num_acts == 16
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 88)
    assert not jnp.isnan(obs).any()


def test_humanoid_amp_env():
    """HumanoidAMP: mocap state init, AMP obs window, demo fetch
    (tasks/humanoid_amp.py + humanoid_amp_base.py)."""
    env = isaacgymenvs_tpu.make(task="HumanoidAMP", num_envs=4)
    assert env.num_obs == 105 and env.num_acts == 28
    assert env.num_amp_obs == 210
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (4, 105)
    assert not jnp.isnan(obs).any()
    # mocap reference-state init puts the pelvis at walking/running heights
    z = np.asarray(state.art.q[:, 2])
    assert (z > 0.3).all() and (z < 1.5).all()
    demo = env.fetch_amp_obs_demo(jax.random.PRNGKey(1), 16)
    assert demo.shape == (16, 210)
    assert bool(jnp.all(jnp.isfinite(demo)))
    # demo features and live features share the same layout/scale
    assert float(jnp.abs(demo).max()) < 50.0


def test_franka_cabinet_constructs():
    """FrankaCabinet: franka+cabinet composed scene, grasp frames, 23-D obs.
    Full stepping is validated on TPU (XLA:CPU mis-schedules this model's
    deep fixed-base chain — a backend pathology, see io docs)."""
    env = isaacgymenvs_tpu.make(task="FrankaCabinet", num_envs=2)
    assert env.num_obs == 23 and env.num_acts == 9
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 23)
    assert not jnp.isnan(obs).any()
    # drawer closed at reset
    assert float(jnp.abs(state.art.q[:, env.drawer_dof]).max()) < 1e-5


def test_franka_cube_stack_constructs():
    """FrankaCubeStack: 5-actor composed scene (franka+table+stand+2 cubes),
    OSC control path, 19-D obs. Stepping validated on TPU."""
    env = isaacgymenvs_tpu.make(task="FrankaCubeStack", num_envs=2)
    assert env.num_obs == 19 and env.num_acts == 7
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 19)
    assert not jnp.isnan(obs).any()
    # cubes spawned on the tabletop, apart from each other
    za = np.asarray(state.art.q[:, env.cubeA_q + 2])
    zb = np.asarray(state.art.q[:, env.cubeB_q + 2])
    assert (np.abs(za - (env.table_height + 0.025)) < 1e-4).all()
    assert (np.abs(zb - (env.table_height + 0.035)) < 1e-4).all()
    pa = np.asarray(state.art.q[:, env.cubeA_q:env.cubeA_q + 2])
    pb = np.asarray(state.art.q[:, env.cubeB_q:env.cubeB_q + 2])
    assert (np.linalg.norm(pa - pb, axis=-1) > 0.1).all()


def test_cube_rests_on_table():
    """Contact conditioning: a light 5cm cube (rot inertia ~5e-6) must rest
    on the table — exercises the diagonal-preconditioned APGD solver."""
    from isaacgymenvs_tpu.physics.step import physics_step
    from isaacgymenvs_tpu.physics.collide import build_ground_contacts
    from isaacgymenvs_tpu.core import types as T
    env = isaacgymenvs_tpu.make(task="FrankaCubeStack", num_envs=1)
    m = env.model
    gc = build_ground_contacts(m)
    params = m.default_phys_params()
    st = T.ArtState(q=env.init_q, qd=jnp.zeros(m.nv))
    step = jax.jit(lambda s: physics_step(
        m, env.sim, params, s, ctrl=jnp.full(2, 0.035), contacts=gc,
        pair_contacts=env.pair_contacts)[0])
    for _ in range(50):
        st = step(st)
    z = float(st.q[env.cubeA_q + 2])
    assert abs(z - (env.table_height + 0.025)) < 0.03, f"cube fell: z={z}"


def test_trifinger_constructs():
    """Trifinger: 3-finger robot + free cube, normalized 41-D obs, goal
    difficulty levels (tasks/trifinger.py). Stepping validated on TPU."""
    env = isaacgymenvs_tpu.make(task="Trifinger", num_envs=2)
    assert env.num_obs == 41 and env.num_acts == 9
    state, obs = env.reset(jax.random.PRNGKey(0))
    assert obs.shape == (2, 41)
    assert not jnp.isnan(obs).any()
    # normalized obs live in [-1, 1]
    assert float(jnp.abs(obs).max()) <= 1.0 + 1e-5
    # difficulty-4 goals include full orientation
    g = np.asarray(state.aux["goal_pose"])
    np.testing.assert_allclose(np.linalg.norm(g[:, 3:7], axis=-1), 1.0,
                               rtol=1e-5)


def test_variant_configs_compose():
    """Hydra-style `defaults:` variant configs select env class via `name:`
    (reference cfg/task/{AntSAC,HumanoidSAC,HumanoidAMPHands,ShadowHandTest}
    .yaml, train/{HumanoidAMPPPOLowGP,ShadowHandOpenAIPPO,...}.yaml)."""
    from isaacgymenvs_tpu.utils.config import (load_task_config,
                                               load_train_config)
    c = load_task_config("ShadowHandTest")
    assert c["name"] == "ShadowHand" and "defaults" not in c
    assert c["env"]["observationType"] == "openai"
    assert c["env"]["numEnvs"] == 256 and c["task"]["randomize"] is True
    c = load_task_config("HumanoidAMPHands")
    assert "right_hand" in c["env"]["contactBodies"]
    assert c["env"]["motion_file"] == "amp_humanoid_cartwheel.npy"
    c = load_train_config("HumanoidAMPPPOLowGP")
    assert c["params"]["config"]["disc_grad_penalty"] == 0.2
    assert c["params"]["algo"]["name"] == "amp_continuous"
    c = load_train_config("ShadowHandOpenAIPPO")
    assert c["params"]["network"]["mlp"]["units"] == [400, 400, 200, 100]
    assert "rnn" not in c["params"]["network"]
    c = load_train_config("HumanoidSAC")
    assert c["params"]["algo"]["name"] == "sac"

    env = isaacgymenvs_tpu.make(task="AntSAC", num_envs=4)
    assert type(env).__name__ == "Ant" and env.num_envs == 4
    env = isaacgymenvs_tpu.make(task="HumanoidAMPHands", num_envs=2)
    assert type(env).__name__ == "HumanoidAMP"
    assert len(env.contact_body_ids) == 4


def test_trajectory_viewer(tmp_path):
    """Offline re-renderer (utils/viewer.py) — the headless analogue of the
    reference viewer (vec_task.py:408-440): trajectory.npz → PNG strip."""
    import os
    env = isaacgymenvs_tpu.make(task="Cartpole", num_envs=1)
    state, _ = env.reset(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    qs = []
    for _ in range(6):
        state, t = step(state, jnp.zeros((1, 1)))
        qs.append(np.asarray(state.art.q[0]))
    p = tmp_path / "trajectory.npz"
    np.savez(p, q=np.stack(qs),
             body_names=np.asarray(env.model.body_names))
    from isaacgymenvs_tpu.utils.viewer import render_trajectory
    out = render_trajectory(str(p), "Cartpole",
                            out=str(tmp_path / "t.png"),
                            keyframes=2, stride=1)
    assert os.path.getsize(out) > 1000


def test_trifinger_asymmetric_states():
    """113-dim privileged states (reference trifinger.py:334-352):
    [obs 41 | object_u 6 | fingertip_state 39 | joint_torques 9 |
    fingertip_wrench 18], defaults on (Trifinger.yaml asymmetric_obs)."""
    import isaacgymenvs_tpu
    from isaacgymenvs_tpu.utils.config import load_task_config
    cfg = load_task_config("Trifinger")
    assert cfg["env"]["asymmetric_obs"] is True
    env = isaacgymenvs_tpu.make(task="Trifinger", num_envs=4, cfg=cfg)
    assert env.num_states == 113
    state, obs = env.reset(jax.random.PRNGKey(0))
    state, ts = jax.jit(env.step)(state, jnp.zeros((4, 9)))
    assert ts.states is not None and ts.states.shape == (4, 113)
    s = np.asarray(ts.states)
    assert np.isfinite(s).all()
    # layout checks: raw obs prefix (q unnormalized, within joint limits)
    q = np.asarray(state.art.q[:, :9])
    np.testing.assert_allclose(s[:, :9], q, atol=1e-5)
    # goal-pose quaternion inside the raw-obs block is unit-norm
    goal_quat = s[:, 28:32]
    np.testing.assert_allclose(np.linalg.norm(goal_quat, axis=-1), 1.0,
                               atol=1e-4)
    # fingertip quaternions (offsets 41+6+3 .. +7 per 13-wide finger block)
    for f in range(3):
        base = 41 + 6 + 13 * f
        qn = np.linalg.norm(s[:, base + 3:base + 7], axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-4)
    # joint torques bounded by the actuator saturation
    tau = s[:, 41 + 6 + 39:41 + 6 + 39 + 9]
    assert np.abs(tau).max() <= 0.36 + 1e-5


def test_sim_param_passthrough():
    """make() forwards advanced solver knobs from the task sim: block
    (reference __parse_sim_params consumes the whole physx block)."""
    from isaacgymenvs_tpu.utils.config import load_task_config
    c = load_task_config("Ant")
    c.setdefault("sim", {})["friction_timeconst"] = 0.004
    c["sim"]["power_iterations"] = 3
    env = isaacgymenvs_tpu.make(task="Ant", num_envs=2, cfg=c)
    assert env.sim.friction_timeconst == 0.004
    assert env.sim.power_iterations == 3


def test_safety_guard_nan_recovery(cartpole):
    """Round-4 explosion guard (envs/base.py): an env whose physics
    produces NaN state must be sanitized, force-terminated, and fully
    recovered (finite, re-spawned) two steps later — the round-3
    a1terrain failure mode (NaN comparisons are False → done never
    fires → permanent NaN) must be impossible."""
    import dataclasses
    from isaacgymenvs_tpu.core.types import ArtState

    env = cartpole
    state, _ = env.reset(jax.random.PRNGKey(7))
    # inject NaN into env 0's q and +inf into env 1's qd
    q = state.art.q.at[0, 0].set(jnp.nan)
    qd = state.art.qd.at[1, 0].set(jnp.inf)
    state = dataclasses.replace(state, art=ArtState(q=q, qd=qd))

    step = jax.jit(env.step)
    state, ts = step(state, jnp.zeros((16, 1)))
    # guard fires: both envs terminated, their frames zeroed
    assert bool(ts.done[0]) and bool(ts.done[1])
    assert not bool(ts.timeout[0]) and not bool(ts.timeout[1])
    assert float(jnp.abs(ts.obs[0]).max()) == 0.0
    assert float(ts.reward[0]) == 0.0 and float(ts.reward[1]) == 0.0
    # state pytree is finite again (sanitized)
    assert bool(jnp.isfinite(state.art.q).all())
    assert bool(jnp.isfinite(state.art.qd).all())
    assert float(ts.info["safety_blown"]) == 2.0
    # next step: auto-reset replaces the blown envs with fresh spawns
    state, ts = step(state, jnp.zeros((16, 1)))
    assert bool(jnp.isfinite(ts.obs).all())
    assert abs(float(ts.obs[0, 0])) < 0.5  # near-origin respawn
    # and the guard is quiescent on healthy state
    state, ts = step(state, jnp.zeros((16, 1)))
    assert float(ts.info["safety_blown"]) == 0.0


def test_terrain_reset_respects_joint_limits():
    """Round-4 A1 fix: sampled reset DOF positions must be clamped to
    joint limits (PhysX clamps on set_dof_state), and the first steps
    after reset must not catapult joints (the round-3 NaN seed was
    beta/h * violation ~ 16 rad/s limit-row kicks at 500 Hz)."""
    import numpy as np
    import isaacgymenvs_tpu
    from isaacgymenvs_tpu.utils.config import load_task_config

    env = isaacgymenvs_tpu.make(task="A1Terrain", num_envs=32,
                                cfg=load_task_config("A1Terrain"))
    state, _ = env.reset(jax.random.PRNGKey(3))
    lo, hi = env.model.dof_limits()
    d = np.asarray(state.art.q[:, 7:])
    assert (d >= lo[6:] - 1e-5).all() and (d <= hi[6:] + 1e-5).all(), \
        "reset sampled DOF positions outside joint limits"
    # two steps of zero torque from spawn: no joint may exceed a few
    # rad/s (free fall + gentle depenetration only)
    step = jax.jit(env.step)
    for _ in range(2):
        state, ts = step(state, jnp.zeros((32, env.num_acts)))
    qd = np.asarray(state.art.qd[:, 6:])
    # gentle depenetration of a deep-spawned foot can transiently reach
    # ~5 rad/s at the calf; the pre-fix catapult regime was 16+ rad/s
    assert np.abs(qd).max() < 8.0, \
        f"spawn catapult: joint velocity {np.abs(qd).max():.1f} rad/s"
