"""Domain-randomization engine tests (reference vec_task.py:496-768,
utils/dr_utils.py, docs/domain_randomization.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import isaacgymenvs_tpu
from isaacgymenvs_tpu.utils.config import load_task_config


@pytest.fixture(scope="module")
def dr_ant():
    cfg = load_task_config("Ant")
    cfg["task"]["randomize"] = True
    cfg["task"]["randomization_params"]["frequency"] = 8
    return isaacgymenvs_tpu.make(task="Ant", num_envs=8, cfg=cfg)


def test_dr_params_batched_and_in_range(dr_ant):
    env = dr_ant
    state, obs = env.reset(jax.random.PRNGKey(0))
    p = state.params
    base = env.model.default_phys_params()
    # batched per env
    assert p.body_mass.shape == (8,) + base.body_mass.shape
    # scaling uniform [0.5, 1.5] of original mass
    ratio = np.asarray(p.body_mass) / np.asarray(base.body_mass)[None]
    assert (ratio >= 0.5 - 1e-6).all() and (ratio <= 1.5 + 1e-6).all()
    # per-env values differ
    assert np.std(np.asarray(p.body_mass)[:, 1]) > 0
    # damping randomized too
    rd = np.asarray(p.dof_damping)[:, 6:] / \
        np.maximum(np.asarray(base.dof_damping)[None, 6:], 1e-9)
    assert (rd >= 0.5 - 1e-4).all() and (rd <= 1.5 + 1e-4).all()


def test_dr_resample_on_reset_after_frequency(dr_ant):
    env = dr_ant
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    mass0 = np.asarray(state.params.body_mass)
    # run long enough that every env passes frequency=8 and termination or
    # timeout resets fire (termination height cuts episodes short w/ zero
    # actions eventually... force short episodes via max_episode_length)
    env.max_episode_length = 10
    changed = False
    for i in range(30):
        state, ts = step(state, jnp.zeros((8, env.num_acts)))
        m = np.asarray(state.params.body_mass)
        if not np.allclose(m, mass0):
            changed = True
            break
    assert changed, "params never re-randomized after frequency+reset"


def test_dr_step_runs_and_obs_finite(dr_ant):
    env = dr_ant
    state, obs = env.reset(jax.random.PRNGKey(2))
    step = jax.jit(env.step)
    for _ in range(3):
        state, ts = step(state, jnp.zeros((8, env.num_acts)))
    assert not jnp.isnan(ts.obs).any()


def test_noise_spec_schedules():
    from isaacgymenvs_tpu.dr.engine import DomainRandomizer
    import numpy as np
    dr = DomainRandomizer(
        {"frequency": 4,
         "observations": {"range": [0.0, 0.1], "operation": "additive",
                          "distribution": "gaussian", "schedule": "linear",
                          "schedule_steps": 100}}, model=None)
    x = jnp.zeros((4, 6))
    corr = jnp.zeros((4, 6))
    # at step 0 the linear schedule zeroes the noise
    y0 = dr.obs_noise(x, jax.random.PRNGKey(0), corr, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(y0), 0.0, atol=1e-8)
    # at step >= schedule_steps, full variance
    y1 = dr.obs_noise(x, jax.random.PRNGKey(0), corr, jnp.asarray(200))
    assert float(jnp.std(y1)) > 0.01


# ---------------------------------------------------------------- round 2
# full reference prop surface: ShadowHandOpenAI_FF's DR tree (tendons,
# dof limits, restitution via Anymal, per-actor scoping, object scale)

@pytest.fixture(scope="module")
def dr_shadow():
    cfg = load_task_config("ShadowHandOpenAI_FF")
    assert cfg["task"]["randomize"], "reference default is randomize=true"
    return isaacgymenvs_tpu.make(task="ShadowHandOpenAI_FF", num_envs=4,
                                 cfg=cfg)


def test_shadowhand_dr_full_surface(dr_shadow):
    """All reference ShadowHand DR props active: per-env dispersion on
    hand tendons/dof-limits/mass/friction AND object scale/mass, with
    per-actor scoping (hand DR must not touch the object's bodies)."""
    env = dr_shadow
    state, obs = env.reset(jax.random.PRNGKey(0))
    p = state.params
    base = env.model.default_phys_params()
    slices = env.model.actor_slices
    hand_b = slices["hand"]["body"]
    obj_b = slices["object"]["body"]
    hand_v = slices["hand"]["v"]
    obj_g = slices["object"]["geom"]
    hand_g = slices["hand"]["geom"]

    mass = np.asarray(p.body_mass)
    base_mass = np.asarray(base.body_mass)
    # hand + object masses randomized (scaling [0.5, 1.5])
    hand_ratio = mass[:, hand_b[0] + 1:hand_b[1]] / \
        np.maximum(base_mass[None, hand_b[0] + 1:hand_b[1]], 1e-12)
    assert np.std(hand_ratio) > 0
    assert (hand_ratio >= 0.5 - 1e-5).all() and (hand_ratio <= 1.5 + 1e-5).all()

    # dof limits perturbed additively (gaussian sigma 0.01) on hand dofs
    dlo = np.asarray(p.dof_lower)[:, hand_v[0]:hand_v[1]]
    blo = np.asarray(base.dof_lower)[None, hand_v[0]:hand_v[1]]
    finite = np.abs(blo) < 1e6
    assert np.std((dlo - blo)[:, finite[0]]) > 0
    assert np.abs((dlo - blo)[:, finite[0]]).max() < 0.1

    # tendon stiffness scaled loguniform [0.75, 1.5] of the asset value
    if env.model.ntendon:
        tkp = np.asarray(p.ten_kp)
        bkp = np.asarray(base.ten_kp)
        nz = bkp > 0
        if nz.any():
            r = tkp[:, nz] / bkp[None, nz]
            assert (r >= 0.75 - 1e-5).all() and (r <= 1.5 + 1e-5).all()
            assert np.std(r) > 0

    # object scale: ONE factor per env on the object's geoms, in range
    gs = np.asarray(p.geom_scale)
    obj_s = gs[:, obj_g[0]:obj_g[1]]
    assert (obj_s >= 0.95 - 1e-6).all() and (obj_s <= 1.05 + 1e-6).all()
    assert np.std(obj_s[:, 0]) > 0
    # single shared factor per env across the object's geoms
    assert np.allclose(obj_s, obj_s[:, :1])
    # hand geoms NOT scale-randomized (per-actor scoping)
    assert np.allclose(gs[:, hand_g[0]:hand_g[1]], 1.0)


def test_shadowhand_dr_steps_under_jit(dr_shadow):
    env = dr_shadow
    state, obs = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    for _ in range(3):
        state, ts = step(state, jnp.zeros((4, env.num_acts)))
    assert np.isfinite(np.asarray(ts.obs)).all()
    assert np.isfinite(np.asarray(ts.reward)).all()


def test_restitution_bounce():
    """geom_restitution produces bounce: a falling ball with e=0.8
    rebounds; with e=0 it stays down (solver restitution rows)."""
    import dataclasses
    from isaacgymenvs_tpu.core import types as T
    from isaacgymenvs_tpu.physics.step import physics_step
    from isaacgymenvs_tpu.physics.collide import build_ground_contacts
    from test_pair_collisions import _free_sphere

    ball = _free_sphere("ball", radius=0.1, mass=0.2, z0=0.5)
    sim = T.SimParams(dt=1 / 60, substeps=2)
    contacts = build_ground_contacts(ball)

    step = jax.jit(lambda params, art: physics_step(
        ball, sim, params, art, ctrl=jnp.zeros(ball.nu),
        contacts=contacts, n_substeps=sim.substeps)[0])

    def drop(e):
        params = ball.default_phys_params()
        params = dataclasses.replace(
            params, geom_restitution=jnp.full((ball.ngeom,), e))
        q = jnp.asarray(ball.init_qpos).at[2].set(0.5)
        art = T.ArtState(q=q, qd=jnp.zeros(ball.nv))
        zs = []
        for t in range(120):
            art = step(params, art)
            zs.append(float(art.q[2]))
        zs = np.asarray(zs)
        hit = int(np.argmax(zs < 0.12))
        return float(zs[hit:].max())

    bounce_high = drop(0.8 * 2)   # geom-vs-plane combine averages to 0.8
    bounce_none = drop(0.0)
    assert bounce_high > 0.20, f"e=0.8 should rebound, peak={bounce_high}"
    assert bounce_none < 0.15, f"e=0 should stay down, peak={bounce_none}"
