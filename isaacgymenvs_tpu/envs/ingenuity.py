"""Ingenuity: Mars helicopter flying to moving targets.

Parity with reference `tasks/ingenuity.py` (440 LoC):
  * runtime-authored coaxial-rotor model (`_create_ingenuity_asset`
    `:125-232`): chassis + two rotor assemblies;
  * Mars gravity −3.721 (`:117-119`);
  * thrust as LOCAL_SPACE rigid-body forces on the rotor bodies
    (`:330-359`): vertical component `clip(a·2000)·dt`, lateral fraction
    clipped ±0.2;
  * moving target resampled every 500 steps and on reset (`set_targets`
    `:285-296`: x,y ∈ (−5,5), z ∈ (1,2));
  * 13-D obs `[(target−pos)/3, quat, linvel/2, angvel/π]` (`:396-400`);
  * reward pos·(1 + up + spinnage) with die on dist>8 or z<0.5
    (`compute_ingenuity_reward` `:409-440`).
Config `cfg/task/Ingenuity.yaml`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..io.mjcf import load_mjcf
from ..physics.collide import build_ground_contacts
from ..physics.step import physics_step
from .base import VecTask


def _ingenuity_xml():
    """Chassis sphere + 2 rotor bodies on vertical hinges (geometry per
    ingenuity.py:125-232, simplified to physics-relevant parts)."""
    return """<mujoco model="Ingenuity">
  <compiler angle="degree" coordinate="local" inertiafromgeom="true"/>
  <worldbody>
    <body name="chassis" pos="0 0 0">
      <joint type="free" name="root"/>
      <geom type="sphere" size="0.06" density="1000"/>
      <body name="rotor_physics_0" pos="0 0 0.17">
        <joint name="rotor_roll0" type="hinge" axis="0 0 1"/>
        <geom type="cylinder" size="0.15 0.005" density="500"/>
      </body>
      <body name="rotor_physics_1" pos="0 0 0.28">
        <joint name="rotor_roll1" type="hinge" axis="0 0 1"/>
        <geom type="cylinder" size="0.15 0.005" density="500"/>
      </body>
    </body>
  </worldbody>
</mujoco>"""


class Ingenuity(VecTask):
    num_obs = 13
    num_acts = 6

    def __init__(self, cfg=None, num_envs=4096):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.max_episode_length = env.get("maxEpisodeLength", 2000)
        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 100.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -3.721))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        self.dt = self.sim.dt
        self.model = load_mjcf(_ingenuity_xml())
        self.rotor_bodies = np.array([
            self.model.body_index("rotor_physics_0"),
            self.model.body_index("rotor_physics_1")])
        self.thrust_upper_limit = 2000.0
        self.thrust_lateral_component = 0.2
        init_q = np.array(self.model.init_qpos)
        init_q[2] = 1.0
        self.init_q = jnp.asarray(init_q, jnp.float32)

    def _initial_aux(self):
        n = self.num_envs
        return {"targets": jnp.tile(jnp.array([0.0, 0.0, 1.0]), (n, 1))}

    def _sample_targets(self, keys):
        def one(k):
            kxy, kz = jax.random.split(k)
            xy = jax.random.uniform(kxy, (2,), minval=-5.0, maxval=5.0)
            z = jax.random.uniform(kz, minval=1.0, maxval=2.0)
            return jnp.array([xy[0], xy[1], z])
        return jax.vmap(one)(keys)

    def _sample_reset(self, state, keys):
        n = self.num_envs

        def one(key):
            ks = jax.random.split(key, 3)
            dx = jax.random.uniform(ks[0], (2,), minval=-1.5, maxval=1.5)
            dz = jax.random.uniform(ks[1], minval=-0.2, maxval=1.5)
            q = self.init_q.at[0:2].add(dx).at[2].add(dz)
            return q, jnp.zeros(self.model.nv)

        q, qd = jax.vmap(one)(keys)
        tkeys = jax.vmap(lambda k: jax.random.fold_in(k, 5))(keys)
        return q, qd, {"targets": self._sample_targets(tkeys)}

    def _physics(self, state, actions):
        contacts = build_ground_contacts(self.model)
        # thrust vectors (ingenuity.py:341-352)
        scale = 2000.0
        v0 = jnp.clip(actions[:, 2] * scale, -self.thrust_upper_limit,
                      self.thrust_upper_limit) * self.dt
        v1 = jnp.clip(actions[:, 5] * scale, -self.thrust_upper_limit,
                      self.thrust_upper_limit) * self.dt
        lat0 = jnp.clip(actions[:, 0:2], -self.thrust_lateral_component,
                        self.thrust_lateral_component)
        lat1 = jnp.clip(actions[:, 3:5], -self.thrust_lateral_component,
                        self.thrust_lateral_component)
        thrust0 = jnp.concatenate([v0[:, None] * lat0, v0[:, None]], -1)
        thrust1 = jnp.concatenate([v1[:, None] * lat1, v1[:, None]], -1)

        rb = self.rotor_bodies
        nb = self.model.nbody

        def one(art, t0, t1, params):
            def force_fn(kin):
                # LOCAL_SPACE: rotate body-frame thrust to world (:359)
                f = jnp.zeros((nb, 6), art.q.dtype)
                f0 = mx.quat_rotate(kin.body_quat[rb[0]], t0)
                f1 = mx.quat_rotate(kin.body_quat[rb[1]], t1)
                return f.at[rb[0], 3:].set(f0).at[rb[1], 3:].set(f1)

            return physics_step(self.model, self.sim, params, art,
                                contacts=contacts,
                                n_substeps=self.sim.substeps,
                                force_fn=force_fn)

        in_axes = (0, 0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(
            state.art, thrust0, thrust1, state.params)

    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        tgt = state.aux["targets"]
        obs = jnp.concatenate([
            (tgt - q[:, 0:3]) / 3.0,
            q[:, 3:7],
            qd[:, 0:3] / 2.0,
            qd[:, 3:6] / jnp.pi,
        ], axis=-1)
        return obs, {}

    def _reward_done(self, state, obs, actions, info):
        q, qd = state.art.q, state.art.qd
        tgt = state.aux["targets"]
        pos = q[:, 0:3]
        target_dist = jnp.linalg.norm(tgt - pos, axis=-1)
        pos_reward = 1.0 / (1.0 + target_dist ** 2)
        ups = mx.quat_axis(q[:, 3:7], 2)
        tiltage = jnp.abs(1.0 - ups[:, 2])
        up_reward = 5.0 / (1.0 + tiltage ** 2)
        spinnage = jnp.abs(qd[:, 5])
        spin_reward = 1.0 / (1.0 + spinnage ** 2)
        reward = pos_reward + pos_reward * (up_reward + spin_reward)

        die = (target_dist > 8.0) | (pos[:, 2] < 0.5)
        done = die | (state.progress >= self.max_episode_length - 1)

        # retarget every 500 steps (ingenuity.py:325-329)
        retarget = (state.progress % 500 == 0) & (state.progress > 0)
        tkeys = jax.vmap(lambda k: jax.random.fold_in(k, 6))(state.rng)
        new_t = self._sample_targets(tkeys)
        targets = jnp.where(retarget[:, None], new_t, tgt)
        return reward, done, {}, {"targets": targets}
