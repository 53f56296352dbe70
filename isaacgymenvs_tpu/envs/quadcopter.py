"""Quadcopter: hover at (0,0,1) with tiltable rotors.

Parity with reference `tasks/quadcopter.py` (418 LoC):
  * runtime-authored model (`_create_quadcopter_asset` `:121-199`):
    chassis disc + 4 rotor arms, each with pitch (±30°) and roll (±30°)
    hinges, 8 DOFs total;
  * PD position drives kp=1000/kd=0 on all DOFs (`:229-232`), targets
    velocity-integrated `targets += dt·8π·a[0:8]` clamped to limits
    (`pre_physics_step` `:301-310`);
  * 4 thrusts velocity-integrated `thrusts += dt·200·a[8:12]` clamped to
    [0,2], applied LOCAL_SPACE on rotor bodies (`:312-330`);
  * 21-D obs `[(target−pos)/3, quat, linvel/2, angvel/π, dof_pos]`
    (`:382-392`); reward as Ingenuity with die on dist>3 or z<0.3
    (`compute_quadcopter_reward` `:399-418`).
Config `cfg/task/Quadcopter.yaml`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..core.modeling import add_actuators, hinge_joint_names
from ..io.mjcf import load_mjcf
from ..physics.collide import build_ground_contacts
from ..physics.step import physics_step
from .base import VecTask


def _quadcopter_xml():
    """Geometry per quadcopter.py:121-199."""
    chassis_radius, chassis_thickness = 0.1, 0.03
    rotor_radius, rotor_thickness, arm_radius = 0.04, 0.01, 0.01
    arms = []
    for i, ang in enumerate([0.25 * math.pi, 0.75 * math.pi,
                             1.25 * math.pi, 1.75 * math.pi]):
        d = chassis_radius + 0.25 * arm_radius
        pos = (d * math.cos(ang), d * math.sin(ang), 0.0)
        qw, qz = math.cos(ang / 2), math.sin(ang / 2)
        rpos = rotor_radius + 0.25 * arm_radius
        arms.append(f"""
      <body name="rotor_arm{i}" pos="{pos[0]:g} {pos[1]:g} {pos[2]:g}"
            quat="{qw:g} 0 0 {qz:g}">
        <geom type="sphere" size="{arm_radius:g}" density="200"/>
        <joint name="rotor_pitch{i}" type="hinge" pos="0 0 0" axis="0 1 0"
               limited="true" range="-30 30"/>
        <body name="rotor{i}" pos="{rpos:g} 0 0">
          <geom type="cylinder" size="{rotor_radius:g} {0.5 * rotor_thickness:g}"
                density="1000"/>
          <joint name="rotor_roll{i}" type="hinge" pos="0 0 0" axis="1 0 0"
                 limited="true" range="-30 30"/>
        </body>
      </body>""")
    return f"""<mujoco model="Quadcopter">
  <compiler angle="degree" coordinate="local" inertiafromgeom="true"/>
  <worldbody>
    <body name="chassis" pos="0 0 0">
      <joint name="root_joint" type="free"/>
      <geom type="cylinder" size="{chassis_radius:g} {0.5 * chassis_thickness:g}"
            density="50"/>
      {''.join(arms)}
    </body>
  </worldbody>
</mujoco>"""


class Quadcopter(VecTask):
    num_obs = 21
    num_acts = 12

    def __init__(self, cfg=None, num_envs=4096):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.max_episode_length = env.get("maxEpisodeLength", 500)
        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 100.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        self.dt = self.sim.dt
        model = load_mjcf(_quadcopter_xml())
        dof_names = hinge_joint_names(model)
        self.model = add_actuators(model, dof_names, trntype=T.ACT_POSITION,
                                   kp=1000.0, kd=0.0)
        self.rotor_bodies = np.array(
            [self.model.body_index(f"rotor{i}") for i in range(4)])
        lo, hi = [], []
        for ji in range(self.model.njnt):
            if self.model.jnt_type[ji] == T.HINGE:
                l, h = self.model.jnt_range[ji]
                lo.append(l); hi.append(h)
        self.dof_lower = jnp.asarray(np.array(lo, np.float32))
        self.dof_upper = jnp.asarray(np.array(hi, np.float32))
        init_q = np.array(self.model.init_qpos)
        init_q[2] = 1.0
        self.init_q = jnp.asarray(init_q, jnp.float32)

    def _initial_aux(self):
        n = self.num_envs
        return {"dof_targets": jnp.zeros((n, 8)),
                "thrusts": jnp.zeros((n, 4))}

    def _sample_reset(self, state, keys):
        n = self.num_envs

        def one(key):
            ks = jax.random.split(key, 3)
            dx = jax.random.uniform(ks[0], (2,), minval=-1.5, maxval=1.5)
            dz = jax.random.uniform(ks[1], minval=-0.2, maxval=1.5)
            dofs = jax.random.uniform(ks[2], (8,), minval=-0.2, maxval=0.2)
            q = self.init_q.at[0:2].add(dx).at[2].add(dz).at[7:].set(dofs)
            return q, jnp.zeros(self.model.nv)

        q, qd = jax.vmap(one)(keys)
        return q, qd, {"dof_targets": jnp.zeros((n, 8)),
                       "thrusts": jnp.zeros((n, 4))}

    def _physics(self, state, actions):
        contacts = build_ground_contacts(self.model)
        # velocity-integrated dof targets + thrusts (quadcopter.py:301-316)
        tgt = state.aux["dof_targets"] + self.dt * 8 * jnp.pi \
            * actions[:, 0:8]
        tgt = jnp.clip(tgt, self.dof_lower, self.dof_upper)
        thr = state.aux["thrusts"] + self.dt * 200.0 * actions[:, 8:12]
        thr = jnp.clip(thr, 0.0, 2.0)
        state.aux["dof_targets"] = tgt
        state.aux["thrusts"] = thr

        rb = self.rotor_bodies
        nb = self.model.nbody

        def one(art, ctrl, thrust, params):
            def force_fn(kin):
                f = jnp.zeros((nb, 6), art.q.dtype)
                for k in range(4):
                    fw = mx.quat_rotate(kin.body_quat[rb[k]],
                                        jnp.array([0.0, 0.0, 1.0])) \
                        * thrust[k]
                    f = f.at[rb[k], 3:].set(fw)
                return f

            return physics_step(self.model, self.sim, params, art, ctrl=ctrl,
                                contacts=contacts,
                                n_substeps=self.sim.substeps,
                                force_fn=force_fn)

        in_axes = (0, 0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(
            state.art, tgt, thr, state.params)

    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        target = jnp.array([0.0, 0.0, 1.0])
        obs = jnp.concatenate([
            (target - q[:, 0:3]) / 3.0,
            q[:, 3:7],
            qd[:, 0:3] / 2.0,
            qd[:, 3:6] / jnp.pi,
            q[:, 7:15],
        ], axis=-1)
        return obs, {}

    def _reward_done(self, state, obs, actions, info):
        q, qd = state.art.q, state.art.qd
        pos = q[:, 0:3]
        target_dist = jnp.sqrt(pos[:, 0] ** 2 + pos[:, 1] ** 2
                               + (1.0 - pos[:, 2]) ** 2)
        pos_reward = 1.0 / (1.0 + target_dist ** 2)
        ups = mx.quat_axis(q[:, 3:7], 2)
        tiltage = jnp.abs(1.0 - ups[:, 2])
        up_reward = 1.0 / (1.0 + tiltage ** 2)
        spinnage = jnp.abs(qd[:, 5])
        spin_reward = 1.0 / (1.0 + spinnage ** 2)
        reward = pos_reward + pos_reward * (up_reward + spin_reward)
        die = (target_dist > 3.0) | (pos[:, 2] < 0.3)
        done = die | (state.progress >= self.max_episode_length - 1)
        return reward, done, {}
