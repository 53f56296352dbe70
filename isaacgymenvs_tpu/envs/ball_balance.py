"""BallBalance: 3-legged tray balancing a free ball.

Parity with reference `tasks/ball_balance.py` (475 LoC):
  * procedurally-authored balance-bot MJCF (`_create_balance_bot_asset`
    `:135-224`) — tray disc + 3 two-segment legs with hinge joints;
  * foot attractors pinning the lower-leg endpoints to the ground circle
    (`:252-270`) — here hard pin constraints in the impulse solver;
  * velocity-integrated PD position targets on the 3 lower-leg DOFs
    (`pre_physics_step` `:406-424`: targets += dt·speed_scale·a, clamped
    to limits, kp 4000 / kd 100 `:243-249`);
  * 24-D obs: actuated dof pos/vel, ball pos/linvel, tray force sensors /20
    (`compute_observations` `:285-300`);
  * reward 1/(1+dist)·1/(1+speed) toward ball at (0,0,0.7), reset when
    ball falls below 1.5·radius (`compute_bbot_reward` `:455-475`);
  * ball reset: random offset/height with inward-aimed horizontal velocity
    and −5 m/s vertical (`reset_idx` `:330-368`).
Config `cfg/task/BallBalance.yaml`.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import types as T
from ..core.modeling import add_actuators, compose_models
from ..io.mjcf import load_mjcf
from ..physics.collide import build_pair_contacts
from ..physics.solver import Attractors
from .base import VecTask


def _balance_bot_xml():
    """Author the balance-bot MJCF (geometry per ball_balance.py:135-224)."""
    tray_radius, tray_thickness, leg_radius = 0.5, 0.02, 0.02
    leg_outer = tray_radius - 0.1
    leg_length = leg_outer - 2 * leg_radius
    leg_inner = leg_outer - leg_length / math.sqrt(2)
    tray_height = leg_length * math.sqrt(2) + 2 * leg_radius \
        + 0.5 * tray_thickness

    def euler_zyx(r, p, y):
        # gymapi.Quat.from_euler_zyx(roll, pitch, yaw) intrinsic zyx
        cr, sr = math.cos(r / 2), math.sin(r / 2)
        cp, sp = math.cos(p / 2), math.sin(p / 2)
        cy, sy = math.cos(y / 2), math.sin(y / 2)
        return (cy * cp * cr + sy * sp * sr,
                cy * cp * sr - sy * sp * cr,
                cy * sp * cr + sy * cp * sr,
                sy * cp * cr - cy * sp * sr)

    legs = []
    angles = [0.0, 2 * math.pi / 3, 4 * math.pi / 3]
    for i, ang in enumerate(angles):
        fro = np.array([leg_outer * math.cos(ang), leg_outer * math.sin(ang),
                        -leg_radius - 0.5 * tray_thickness])
        to = np.array([leg_inner * math.cos(ang), leg_inner * math.sin(ang),
                       fro[2] - leg_length / math.sqrt(2)])
        up_pos = 0.5 * (fro + to)
        uq = euler_zyx(0, -0.75 * math.pi, ang)
        lq = euler_zyx(0, -0.5 * math.pi, 0)
        legs.append(f"""
      <body name="upper_leg{i}" pos="{up_pos[0]:g} {up_pos[1]:g} {up_pos[2]:g}"
            quat="{uq[0]:g} {uq[1]:g} {uq[2]:g} {uq[3]:g}">
        <geom type="capsule" size="{leg_radius:g} {0.5 * leg_length:g}" density="1000"/>
        <joint name="upper_leg_joint{i}" type="hinge" pos="0 0 {-0.5 * leg_length:g}"
               axis="0 1 0" limited="true" range="-45 45"/>
        <body name="lower_leg{i}" pos="{-0.5 * leg_length:g} 0 {0.5 * leg_length:g}"
              quat="{lq[0]:g} {lq[1]:g} {lq[2]:g} {lq[3]:g}">
          <geom type="capsule" size="{leg_radius:g} {0.5 * leg_length:g}" density="1000"/>
          <joint name="lower_leg_joint{i}" type="hinge" pos="0 0 {-0.5 * leg_length:g}"
                 axis="0 1 0" limited="true" range="-70 90"/>
        </body>
      </body>""")

    xml = f"""<mujoco model="BalanceBot">
  <compiler angle="degree" coordinate="local" inertiafromgeom="true"/>
  <worldbody>
    <body name="tray" pos="0 0 0">
      <joint name="root_joint" type="free"/>
      <geom type="cylinder" size="{tray_radius:g} {0.5 * tray_thickness:g}"
            pos="0 0 0" density="100"/>
      {''.join(legs)}
    </body>
  </worldbody>
</mujoco>"""
    geom = dict(tray_height=tray_height, leg_radius=leg_radius,
                leg_length=leg_length, leg_outer=leg_outer, angles=angles)
    return xml, geom


class BallBalance(VecTask):
    num_obs = 24
    num_acts = 3

    def __init__(self, cfg=None, num_envs=1024):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.max_episode_length = env.get("maxEpisodeLength", 500)
        self.action_speed_scale = env.get("actionSpeedScale", 20)
        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 1.0 / 60.0),
            substeps=sim_cfg.get("substeps", 2),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        self.dt = self.sim.dt

        xml, geom = _balance_bot_xml()
        bbot = load_mjcf(xml)
        self.ball_radius = 0.1
        ball_xml = f"""<mujoco model="ball"><worldbody>
          <body name="ball"><joint type="free" name="ball_free"/>
          <geom type="sphere" size="{self.ball_radius}" density="200"/>
          </body></worldbody></mujoco>"""
        ball = load_mjcf(ball_xml)
        self.tray_height = geom["tray_height"]
        scene = compose_models([
            ("bbot", bbot, [0, 0, self.tray_height]),
            ("ball", ball, [0.2, 0, 2.0]),
        ])
        sl = scene.actor_slices  # before add_actuators (dataclass copy)
        # PD position drives on lower-leg joints (ball_balance.py:243-249)
        act_joints = [f"bbot/lower_leg_joint{i}" for i in range(3)]
        scene = add_actuators(scene, act_joints, trntype=T.ACT_POSITION,
                              kp=4000.0, kd=100.0)
        self.model = scene
        # ball ↔ tray + ball ↔ legs only (PhysX would filter leg-tray
        # adjacent pairs; our tray-disc capsule approximation must not
        # collide with its own legs)
        bp = [("ball/ball", "bbot/tray")]
        for i in range(3):
            bp += [("ball/ball", f"bbot/upper_leg{i}"),
                   ("ball/ball", f"bbot/lower_leg{i}")]
        self.pair_contacts = build_pair_contacts(scene, body_pairs=bp)

        # foot attractors (ball_balance.py:252-270): pin lower-leg endpoints
        lower_ids = [scene.body_index(f"bbot/lower_leg{i}") for i in range(3)]
        targets = np.array([[geom["leg_outer"] * math.cos(a),
                             geom["leg_outer"] * math.sin(a),
                             geom["leg_radius"]] for a in geom["angles"]],
                           np.float32)
        offsets = np.tile(np.array([0, 0, 0.5 * geom["leg_length"]],
                                   np.float32), (3, 1))
        self.attractors = Attractors(
            body=np.asarray(lower_ids, np.int32), offset=offsets,
            target=targets)

        # dof bookkeeping: tree order = (upper0, lower0, upper1, ...)
        self.actuated_dofs = np.array([1, 3, 5])
        lo, hi = [], []
        for ji in range(scene.njnt):
            if scene.jnt_type[ji] == T.HINGE:
                l, h = scene.jnt_range[ji]
                lo.append(l); hi.append(h)
        self.dof_lower = jnp.asarray(np.array(lo, np.float32))
        self.dof_upper = jnp.asarray(np.array(hi, np.float32))

        self.ball_q = sl["ball"]["q"][0]   # ball qpos start
        self.ball_v = sl["ball"]["v"][0]
        self.bbot_v = sl["bbot"]["v"][0]   # free(6) + 6 hinges
        self.tray_body = scene.body_index("bbot/tray")
        self.ball_body = scene.body_index("ball/ball")
        self.sensor_pos = jnp.asarray(targets)  # tray sensor points ≈ feet
        self.init_q = jnp.asarray(scene.init_qpos)

    def _action_to_ctrl(self, actions):
        # ctrl comes from aux targets — handled in _physics via aux
        return actions

    def _initial_aux(self):
        n = self.num_envs
        return {"dof_targets": jnp.zeros((n, 3))}

    def _physics(self, state, actions):
        # velocity-integrated position targets (ball_balance.py:414-421)
        tgt = state.aux["dof_targets"] + self.dt * self.action_speed_scale \
            * actions
        tgt = jnp.clip(tgt, self.dof_lower[self.actuated_dofs],
                       self.dof_upper[self.actuated_dofs])
        # stash for obs/reward + persistence
        state.aux["dof_targets"] = tgt  # dict mutation safe: fresh dict/step
        from ..physics.step import physics_step
        from ..physics.collide import build_ground_contacts
        contacts = build_ground_contacts(self.model)

        def one(art, ctrl, params):
            return physics_step(self.model, self.sim, params, art, ctrl=ctrl,
                                contacts=contacts,
                                n_substeps=self.sim.substeps,
                                pair_contacts=self.pair_contacts,
                                attractors=self.attractors)

        in_axes = (0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(state.art, tgt,
                                                   state.params)

    def _sample_reset(self, state, keys):
        n = self.num_envs

        def one(key):
            ks = jax.random.split(key, 4)
            dist = jax.random.uniform(ks[0], minval=0.001, maxval=0.5)
            ang = jax.random.uniform(ks[1], minval=0.0,
                                     maxval=2 * jnp.pi)
            direc = jnp.array([jnp.cos(ang), jnp.sin(ang)])
            hpos = dist * direc
            speedscale = (dist - 0.001) / (0.5 - 0.001)
            hspeed = jax.random.uniform(ks[2], minval=0.0, maxval=5.0)
            hvel = -speedscale * hspeed * direc
            height = jax.random.uniform(ks[3], minval=1.0, maxval=2.0)
            q = self.init_q
            bq = self.ball_q
            q = q.at[bq:bq + 3].set(jnp.array([hpos[0], hpos[1], height]))
            q = q.at[bq + 3:bq + 7].set(jnp.array([1.0, 0, 0, 0]))
            # tray dofs back to zero handled by init_q
            qd = jnp.zeros(self.model.nv)
            bv = self.ball_v
            qd = qd.at[bv:bv + 3].set(
                jnp.array([hvel[0], hvel[1], -5.0]))
            return q, qd

        q, qd = jax.vmap(one)(keys)
        return q, qd, {"dof_targets": jnp.zeros((n, 3))}

    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        dof_pos = q[:, 7:13]
        dof_vel = qd[:, 6:12]
        bq, bv = self.ball_q, self.ball_v
        ball_pos = q[:, bq:bq + 3]
        ball_vel = qd[:, bv:bv + 3]

        # tray "force sensors": net tray contact force + torque about the 3
        # sensor points (ball_balance.py:285-300 normalizes by /20)
        f = info.body_contact_force[:, self.tray_body]      # (N,3)
        tau0 = info.body_contact_torque[:, self.tray_body]  # about tray origin
        tray_pos = info.kin.body_pos[:, self.tray_body]
        # torque about sensor point s (world): τ_s = τ_o − (s_w − o) × F
        from ..core.maths import quat_rotate
        tray_quat = info.kin.body_quat[:, self.tray_body]
        sensors = []
        for i in range(3):
            s_w = tray_pos + quat_rotate(tray_quat,
                                         jnp.broadcast_to(self.sensor_pos[i],
                                                          tray_pos.shape))
            tau_s = tau0 - jnp.cross(s_w - tray_pos, f)
            sensors.append(tau_s / 20.0)
        obs = jnp.concatenate([
            dof_pos[:, self.actuated_dofs],
            dof_vel[:, self.actuated_dofs],
            ball_pos, ball_vel,
            f / 20.0,
            sensors[0], sensors[1], sensors[2],
        ], axis=-1)
        return obs, {}

    def _reward_done(self, state, obs, actions, info):
        bq, bv = self.ball_q, self.ball_v
        bp = state.art.q[:, bq:bq + 3]
        bvel = state.art.qd[:, bv:bv + 3]
        ball_dist = jnp.sqrt(bp[:, 0] ** 2 + (bp[:, 2] - 0.7) ** 2
                             + bp[:, 1] ** 2)
        ball_speed = jnp.linalg.norm(bvel, axis=-1)
        reward = 1.0 / (1.0 + ball_dist) * (1.0 / (1.0 + ball_speed))
        done = (state.progress >= self.max_episode_length - 1) \
            | (bp[:, 2] < self.ball_radius * 1.5)
        return reward, done, {}
