"""AnymalTerrain: rough-terrain locomotion with curriculum.

Parity with reference `tasks/anymal_terrain.py` (685 LoC):
  * procedural heightfield terrain grid (numLevels × numTerrains) with
    game-inspired curriculum promotion/demotion (`update_terrain_level`,
    `:425-433`) and per-env spawn origins from the grid (`:256-283`);
  * decimated PD torque loop clipped at ±80 Nm recomputed every sim
    substep (`pre_physics_step`, `:439-449`);
  * 188-D obs incl. 140 height samples on a 1.6m×1m grid with the
    reference's min-of-two-pixels lookup (`init_height_points`/`get_heights`,
    `:501-538`) and additive uniform obs noise vector (`:172-184`);
  * 13-term reward with per-term episode sums (`compute_reward`,
    `:313-381`), heading-based yaw command (`:461-467`);
  * random robot pushes every pushInterval_s (root lin-vel overwrite,
    `push_robots` `:435-437`);
  * per-env friction randomization from 100 buckets (`:233-240,277-279`).
Config `cfg/task/AnymalTerrain.yaml`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..io.terrain import Terrain, make_height_fn
from ..io.urdf import load_urdf
from ..physics.collide import build_ground_contacts
from ..physics.step import physics_step
from .base import VecTask
from ..utils.assets import asset_path

_ASSET = asset_path("urdf/anymal_c/urdf/anymal_minimal.urdf")

_DEFAULT_ANGLES = {
    "LF_HAA": 0.03, "LH_HAA": 0.03, "RF_HAA": -0.03, "RH_HAA": -0.03,
    "LF_HFE": 0.4, "LH_HFE": -0.4, "RF_HFE": 0.4, "RH_HFE": -0.4,
    "LF_KFE": -0.8, "LH_KFE": 0.8, "RF_KFE": -0.8, "RH_KFE": 0.8,
}

_REW_TERMS = ("lin_vel_xy", "ang_vel_z", "lin_vel_z", "ang_vel_xy", "orient",
              "torques", "joint_acc", "base_height", "air_time", "collision",
              "stumble", "action_rate", "hip")


class AnymalTerrain(VecTask):
    num_obs = 188
    refresh_kin_on_reset = True  # spawn teleports between terrain cells

    # subclass hooks (A1Terrain overrides)
    asset_path = _ASSET
    default_angles = _DEFAULT_ANGLES
    foot_name = "SHANK"
    knee_name = "THIGH"
    torque_clip = 80.0

    def __init__(self, cfg=None, num_envs=4096, seed: int = 0):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        learn = env.get("learn", {})
        control = env.get("control", {})
        tcfg = env.get("terrain", {})
        self.clip_obs = env.get("clipObservations", np.inf)
        self.clip_actions = env.get("clipActions", np.inf)

        self.lin_vel_scale = learn.get("linearVelocityScale", 2.0)
        self.ang_vel_scale = learn.get("angularVelocityScale", 0.25)
        self.dof_pos_scale = learn.get("dofPositionScale", 1.0)
        self.dof_vel_scale = learn.get("dofVelocityScale", 0.05)
        self.height_meas_scale = learn.get("heightMeasurementScale", 5.0)
        self.action_scale = control.get("actionScale", 0.5)
        self.kp = control.get("stiffness", 80.0)
        self.kd = control.get("damping", 2.0)
        self.decimation = control.get("decimation", 4)
        self.allow_knee_contacts = learn.get("allowKneeContacts", True)

        sim_cfg = (cfg or {}).get("sim", {})
        sim_dt = sim_cfg.get("dt", 0.005)
        # control dt = decimation × sim dt (anymal_terrain.py:92-93); the
        # decimated PD loop = physics substeps with tau_fn
        self.sim = T.SimParams(
            dt=sim_dt * self.decimation,
            substeps=self.decimation * sim_cfg.get("substeps", 1),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            solver_iterations=sim_cfg.get("num_solver_iterations", 16),
        )
        self.dt_ctl = self.sim.dt
        self.max_episode_length_s = learn.get("episodeLength_s", 20.0)
        self.max_episode_length = int(
            self.max_episode_length_s / self.dt_ctl + 0.5)
        self.push_interval = int(
            learn.get("pushInterval_s", 15.0) / self.dt_ctl + 0.5)
        self.push_robots = learn.get("pushRobots", True)

        # reward scales × dt (anymal_terrain.py:102-103)
        g = lambda k, d: learn.get(k, d) * self.dt_ctl
        self.rew_scales = {
            "termination": learn.get("terminalReward", 0.0) * self.dt_ctl,
            "lin_vel_xy": g("linearVelocityXYRewardScale", 1.0),
            "lin_vel_z": g("linearVelocityZRewardScale", -4.0),
            "ang_vel_z": g("angularVelocityZRewardScale", 0.5),
            "ang_vel_xy": g("angularVelocityXYRewardScale", -0.05),
            "orient": g("orientationRewardScale", 0.0),
            "torques": g("torqueRewardScale", -0.00002),
            "joint_acc": g("jointAccRewardScale", -0.0005),
            "base_height": g("baseHeightRewardScale", 0.0),
            "air_time": g("feetAirTimeRewardScale", 1.0),
            "collision": g("kneeCollisionRewardScale", -0.25),
            "stumble": g("feetStumbleRewardScale", 0.0),
            "action_rate": g("actionRateRewardScale", -0.01),
            "hip": g("hipRewardScale", 0.0),
        }

        cr = env.get("randomCommandVelocityRanges", {})
        self.cmd_x = tuple(cr.get("linear_x", (-1.0, 1.0)))
        self.cmd_y = tuple(cr.get("linear_y", (-1.0, 1.0)))
        self.cmd_yaw = tuple(cr.get("yaw", (-3.14, 3.14)))
        init = env.get("baseInitState", {})
        self.base_init_pos = tuple(init.get("pos", (0.0, 0.0, 0.62)))

        # noise vector (anymal_terrain.py:172-184)
        self.add_noise = learn.get("addNoise", True)
        nl = learn.get("noiseLevel", 1.0)
        nv = np.zeros(self.num_obs, np.float32)
        nv[0:3] = learn.get("linearVelocityNoise", 0.1) * nl * self.lin_vel_scale
        nv[3:6] = learn.get("angularVelocityNoise", 0.2) * nl * self.ang_vel_scale
        nv[6:9] = learn.get("gravityNoise", 0.05) * nl
        nv[12:24] = learn.get("dofPositionNoise", 0.01) * nl * self.dof_pos_scale
        nv[24:36] = learn.get("dofVelocityNoise", 1.5) * nl * self.dof_vel_scale
        if self.num_obs > 48:
            nv[36:36 + self.num_height_points()] = (
                learn.get("heightMeasurementNoise", 0.06) * nl
                * self.height_meas_scale)
        self.noise_vec = jnp.asarray(nv)

        # friction randomization buckets (anymal_terrain.py:233-240)
        self.randomize_friction = learn.get("randomizeFriction", True)
        self.friction_range = tuple(learn.get("frictionRange", (0.5, 1.25)))

        # terrain
        self.terrain_type = tcfg.get("terrainType", "trimesh")
        self.curriculum = tcfg.get("curriculum", True)
        self.tcfg = tcfg
        if self.terrain_type in ("trimesh", "heightfield"):
            self.terrain = Terrain(tcfg, num_robots=num_envs, seed=seed)
            self.height_fn = make_height_fn(
                self.terrain.height_field_raw, self.terrain.horizontal_scale,
                self.terrain.vertical_scale,
                origin=(-self.terrain.border_size, -self.terrain.border_size))
            self.terrain_origins = jnp.asarray(
                self.terrain.env_origins, jnp.float32)
            self.num_levels = self.terrain.env_rows
            self.num_terrains = self.terrain.env_cols
            self.max_init_level = (tcfg.get("maxInitMapLevel", 0)
                                   if self.curriculum else self.num_levels - 1)
            self.env_length = self.terrain.env_length
        else:
            self.terrain = None
            self.height_fn = None
            self.num_levels = self.num_terrains = 1
            self.max_init_level = 0
            self.env_length = 8.0

        model = self._load_model()
        self.model = model
        self.num_acts = model.nv - 6
        self.num_dof = self.num_acts
        from ..core.modeling import hinge_joint_names
        dof_names = hinge_joint_names(model)
        self.dof_names = dof_names
        self.default_dof_pos = jnp.asarray(
            [self.default_angles[n] for n in dof_names], jnp.float32)
        self.hip_dofs = np.array(
            [i for i, n in enumerate(dof_names) if "HAA" in n or "hip" in n])

        self.base_idx = model.body_index("base")
        self.feet_idx = np.array([model.body_index(n) for n in model.body_names
                                  if self.foot_name in n])
        self.knee_idx = np.array([model.body_index(n) for n in model.body_names
                                  if self.knee_name in n])

        init_q = np.array(model.init_qpos)
        init_q[0:3] = self.base_init_pos
        init_q[7:] = np.asarray(self.default_dof_pos)
        self.init_q = jnp.asarray(init_q, jnp.float32)
        self.gravity_vec = jnp.array([0.0, 0.0, -1.0])

        # height-sensor grid: 1.6m×1m rectangle w/o center line (:501-511)
        ys = 0.1 * np.array([-5, -4, -3, -2, -1, 1, 2, 3, 4, 5])
        xs = 0.1 * np.array([-8, -7, -6, -5, -4, -3, -2, 2, 3, 4, 5, 6, 7, 8])
        gx, gy = np.meshgrid(xs, ys, indexing="ij")
        self.height_points = jnp.asarray(
            np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1),
            jnp.float32)

    @classmethod
    def num_height_points(cls):
        return 140

    def _load_model(self):
        return load_urdf(self.asset_path, fix_base=False,
                         collapse_fixed_joints=True,
                         replace_cylinder_with_capsule=True)

    # ----------------------------------------------------------------- params
    def _params_batched(self) -> bool:
        return self.randomize_friction

    def _initial_params(self, key):
        p = self.model.default_phys_params()
        if not self.randomize_friction:
            return p
        # 100 friction buckets, env i ← bucket i%100 (anymal_terrain.py:236-240)
        buckets = jax.random.uniform(
            key, (100,), minval=self.friction_range[0],
            maxval=self.friction_range[1])
        fr = buckets[jnp.arange(self.num_envs) % 100]
        gf = jnp.broadcast_to(fr[:, None],
                              (self.num_envs, self.model.ngeom))
        tile = lambda x: jnp.broadcast_to(
            jnp.asarray(x), (self.num_envs,) + jnp.asarray(x).shape)
        return T.PhysParams(
            body_mass=tile(p.body_mass), body_com=tile(p.body_com),
            body_inertia=tile(p.body_inertia),
            dof_armature=tile(p.dof_armature), dof_damping=tile(p.dof_damping),
            dof_stiffness=tile(p.dof_stiffness),
            dof_frictionloss=tile(p.dof_frictionloss),
            act_gear=tile(p.act_gear), act_kp=tile(p.act_kp),
            act_kd=tile(p.act_kd), geom_friction=gf)

    # ------------------------------------------------------------------- aux
    def _initial_aux(self):
        n = self.num_envs
        k = jax.random.PRNGKey(12345)
        levels = jax.random.randint(k, (n,), 0, self.max_init_level + 1)
        types_ = jax.random.randint(jax.random.fold_in(k, 1), (n,), 0,
                                    self.num_terrains)
        if self.terrain is not None:
            origins = self.terrain_origins[levels, types_]
            xy = jax.random.uniform(jax.random.fold_in(k, 2), (n, 2),
                                    minval=-1.0, maxval=1.0)
            origins = origins.at[:, :2].add(xy)
        else:
            origins = jnp.zeros((n, 3))
        return {
            "actions": jnp.zeros((n, self.num_acts)),
            "last_actions": jnp.zeros((n, self.num_acts)),
            "last_dof_vel": jnp.zeros((n, self.num_dof)),
            "commands": jnp.zeros((n, 4)),
            "feet_air_time": jnp.zeros((n, len(self.feet_idx))),
            "terrain_levels": levels,
            "terrain_types": types_,
            "env_origins": origins,
            "ep_sums": jnp.zeros((n, len(_REW_TERMS))),
        }

    # ---------------------------------------------------------------- physics
    def _physics(self, state, actions):
        contacts = build_ground_contacts(self.model)
        targets = self.action_scale * actions + self.default_dof_pos

        # random pushes every push_interval common steps (:435-437, :457-458)
        art = state.art
        if self.push_robots:
            do_push = (state.step_count + 1) % self.push_interval == 0
            push_v = jax.vmap(
                lambda kk: jax.random.uniform(jax.random.fold_in(kk, 77),
                                              (2,), minval=-1.0, maxval=1.0)
            )(state.rng)
            qd = jnp.where(do_push,
                           art.qd.at[:, 0:2].set(push_v), art.qd)
            art = T.ArtState(q=art.q, qd=qd)

        def one(art1, tgt, params):
            nv = self.model.nv

            def tau_fn(q, qd):
                # decimated PD torque, clipped (anymal_terrain.py:441-449)
                tau_pd = jnp.clip(
                    self.kp * (tgt - q[7:]) - self.kd * qd[6:],
                    -self.torque_clip, self.torque_clip)
                return jnp.zeros(nv, q.dtype).at[6:].set(tau_pd)

            return physics_step(self.model, self.sim, params, art1,
                                contacts=contacts, height_fn=self.height_fn,
                                n_substeps=self.sim.substeps, tau_fn=tau_fn)

        in_axes = (0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(art, targets, state.params)

    # ------------------------------------------------------------------ reset
    def _sample_reset(self, state, keys):
        n = self.num_envs
        aux = state.aux

        # terrain curriculum (update_terrain_level :425-433); no update on
        # the very first reset (progress==0 everywhere → init_done=False)
        levels = aux["terrain_levels"]
        if self.terrain is not None and self.curriculum:
            init_done = jnp.any(state.progress > 0)
            dist = jnp.linalg.norm(
                state.art.q[:, :2] - aux["env_origins"][:, :2], axis=-1)
            cmd_dist = jnp.linalg.norm(aux["commands"][:, :2], axis=-1)
            demote = dist < cmd_dist * self.max_episode_length_s * 0.25
            promote = dist > self.env_length / 2
            new_levels = levels - demote.astype(levels.dtype) \
                + promote.astype(levels.dtype)
            new_levels = jnp.clip(new_levels, 0, None) % self.num_levels
            levels = jnp.where(init_done, new_levels, levels)
        if self.terrain is not None:
            origins = self.terrain_origins[levels, aux["terrain_types"]]
        else:
            origins = aux["env_origins"]

        def one(key, origin):
            ks = jax.random.split(key, 5)
            scale = jax.random.uniform(ks[0], (self.num_dof,), minval=0.5,
                                       maxval=1.5)
            dv = jax.random.uniform(ks[1], (self.num_dof,), minval=-0.1,
                                    maxval=0.1)
            # PhysX clamps DOF positions to joint limits on
            # set_dof_state (the reference's ×U(0.5,1.5) sampling,
            # anymal_terrain.py:387, routinely lands outside them —
            # A1's calf range [-2.7,-0.92] × 0.5-1.5 of default -1.5
            # violates the upper bound ~40% of the time). Without the
            # clamp our limit rows catapult the joint at
            # beta·viol/h ≈ 16 rad/s every reset (the round-3 A1
            # reward-explosion/NaN seed).
            lo, hi = self.model.dof_limits()
            dof = jnp.clip(self.default_dof_pos * scale,
                           jnp.asarray(lo[6:]), jnp.asarray(hi[6:]))
            q = self.init_q.at[7:].set(dof)
            if self.terrain is not None:
                xy = jax.random.uniform(ks[2], (2,), minval=-0.5, maxval=0.5)
                q = q.at[0:3].add(origin).at[0:2].add(xy)
            q = self._spawn_project(q)
            qd = jnp.zeros(self.model.nv).at[6:].set(dv)
            cmd = jnp.stack([
                jax.random.uniform(ks[3], minval=self.cmd_x[0],
                                   maxval=self.cmd_x[1]),
                jax.random.uniform(jax.random.fold_in(ks[3], 1),
                                   minval=self.cmd_y[0], maxval=self.cmd_y[1]),
                jnp.zeros(()),
                jax.random.uniform(ks[4], minval=self.cmd_yaw[0],
                                   maxval=self.cmd_yaw[1]),
            ])
            # zero small commands (:467-468)
            cmd = cmd * (jnp.linalg.norm(cmd[:2]) > 0.25)
            return q, qd, cmd

        q, qd, cmd = jax.vmap(one)(keys, origins)
        z = jnp.zeros
        return q, qd, {
            "actions": z((n, self.num_acts)),
            "last_actions": z((n, self.num_acts)),
            "last_dof_vel": z((n, self.num_dof)),
            "commands": cmd,
            "feet_air_time": z((n, len(self.feet_idx))),
            "terrain_levels": levels,
            "env_origins": origins,
            "ep_sums": z((n, len(_REW_TERMS))),
        }

    def _spawn_project(self, q):
        """Momentum-free spawn depenetration — the TPU-native analogue of
        PhysX removing set_dof_state penetrations in POSITION iterations
        (reference A1/Anymal spawn: fixed base height x U(0.5,1.5)-scaled
        leg angles routinely puts a near-straight leg's foot sphere up to
        ~18 mm inside the ground). A velocity-level Baumgarte solver must
        instead inject v = beta*depth/h through a near-singular leg —
        measured ~19 rad/s calf velocity ONE step after reset (round-5
        a1_diag2), the seed of the A1Terrain reward explosions. Raising
        the base so the deepest candidate sits 1 mm clear removes the
        penetration with zero momentum, like PhysX."""
        from ..physics.kinematics import forward_kinematics
        cs = build_ground_contacts(self.model)
        p0 = self.model.default_phys_params()
        kin = forward_kinematics(self.model, p0, q,
                                 jnp.zeros(self.model.nv, q.dtype))
        b = jnp.asarray(cs.body)
        off = jnp.asarray(cs.offset, q.dtype)
        r = jnp.asarray(cs.radius, q.dtype)
        pts = kin.body_pos[b] + mx.quat_rotate(kin.body_quat[b], off)
        if self.height_fn is not None:
            ground, _ = self.height_fn(pts[:, 0], pts[:, 1])
        else:
            ground = 0.0
        clearance = pts[:, 2] - r - ground
        dz = jnp.maximum(0.0, 1e-3 - jnp.min(clearance))
        return q.at[2].add(dz)

    # -------------------------------------------------------------------- obs
    def _measured_heights(self, q):
        """Reference get_heights (:513-538): yaw-rotated grid, min of two
        diagonal integer-pixel samples."""
        if self.terrain is None:
            return jnp.zeros((self.num_envs, self.height_points.shape[0]))
        base_quat = q[:, 3:7]
        yaw_quat = mx.calc_heading_quat(base_quat)
        pts = mx.quat_rotate(yaw_quat[:, None, :],
                             jnp.broadcast_to(self.height_points,
                                              (self.num_envs,) +
                                              self.height_points.shape))
        pts = pts + q[:, None, 0:3]
        hf = jnp.asarray(self.terrain.height_field_raw.astype(np.float32))
        scale = self.terrain.horizontal_scale
        px = jnp.clip(((pts[..., 0] + self.terrain.border_size) / scale)
                      .astype(jnp.int32), 0, hf.shape[0] - 2)
        py = jnp.clip(((pts[..., 1] + self.terrain.border_size) / scale)
                      .astype(jnp.int32), 0, hf.shape[1] - 2)
        h1 = hf[px, py]
        h2 = hf[px + 1, py + 1]
        return jnp.minimum(h1, h2) * self.terrain.vertical_scale

    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        base_quat = q[:, 3:7]
        base_lin_vel = mx.quat_rotate_inv(base_quat, qd[:, 0:3])
        base_ang_vel = mx.quat_rotate_inv(base_quat, qd[:, 3:6])
        projected_gravity = mx.quat_rotate_inv(
            base_quat, jnp.broadcast_to(self.gravity_vec,
                                        (self.num_envs, 3)))

        # heading-based yaw command (:461-467)
        cmd = state.aux["commands"]
        forward = mx.quat_rotate(base_quat, jnp.broadcast_to(
            jnp.array([1.0, 0, 0]), (self.num_envs, 3)))
        heading = jnp.arctan2(forward[:, 1], forward[:, 0])
        yaw_cmd = jnp.clip(
            0.5 * mx.normalize_angle(cmd[:, 3] - heading), -1.0, 1.0)
        cmd = cmd.at[:, 2].set(yaw_cmd)

        heights = self._measured_heights(q)
        h_obs = jnp.clip(q[:, 2:3] - 0.5 - heights, -1.0, 1.0) \
            * self.height_meas_scale
        cmd_scale = jnp.array([self.lin_vel_scale, self.lin_vel_scale,
                               self.ang_vel_scale])
        obs = jnp.concatenate([
            base_lin_vel * self.lin_vel_scale,
            base_ang_vel * self.ang_vel_scale,
            projected_gravity,
            cmd[:, :3] * cmd_scale,
            q[:, 7:] * self.dof_pos_scale,
            qd[:, 6:] * self.dof_vel_scale,
            h_obs,
            state.aux["actions"],
        ], axis=-1)
        if self.add_noise:
            nkeys = jax.vmap(lambda k: jax.random.fold_in(k, 33))(state.rng)
            noise = jax.vmap(lambda k: jax.random.uniform(
                k, (self.num_obs,), minval=-1.0, maxval=1.0))(nkeys)
            obs = obs + noise * self.noise_vec
        return obs, {"commands": cmd}

    # ----------------------------------------------------------------- reward
    def _reward_done(self, state, obs, actions, info):
        q, qd = state.art.q, state.art.qd
        aux = state.aux
        base_quat = q[:, 3:7]
        base_lin_vel = mx.quat_rotate_inv(base_quat, qd[:, 0:3])
        base_ang_vel = mx.quat_rotate_inv(base_quat, qd[:, 3:6])
        projected_gravity = mx.quat_rotate_inv(
            base_quat, jnp.broadcast_to(self.gravity_vec,
                                        (self.num_envs, 3)))
        cmd = aux["commands"]
        rs = self.rew_scales
        cf = info.body_contact_force

        lin_vel_error = jnp.sum((cmd[:, :2] - base_lin_vel[:, :2]) ** 2, -1)
        ang_vel_error = (cmd[:, 2] - base_ang_vel[:, 2]) ** 2
        r_lin_xy = jnp.exp(-lin_vel_error / 0.25) * rs["lin_vel_xy"]
        r_ang_z = jnp.exp(-ang_vel_error / 0.25) * rs["ang_vel_z"]
        r_lin_z = base_lin_vel[:, 2] ** 2 * rs["lin_vel_z"]
        r_ang_xy = jnp.sum(base_ang_vel[:, :2] ** 2, -1) * rs["ang_vel_xy"]
        r_orient = jnp.sum(projected_gravity[:, :2] ** 2, -1) * rs["orient"]
        r_height = (q[:, 2] - 0.52) ** 2 * rs["base_height"]

        # PD torques at the post-step state (reference keeps last applied)
        tgt = self.action_scale * actions + self.default_dof_pos
        torques = jnp.clip(self.kp * (tgt - q[:, 7:]) - self.kd * qd[:, 6:],
                           -self.torque_clip, self.torque_clip)
        r_torque = jnp.sum(torques ** 2, -1) * rs["torques"]
        r_jacc = jnp.sum((aux["last_dof_vel"] - qd[:, 6:]) ** 2, -1) \
            * rs["joint_acc"]

        knee_contact = jnp.linalg.norm(cf[:, self.knee_idx], axis=-1) > 1.0
        r_collision = jnp.sum(knee_contact, -1) * rs["collision"]
        stumble = ((jnp.linalg.norm(cf[:, self.feet_idx, :2], axis=-1) > 5.0)
                   & (jnp.abs(cf[:, self.feet_idx, 2]) < 1.0))
        r_stumble = jnp.sum(stumble, -1) * rs["stumble"]
        r_act_rate = jnp.sum((aux["last_actions"] - actions) ** 2, -1) \
            * rs["action_rate"]

        # feet air time (:365-371)
        contact = cf[:, self.feet_idx, 2] > 1.0
        air = aux["feet_air_time"]
        first_contact = (air > 0.0) & contact
        air = air + self.dt_ctl
        r_air = jnp.sum((air - 0.5) * first_contact, -1) * rs["air_time"]
        r_air = r_air * (jnp.linalg.norm(cmd[:, :2], axis=-1) > 0.1)
        air = air * (~contact)

        r_hip = jnp.sum(jnp.abs(q[:, 7 + self.hip_dofs]
                                - self.default_dof_pos[self.hip_dofs]), -1) \
            * rs["hip"]

        terms = jnp.stack([r_lin_xy, r_ang_z, r_lin_z, r_ang_xy, r_orient,
                           r_torque, r_jacc, r_height, r_air, r_collision,
                           r_stumble, r_act_rate, r_hip], axis=-1)
        total = jnp.clip(jnp.sum(terms, -1), 0.0, None)

        base_contact = jnp.linalg.norm(cf[:, self.base_idx], axis=-1) > 1.0
        done = base_contact
        if not self.allow_knee_contacts:
            done = done | jnp.any(knee_contact, -1)
        timeout = state.progress >= self.max_episode_length - 1
        done = done | timeout
        total = total + rs["termination"] * (done & ~timeout)

        ep_sums = aux["ep_sums"] + terms
        # per-term episode sums ride the done-gated "final/" channel
        # (reference extras["episode"], anymal_terrain.py:419-424: mean
        # over RESETTING envs / max_episode_length_s). The earlier
        # pre-reduced per-step scalar was diluted ~1/ep_len by the
        # epoch-mean (round-3 Weak #2: channel read ~0.0 all run).
        task_info = {"terrain_level_mean":
                     jnp.mean(aux["terrain_levels"].astype(jnp.float32))}
        for i, name in enumerate(_REW_TERMS):
            task_info["final/rew_" + name] = \
                ep_sums[:, i] / self.max_episode_length_s

        aux_up = {"feet_air_time": air, "last_actions": actions,
                  "last_dof_vel": qd[:, 6:], "ep_sums": ep_sums}
        return total, done, task_info, aux_up
