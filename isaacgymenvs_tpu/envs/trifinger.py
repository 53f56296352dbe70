"""Trifinger: move/reorient a cube to goal poses with three 3-DoF fingers.

Parity with reference `tasks/trifinger.py` (1513 LoC):
  * explicit MDP-space configuration: per-dimension observation bounds
    with optional normalized obs/actions (`__configure_mdp_spaces`
    `:593-713`); obs 41 = [q(9), u(9), object pose(7), goal pose(7),
    action(9)];
  * torque command mode with actuator saturation ±0.36 Nm and safety
    velocity damping (`pre_physics_step` `:993-1045`,
    `_robot_dof_gains["safety_damping"]` `:316-320`);
  * keypoint reward: 8 cube-corner keypoints vs goal keypoints through
    logistic kernels (`lgsk_kernel` `:1262`, `gen_keypoints` `:1279`),
    finger-movement penalty and finger-reach-rate terms
    (`compute_trifinger_reward` `:1294-1387`);
  * goal difficulty levels 1-4 (`_sample_object_goal_poses` `:928-990`);
  * random object spawn on the arena with yaw orientation (`:882-925`).
The stage surface is the ground plane at z=0 with a world-fixed `table`
actor as its material (so `table` friction DR is live); the boundary
ring URDF becomes an SDF carried by that actor, confining stray cubes.
Config `cfg/task/Trifinger.yaml`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core import maths as mx
from ..core import types as T
from ..core.modeling import compose_models
from ..io.urdf import load_urdf
from ..physics.collide import build_ground_contacts, build_pair_contacts
from ..physics.step import physics_step
from .base import VecTask
from ..utils.assets import asset_path

_ROBOT = asset_path(
    "trifinger/robot_properties_fingers/urdf/pro/trifingerpro.urdf")
_CUBE = asset_path("trifinger/objects/urdf/cube_multicolor_rrc.urdf")

_TIPS = ("finger_tip_link_0", "finger_tip_link_120", "finger_tip_link_240")
ARENA_RADIUS = 0.195
CUBE_SIZE = 0.065

_Q_LOW = np.array([-0.33, 0.0, -2.7] * 3, np.float32)
_Q_HIGH = np.array([1.0, 1.57, 0.0] * 3, np.float32)
_Q_DEFAULT = np.array([0.0, 0.9, -2.0] * 3, np.float32)
_MAX_TORQUE = 0.36
_MAX_VEL = 10.0
_SAFETY_DAMPING = np.array([0.08, 0.08, 0.04] * 3, np.float32)


def lgsk_kernel(x, scale=50.0, eps=2.0):
    """Logistic kernel bounding input to (0, 1/(2+eps)] (trifinger.py:1262)."""
    scaled = x * scale
    return 1.0 / (jnp.exp(scaled) + eps + jnp.exp(-scaled))


def gen_keypoints(pose, size=(CUBE_SIZE,) * 3):
    """8 cube-corner keypoints in world frame (trifinger.py:1279)."""
    corners = np.array([[(1 if ((i >> k) & 1) == 0 else -1) * size[k] / 2
                         for k in range(3)] for i in range(8)], np.float32)
    pos, quat = pose[..., 0:3], pose[..., 3:7]
    return pos[..., None, :] + mx.quat_rotate(quat[..., None, :],
                                              jnp.asarray(corners))


class Trifinger(VecTask):
    num_obs = 41
    num_acts = 9

    def __init__(self, cfg=None, num_envs=16384):
        super().__init__(cfg, num_envs)
        env = (cfg or {}).get("env", {})
        self.max_episode_length = env.get("episodeLength", 750)
        self.difficulty = env.get("task_difficulty", 4)
        self.command_mode = env.get("command_mode", "torque")
        self.normalize_action = env.get("normalize_action", True)
        self.normalize_obs = env.get("normalize_obs", True)
        self.apply_safety_damping = env.get("apply_safety_damping", True)
        # reference default is asymmetric (Trifinger.yaml:20): 113-dim
        # privileged states for the central-value critic
        self.asymmetric_obs = env.get("asymmetric_obs", True)
        self.num_states = 113 if self.asymmetric_obs else 0
        rt = env.get("reward_terms", {})
        self.w_move = rt.get("finger_move_penalty", {}).get("weight", -0.5)
        self.w_reach = rt.get("finger_reach_object_rate", {}).get(
            "weight", -250)
        self.w_keypoints = rt.get("keypoints_dist", {}).get("weight", 2000)
        tc = env.get("termination_conditions", {}).get("success", {})
        self.pos_tol = tc.get("position_tolerance", 0.02)
        self.rot_tol = tc.get("orientation_tolerance", 0.4)

        sim_cfg = (cfg or {}).get("sim", {})
        self.sim = T.SimParams(
            dt=sim_cfg.get("dt", 0.02),
            substeps=sim_cfg.get("substeps", 4),
            gravity=tuple(sim_cfg.get("gravity", (0.0, 0.0, -9.81))),
            # light-cube rows need extra APGD sweeps inside the stiff
            # finger constraint system (~5 mm rest sink at 16)
            solver_iterations=sim_cfg.get("num_solver_iterations", 48),
        )
        self.dt = self.sim.dt

        robot = load_urdf(_ROBOT, fix_base=True, collapse_fixed_joints=True)
        cube = load_urdf(_CUBE, fix_base=False)
        # stage/table actor (reference table_without_border.urdf actor,
        # trifinger.py:555-560): world-fixed, top surface at z=0. Its
        # geom is (a) the material source the ground-plane rows combine
        # with (SimParams.ground_material_geom) — making the DR tree's
        # `table` friction spec physically live — and (b) the carrier
        # of the arena-boundary SDF.
        from ..core.modeling import box_model_xml
        from ..io.mjcf import load_mjcf
        table = load_mjcf(box_model_xml(
            "table", (2 * ARENA_RADIUS + 0.21, 2 * ARENA_RADIUS + 0.21,
                      0.02), free=False))
        scene = compose_models([
            ("robot", robot, [0, 0, 0]),
            ("object", cube, [0, 0, CUBE_SIZE / 2]),
            ("table", table, [0, 0, -0.01]),
        ])
        sl = scene.actor_slices
        self.model = scene
        self.cube_q = sl["object"]["q"][0]
        self.cube_v = sl["object"]["v"][0]
        self.tip_bodies = np.array(
            [scene.body_index(f"robot/{t}") for t in _TIPS])
        self.cube_body = scene.body_index(f"object/{cube.body_names[0]}")
        self.table_body = scene.body_index("table/table")
        self.table_geom = int(sl["table"]["geom"][0])
        # ground rows take their second material from the table geom
        import dataclasses as _dc
        self.sim = _dc.replace(self.sim,
                               ground_material_geom=self.table_geom)

        init_q = np.array(scene.init_qpos)
        init_q[:9] = _Q_DEFAULT
        self.init_q = jnp.asarray(init_q, jnp.float32)

        # observation normalization bounds (__configure_mdp_spaces)
        obs_low = np.concatenate([
            _Q_LOW, np.full(9, -_MAX_VEL),
            [-0.3, -0.3, 0], -np.ones(4),          # object pose
            [-0.3, -0.3, 0], -np.ones(4),          # goal pose
            np.full(9, -_MAX_TORQUE) if self.command_mode == "torque"
            else _Q_LOW,
        ]).astype(np.float32)
        obs_high = np.concatenate([
            _Q_HIGH, np.full(9, _MAX_VEL),
            [0.3, 0.3, 0.3], np.ones(4),
            [0.3, 0.3, 0.3], np.ones(4),
            np.full(9, _MAX_TORQUE) if self.command_mode == "torque"
            else _Q_HIGH,
        ]).astype(np.float32)
        self.obs_low = jnp.asarray(obs_low)
        self.obs_high = jnp.asarray(obs_high)
        self.q_low, self.q_high = jnp.asarray(_Q_LOW), jnp.asarray(_Q_HIGH)
        self.kp = jnp.asarray([10.0] * 9)
        self.kd = jnp.asarray([0.1, 0.3, 0.001] * 3)

        bp = [(f"object/{cube.body_names[0]}", f"robot/{bn}")
              for bn in robot.body_names
              if "lower" in bn or "middle" in bn or "tip" in bn]
        self.pair_contacts = build_pair_contacts(scene, body_pairs=bp)
        # arena boundary (reference `high_table_boundary.urdf`, actor
        # created at trifinger.py:561-563): cube corner/edge/face points
        # vs an SDF of the real boundary ring mesh, carried by the
        # world-fixed robot base — confines stray cubes to the arena.
        # Skipped silently when neither the mesh nor a vendored grid
        # cache is reachable (same fallback story as factory SDF).
        if env.get("arena_boundary", True):
            self._add_boundary_sdf(scene)

    def _add_boundary_sdf(self, scene):
        import warnings
        from ..io.sdf import mesh_sdf_cropped
        from ..physics.collide import add_sdf_pairs
        from ..utils.assets import full_mesh_path
        try:
            mesh = full_mesh_path("trifinger/robot_properties_fingers/"
                                  "meshes/high_table_boundary.stl")
            spacing = 5.0e-3
            mesh_sdf_cropped(mesh, 1.0, spacing)     # cook-or-cache now
            h = CUBE_SIZE / 2
            lin = (-h, 0.0, h)
            pts = np.array([(x, y, z) for x in lin for y in lin
                            for z in lin if (x, y, z) != (0, 0, 0)],
                           np.float32)               # 26 surface points
            gb_arr = np.asarray(scene.geom_body)
            cube_geom = int(np.where(gb_arr == self.cube_body)[0][0])
            # carried by the world-fixed table actor, whose geom is the
            # wall's friction/restitution source (the reference boundary
            # is likewise a separate static actor, trifinger.py:561-563)
            self.pair_contacts = add_sdf_pairs(
                self.pair_contacts, scene, [{
                    "body_a": self.cube_body, "geom_a": cube_geom,
                    "pts_a": pts, "mesh_a": None,
                    "body_b": self.table_body, "geom_b": self.table_geom,
                    "mesh_b": mesh, "spacing": spacing,
                    # the table body sits at z=-0.01; the boundary mesh
                    # is authored about z=0
                    "grid_pos": (0.0, 0.0, 0.01),
                    # 2 CCD taps, not the factory default 16: the cube
                    # moves ≤ ~5 mm per substep (1 m/s clamp x 5 ms) —
                    # one grid spacing — so thread-crest-style tunneling
                    # cannot happen at the 30 mm wall; 16 taps were pure
                    # gather traffic (TPU SDF gathers dominate this
                    # scene's step)
                    "sweep": 2,
                }])
        except (RuntimeError, FileNotFoundError) as e:
            warnings.warn(f"arena boundary SDF unavailable ({e}); "
                          "stray cubes are unconfined")

    # ------------------------------------------------------------------- aux
    def _initial_aux(self):
        n = self.num_envs
        return {
            "actions": jnp.zeros((n, 9)),
            "goal_pose": jnp.tile(
                jnp.array([0, 0, CUBE_SIZE / 2, 1.0, 0, 0, 0]), (n, 1)),
            "last_tip_pos": jnp.zeros((n, 3, 3)),
            "last_cube_pos": jnp.zeros((n, 3)),
            "successes": jnp.zeros(n),
        }

    def _sample_goal(self, key):
        """Goal pose by difficulty (trifinger.py:928-990)."""
        ks = jax.random.split(key, 4)
        r = ARENA_RADIUS * jnp.sqrt(jax.random.uniform(ks[0]))
        ang = jax.random.uniform(ks[1], minval=0.0, maxval=2 * jnp.pi)
        xy = r * jnp.array([jnp.cos(ang), jnp.sin(ang)])
        if self.difficulty == 1:
            pos = jnp.array([xy[0], xy[1], CUBE_SIZE / 2])
            quat = jnp.array([1.0, 0, 0, 0])
        elif self.difficulty == 2:
            z = jax.random.uniform(ks[2], minval=CUBE_SIZE / 2, maxval=0.25)
            pos = jnp.array([0.0, 0.0, z])
            quat = jnp.array([1.0, 0, 0, 0])
        elif self.difficulty == 3:
            z = jax.random.uniform(ks[2], minval=CUBE_SIZE / 2, maxval=0.25)
            pos = jnp.array([xy[0], xy[1], z])
            quat = jnp.array([1.0, 0, 0, 0])
        else:  # 4: full pose
            z = jax.random.uniform(ks[2], minval=CUBE_SIZE / 2, maxval=0.25)
            pos = jnp.array([xy[0], xy[1], z])
            u = jax.random.normal(ks[3], (4,))
            quat = u / jnp.linalg.norm(u)
        return jnp.concatenate([pos, quat])

    def _sample_reset(self, state, keys):
        n = self.num_envs

        def one(key):
            ks = jax.random.split(key, 5)
            dq = 0.4 * jax.random.normal(ks[0], (9,))
            qpos = jnp.clip(jnp.asarray(_Q_DEFAULT) + dq,
                            self.q_low, self.q_high)
            dv = 0.2 * jax.random.normal(ks[1], (9,))
            # cube random on arena with yaw
            r = ARENA_RADIUS * jnp.sqrt(jax.random.uniform(ks[2]))
            ang = jax.random.uniform(ks[3], minval=0.0, maxval=2 * jnp.pi)
            yaw = jax.random.uniform(ks[4], minval=0.0, maxval=2 * jnp.pi)
            q = self.init_q.at[:9].set(qpos)
            q = q.at[self.cube_q:self.cube_q + 3].set(jnp.array(
                [r * jnp.cos(ang), r * jnp.sin(ang), CUBE_SIZE / 2]))
            q = q.at[self.cube_q + 3:self.cube_q + 7].set(
                mx.quat_from_axis_angle(jnp.array([0.0, 0, 1.0]), yaw))
            qd = jnp.zeros(self.model.nv).at[:9].set(dv)
            goal = self._sample_goal(jax.random.fold_in(key, 9))
            return q, qd, goal

        q, qd, goal = jax.vmap(one)(keys)
        return q, qd, {
            "actions": jnp.zeros((n, 9)),
            "goal_pose": goal,
            "last_tip_pos": jnp.zeros((n, 3, 3)),
            "last_cube_pos": q[:, self.cube_q:self.cube_q + 3],
            "successes": jnp.zeros(n),
        }

    # --------------------------------------------------------------- physics
    def _physics(self, state, actions):
        contacts = build_ground_contacts(self.model)
        if self.normalize_action:
            if self.command_mode == "torque":
                cmd = actions * _MAX_TORQUE
            else:
                cmd = mx.scale_transform(actions, self.q_low, self.q_high)
        else:
            cmd = actions

        nv = self.model.nv

        def one(art, c, params):
            def tau_fn(q, qd):
                if self.command_mode == "torque":
                    tau9 = c
                else:
                    tau9 = self.kp * (c - q[:9]) - self.kd * qd[:9]
                tau9 = jnp.clip(tau9, -_MAX_TORQUE, _MAX_TORQUE)
                if self.apply_safety_damping:
                    tau9 = tau9 - jnp.asarray(_SAFETY_DAMPING) * qd[:9]
                    tau9 = jnp.clip(tau9, -_MAX_TORQUE, _MAX_TORQUE)
                return jnp.zeros(nv, q.dtype).at[:9].set(tau9)

            return physics_step(self.model, self.sim, params, art,
                                contacts=contacts,
                                n_substeps=self.sim.substeps,
                                pair_contacts=self.pair_contacts,
                                tau_fn=tau_fn)

        in_axes = (0, 0, 0 if self._params_batched() else None)
        return jax.vmap(one, in_axes=in_axes)(state.art, cmd,
                                                   state.params)

    # ------------------------------------------------------------------- obs
    def _observe(self, state, info):
        q, qd = state.art.q, state.art.qd
        cube_pose = q[:, self.cube_q:self.cube_q + 7]
        obs = jnp.concatenate([
            q[:, :9], qd[:, :9], cube_pose, state.aux["goal_pose"],
            state.aux["actions"],
        ], axis=-1)
        if self.normalize_obs:
            obs = mx.unscale_transform(obs, self.obs_low, self.obs_high)
        return obs, {}

    def _states(self, state, info):
        """113-dim privileged states (trifinger.py:334-352 state_spec +
        compute_trifinger_observations_states `:1388-1421`):
        [raw obs(41), object_u(6), fingertip_state(3x13=39),
        joint_torques(9) (the spec's misleadingly-named "robot_a" slot is
        filled with dof torques, `:770-772`), fingertip_wrench(3x6=18)].
        Like the reference, states are NOT pre-normalized (only obs are;
        `:776-783`) — the central-value net's running-stats normalizer
        handles scaling."""
        if not self.asymmetric_obs:
            return None
        q, qd = state.art.q, state.art.qd
        raw_obs = jnp.concatenate([
            q[:, :9], qd[:, :9], q[:, self.cube_q:self.cube_q + 7],
            state.aux["goal_pose"], state.aux["actions"],
        ], axis=-1)
        object_u = qd[:, self.cube_v:self.cube_v + 6]
        kin = info.kin
        tb = self.tip_bodies
        omega = kin.body_vel[:, tb, :3]
        v_origin = kin.body_vel[:, tb, 3:] + jnp.cross(
            omega, kin.body_pos[:, tb] - kin.ref[:, None, :])
        ft_state = jnp.concatenate([
            kin.body_pos[:, tb], kin.body_quat[:, tb], v_origin, omega,
        ], axis=-1).reshape(self.num_envs, -1)          # (N, 39)
        joint_torques = info.tau[:, :9]
        wrench = jnp.concatenate([
            info.body_contact_force[:, tb], info.body_contact_torque[:, tb],
        ], axis=-1).reshape(self.num_envs, -1)          # (N, 18)
        return jnp.concatenate([raw_obs, object_u, ft_state,
                                joint_torques, wrench], axis=-1)

    # ---------------------------------------------------------------- reward
    def _reward_done(self, state, obs, actions, info):
        q = state.art.q
        aux = state.aux
        kin = info.kin
        tips = kin.body_pos[:, self.tip_bodies]             # (N,3,3)
        cube_pose = q[:, self.cube_q:self.cube_q + 7]
        cube_pos = cube_pose[:, 0:3]
        goal = aux["goal_pose"]

        tip_vel = (tips - aux["last_tip_pos"]) / self.dt
        move_penalty = self.w_move * jnp.sum(
            tip_vel.reshape(self.num_envs, -1) ** 2, -1)

        curr_n = jnp.linalg.norm(tips - cube_pos[:, None, :], axis=-1)
        prev_n = jnp.linalg.norm(
            aux["last_tip_pos"] - aux["last_cube_pos"][:, None, :], axis=-1)
        reach = self.w_reach * jnp.sum(curr_n - prev_n, -1)

        kp_obj = gen_keypoints(cube_pose)
        kp_goal = gen_keypoints(goal)
        dist = jnp.linalg.norm(kp_obj - kp_goal, axis=-1)
        pose_reward = self.w_keypoints * self.dt * jnp.mean(
            lgsk_kernel(dist, scale=30.0, eps=2.0), axis=-1)

        total = move_penalty + reach + pose_reward

        # success metric (termination_conditions; episodes end on timeout)
        pos_err = jnp.linalg.norm(cube_pos - goal[:, 0:3], axis=-1)
        rot_err = mx.quat_diff_rad(cube_pose[:, 3:7], goal[:, 3:7])
        success = pos_err < self.pos_tol
        if self.difficulty == 4:
            success = success & (rot_err < self.rot_tol)
        done = state.progress >= self.max_episode_length - 1

        aux_up = {"last_tip_pos": tips, "last_cube_pos": cube_pos,
                  "successes": jnp.maximum(aux["successes"],
                                           success.astype(jnp.float32))}
        return total, done, {
            "success_rate": jnp.mean(success.astype(jnp.float32))}, aux_up
