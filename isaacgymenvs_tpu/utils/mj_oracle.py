"""MuJoCo-oracle physics backend for validation and calibration.

MuJoCo is the semantic authority for the MJCF assets this framework
ingests (nv_ant.xml etc. are MuJoCo models). This module swaps OUR task
envs' `_physics` for a batched MuJoCo step via `jax.pure_callback`,
keeping every other part of the pipeline (obs/reward kernels, auto-reset
machinery, PPO) bit-identical. Two uses:

  1. physics validation — statistical comparison of our solver against
     MuJoCo under matched inputs (tests/test_mj_oracle.py);
  2. training-ceiling calibration — what return does OUR trainer reach
     when the dynamics are ground truth? (CPU-only; MuJoCo steps on
     host threads.)

The reference cannot do this at all: its physics is a closed PhysX
binary with no alternative backend.
"""

from __future__ import annotations

import dataclasses

import numpy as np

try:
    import mujoco
    HAVE_MUJOCO = True
except ImportError:  # pragma: no cover
    HAVE_MUJOCO = False


class MjBatch:
    """N independent MjData stepped with a shared model (host-side)."""

    def __init__(self, xml_path: str, num_envs: int, dt: float,
                 substeps: int, body_names, threads: int = 16):
        from concurrent.futures import ThreadPoolExecutor
        try:
            m = mujoco.MjModel.from_xml_path(xml_path)
        except ValueError:
            # some reference MJCFs reference undefined visual materials
            # (nv_humanoid's floor 'grid' — IsaacGym's importer ignored
            # them); strip material attributes and retry
            import re
            xml = open(xml_path).read()
            xml = re.sub(r'\smaterial="[^"]*"', "", xml)
            m = mujoco.MjModel.from_xml_string(xml)
        m.opt.timestep = dt / substeps
        self.model = m
        self.substeps = substeps
        self.data = [mujoco.MjData(m) for _ in range(num_envs)]
        self.n = num_envs
        self.pool = ThreadPoolExecutor(max_workers=threads)
        self.threads = threads
        # our-model body index -> mujoco body id (name match)
        self.body_map = np.array(
            [mujoco.mj_name2id(m, mujoco.mjtObj.mjOBJ_BODY, bn)
             for bn in body_names])
        assert (self.body_map >= 0).all(), "body name mismatch vs mujoco"

    def step(self, qpos, qvel_world, ctrl):
        """qpos (N,nq) [pos3, quat wxyz, dofs], qvel_world (N,nv) with the
        free-joint angular velocity in WORLD axes (our convention; MuJoCo
        stores it body-local). Returns (qpos', qvel_world', cfrc (N,nb,6)
        [force,torque] at our body ordering)."""
        n = self.n
        nq, nv = self.model.nq, self.model.nv
        out_q = np.empty((n, nq), np.float32)
        out_v = np.empty((n, nv), np.float32)
        out_f = np.empty((n, len(self.body_map), 6), np.float32)

        def one(i):
            d = self.data[i]
            d.qpos[:] = qpos[i]
            d.qvel[:] = qvel_world[i]
            # world -> body-local angular velocity for the free joint
            R = _quat_mat(qpos[i, 3:7])
            d.qvel[3:6] = R.T @ qvel_world[i, 3:6]
            d.ctrl[:] = ctrl[i]
            mujoco.mj_step(self.model, d, nstep=self.substeps)
            out_q[i] = d.qpos
            out_v[i] = d.qvel
            out_v[i, 3:6] = _quat_mat(d.qpos[3:7]) @ d.qvel[3:6]
            # cfrc_ext: (nbody,6) [rotational, translational]
            cf = d.cfrc_ext[self.body_map]
            out_f[i, :, 0:3] = cf[:, 3:6]   # force
            out_f[i, :, 3:6] = cf[:, 0:3]   # torque

        def shard(w):
            for i in range(w, n, self.threads):
                one(i)

        # mujoco releases the GIL inside mj_step — thread across envs
        list(self.pool.map(shard, range(self.threads)))
        return out_q, out_v, out_f


def _quat_mat(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def mujoco_backend(env, xml_path: str):
    """Swap any single-MJCF task env's `_physics` for MuJoCo stepping.
    The env keeps its own obs/reward/reset machinery; dynamics become
    ground truth. Returns the same env instance, modified."""
    import jax
    import jax.numpy as jnp
    from ..physics.step import StepInfo

    assert HAVE_MUJOCO, "mujoco not installed"
    num_envs = env.num_envs
    batch = MjBatch(xml_path, num_envs, env.sim.dt,
                    env.sim.substeps * env.control_freq_inv,
                    env.model.body_names)
    nb, nv, nq = env.model.nbody, env.model.nv, env.model.nq

    def host_step(q, qd, a):
        q2, v2, f = batch.step(np.asarray(q, np.float64),
                               np.asarray(qd, np.float64),
                               np.asarray(np.clip(a, -1, 1), np.float64))
        return q2, v2, f

    def mj_physics(state, actions):
        from ..core import types as T
        q2, v2, f = jax.pure_callback(
            host_step,
            (jax.ShapeDtypeStruct((num_envs, nq), jnp.float32),
             jax.ShapeDtypeStruct((num_envs, nv), jnp.float32),
             jax.ShapeDtypeStruct((num_envs, nb, 6), jnp.float32)),
            state.art.q, state.art.qd, actions)
        z3 = jnp.zeros((num_envs, nb, 3))
        kin = env._batched_fk(dataclasses.replace(
            state, art=T.ArtState(q=q2, qd=v2)))
        info = StepInfo(kin=kin, body_contact_force=f[..., 0:3],
                        body_contact_torque=f[..., 3:6],
                        qdd=jnp.zeros((num_envs, nv)),
                        tau=jnp.zeros((num_envs, nv)))
        return T.ArtState(q=q2, qd=v2), info

    env._physics = mj_physics
    return env


def mujoco_ant(num_envs: int = 256, cfg=None):
    """Our Ant task with MuJoCo dynamics (CPU)."""
    from ..envs.ant import Ant, _ASSET
    return mujoco_backend(Ant(cfg=cfg, num_envs=num_envs), _ASSET)


def mujoco_humanoid(num_envs: int = 256, cfg=None):
    """Our Humanoid task with MuJoCo dynamics (CPU)."""
    from ..envs.humanoid import Humanoid, _ASSET
    return mujoco_backend(Humanoid(cfg=cfg, num_envs=num_envs), _ASSET)
