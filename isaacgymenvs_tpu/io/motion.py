"""Motion library: mocap clips → batched on-device state sampling.

Replaces `tasks/amp/utils_amp/motion_lib.py` (323 LoC) + the poselib
SkeletonMotion loader (`tasks/amp/poselib/poselib/skeleton/skeleton3d.py`):
  * loads poselib `.npy` SkeletonMotion dicts (rotation (T,nb,4) local
    quats xyzw, root_translation, global velocities, skeleton_tree, fps)
    and `.yaml` weighted motion lists (`motion_lib.py:208-232`);
  * converts local rotations → the simulator's dof coordinates. DEVIATION
    from the reference recorded here: the reference encodes 3-dof joints
    as exp-maps onto 3 stacked hinge dofs (`motion_lib.py:248-294`); our
    dynamics composes the 3 hinges as intrinsic-xyz rotations, so we use
    intrinsic-xyz euler angles — demo and agent AMP features use the SAME
    encoding, which is what discriminator parity requires;
  * precomputes per-frame (root_pos, root_rot wxyz, dof_pos, root_vel,
    root_ang_vel, dof_vel, key_body_pos) on the host; runtime sampling is
    a pure jax gather + frame blend (slerp root rot, lerp the rest —
    `motion_lib.py:83-154`).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _unwrap(d):
    return d["arr"] if isinstance(d, dict) and "arr" in d else np.asarray(d)


def _qmul(a, b):
    aw, ax, ay, az = np.moveaxis(a, -1, 0)
    bw, bx, by, bz = np.moveaxis(b, -1, 0)
    return np.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw], axis=-1)


def _qrot(q, v):
    w = q[..., 0:1]
    qv = q[..., 1:4]
    t = 2.0 * np.cross(qv, v)
    return v + w * t + np.cross(qv, t)


def _euler_xyz_intrinsic(q):
    """wxyz quat → intrinsic-xyz euler angles (matches 3-hinge-xyz FK)."""
    w, x, y, z = np.moveaxis(q, -1, 0)
    # intrinsic xyz == extrinsic zyx; standard aerospace formulas swapped
    r = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    p = np.arcsin(np.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return np.stack([r, p, yaw], axis=-1)


class MotionLib:
    """Host-side load + device-side sampling of reference motions."""

    def __init__(self, motion_file: str, model, key_body_names):
        """model: the amp humanoid ArticulationModel (for joint layout)."""
        self.model = model
        if motion_file.endswith(".yaml"):
            import yaml
            with open(motion_file) as f:
                spec = yaml.safe_load(f)
            base = os.path.dirname(motion_file)
            files = [os.path.join(base, m["file"]) for m in spec["motions"]]
            weights = np.array([m.get("weight", 1.0) for m in spec["motions"]])
        else:
            files = [motion_file]
            weights = np.ones(1)

        frames = dict(root_pos=[], root_rot=[], dof_pos=[], root_vel=[],
                      root_ang_vel=[], dof_vel=[], key_pos=[])
        lengths, fpss = [], []
        for f in files:
            data = np.load(f, allow_pickle=True).item()
            out = self._process(data, key_body_names)
            for k in frames:
                frames[k].append(out[k])
            lengths.append(out["root_pos"].shape[0])
            fpss.append(out["fps"])

        self.num_motions = len(files)
        self.weights = weights / weights.sum()
        self.fps = np.asarray(fpss, np.float32)
        self.dt_frame = 1.0 / self.fps
        self.lengths = np.asarray(lengths, np.int32)
        self.durations = (self.lengths - 1) * self.dt_frame
        offsets = np.concatenate([[0], np.cumsum(self.lengths)])
        self.offsets = offsets[:-1].astype(np.int32)

        self.root_pos = jnp.asarray(np.concatenate(frames["root_pos"]))
        self.root_rot = jnp.asarray(np.concatenate(frames["root_rot"]))
        self.dof_pos = jnp.asarray(np.concatenate(frames["dof_pos"]))
        self.root_vel = jnp.asarray(np.concatenate(frames["root_vel"]))
        self.root_ang_vel = jnp.asarray(
            np.concatenate(frames["root_ang_vel"]))
        self.dof_vel = jnp.asarray(np.concatenate(frames["dof_vel"]))
        self.key_pos = jnp.asarray(np.concatenate(frames["key_pos"]))
        self._weights_j = jnp.asarray(self.weights)
        self._durations_j = jnp.asarray(self.durations)
        self._offsets_j = jnp.asarray(self.offsets)
        self._fps_j = jnp.asarray(self.fps)
        self._lengths_j = jnp.asarray(self.lengths)

    # ------------------------------------------------------------ host load
    def _process(self, data, key_body_names):
        rot_xyzw = _unwrap(data["rotation"])          # (T,nb,4) local, xyzw
        rot = np.concatenate([rot_xyzw[..., 3:4], rot_xyzw[..., 0:3]], -1)
        root_trans = _unwrap(data["root_translation"])  # (T,3)
        gvel = _unwrap(data["global_velocity"])       # (T,nb,3)
        gavel = _unwrap(data["global_angular_velocity"])
        tree = data["skeleton_tree"]
        node_names = list(tree["node_names"])
        parents = _unwrap(tree["parent_indices"]).astype(int)
        local_t = _unwrap(tree["local_translation"])  # (nb,3)
        fps = float(np.asarray(data["fps"]))
        T_, nb = rot.shape[0], rot.shape[1]

        # FK: global rotations + translations
        g_rot = np.zeros_like(rot)
        g_pos = np.zeros((T_, nb, 3), np.float32)
        for i in range(nb):
            p = parents[i]
            if p < 0:
                g_rot[:, i] = rot[:, i]
                g_pos[:, i] = root_trans
            else:
                g_rot[:, i] = _qmul(g_rot[:, p], rot[:, i])
                g_pos[:, i] = g_pos[:, p] + _qrot(g_rot[:, p],
                                                  local_t[None, i])

        # dof coordinates from local rotations, per the MODEL's joints
        m = self.model
        body_of = {n: i for i, n in enumerate(node_names)}
        dof_pos = np.zeros((T_, m.nv - 6), np.float32)
        from ..core.types import HINGE
        # group model joints by body, in order
        jnts_of = {}
        for ji in range(m.njnt):
            jnts_of.setdefault(int(m.jnt_body[ji]), []).append(ji)
        for bi, bname in enumerate(m.body_names):
            if bname not in body_of or bi == 0:
                continue
            node = body_of[bname]
            jis = jnts_of.get(bi, [])
            if not jis:
                continue
            if len(jis) == 3:
                eul = _euler_xyz_intrinsic(rot[:, node])
                for k, ji in enumerate(jis):
                    dof_pos[:, int(m.jnt_vadr[ji]) - 6] = eul[:, k]
            elif len(jis) == 1:
                ji = jis[0]
                axis = np.asarray(m.jnt_axis[ji])
                # angle about the hinge axis: 2·atan2(q_axis, q_w)
                qv = rot[:, node, 1:4] @ axis
                ang = 2.0 * np.arctan2(qv, rot[:, node, 0])
                ang = (ang + np.pi) % (2 * np.pi) - np.pi
                dof_pos[:, int(m.jnt_vadr[ji]) - 6] = ang

        # dof velocities by CENTERED finite difference. The reference uses
        # forward differences (motion_lib.py:248-294) which alternate with
        # exact zeros on these clips (30 fps data stored at 60 fps with
        # duplicated frames) — a demo-feature artifact the discriminator
        # would exploit; centered differences recover smooth velocities.
        dof_vel = np.zeros_like(dof_pos)
        if T_ > 2:
            dd = dof_pos[2:] - dof_pos[:-2]
            dd = (dd + np.pi) % (2 * np.pi) - np.pi
            dof_vel[1:-1] = dd * (0.5 * fps)
            dof_vel[0] = dof_vel[1]
            dof_vel[-1] = dof_vel[-2]

        key_ids = [node_names.index(k) for k in key_body_names]
        return dict(
            root_pos=root_trans.astype(np.float32),
            root_rot=g_rot[:, 0].astype(np.float32),
            dof_pos=dof_pos,
            root_vel=gvel[:, 0].astype(np.float32),
            root_ang_vel=gavel[:, 0].astype(np.float32),
            dof_vel=dof_vel,
            key_pos=g_pos[:, key_ids].astype(np.float32),
            fps=fps,
        )

    # --------------------------------------------------------- device sample
    def sample_motions(self, key, n):
        return jax.random.choice(key, self.num_motions, (n,),
                                 p=self._weights_j)

    def sample_time(self, key, motion_ids):
        u = jax.random.uniform(key, motion_ids.shape)
        return u * self._durations_j[motion_ids]

    def get_motion_state(self, motion_ids, motion_times):
        """Batched frame-blend state lookup (motion_lib.py:83-154)."""
        from ..core.maths import slerp
        dur = self._durations_j[motion_ids]
        t = jnp.clip(motion_times, 0.0, dur)
        phase = t * self._fps_j[motion_ids]
        f0 = jnp.floor(phase).astype(jnp.int32)
        f0 = jnp.minimum(f0, self._lengths_j[motion_ids] - 2)
        f0 = jnp.maximum(f0, 0)
        blend = jnp.clip(phase - f0, 0.0, 1.0)[..., None]
        i0 = self._offsets_j[motion_ids] + f0
        i1 = i0 + 1

        root_pos = (1 - blend) * self.root_pos[i0] + blend * self.root_pos[i1]
        root_rot = slerp(self.root_rot[i0], self.root_rot[i1], blend)
        dof_pos = (1 - blend) * self.dof_pos[i0] + blend * self.dof_pos[i1]
        root_vel = (1 - blend) * self.root_vel[i0] + blend * self.root_vel[i1]
        root_ang_vel = (1 - blend) * self.root_ang_vel[i0] \
            + blend * self.root_ang_vel[i1]
        dof_vel = (1 - blend) * self.dof_vel[i0] + blend * self.dof_vel[i1]
        kb = blend[..., None]
        key_pos = (1 - kb) * self.key_pos[i0] + kb * self.key_pos[i1]
        return (root_pos, root_rot, dof_pos, root_vel, root_ang_vel,
                dof_vel, key_pos)
