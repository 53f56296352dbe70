"""poselib: skeleton state/motion representation + offline retargeting.

NumPy re-implementation of the reference's
`tasks/amp/poselib/poselib/skeleton/skeleton3d.py` (~1.1k LoC) and the
parts of `core/rotation3d.py` it needs — the offline tooling that
produces the `.npy` SkeletonMotion files consumed by
`isaacgymenvs_tpu.io.motion.MotionLib`:

  * `SkeletonTree` — node names / parent indices / local translations;
    `from_mjcf` (skeleton3d.py:176-221), dict round-trip in the
    reference's `{arr, context}` serialization;
  * `SkeletonState` — local<->global rotation propagation
    (skeleton3d.py:360-813);
  * `SkeletonMotion` — adds fps + finite-difference global linear and
    angular velocities (skeleton3d.py:1026+), `.npy` file round-trip;
  * `retarget_to` / `retarget_to_by_tpose` (skeleton3d.py:814-1025) —
    global-rotation-delta transfer between skeletons via a joint
    mapping, with coordinate rotation and root-translation scaling.

All quaternions here are **xyzw** (poselib convention, as stored in the
`.npy` assets) — unlike the simulator core (wxyz).  This module is
host-side/offline; nothing in it runs under jit.  The FBX import
backend requires the proprietary FBX SDK and is stubbed
(`import_fbx`), matching its optional status in the reference
(`skeleton/backend/fbx/fbx_backend.py`).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import numpy as np


# -------------------------------------------------------- xyzw quaternions
def quat_mul(a, b):
    ax, ay, az, aw = [a[..., i] for i in range(4)]
    bx, by, bz, bw = [b[..., i] for i in range(4)]
    return np.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by + ay * bw + az * bx - ax * bz,
        aw * bz + az * bw + ax * by - ay * bx,
        aw * bw - ax * bx - ay * by - az * bz], axis=-1)


def quat_inverse(q):
    return q * np.array([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_normalize(q):
    return q / np.maximum(np.linalg.norm(q, axis=-1, keepdims=True), 1e-9)


def quat_rotate(q, v):
    u = q[..., :3]
    w = q[..., 3:]
    return (v * (w ** 2 - np.sum(u * u, axis=-1, keepdims=True))
            + 2.0 * u * np.sum(u * v, axis=-1, keepdims=True)
            + 2.0 * w * np.cross(u, v))


def quat_identity(shape=()):
    q = np.zeros(tuple(shape) + (4,), np.float32)
    q[..., 3] = 1.0
    return q


def quat_from_angle_axis(angle, axis):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.maximum(np.linalg.norm(axis), 1e-12)
    s, c = np.sin(angle / 2), np.cos(angle / 2)
    return np.concatenate([axis * s, [c]]).astype(np.float32)


def quat_to_angle_axis(q):
    """(angle, axis) with angle in [0, pi]."""
    q = quat_normalize(q)
    s = np.linalg.norm(q[..., :3], axis=-1)
    angle = 2.0 * np.arctan2(s, np.abs(q[..., 3]))
    sign = np.where(q[..., 3] < 0, -1.0, 1.0)
    axis = q[..., :3] * sign[..., None] \
        / np.maximum(s, 1e-9)[..., None]
    return angle, axis


# ------------------------------------------------------------ serialization
def _wrap(arr):
    return {"arr": np.asarray(arr),
            "context": {"dtype": str(np.asarray(arr).dtype)}}


def _unwrap(d):
    return np.asarray(d["arr"]) if isinstance(d, dict) else np.asarray(d)


# ----------------------------------------------------------------- skeleton
@dataclasses.dataclass
class SkeletonTree:
    """Kinematic tree: names, parents (-1 root), local offsets."""

    node_names: List[str]
    parent_indices: np.ndarray      # (nb,) int
    local_translation: np.ndarray   # (nb,3)

    @property
    def num_joints(self):
        return len(self.node_names)

    def index(self, name: str) -> int:
        return self.node_names.index(name)

    @classmethod
    def from_mjcf(cls, path_or_xml: str) -> "SkeletonTree":
        """Skeleton from an MJCF body tree (skeleton3d.py:176-221):
        node = body, offset = body pos."""
        from .mjcf import load_mjcf
        m = load_mjcf(path_or_xml)
        return cls(node_names=list(m.body_names),
                   parent_indices=np.asarray(m.body_parent, np.int64),
                   local_translation=np.asarray(m.body_pos, np.float32))

    def to_dict(self):
        return {"node_names": list(self.node_names),
                "parent_indices": _wrap(self.parent_indices.astype(
                    np.int64)),
                "local_translation": _wrap(self.local_translation.astype(
                    np.float32))}

    @classmethod
    def from_dict(cls, d):
        return cls(node_names=list(d["node_names"]),
                   parent_indices=_unwrap(d["parent_indices"]).astype(int),
                   local_translation=_unwrap(d["local_translation"]))


@dataclasses.dataclass
class SkeletonState:
    """Poses of a skeleton: local rotations (xyzw) + root translation.

    rotation: (..., nb, 4); root_translation: (..., 3).  Leading axes
    (e.g. time) broadcast through all properties.
    """

    skeleton_tree: SkeletonTree
    rotation: np.ndarray
    root_translation: np.ndarray
    is_local: bool = True

    @classmethod
    def from_rotation_and_root_translation(cls, tree, r, t, is_local=True):
        return cls(tree, np.asarray(r, np.float32),
                   np.asarray(t, np.float32), is_local)

    @property
    def local_rotation(self):
        if self.is_local:
            return self.rotation
        # global -> local: l_i = g_parent^-1 * g_i
        g = self.rotation
        parents = self.skeleton_tree.parent_indices
        loc = np.array(g)
        for i, p in enumerate(parents):
            if p >= 0:
                loc[..., i, :] = quat_mul(quat_inverse(g[..., p, :]),
                                          g[..., i, :])
        return loc

    @property
    def global_rotation(self):
        if not self.is_local:
            return self.rotation
        l = self.rotation
        parents = self.skeleton_tree.parent_indices
        g = np.array(l)
        for i, p in enumerate(parents):   # parents precede children
            if p >= 0:
                g[..., i, :] = quat_mul(g[..., p, :], l[..., i, :])
        return g

    @property
    def global_translation(self):
        g = self.global_rotation
        parents = self.skeleton_tree.parent_indices
        off = self.skeleton_tree.local_translation
        nb = self.skeleton_tree.num_joints
        t = np.zeros(self.rotation.shape[:-2] + (nb, 3), np.float32)
        for i, p in enumerate(parents):
            if p < 0:
                t[..., i, :] = self.root_translation
            else:
                t[..., i, :] = t[..., p, :] + quat_rotate(
                    g[..., p, :], np.broadcast_to(off[i],
                                                  t[..., p, :].shape))
        return t

    def to_dict(self):
        return {"rotation": _wrap(self.local_rotation.astype(np.float32)),
                "root_translation": _wrap(
                    self.root_translation.astype(np.float32)),
                "skeleton_tree": self.skeleton_tree.to_dict(),
                "is_local": True,
                "__name__": "SkeletonState"}

    @classmethod
    def from_dict(cls, d):
        return cls(SkeletonTree.from_dict(d["skeleton_tree"]),
                   _unwrap(d["rotation"]),
                   _unwrap(d["root_translation"]),
                   bool(d.get("is_local", True)))

    # ------------------------------------------------------------ retarget
    def retarget_to_by_tpose(self, joint_mapping: Dict[str, str],
                             source_tpose: "SkeletonState",
                             target_tpose: "SkeletonState",
                             rotation_to_target_skeleton=None,
                             scale_to_target_skeleton: float = 1.0):
        """Transfer this state onto the target skeleton
        (skeleton3d.py:814-1025).

        For each mapped joint: the source's global-rotation DELTA from
        its tpose is applied to the target tpose's global rotation.  The
        root translation is rotated into the target coordinate frame,
        measured relative to the source tpose root and scaled.
        """
        rot = (quat_identity() if rotation_to_target_skeleton is None
               else np.asarray(rotation_to_target_skeleton, np.float32))
        src_tree, tgt_tree = self.skeleton_tree, target_tpose.skeleton_tree
        g_src = self.global_rotation                  # (..., nbs, 4)
        g_src_tp = source_tpose.global_rotation       # (nbs, 4)
        g_tgt_tp = target_tpose.global_rotation       # (nbt, 4)

        lead = self.rotation.shape[:-2]
        nbt = tgt_tree.num_joints
        g_out = np.broadcast_to(quat_identity((nbt,)),
                                lead + (nbt, 4)).copy()
        for src_name, tgt_name in joint_mapping.items():
            si = src_tree.index(src_name)
            ti = tgt_tree.index(tgt_name)
            delta = quat_mul(
                rot, quat_mul(g_src[..., si, :],
                              quat_inverse(g_src_tp[si])))
            g_out[..., ti, :] = quat_normalize(
                quat_mul(delta, np.broadcast_to(g_tgt_tp[ti],
                                                delta.shape)))
        root_t = quat_rotate(
            rot, self.root_translation
            - source_tpose.root_translation) * scale_to_target_skeleton \
            + target_tpose.root_translation
        return SkeletonState(tgt_tree, g_out, root_t.astype(np.float32),
                             is_local=False)


@dataclasses.dataclass
class SkeletonMotion(SkeletonState):
    """SkeletonState over time + fps + finite-difference velocities."""

    fps: float = 30.0
    global_velocity: Optional[np.ndarray] = None
    global_angular_velocity: Optional[np.ndarray] = None

    @classmethod
    def from_skeleton_state(cls, state: SkeletonState, fps: float):
        gt = state.global_translation                 # (T, nb, 3)
        g = state.global_rotation                     # (T, nb, 4)
        v = np.gradient(gt, axis=0) * fps
        # angular velocity from frame-to-frame quaternion difference
        dq = quat_mul(g[1:], quat_inverse(g[:-1]))
        angle, axis = quat_to_angle_axis(dq)
        w = axis * angle[..., None] * fps
        w = np.concatenate([w[:1], w], axis=0)
        return cls(state.skeleton_tree, state.local_rotation,
                   state.root_translation, True, fps=float(fps),
                   global_velocity=v.astype(np.float32),
                   global_angular_velocity=w.astype(np.float32))

    def retarget_to_by_tpose(self, joint_mapping, source_tpose,
                             target_tpose, rotation_to_target_skeleton=None,
                             scale_to_target_skeleton=1.0):
        st = SkeletonState.retarget_to_by_tpose(
            self, joint_mapping, source_tpose, target_tpose,
            rotation_to_target_skeleton, scale_to_target_skeleton)
        return SkeletonMotion.from_skeleton_state(st, self.fps)

    def to_dict(self):
        d = super().to_dict()
        if self.global_velocity is None:
            m = SkeletonMotion.from_skeleton_state(self, self.fps)
            gv, gw = m.global_velocity, m.global_angular_velocity
        else:
            gv, gw = self.global_velocity, self.global_angular_velocity
        d.update({"global_velocity": _wrap(gv),
                  "global_angular_velocity": _wrap(gw),
                  "fps": np.asarray(self.fps),
                  "__name__": "SkeletonMotion"})
        return d

    def to_file(self, path: str):
        np.save(path, self.to_dict(), allow_pickle=True)

    @classmethod
    def from_dict(cls, d):
        return cls(SkeletonTree.from_dict(d["skeleton_tree"]),
                   _unwrap(d["rotation"]),
                   _unwrap(d["root_translation"]), True,
                   fps=float(np.asarray(d["fps"])),
                   global_velocity=_unwrap(d["global_velocity"]),
                   global_angular_velocity=_unwrap(
                       d["global_angular_velocity"]))

    @classmethod
    def from_file(cls, path: str):
        return cls.from_dict(np.load(path, allow_pickle=True).item())


def retarget_motion(cfg: dict) -> SkeletonMotion:
    """Config-driven retargeting (reference
    `poselib/retarget_motion.py`, 281 LoC).  cfg keys:
      source_motion, source_tpose, target_tpose (paths: .npy files;
      tposes are SkeletonState dicts or SkeletonMotion frame 0),
      joint_mapping {src: tgt}, rotation (xyzw, optional),
      scale (float), target_motion_path (optional output .npy),
      trim_frames_start/end (optional ints).
    """
    def load_state(path):
        d = np.load(path, allow_pickle=True).item()
        if d.get("__name__") == "SkeletonMotion":
            m = SkeletonMotion.from_dict(d)
            return SkeletonState(m.skeleton_tree, m.rotation[0],
                                 m.root_translation[0])
        return SkeletonState.from_dict(d)

    motion = SkeletonMotion.from_file(cfg["source_motion"])
    s0 = int(cfg.get("trim_frames_start", 0))
    s1 = motion.rotation.shape[0] - int(cfg.get("trim_frames_end", 0))
    motion = SkeletonMotion(
        motion.skeleton_tree, motion.rotation[s0:s1],
        motion.root_translation[s0:s1], True, fps=motion.fps)
    out = motion.retarget_to_by_tpose(
        dict(cfg["joint_mapping"]),
        load_state(cfg["source_tpose"]),
        load_state(cfg["target_tpose"]),
        rotation_to_target_skeleton=cfg.get("rotation"),
        scale_to_target_skeleton=float(cfg.get("scale", 1.0)))
    if cfg.get("target_motion_path"):
        out.to_file(cfg["target_motion_path"])
    return out


def _main():
    import json
    import sys
    with open(sys.argv[1]) as f:
        retarget_motion(json.load(f))


if __name__ == "__main__":
    _main()


def import_fbx(*a, **kw):
    """FBX import requires the proprietary Autodesk FBX SDK (reference
    `poselib/skeleton/backend/fbx/fbx_backend.py`), which is not
    available in this environment."""
    raise ImportError(
        "FBX import needs the Autodesk FBX Python SDK; convert motions "
        "to the .npy SkeletonMotion format offline instead.")
