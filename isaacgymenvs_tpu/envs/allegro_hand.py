"""AllegroHand: in-hand cube reorientation (16-DoF Allegro hand).

Parity with reference `tasks/allegro_hand.py` (768 LoC) — the same goal
machinery as ShadowHand (`:542-620`) with:
  * kuka_allegro URDF, fixed base at z=0.5 rotated by
    R_y(π)·R_x(0.47π)·R_z(0.25π) (`:282-284`); mesh collisions approximated
    by bounding boxes (the TPU analogue of PhysX convex decomposition);
  * all 16 DOFs actuated with PD kp=3 / kd=0.1 / effort ±0.5 (`:262-265`);
  * object offset dy=−0.2 dz=0.06 (`:289-292`);
  * obs full_no_vel/50, full/72, full_state/88 without fingertip blocks
    (`compute_full_observations`/`compute_full_state` `:451-530`).
Config `cfg/task/AllegroHand.yaml`.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from ..core import types as T
from ..core.modeling import add_actuators, hinge_joint_names
from ..io.urdf import load_urdf
from .shadow_hand import ShadowHand
from ..utils.assets import asset_path

_HAND_ASSET = asset_path("urdf/kuka_allegro_description/allegro.urdf")


def _aa(axis, angle):
    h = 0.5 * angle
    return np.concatenate([[math.cos(h)],
                           math.sin(h) * np.asarray(axis, np.float64)])


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw])


class AllegroHand(ShadowHand):
    num_acts = 16
    hand_asset = _HAND_ASSET
    object_offset = (0.0, -0.2, 0.06)   # allegro_hand.py:289-292
    obs_dims = {"full_no_vel": 50, "full": 72, "full_state": 88}
    states_dim = 88

    def _load_hand(self):
        hand = load_urdf(self.hand_asset, fix_base=True,
                         collapse_fixed_joints=True)
        hand = add_actuators(hand, hinge_joint_names(hand),
                             trntype=T.ACT_POSITION, kp=3.0, kd=0.1,
                             forcerange=(-0.5, 0.5))
        # R_y(π) ⊗ R_x(0.47π) ⊗ R_z(0.25π) (allegro_hand.py:284)
        q = _qmul(_qmul(_aa([0, 1, 0], math.pi),
                        _aa([1, 0, 0], 0.47 * math.pi)),
                  _aa([0, 0, 1], 0.25 * math.pi))
        return hand, list(q)

    def _actuated_indices(self, scene, hinge_names):
        return np.arange(len(hinge_names))  # all 16 actuated (:244)

    def _fingertip_indices(self, scene):
        tips = [bn for bn in scene.body_names
                if bn.startswith("hand/") and bn.endswith("link_3")]
        return np.array([scene.body_index(t) for t in tips])

    def _contact_bodies(self, hand):
        return [bn for bn in hand.body_names if "link" in bn]

    # ---- obs layouts without fingertip blocks (allegro_hand.py:451-530)
    def _full_state(self, pieces, actions):
        (dof_pos, dof_vel, obj_pose, obj_linvel, obj_angvel, goal_pose,
         quat_diff, ft_state, ft_pos, ft_force, dof_force) = pieces
        return jnp.concatenate([
            dof_pos, dof_vel, dof_force,
            obj_pose, obj_linvel, obj_angvel,
            goal_pose, quat_diff,
            actions,
        ], axis=-1)

    def _observe(self, state, info):
        pieces = self._obs_pieces(state, info)
        (dof_pos, dof_vel, obj_pose, obj_linvel, obj_angvel, goal_pose,
         quat_diff, ft_state, ft_pos, ft_force, dof_force) = pieces
        actions = state.aux["actions"]
        if self.obs_type == "full_no_vel":
            obs = jnp.concatenate([
                dof_pos, obj_pose, goal_pose, quat_diff, actions], axis=-1)
        elif self.obs_type == "full":
            obs = jnp.concatenate([
                dof_pos, dof_vel, obj_pose, obj_linvel, obj_angvel,
                goal_pose, quat_diff, actions], axis=-1)
        else:
            obs = self._full_state(pieces, actions)
        self._pieces_cache = pieces
        return obs, {}
