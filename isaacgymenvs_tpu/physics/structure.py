"""Static tree structure for level-synchronous batched sweeps.

The first kinematics/dynamics implementation unrolled per-body Python
loops into hundreds of tiny ops per substep; XLA executes those
sequentially (≈5-10 µs launch overhead each on TPU, pathological
scheduling on XLA:CPU for deep chains). This module precomputes numpy
index/mask arrays so each tree sweep becomes O(depth) BATCHED gather/
where ops over all bodies at once — the MJX-style "scan over tree
levels" structure.
"""

from __future__ import annotations

import functools

import numpy as np

from ..core import types as T


@functools.lru_cache(maxsize=None)
class TreeStructure:
    """Cached static structure of an ArticulationModel."""

    def __init__(self, model: T.ArticulationModel):
        self.model = model
        nb, nv, nj = model.nbody, model.nv, model.njnt
        parent = np.asarray(model.body_parent)

        # depth levels (roots = level 0)
        depth = np.zeros(nb, np.int32)
        for i in range(nb):
            p = parent[i]
            depth[i] = 0 if p < 0 else depth[p] + 1
        self.levels = [np.where(depth == d)[0].astype(np.int32)
                       for d in range(depth.max() + 1 if nb else 0)]
        self.depth = depth

        # joints per body, slot-padded
        jnts_of = [[] for _ in range(nb)]
        for ji in range(nj):
            jnts_of[int(model.jnt_body[ji])].append(ji)
        self.jmax = max((len(j) for j in jnts_of), default=0)
        self.body_jnt = np.full((nb, self.jmax), -1, np.int32)
        for i, js in enumerate(jnts_of):
            self.body_jnt[i, :len(js)] = js

        # per-slot static arrays (indexed by body): joint type/axis/anchor/
        # qadr/vadr; -1 slots get type=-1
        jt = np.asarray(model.jnt_type)
        pitch = model.jnt_pitch_arr()
        self.slot_type = np.full((nb, self.jmax), -1, np.int32)
        self.slot_axis = np.zeros((nb, self.jmax, 3), np.float32)
        self.slot_anchor = np.zeros((nb, self.jmax, 3), np.float32)
        self.slot_qadr = np.zeros((nb, self.jmax), np.int32)
        self.slot_vadr = np.zeros((nb, self.jmax), np.int32)
        # screw coupling coefficient dz/dtheta = pitch/(2π)
        self.slot_coef = np.zeros((nb, self.jmax), np.float32)
        for i in range(nb):
            for s, ji in enumerate(jnts_of[i]):
                self.slot_type[i, s] = jt[ji]
                self.slot_axis[i, s] = model.jnt_axis[ji]
                self.slot_anchor[i, s] = model.jnt_pos[ji]
                self.slot_qadr[i, s] = model.jnt_qadr[ji]
                self.slot_vadr[i, s] = model.jnt_vadr[ji]
                self.slot_coef[i, s] = pitch[ji] / (2 * np.pi)

        self.has_ball = bool((jt == T.BALL).any())

        # per-dof static arrays
        self.dof_body = np.array(
            [int(model.jnt_body[int(model.dof_jnt[k])]) for k in range(nv)],
            np.int32)
        self.dof_type = np.array(
            [int(model.jnt_type[int(model.dof_jnt[k])]) for k in range(nv)],
            np.int32)
        self.dof_axis = np.zeros((nv, 3), np.float32)
        self.dof_anchor = np.zeros((nv, 3), np.float32)
        self.dof_qadr = np.zeros(nv, np.int32)
        # sub-index of the dof within its joint (0..5 for free)
        self.dof_sub = np.zeros(nv, np.int32)
        self.dof_coef = np.zeros(nv, np.float32)
        for k in range(nv):
            ji = int(model.dof_jnt[k])
            self.dof_axis[k] = model.jnt_axis[ji]
            self.dof_anchor[k] = model.jnt_pos[ji]
            self.dof_qadr[k] = model.jnt_qadr[ji]
            self.dof_sub[k] = k - int(model.jnt_vadr[ji])
            self.dof_coef[k] = pitch[ji] / (2 * np.pi)
        # qpos index of each dof for 1-dof joints (0 otherwise) + mask
        self.dof_is_1d = np.isin(self.dof_type, (T.HINGE, T.SLIDE, T.SCREW))
        self.dof_qpos_idx = np.where(self.dof_is_1d, self.dof_qadr, 0)

        # integration scatter maps: 1-dof joints q[qadr] += dt qd[vadr]
        one_d = [ji for ji in range(nj)
                 if jt[ji] in (T.HINGE, T.SLIDE, T.SCREW)]
        self.int1_qadr = np.array([model.jnt_qadr[j] for j in one_d],
                                  np.int32)
        self.int1_vadr = np.array([model.jnt_vadr[j] for j in one_d],
                                  np.int32)
        free = [ji for ji in range(nj) if jt[ji] == T.FREE]
        self.free_qadr = np.array([model.jnt_qadr[j] for j in free],
                                  np.int32)
        self.free_vadr = np.array([model.jnt_vadr[j] for j in free],
                                  np.int32)
        self.free_body = np.array([model.jnt_body[j] for j in free],
                                  np.int32)
        self.n_free = len(free)

        # ---- static masks for matmul-form tree reductions (TPU scatters
        # serialize; a (nb,nb)/(nv,nv) mask matmul runs on the MXU) -------
        # body_anc[a, b] = 1 if a is an ancestor-or-self of b
        body_anc = np.zeros((nb, nb), np.float32)
        for b in range(nb):
            a = b
            while a >= 0:
                body_anc[a, b] = 1.0
                a = parent[a]
        self.body_anc = body_anc                 # descendant sum: anc @ X
        # dof ancestry (strict): for partial velocities
        from .dynamics import dof_structure
        dof_parent, dof_anc, last_dof = dof_structure(model)
        self.dof_anc = dof_anc                   # (nv,nv) ancestor-or-self
        self.dof_anc_strict = dof_anc - np.eye(nv, dtype=np.float32)
        # dof→body mask (nv, nb): dof k is an ancestor of body b
        D = np.zeros((nv, nb), np.float32)
        for b in range(nb):
            ld = last_dof[b]
            if ld >= 0:
                D[:, b] = dof_anc[:, ld]
        self.dof_body_mask = D
        # level concat order + inverse permutation (pose pass writes)
        order = np.concatenate(self.levels) if nb else np.zeros(0, np.int32)
        inv = np.zeros(nb, np.int32)
        inv[order] = np.arange(nb)
        self.level_order = order.astype(np.int32)
        self.level_inv = inv
        # index of each body within the concat-so-far prefix (for parent
        # gathers during the level sweep): position in `order`
        self.body_concat_pos = inv
