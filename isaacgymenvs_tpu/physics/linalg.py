"""Small-matrix batched linear algebra for the TPU hot loop.

XLA:TPU lowers `jnp.linalg.cholesky` / `cho_solve` to a custom call that
dominated the physics step (59% of Ant-4096 step time in the profiler).
For articulation-sized matrices (nv ≈ 8-40) an UNROLLED Cholesky and
triangular inverse — n static steps of batched vector ops — runs entirely
on the vector/matrix units and vmaps cleanly over thousands of envs.

The explicit inverse M⁻¹ = L⁻ᵀL⁻¹ then turns every downstream solve
(forward dynamics, Delassus operator columns) into plain MXU matmuls.
M is SPD with armature regularization, so the explicit inverse is
numerically safe at f32/highest precision.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def mv_small(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched matvec A @ x for SMALL trailing dims as a broadcast-
    multiply-sum. XLA:TPU lowers tiny batched dot_generals to MXU passes
    padded to full 128x128 tiles (the round-3 stage profile measured the
    3x3/6x6 dots at 5-6x their elementwise cost); the broadcast form
    fuses onto the VPU. A: (..., m, k), x: (..., k) -> (..., m)."""
    return jnp.sum(A * x[..., None, :], axis=-1)


def mm_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Batched matmul A @ B for SMALL dims as a broadcast-multiply-sum
    (see mv_small). A: (..., m, k), B: (..., k, n) -> (..., m, n)."""
    return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def cholesky_small(M: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular L with L Lᵀ = M, unrolled over the static size n.

    M: (..., n, n) SPD. Each of the n steps is one batched matvec +
    elementwise ops (no sequential custom call)."""
    n = M.shape[-1]
    dtype = M.dtype
    L = jnp.zeros_like(M)
    idx = np.arange(n)
    for j in range(n):
        # s_i = Σ_{k<j} L[i,k] L[j,k]  (columns ≥ j are still zero;
        # broadcast-sum, not dot — see mv_small)
        s = jnp.sum(L * L[..., j, :][..., None, :], axis=-1)
        djj = jnp.maximum(M[..., j, j] - s[..., j], 1e-12)
        inv_ljj = 1.0 / jnp.sqrt(djj)
        col = (M[..., :, j] - s) * inv_ljj[..., None]
        mask = jnp.asarray(idx >= j, dtype)
        L = L.at[..., :, j].set(col * mask)
    return L


def lower_tri_inverse(L: jnp.ndarray) -> jnp.ndarray:
    """L⁻¹ for lower-triangular L, unrolled forward substitution
    (row i uses the already-final rows k < i)."""
    n = L.shape[-1]
    dtype = L.dtype
    X = jnp.zeros_like(L)
    eye = np.eye(n, dtype=np.float32)
    idx = np.arange(n)
    for i in range(n):
        mask = jnp.asarray(idx < i, dtype)
        acc = jnp.sum((L[..., i, :] * mask)[..., :, None] * X, axis=-2)
        row = (jnp.asarray(eye[i], dtype) - acc) \
            / L[..., i, i][..., None]
        X = X.at[..., i, :].set(row)
    return X


def spd_inverse(M: jnp.ndarray) -> jnp.ndarray:
    """M⁻¹ for SPD M via unrolled Cholesky: M⁻¹ = L⁻ᵀ L⁻¹."""
    L = cholesky_small(M)
    Li = lower_tri_inverse(L)
    return jnp.sum(Li[..., :, :, None] * Li[..., :, None, :], axis=-3)


def spd_inverse_blocked(M: jnp.ndarray, components) -> jnp.ndarray:
    """M⁻¹ for SPD M that is BLOCK-DIAGONAL over `components` (static
    tuple of tuples of index lists) — disconnected actors in a composed
    scene (props, free objects) never couple in the mass matrix, so the
    inverse factors per component.

    Unrolled-Cholesky cost is O(nv³) with an nv-long dependency chain:
    FrankaCabinet's 16 free-prop scene is nv=109 dense (1.3 MFLOP and a
    109-step chain per substep) but 13³ + 16·6³ ≈ 5.6 KFLOP blocked,
    with same-size components batched into ONE unrolled factorization.
    Bit-identical to the dense path for truly block-diagonal M: the
    dense recurrences only add exact zeros outside the blocks."""
    if len(components) <= 1:
        return spd_inverse(M)
    Minv = jnp.zeros_like(M)
    from collections import defaultdict
    by_size = defaultdict(list)
    for comp in components:
        by_size[len(comp)].append(np.asarray(comp, np.int32))
    for size, comps in sorted(by_size.items()):
        idx = np.stack(comps)                              # (k, s)
        blocks = M[..., idx[:, :, None], idx[:, None, :]]  # (..., k, s, s)
        binv = spd_inverse(blocks)
        Minv = Minv.at[..., idx[:, :, None], idx[:, None, :]].set(binv)
    return Minv


def mm_blocked(Minv: jnp.ndarray, B: jnp.ndarray, components) -> jnp.ndarray:
    """Minv @ B for block-diagonal Minv (see spd_inverse_blocked).
    B: (nv, m) → (nv, m). Streams s·nv·m work per component group
    instead of nv²·m — the Delassus assembly M⁻¹Jᵀ at FrankaCabinet
    scale reads 18× less than the dense broadcast-sum."""
    if len(components) <= 1:
        return mm_small(Minv, B)
    out = jnp.zeros((Minv.shape[-2],) + B.shape[1:], B.dtype)
    from collections import defaultdict
    by_size = defaultdict(list)
    for comp in components:
        by_size[len(comp)].append(np.asarray(comp, np.int32))
    for size, comps in sorted(by_size.items()):
        idx = np.stack(comps)                               # (k, s)
        blk = Minv[..., idx[:, :, None], idx[:, None, :]]   # (k, s, s)
        rows = B[idx]                                       # (k, s, m)
        prod = jnp.sum(blk[..., :, :, None] * rows[..., None, :, :],
                       axis=-2)                             # (k, s, m)
        out = out.at[idx.reshape(-1)].set(
            prod.reshape(-1, B.shape[-1]))
    return out
