"""Impulse-level velocity constraint solver (contacts + joint limits).

TPU-native replacement for PhysX's PGS/TGS rigid-contact solver
(reference sim params `vec_task.py:442-490`: solver_type, num_position/
velocity_iterations). Design rationale:

* Constraint set is STATIC (fixed candidate contacts + limit rows) —
  inactive rows are masked, shapes never change, XLA compiles once.
* The Delassus operator A = J M⁻¹ Jᵀ is built with dense batched
  matmuls (lands on the MXU when vmapped over thousands of envs).
* The LCP  0 ≤ λ ⟂ Aλ + b ≥ 0  (+ pyramidal friction box coupled to
  normal impulses, matching the reference assets' cone="pyramidal") is
  solved with PROJECTED GRADIENT iterations: per iteration one (nr,nr)
  matvec + elementwise projection — fully parallel across envs, no
  sequential per-contact sweep like PGS (which would serialize poorly
  on TPU vector units).
* Unconditionally stable at any mass ratio (unlike penalty springs);
  Baumgarte bias handles depenetration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core import types as T
from .collide import ContactSet
from .dynamics import dof_structure
from .linalg import mm_small, mv_small

import dataclasses


@dataclasses.dataclass(frozen=True)
class Attractors:
    """Point-position equality constraints pinning body points to world
    targets — the TPU analogue of `gym.create_rigid_body_attractor`
    (reference `tasks/ball_balance.py:252-270`: 5e7-stiffness translation
    attractors holding the balance-bot feet). Solved as 3 hard velocity
    rows per attractor with Baumgarte bias (stable at any stiffness,
    unlike an explicit spring)."""

    body: np.ndarray     # (na,) int32
    offset: np.ndarray   # (na,3) attachment point, body frame
    target: np.ndarray   # (na,3) world target

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    @property
    def count(self):
        return len(self.body)


@functools.lru_cache(maxsize=None)
def _dof_body_mask(model: T.ArticulationModel) -> np.ndarray:
    """(nv, nb) 1.0 where dof k is in the ancestor chain of body b."""
    _, anc, last_dof = dof_structure(model)
    nv, nb = model.nv, model.nbody
    D = np.zeros((nv, nb), dtype=np.float32)
    for b in range(nb):
        ld = last_dof[b]
        if ld >= 0:
            D[:, b] = anc[:, ld]
    return D


@functools.lru_cache(maxsize=None)
def _limit_rows(model: T.ArticulationModel):
    """Static linear position-limit rows: W (nl, nv), sign, bound.

    Constraint per row: sign·(W·qpos_dof − bound) ≥ 0. Covers joint range
    limits (two rows per limited 1-dof joint) AND fixed-tendon ranges
    (ShadowHand distal couplings, `<tendon><fixed range>` — two rows per
    tendon with the coupling coefficients as the W row).

    Also returns per-row provenance for runtime (DR-randomized)
    overrides: row_dof (dof index, -1 for tendon rows), row_upper
    (1 where the row enforces the upper bound), row_ten (tendon index,
    -1 for dof rows)."""
    rows_w, signs, bounds = [], [], []
    row_dof, row_upper, row_ten = [], [], []
    nv = model.nv
    for ji in range(model.njnt):
        if not model.jnt_limited[ji]:
            continue
        if int(model.jnt_type[ji]) not in (T.HINGE, T.SLIDE, T.SCREW):
            continue
        va = int(model.jnt_vadr[ji])
        lo, hi = float(model.jnt_range[ji][0]), float(model.jnt_range[ji][1])
        w = np.zeros(nv, np.float32)
        w[va] = 1.0
        rows_w += [w, w]
        signs += [1.0, -1.0]
        bounds += [lo, hi]
        row_dof += [va, va]
        row_upper += [0, 1]
        row_ten += [-1, -1]
    for t in range(model.ntendon):
        a0, a1 = int(model.ten_adr[t]), int(model.ten_adr[t + 1])
        w = np.zeros(nv, np.float32)
        for k in range(a0, a1):
            ji = int(model.ten_jnt[k])
            w[int(model.jnt_vadr[ji])] += float(model.ten_coef[k])
        lo, hi = float(model.ten_range[t][0]), float(model.ten_range[t][1])
        rows_w += [w, w]
        signs += [1.0, -1.0]
        bounds += [lo, hi]
        row_dof += [-1, -1]
        row_upper += [0, 1]
        row_ten += [t, t]
    W = (np.stack(rows_w) if rows_w
         else np.zeros((0, nv), np.float32))
    return (W, np.asarray(signs, np.float32), np.asarray(bounds, np.float32),
            np.asarray(row_dof, np.int32), np.asarray(row_upper, np.int32),
            np.asarray(row_ten, np.int32))


def _qpos_dof(model, q):
    """(nv,) q value per dof for 1-dof joints (0 for free/ball) — one
    batched gather via the static tree structure."""
    from .structure import TreeStructure
    st = TreeStructure(model)
    return q[st.dof_qpos_idx] * jnp.asarray(st.dof_is_1d, q.dtype)


def constraint_row_count(model: T.ArticulationModel, sim: T.SimParams,
                         contacts: ContactSet, pair_contacts=None,
                         attractors=None) -> int:
    """Static solver-row count (3 per post-cap contact candidate +
    limit rows + 3 per attractor) — the shape of the impulse vector
    `lam` for warm-start carries."""
    nc = contacts.count + (pair_contacts.count if pair_contacts is not None
                           else 0)
    cap = int(getattr(sim, "max_contact_points", 0) or 0)
    if cap:
        nc = min(nc, cap)
    nl = len(_limit_rows(model)[1])
    na = attractors.count if attractors is not None else 0
    return 3 * nc + nl + 3 * na


def solve_constraints(model: T.ArticulationModel, params: T.PhysParams,
                      sim: T.SimParams, kin, contacts: ContactSet,
                      q, qd_free, Minv, h, height_fn=None,
                      pair_geom=None, attractors=None, lam_init=None):
    """One velocity-level constraint solve.

    qd_free: unconstrained post-step velocity (after forces, before
    impulses). Minv: explicit inverse of the effective mass matrix
    (see physics/linalg.py). pair_geom: optional runtime
    body-pair narrowphase output from `collide.pair_contact_geometry`.
    lam_init: optional warm-start impulses from the previous substep
    (row ordering is static, so they correspond; re-projected onto the
    current active set before iterating).
    Returns (qd_new, body_contact_force (nb,3), body_contact_torque,
    lam)."""
    from ..core.maths import quat_rotate

    nv, nb = model.nv, model.nbody
    dtype = qd_free.dtype
    ncg = contacts.count
    ncp = pair_geom[0].shape[0] if pair_geom is not None else 0
    nc = ncg + ncp
    lim_W, lim_sign, lim_bound, lim_dof, lim_up, lim_ten = _limit_rows(model)
    nl = len(lim_sign)
    na = attractors.count if attractors is not None else 0
    if nc == 0 and nl == 0 and na == 0:
        return (qd_free, jnp.zeros((nb, 3), dtype),
                jnp.zeros((nb, 3), dtype), jnp.zeros((0,), dtype))

    S = kin.dof_S                                   # (nv,6)
    Dmat = jnp.asarray(_dof_body_mask(model))       # (nv,nb)

    def point_vel_jac(cpt, dof_mask):
        """(nv, k, 3) point-velocity jacobian at world points cpt (k,3),
        masked per dof by dof_mask (nv, k)."""
        k = cpt.shape[0]
        cpt_rel = cpt - kin.ref
        v = S[:, None, 3:] + jnp.cross(
            jnp.broadcast_to(S[:, None, :3], (nv, k, 3)),
            jnp.broadcast_to(cpt_rel[None, :, :], (nv, k, 3)))
        return v * dof_mask[:, :, None]

    # ---- unified normal-row geometry: ground then pairs -------------------
    # per-candidate arrays: n, cpt, depth, mu, rest, dof-mask column
    # (Dmat[:,a] − Dmat[:,b]), body a, body b (−1 = static world/ground)
    ns, cpts, depths, mus, rests, dcols, b_as, b_bs = \
        [], [], [], [], [], [], [], []
    if ncg:
        b_idx = jnp.asarray(contacts.body)
        g_idx = jnp.asarray(contacts.geom)
        off = jnp.asarray(contacts.offset, dtype)
        rad = jnp.asarray(contacts.radius, dtype)
        if params.geom_scale is not None:
            gsc = params.geom_scale.astype(dtype)[g_idx]
            off = off * gsc[:, None]
            rad = rad * gsc
        p = kin.body_pos[b_idx] + quat_rotate(kin.body_quat[b_idx], off)
        if height_fn is None:
            ground_h = jnp.zeros((ncg,), dtype)
            n_g = jnp.zeros((ncg, 3), dtype).at[:, 2].set(1.0)
        else:
            ground_h, n_g = height_fn(p[:, 0], p[:, 1])
        depth_g = rad + ground_h - p[:, 2]
        cpt_g = p - n_g * rad[:, None]
        ns.append(n_g); cpts.append(cpt_g); depths.append(depth_g)
        gmu = params.geom_friction.astype(dtype)[g_idx]
        gmat = int(getattr(sim, "ground_material_geom", -1))
        if gmat >= 0:
            # plane carries a material geom (scene floor/table actor):
            # average combine, PhysX default mode
            gmu = 0.5 * (gmu + params.geom_friction.astype(dtype)[gmat])
        mus.append(gmu)
        # vs the rigid plane (restitution 0): average combine (PhysX
        # default) -> e/2
        rests.append(0.5 * params.geom_restitution.astype(dtype)[g_idx]
                     if params.geom_restitution is not None
                     else jnp.zeros((ncg,), dtype))
        dcols.append(jnp.asarray(Dmat[:, np.asarray(contacts.body)]))
        b_as.append(b_idx)
        b_bs.append(jnp.full((ncg,), -1, jnp.int32))
    if ncp:
        depth_p, n_p, cpt_p, ba, bb, mu_p, e_p = pair_geom
        ns.append(n_p); cpts.append(cpt_p); depths.append(depth_p)
        mus.append(mu_p)
        rests.append(e_p)
        # relative point velocity: dofs above A minus dofs above B
        dcols.append(Dmat[:, ba] - Dmat[:, bb])
        b_as.append(jnp.asarray(ba, jnp.int32))
        b_bs.append(jnp.asarray(bb, jnp.int32))

    if nc:
        n = jnp.concatenate(ns)
        cpt = jnp.concatenate(cpts)
        depth = jnp.concatenate(depths)
        mu = jnp.concatenate(mus)
        rest = jnp.concatenate(rests)
        dcol = jnp.concatenate(dcols, axis=1)       # (nv, nc)
        body_a = jnp.concatenate(b_as)
        body_b = jnp.concatenate(b_bs)
    else:
        n = jnp.zeros((0, 3), dtype)
        cpt = jnp.zeros((0, 3), dtype)
        depth = jnp.zeros((0,), dtype)
        mu = jnp.zeros((0,), dtype)
        rest = jnp.zeros((0,), dtype)
        dcol = jnp.zeros((nv, 0), dtype)
        body_a = jnp.zeros((0,), jnp.int32)
        body_b = jnp.zeros((0,), jnp.int32)

    # ---- contact capping (PhysX max_gpu_contact_pairs analogue) ----------
    # Candidate sets are static-shaped (hand tasks: 200+ points of which
    # ~a dozen ever touch); solving all of them makes J and every APGD
    # matvec scale with the candidate count, not the active count. When
    # sim.max_contact_points > 0, keep only the K deepest candidates per
    # env (gathers are per-env under vmap): identical solution whenever
    # all truly-active contacts fit in K, at K/nc of the row cost.
    cap = int(getattr(sim, "max_contact_points", 0) or 0)
    if nc and cap and cap < nc:
        _, sel = jax.lax.top_k(depth, cap)
        n = n[sel]
        cpt = cpt[sel]
        depth = depth[sel]
        mu = mu[sel]
        rest = rest[sel]
        dcol = dcol[:, sel]
        body_a = body_a[sel]
        body_b = body_b[sel]
        nc = cap
    v_dof = point_vel_jac(cpt, dcol) if nc else jnp.zeros((nv, 0, 3), dtype)

    # tangent frame (robust for arbitrary normals)
    ex = jnp.zeros((nc, 3), dtype).at[:, 0].set(1.0)
    ey = jnp.zeros((nc, 3), dtype).at[:, 1].set(1.0)
    ref_ax = jnp.where(jnp.abs(n[:, 0:1]) < 0.9, ex, ey)
    t1 = jnp.cross(n, ref_ax)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-6)
    t2 = jnp.cross(n, t1)

    # contraction over the 3 spatial axes as broadcast-sums (VPU;
    # tiny batched dots pad MXU tiles — see linalg.mv_small)
    Jn = jnp.sum(v_dof * n[None, :, :], axis=-1).T   # (nc,nv)
    Jt1 = jnp.sum(v_dof * t1[None, :, :], axis=-1).T
    Jt2 = jnp.sum(v_dof * t2[None, :, :], axis=-1).T

    # speculative contacts (PhysX contactOffset analogue): rows within
    # contact_margin of touching activate with bias = -depth/h — the
    # point may close at most its remaining gap this substep, which
    # stops fast approaches at thin features (factory thread crests)
    # instead of tunneling through them between substeps. Penetrating
    # rows keep the Baumgarte push-out. margin 0 ⇒ round-1 behavior.
    active = depth > -sim.contact_margin
    bias = jnp.where(
        depth > 0.0,
        -jnp.clip(sim.contact_beta * depth / h, 0.0,
                  sim.max_depenetration_velocity),
        -depth / h)
    vn_pre = mv_small(Jn, qd_free)
    # restitution: target normal velocity -e·v_n for impacts faster than
    # the bounce threshold (PhysX bounce_threshold_velocity). Touching
    # rows always; SEPARATED (speculative) rows only when the approach
    # covers the whole gap this substep — otherwise the speculative
    # clamp would absorb the impact inelastically and the penetrating
    # substep would see only ~gap/h of the original speed (silent
    # restitution loss under contact_margin > 0). A slow approach that
    # stays separated must not bounce early.
    will_hit = depth > 0.0
    if sim.contact_margin > 0.0:
        will_hit = will_hit | (vn_pre * h < depth)  # closes the gap
    bounce = jnp.where((vn_pre < -sim.bounce_threshold) & will_hit,
                       rest * vn_pre, 0.0)
    rows_J = [Jn, Jt1, Jt2]
    rows_b = [vn_pre + jnp.where(active, bias + bounce, 0.0),
              mv_small(Jt1, qd_free), mv_small(Jt2, qd_free)]

    # ---- joint-limit + tendon-range rows -----------------------------------
    if nl:
        qdof = _qpos_dof(model, q)
        W = jnp.asarray(lim_W, dtype)
        L = mv_small(W, qdof)                       # linear position value
        sign = jnp.asarray(lim_sign)
        bound = jnp.asarray(lim_bound)
        # DR-randomized dof limits override the static bounds
        # (dof_properties.lower/upper, reference dr_utils.py:35-68)
        if params.dof_lower is not None:
            rdof = jnp.asarray(lim_dof)
            dyn = jnp.where(jnp.asarray(lim_up) == 1,
                            params.dof_upper[jnp.maximum(rdof, 0)],
                            params.dof_lower[jnp.maximum(rdof, 0)])
            bound = jnp.where(rdof >= 0, dyn.astype(dtype), bound)
        viol = sign * (L - bound)                   # ≤ 0 when violating
        Jl = sign[:, None] * W
        lim_active = viol < 0.0
        bias_l = jnp.clip(sim.contact_beta * viol / h,
                          -sim.max_depenetration_velocity, 0.0)
        bl = mv_small(Jl, qd_free) + jnp.where(lim_active, bias_l, 0.0)
        rows_J.append(Jl)
        rows_b.append(bl)

    # ---- attractor (pin) equality rows ------------------------------------
    if na:
        ab = jnp.asarray(attractors.body)
        a_pt = kin.body_pos[ab] + quat_rotate(
            kin.body_quat[ab], jnp.asarray(attractors.offset, dtype))
        va = point_vel_jac(a_pt, Dmat[:, np.asarray(attractors.body)])
        Ja = jnp.transpose(va, (1, 2, 0)).reshape(3 * na, nv)  # (a0x,a0y,a0z,…)
        err = (a_pt - jnp.asarray(attractors.target, dtype)).reshape(-1)
        ba_rows = mv_small(Ja, qd_free) + jnp.clip(
            sim.contact_beta * err / h,
            -sim.max_depenetration_velocity, sim.max_depenetration_velocity)
        rows_J.append(Ja)
        rows_b.append(ba_rows)

    J = jnp.concatenate(rows_J, axis=0)             # (nr,nv)
    b = jnp.concatenate(rows_b, axis=0)
    nr = J.shape[0]

    # Delassus operator kept FACTORED: A@x = J (M⁻¹Jᵀ x). Two skinny
    # (nr,nv) matvecs beat one dense (nr,nr) matvec on TPU (measured:
    # materializing A halved Ant throughput), and the dense form would
    # not fit HBM at hand-task row counts × thousands of envs.
    from .step import dof_components
    from .linalg import mm_blocked
    MinvJT = mm_blocked(Minv, J.T, dof_components(model))      # (nv,nr)

    # tendon limit compliance: ten_kp/ten_kd (PhysX tendon
    # limit_stiffness/damping the reference sets per asset and DR scales,
    # cfg/task/ShadowHand.yaml tendon_properties) enter as per-row
    # constraint-force-mixing regularization cfm = 1/(h²·kp + h·kd);
    # kp=kd=0 keeps the row hard (exact round-1 behavior).
    cfm = jnp.zeros((nr,), dtype)
    if nl and model.ntendon and params.ten_kp is not None:
        rten = jnp.asarray(lim_ten)
        kp = params.ten_kp[jnp.maximum(rten, 0)].astype(dtype)
        kd = params.ten_kd[jnp.maximum(rten, 0)].astype(dtype)
        c = jnp.where((rten >= 0) & (kp + kd > 0),
                      1.0 / jnp.maximum(h * h * kp + h * kd, 1e-12), 0.0)
        cfm = cfm.at[3 * nc:3 * nc + nl].set(c)
    # MuJoCo-style contact compliance (sim.contact_timeconst = solref[0],
    # contact_dampratio = solref[1]): a spring-damper with time constant
    # τ and damping ratio ζ at the row's effective mass m_r = 1/dA has
    # kp = m_r/τ², kd = 2ζ·m_r/τ ⇒
    #   cfm = 1/(h²kp + h·kd) = dA / ((h/τ)² + 2ζ·(h/τ)),
    # scale-free in the row mass, so one expression serves every contact.
    dA_base = jnp.einsum("rv,vr->r", J, MinvJT)
    if nc and sim.contact_timeconst > 0.0:
        r_ = h / sim.contact_timeconst
        denom = r_ * r_ + 2.0 * sim.contact_dampratio * r_
        # NORMAL rows only: regularizing the friction rows as well made
        # stance feet creep (tangential compliance ≈ slip), which
        # measurably degraded Ant gait training (+751 vs +3269 at epoch
        # 900 in the soft-vs-hard A/B). Friction stays hard-projected
        # unless friction_timeconst opts into (stiffer) micro-compliance.
        cfm = cfm.at[:nc].add(dA_base[:nc] / denom)
    if nc and sim.friction_timeconst > 0.0:
        rf = h / sim.friction_timeconst
        denf = rf * rf + 2.0 * sim.contact_dampratio * rf
        cfm = cfm.at[nc:3 * nc].add(dA_base[nc:3 * nc] / denf)
    # joint-limit compliance (MuJoCo solreflimit; default solref (0.02,1)
    # covers limit rows): knees pressed against their extension stop —
    # how every humanoid stands — get a stiff spring-damper instead of a
    # rigid wall. Same scale-free cfm expression as contacts. JOINT
    # limit rows only: tendon-range rows have their own ten_kp/ten_kd
    # regularization above (MuJoCo's solreflimit likewise doesn't stack
    # onto tendon limits).
    if nl and sim.limit_timeconst > 0.0:
        rl_ = h / sim.limit_timeconst
        denl = rl_ * rl_ + 2.0 * sim.limit_dampratio * rl_
        soft = dA_base[3 * nc:3 * nc + nl] / denl
        if model.ntendon:
            soft = jnp.where(jnp.asarray(lim_ten) >= 0, 0.0, soft)
        cfm = cfm.at[3 * nc:3 * nc + nl].add(soft)

    if sim.solver_matvec_bf16:
        # bf16 operand storage for the HBM-bound iteration matvecs,
        # f32 accumulation (jnp.sum dtype) — trims the J/MinvJT bytes
        # that dominate hand-scale solves (measured +6% ShadowHand fps;
        # a layout-transposed J variant was also tried and measured
        # SLOWER on Ant/Humanoid/hand alike, so row-major J stays).
        # Impulses, b, projections and the final update stay f32.
        Jb = J.astype(jnp.bfloat16)
        Mb = MinvJT.astype(jnp.bfloat16)

        def Amv(x):
            xb = x.astype(jnp.bfloat16)
            y = jnp.sum(Mb * xb[None, :], axis=-1,
                        dtype=jnp.float32)               # (nv,)
            yb = y.astype(jnp.bfloat16)
            return jnp.sum(Jb * yb[None, :], axis=-1,
                           dtype=jnp.float32) + cfm * x
    else:
        def Amv(x):
            return mv_small(J, mv_small(MinvJT, x)) + cfm * x

    # DIAGONAL preconditioning (Chrono-style): light objects with tiny
    # rotational inertia (5 cm cubes: I ≈ 5e-6) make cond(A) explode and
    # plain APGD stalls; Γ = γ̂ D⁻¹ equilibrates the rows. diag(A) comes
    # free from the factored operator.
    dA = dA_base + cfm
    dinv = 1.0 / jnp.maximum(dA, 1e-9)

    # rows that can carry impulse THIS solve: active normals + their
    # friction rows, violated limits, attractor equalities.  Inactive
    # candidate rows are projected to zero anyway, but letting them into
    # the power iteration inflates lam_max and starves the live rows'
    # step size (scenes with many dormant candidates — prop clutter,
    # multi-object tables — lost ground support at 16 sweeps)
    row_active = jnp.ones((nr,), dtype)
    if nc:
        act3 = jnp.tile(active.astype(dtype), 3)
        row_active = row_active.at[:3 * nc].set(act3)
    if nl:
        row_active = row_active.at[3 * nc:3 * nc + nl].set(
            lim_active.astype(dtype))

    def Amv_pre(x):
        return Amv(x * row_active) * dinv * row_active

    # step size from power iteration on the PRECONDITIONED operator
    def pow_body(i, v):
        w = Amv_pre(v)
        return w / jnp.maximum(jnp.linalg.norm(w), 1e-12)

    v0 = row_active / jnp.maximum(
        jnp.linalg.norm(row_active), 1e-12)
    v = jax.lax.fori_loop(0, sim.power_iterations, pow_body, v0)
    lam_max = jnp.linalg.norm(Amv_pre(v))
    gamma = dinv / jnp.maximum(1.5 * lam_max, 1e-6)   # per-row Γ

    def project(lam):
        out = lam
        if nc:
            ln = jnp.where(active, jnp.maximum(lam[:nc], 0.0), 0.0)
            lim_t = mu * ln
            lt1 = jnp.clip(lam[nc:2 * nc], -lim_t, lim_t)
            lt2 = jnp.clip(lam[2 * nc:3 * nc], -lim_t, lim_t)
            out = out.at[:3 * nc].set(jnp.concatenate([ln, lt1, lt2]))
        if nl:
            ll = jnp.where(lim_active,
                           jnp.maximum(lam[3 * nc:3 * nc + nl], 0.0), 0.0)
            out = out.at[3 * nc:3 * nc + nl].set(ll)
        return out  # attractor rows (equality) stay unprojected

    # APGD (accelerated projected gradient, Heyn/Negrut-style): Nesterov
    # momentum with gradient-alignment restart — O(1/k²) on the contact
    # LCP vs O(1/k) for plain PGD; same per-iteration cost (2 matvecs).
    def body(i, carry):
        lam, y, theta = carry
        g = Amv(y) + b
        lam_new = project(y - gamma * g)
        theta_new = 0.5 * (jnp.sqrt(theta ** 4 + 4 * theta ** 2)
                           - theta ** 2)
        beta = theta * (1 - theta) / (theta ** 2 + theta_new)
        y_new = lam_new + beta * (lam_new - lam)
        # adaptive restart: if momentum direction opposes the gradient
        restart = jnp.sum(g * (lam_new - lam)) > 0
        y_new = jnp.where(restart, lam_new, y_new)
        theta_new = jnp.where(restart, 1.0, theta_new)
        return lam_new, y_new, theta_new

    if lam_init is not None:
        # warm start from the previous substep's impulses (static row
        # ordering ⇒ rows correspond; with a top-k contact cap the
        # selected subset can shift between substeps, which only makes
        # the initial guess worse, never the physics wrong). Re-project
        # onto THIS substep's active set first.
        assert lam_init.shape[0] == J.shape[0], (
            f"warm-start impulse carry has {lam_init.shape[0]} rows but "
            f"the solve has {J.shape[0]} — constraint_row_count() must "
            "mirror this function's row layout (3·nc_capped + nl + 3·na)")
        lam0 = project(lam_init.astype(dtype))
    else:
        lam0 = jnp.zeros(J.shape[0], dtype)
    lam, _, _ = jax.lax.fori_loop(0, sim.solver_iterations, body,
                                  (lam0, lam0, jnp.asarray(1.0, dtype)))

    qd_new = qd_free + mv_small(MinvJT, lam)

    # equivalent contact force/torque for reporting (impulse/h) per body —
    # replaces acquire_net_contact_force_tensor + force sensors
    # (`tasks/anymal.py:112`, `tasks/ant.py:174-178`)
    f_lin = (lam[:nc, None] * n + lam[nc:2 * nc, None] * t1
             + lam[2 * nc:3 * nc, None] * t2) / h
    if nc:
        # scatter-free accumulation: body_a/body_b are top-k-selected
        # (traced) indices, so segment_sum lowers to scatter-add — which
        # serializes under vmap on TPU and TRIPLED the ShadowHand-16384
        # step (26.6K → 9.0K steps/s) whenever the asymmetric-critic
        # states consumed these forces. A dynamic one-hot (nc,nb) mask
        # contracted on the VPU is the same trick the round-3 narrowphase
        # fix used.
        bodies = jnp.arange(nb)
        onehot_a = (body_a[:, None] == bodies[None, :]).astype(dtype)
        arm_a = cpt - kin.body_pos[body_a]
        ct_a = jnp.cross(arm_a, f_lin)
        body_cf = jnp.sum(onehot_a[:, :, None] * f_lin[:, None, :], axis=0)
        body_ct = jnp.sum(onehot_a[:, :, None] * ct_a[:, None, :], axis=0)
        if ncp:  # static: pair candidates exist (ground-only → body_b ≡ −1)
            bb_c = jnp.maximum(body_b, 0)
            onehot_b = ((body_b[:, None] == bodies[None, :])
                        & (body_b >= 0)[:, None]).astype(dtype)
            arm_b = cpt - kin.body_pos[bb_c]
            ct_b = jnp.cross(arm_b, f_lin)
            body_cf = body_cf - jnp.sum(
                onehot_b[:, :, None] * f_lin[:, None, :], axis=0)
            body_ct = body_ct - jnp.sum(
                onehot_b[:, :, None] * ct_b[:, None, :], axis=0)
    else:
        body_cf = jnp.zeros((nb, 3), dtype)
        body_ct = jnp.zeros((nb, 3), dtype)
    return qd_new, body_cf, body_ct, lam
