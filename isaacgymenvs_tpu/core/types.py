"""Core datatypes of the TPU physics engine.

Design (TPU-first, not a port):

* ``ArticulationModel`` — the *static* scene description: kinematic tree
  structure, joint types/addresses, geoms, actuators, names. Stored as
  **numpy** arrays; it is traced once at jit time (the analogue of the
  reference's host-side C++ scene construction, `vec_task.py:216-217`)
  and its values become compile-time constants.

* ``PhysParams`` — the *physical parameters* (masses, inertias, damping,
  gears, friction, PD gains…). A jax pytree, broadcastable to a leading
  env axis, so domain randomization (reference `vec_task.py:496-768`,
  which loops envs on the host) becomes: resample these arrays per env
  on-device under jit.

* ``ArtState`` — generalized coordinates ``(q, qd)`` per articulation,
  env-batched. The whole simulator state is a pytree of jax arrays: the
  reference's acquire/refresh/set tensor API (`vec_task.py:254-277`)
  disappears by construction.

A *scene* is one ArticulationModel that may contain several kinematic
trees ("forest"): multiple actors per env (e.g. hand + object) merge into
one model with block-diagonal mass matrix — one batched solve.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

# Joint types (per joint primitive; a body may carry several joints)
FREE = 0    # 7 q (pos3 + quat wxyz), 6 v (lin world, ang world)
BALL = 1    # 4 q (quat wxyz), 3 v (ang world-ish local) — phase 2
HINGE = 2   # 1 q (angle), 1 v
SLIDE = 3   # 1 q (offset), 1 v
SCREW = 4   # 1 q (angle), 1 v — hinge with coupled translation
#             z = pitch/(2π)·θ along the axis: structural thread model
#             for Factory nut-bolt (replaces PhysX SDF thread contact)

JOINT_NQ = {FREE: 7, BALL: 4, HINGE: 1, SLIDE: 1, SCREW: 1}
JOINT_NV = {FREE: 6, BALL: 3, HINGE: 1, SLIDE: 1, SCREW: 1}

# Geom types
GEOM_PLANE = 0
GEOM_SPHERE = 1
GEOM_CAPSULE = 2
GEOM_BOX = 3
GEOM_CYLINDER = 4
GEOM_HFIELD = 5
GEOM_MESH = 6  # collision via primitive approximation (phase 2)

# Actuator transmission types
ACT_MOTOR = 0      # tau = gear * ctrl
ACT_POSITION = 1   # tau = kp (ctrl - q) - kd qd  (gains in PhysParams)
ACT_VELOCITY = 2   # tau = kv (ctrl - qd)


@dataclasses.dataclass(frozen=True)
class ArticulationModel:
    """Static articulation/scene description (numpy; hashable by identity).

    Replaces the reference's `gym.load_asset` + `create_actor` product
    (`tasks/ant.py:154-197`): parsed once from MJCF/URDF, then traced as
    compile-time structure.
    """

    name: str

    # --- body tree (index 0..nbody-1; parent -1 = world: a tree root) ---
    body_parent: np.ndarray       # (nb,) int32
    body_pos: np.ndarray          # (nb,3) frame offset in parent frame
    body_quat: np.ndarray         # (nb,4) wxyz
    body_mass: np.ndarray         # (nb,)
    body_com: np.ndarray          # (nb,3) COM in body frame
    body_inertia: np.ndarray      # (nb,3,3) about COM, body frame
    body_names: tuple

    # --- joints (in tree order; multiple per body allowed) ---
    jnt_body: np.ndarray          # (nj,) body carrying this joint
    jnt_type: np.ndarray          # (nj,) FREE/BALL/HINGE/SLIDE
    jnt_axis: np.ndarray          # (nj,3) in body frame
    jnt_pos: np.ndarray           # (nj,3) anchor in body frame
    jnt_qadr: np.ndarray          # (nj,) start index into q
    jnt_vadr: np.ndarray          # (nj,) start index into qd
    jnt_range: np.ndarray         # (nj,2)
    jnt_limited: np.ndarray       # (nj,) bool
    jnt_names: tuple

    # --- dof-level (nv) defaults (runtime copies live in PhysParams) ---
    dof_armature: np.ndarray      # (nv,)
    dof_damping: np.ndarray       # (nv,)
    dof_stiffness: np.ndarray     # (nv,) joint spring to springref (=0)
    dof_frictionloss: np.ndarray  # (nv,)
    dof_jnt: np.ndarray           # (nv,) joint owning each dof

    # --- actuators ---
    act_jnt: np.ndarray           # (nu,) target joint index
    act_trntype: np.ndarray       # (nu,) ACT_*
    act_gear: np.ndarray          # (nu,)
    act_ctrlrange: np.ndarray     # (nu,2)
    act_forcerange: np.ndarray    # (nu,2)
    act_kp: np.ndarray            # (nu,) position-servo gains
    act_kd: np.ndarray            # (nu,)
    act_names: tuple

    # --- geoms (collision) ---
    geom_body: np.ndarray         # (ng,) owning body (-1 = world/static)
    geom_type: np.ndarray         # (ng,)
    geom_size: np.ndarray         # (ng,3) type-specific (see io docs)
    geom_pos: np.ndarray          # (ng,3) in body frame
    geom_quat: np.ndarray         # (ng,4)
    geom_friction: np.ndarray     # (ng,3) slide/torsion/roll
    geom_contype: np.ndarray      # (ng,) collision filters
    geom_conaffinity: np.ndarray  # (ng,)
    geom_names: tuple

    # --- defaults ---
    init_qpos: np.ndarray         # (nq,)

    # merged link name → surviving body name (URDF collapse_fixed_joints)
    body_aliases: dict = dataclasses.field(default_factory=dict)

    # --- fixed tendons (MJCF <tendon><fixed>): linear joint couplings ----
    # tendon t spans entries ten_adr[t]:ten_adr[t+1] of (ten_jnt, ten_coef);
    # length L_t = Σ coef·q[jnt]; limited to ten_range (ShadowHand distal
    # couplings, open_ai_assets/hand/shared.xml)
    ten_adr: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(1, np.int32))
    ten_jnt: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.int32))
    ten_coef: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(0, np.float32))
    ten_range: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros((0, 2), np.float32))
    ten_names: tuple = ()

    # per-joint thread pitch [m/turn] for SCREW joints (0 otherwise);
    # None = all zero (models built before screw support)
    jnt_pitch: Any = None

    # tendon limit springs (PhysX tendon limit_stiffness/damping the
    # reference sets per-asset, `tasks/shadow_hand.py:219+`); 0 = hard
    # range constraint (solver limit rows). None = all zero.
    ten_kp: Any = None                # (nt,)
    ten_kd: Any = None                # (nt,)
    # per-geom restitution (PhysX rigid_shape_properties.restitution);
    # None = all zero (perfectly inelastic, the PhysX default)
    geom_restitution_: Any = None     # (ng,)

    @property
    def ntendon(self) -> int:
        return len(self.ten_range)

    def jnt_pitch_arr(self) -> np.ndarray:
        if self.jnt_pitch is None:
            return np.zeros(self.njnt, np.float32)
        return np.asarray(self.jnt_pitch, np.float32)

    def ten_kp_arr(self) -> np.ndarray:
        if self.ten_kp is None:
            return np.zeros(self.ntendon, np.float32)
        return np.asarray(self.ten_kp, np.float32)

    def ten_kd_arr(self) -> np.ndarray:
        if self.ten_kd is None:
            return np.zeros(self.ntendon, np.float32)
        return np.asarray(self.ten_kd, np.float32)

    def geom_restitution_arr(self) -> np.ndarray:
        if self.geom_restitution_ is None:
            return np.zeros(self.ngeom, np.float32)
        return np.asarray(self.geom_restitution_, np.float32)

    def dof_limits(self) -> tuple:
        """(lower (nv,), upper (nv,)) per-dof limits expanded from
        jnt_range; unlimited / multi-dof joints get ∓1e9."""
        lo = np.full(self.nv, -1e9, np.float32)
        hi = np.full(self.nv, 1e9, np.float32)
        for ji in range(self.njnt):
            if not self.jnt_limited[ji]:
                continue
            if int(self.jnt_type[ji]) not in (HINGE, SLIDE, SCREW):
                continue
            va = int(self.jnt_vadr[ji])
            lo[va] = self.jnt_range[ji][0]
            hi[va] = self.jnt_range[ji][1]
        return lo, hi

    @property
    def nbody(self) -> int:
        return len(self.body_parent)

    @property
    def njnt(self) -> int:
        return len(self.jnt_type)

    @property
    def nq(self) -> int:
        return int(self.jnt_qadr[-1] + JOINT_NQ[int(self.jnt_type[-1])]) if self.njnt else 0

    @property
    def nv(self) -> int:
        return int(self.jnt_vadr[-1] + JOINT_NV[int(self.jnt_type[-1])]) if self.njnt else 0

    @property
    def nu(self) -> int:
        return len(self.act_jnt)

    @property
    def ngeom(self) -> int:
        return len(self.geom_type)

    # hashable-by-identity so it can be a static arg to jit
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def body_index(self, name: str) -> int:
        if name not in self.body_names and name in self.body_aliases:
            name = self.body_aliases[name]
        return self.body_names.index(name)

    def jnt_index(self, name: str) -> int:
        return self.jnt_names.index(name)

    def geom_index(self, name: str) -> int:
        return self.geom_names.index(name)

    def default_phys_params(self) -> "PhysParams":
        import jax.numpy as jnp
        lo, hi = self.dof_limits()
        return PhysParams(
            body_mass=jnp.asarray(self.body_mass),
            body_com=jnp.asarray(self.body_com),
            body_inertia=jnp.asarray(self.body_inertia),
            dof_armature=jnp.asarray(self.dof_armature),
            dof_damping=jnp.asarray(self.dof_damping),
            dof_stiffness=jnp.asarray(self.dof_stiffness),
            dof_frictionloss=jnp.asarray(self.dof_frictionloss),
            act_gear=jnp.asarray(self.act_gear),
            act_kp=jnp.asarray(self.act_kp),
            act_kd=jnp.asarray(self.act_kd),
            geom_friction=jnp.asarray(self.geom_friction[:, 0]),
            dof_lower=jnp.asarray(lo),
            dof_upper=jnp.asarray(hi),
            ten_kp=jnp.asarray(self.ten_kp_arr()),
            ten_kd=jnp.asarray(self.ten_kd_arr()),
            geom_restitution=jnp.asarray(self.geom_restitution_arr()),
            geom_scale=jnp.ones(self.ngeom, jnp.float32),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PhysParams:
    """Runtime physical parameters — a pytree; every leaf may carry a
    leading env axis for per-env domain randomization."""

    body_mass: Any
    body_com: Any
    body_inertia: Any
    dof_armature: Any
    dof_damping: Any
    dof_stiffness: Any
    dof_frictionloss: Any
    act_gear: Any
    act_kp: Any
    act_kd: Any
    geom_friction: Any  # (ng,) sliding friction coefficient
    # DR-extended surface (reference dof/tendon/shape props,
    # `utils/dr_utils.py:35-68`); None on params built before round 2 —
    # physics falls back to the static model values
    dof_lower: Any = None        # (nv,) joint lower limits
    dof_upper: Any = None        # (nv,)
    ten_kp: Any = None           # (nt,) tendon limit stiffness
    ten_kd: Any = None           # (nt,) tendon limit damping
    geom_restitution: Any = None  # (ng,)
    geom_scale: Any = None       # (ng,) collision-geometry scale factor


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SimParams:
    """Solver configuration. Static fields only (hashed into the jit
    cache) — the analogue of `VecTask.__parse_sim_params`
    (`vec_task.py:442-490`)."""

    dt: float = 1.0 / 60.0
    substeps: int = 2
    gravity: tuple = (0.0, 0.0, -9.81)
    # impulse (LCP) solver — the default, PhysX-equivalent path
    solver: str = "impulse"              # "impulse" | "compliant"
    solver_iterations: int = 16          # maps PhysX num_velocity_iterations
    contact_beta: float = 0.2            # Baumgarte stabilization factor
    # MuJoCo-style contact compliance (solref defaults (0.02, 1.0) —
    # part of the MJCF assets' semantics): contact NORMAL rows get CFM
    # regularization for a spring-damper with this time constant at the
    # row's effective mass; friction rows stay hard. 0.0 = fully hard
    # (round-1 behavior). Measured tradeoffs (runs/ant_*):
    #   * regularizing friction rows too reproduces MuJoCo's passive
    #     slip-squat exactly (z=0.38) but makes stance feet creep and
    #     drops Ant training from +3269 to +751 at epoch 900;
    #   * normal-only compliance keeps soft landings without slip.
    # dampratio 2.0 rather than MuJoCo's 1.0: the velocity-level
    # discretization needs the extra damping to settle cleanly
    # (ζ=1 leaves a 0.2 rad/s limit-cycle wobble, ζ=2 settles to 1e-4).
    # DEFAULT 0.0 (hard): softened normal rows reduce transient support
    # (Anymal zero-action stance sinks 0.48→0.35 m) and every
    # soft-contact Ant training run underperformed the hard-contact one
    # (+825/+751/+1414 vs +3269 at comparable budgets) — compliance is
    # an opt-in research knob, not the product default.
    contact_timeconst: float = 0.0
    contact_dampratio: float = 2.0
    # MuJoCo-style JOINT-LIMIT compliance (solreflimit; MuJoCo default
    # solref (0.02, 1) applies to limit rows too). A standing humanoid
    # leans on its knee extension stops — hard limit rows make that a
    # rigid wall where MuJoCo gives a stiff spring-damper, and the
    # difference dominates biped balance dynamics. 0.0 = hard rows.
    limit_timeconst: float = 0.0
    limit_dampratio: float = 1.0
    # carry APGD impulses across substeps as the next solve's starting
    # point (PhysX warm-starts contacts the same way): persistent
    # contacts converge in far fewer sweeps, letting solver_iterations
    # drop at equal solution quality. Off by default (changes iterate
    # paths → trajectories; goldens pinned to cold starts).
    warmstart_solver: bool = False
    # optional friction-row compliance with its OWN (stiffer) time
    # constant: micro-slip regularization for foot-rocking bipeds
    # without the gross stance creep of equal-softness friction.
    # 0.0 = hard friction (default).
    friction_timeconst: float = 0.0
    # compute the mass matrix (CRBA + inverse) once per CONTROL step and
    # reuse it across substeps (PhysX assembles articulation mass data
    # once per step). DEFAULT OFF: despite the CRBA/inverse fusions
    # showing ~20% in the op profile, the measured A/B says hoisting
    # them REGRESSES Ant-4096 stepping 593K→512K steps/s — the
    # out-of-loop computation serializes against the substep scan
    # instead of fusing into it. Kept as a knob for future scheduling
    # work.
    freeze_mass_matrix: bool = False
    # contact capping (PhysX max_gpu_contact_pairs analogue): when > 0,
    # the impulse solver keeps only the K deepest contact candidates per
    # env per substep. Static candidate enumeration makes hand/
    # manipulation scenes carry hundreds of rows of which ~a dozen are
    # ever active (ShadowHand: 266 candidates → 854 solver rows); the
    # cap turns J assembly and every APGD matvec from O(candidates)
    # into O(K). Identical solution whenever actives fit in K.
    # 0 = solve all candidates (exact round-1 behavior).
    max_contact_points: int = 0
    # speculative-contact margin (PhysX contactOffset, which the
    # reference sets per factory asset — docs/factory.md SDF collision
    # rides on it): candidates within this distance of touching become
    # solver rows whose target is vn ≥ -gap/h, so a body can close at
    # most its remaining gap per substep. Stops fast bodies at thin
    # features (thread crests) instead of tunneling. 0 = contacts only
    # activate at penetration (round-1 behavior).
    contact_margin: float = 0.0
    power_iterations: int = 4            # λmax power-iteration count
    max_depenetration_velocity: float = 100.0
    bounce_threshold: float = 0.2        # PhysX bounce_threshold_velocity
    # compliant (penalty) fallback — soft contacts, fully differentiable
    contact_stiffness: float = 1.0e4
    contact_damping_ratio: float = 1.0   # critical damping multiplier
    friction_regularization: float = 0.1  # m/s slip velocity scale
    # joint limits (penalty; only used by the compliant path)
    limit_stiffness: float = 2000.0
    limit_damping_ratio: float = 1.0
    # PhysX-style velocity clamps (asset options max_angular_velocity,
    # e.g. tasks/humanoid.py:158: 100 rad/s; PhysX default 64)
    max_angular_velocity: float = 64.0
    max_linear_velocity: float = 1000.0
    # optional material geom for the ground plane: when >= 0, ground
    # contact friction combines (average, PhysX default mode) the moving
    # geom's friction with this geom's — so a scene's table/floor actor
    # (reference: Trifinger stage actor, trifinger.py:561) is a live DR
    # target (`table.rigid_shape_properties.friction`) instead of the
    # plane being material-less. -1 = plane contributes no material and
    # mu comes from the moving geom alone (round-1/2 behavior).
    ground_material_geom: int = -1
    # store J / M⁻¹Jᵀ in bfloat16 for the APGD matvecs (f32 accumulation):
    # the constraint solve is HBM-bound at hand-task row counts (round-3
    # profile: ~90 ms of the 208 ms ShadowHand-16384 step is J/MinvJT
    # reads) and halving the bytes halves it. Impulses, projections and
    # the final velocity update stay f32. Off by default — opt-in per
    # task config (hand/manipulation scenes).
    solver_matvec_bf16: bool = False

    def __hash__(self):
        return hash((self.dt, self.substeps, self.gravity, self.solver,
                     self.solver_iterations, self.contact_beta,
                     self.power_iterations, self.bounce_threshold,
                     self.contact_timeconst, self.contact_dampratio,
                     self.limit_timeconst, self.limit_dampratio,
                     self.warmstart_solver, self.solver_matvec_bf16,
                     self.friction_timeconst, self.freeze_mass_matrix,
                     self.max_contact_points, self.contact_margin,
                     self.max_depenetration_velocity, self.contact_stiffness,
                     self.contact_damping_ratio, self.friction_regularization,
                     self.limit_stiffness, self.limit_damping_ratio,
                     self.max_angular_velocity, self.max_linear_velocity,
                     self.ground_material_geom))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ArtState:
    """Generalized state of one articulation model, env-batched:
    q: (..., nq), qd: (..., nv)."""

    q: Any
    qd: Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Kinematics:
    """Forward-kinematics products for one step (world frame).

    Replaces the reference's refresh_*_tensor views
    (`tasks/ant.py:78-100`): body poses/velocities are plain arrays
    computed inside the jitted step.
    """

    body_pos: Any    # (..., nb, 3) body frame origin, world
    body_quat: Any   # (..., nb, 4)
    body_vel: Any    # (..., nb, 6) spatial [ω; v] about the reference point
    com: Any         # (..., nb, 3) body COM, world
    # per-dof motion subspace about the reference point, + time derivative
    dof_S: Any       # (..., nv, 6)
    dof_Sdot: Any    # (..., nv, 6)
    # spatial reference point (world): all spatial vectors are expressed
    # about this point, NOT the world origin. Choosing it near the bodies
    # (root body position) keeps the spatial algebra well-conditioned no
    # matter how far an env's robot walks from the origin.
    ref: Any         # (..., 3)
