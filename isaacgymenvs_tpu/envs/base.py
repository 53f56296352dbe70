"""Vectorized-environment runtime — the TPU-native VecTask.

Replaces the reference's `Env` ABC + `VecTask` (`tasks/base/vec_task.py:
60-490`) with a *functional* design: an env is a pair of pure functions

    reset(rng)              → (EnvState, obs)
    step(EnvState, actions) → (EnvState, TimeStep)

entirely jit-compatible. The reference's mutable buffers
(`obs_buf/rew_buf/reset_buf/progress_buf/timeout_buf`, vec_task.py:254-277)
become fields of the EnvState pytree; indexed resets (`reset_idx` +
`set_*_tensor_indexed`) become masked `where`-updates of freshly sampled
reset states — no host sync, ever.

Step semantics preserve the reference's exact ordering
(`vec_task.py:313-359` + task `post_physics_step`):
  1. (DR action noise) → clamp actions → apply forces     (:324-330)
  2. physics substeps                                      (:332-339)
  3. progress += 1; envs flagged done LAST step are reset  (task files)
  4. compute obs (post-reset) → compute reward + new done flags
  5. timeout = (progress ≥ max_len−1) & done               (:345)
  6. (DR obs noise) → clamp obs
so `TimeStep.done` at step T means "this env finished at T and was
freshly reset INSIDE this step's stage 3 of step T+1" — matching
rl_games' value-bootstrap contract (`extras["time_outs"]`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import types as T
from ..physics.collide import build_ground_contacts
from ..physics.step import physics_step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Complete on-device state of all envs (a pytree)."""

    art: T.ArtState          # (N, nq) / (N, nv)
    progress: Any            # (N,) int32 — progress_buf
    done: Any                # (N,) bool — reset_buf (reset next step)
    rng: Any                 # (N, key) per-env RNG keys
    params: Any              # PhysParams (leaves may be (N, ...) under DR)
    aux: Dict[str, Any]      # task-specific batched fields
    dr_count: Any            # (N,) int32 — randomize_buf equivalent
    step_count: Any = None   # () int32 — global frame counter
    dr: Dict[str, Any] = dataclasses.field(default_factory=dict)
    # ^ DR runtime state: correlated-noise samples, gravity override


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TimeStep:
    obs: Any                 # (N, num_obs)
    reward: Any              # (N,)
    done: Any                # (N,) bool
    timeout: Any             # (N,) bool — extras["time_outs"]
    info: Dict[str, Any]     # scalar/vector diagnostics (episode sums etc.)
    states: Any = None       # (N, num_states) asymmetric-critic states


class VecTask:
    """Base class for all task environments.

    Subclasses set: model (ArticulationModel), sim (SimParams), num_obs,
    num_acts, max_episode_length, and implement the three task hooks
    (all BATCHED, operating on (N, ...) arrays, mirroring the reference's
    @torch.jit.script kernels at each task file's bottom):

      _sample_reset(state, key)      → (q (N,nq), qd (N,nv), aux dict)
      _observe(state, info)          → (obs (N, num_obs), aux_updates dict)
      _reward_done(state, obs, actions, info) → (rew, done, task_info)

    aux_updates from _observe are merged into state.aux BEFORE
    _reward_done runs (the reference's compute_observations also updates
    potentials consumed by compute_reward, `tasks/ant.py:236-244`).

    plus optionally _pre_physics (custom force application) and
    _randomize (DR hook).
    """

    model: T.ArticulationModel
    sim: T.SimParams
    num_obs: int
    num_states: int = 0
    num_acts: int = 0
    max_episode_length: int = 1000
    clip_obs: float = np.inf
    clip_actions: float = np.inf
    control_freq_inv: int = 1
    height_fn = None  # terrain heightfield lookup
    pair_contacts = None  # static body-pair candidates (PairSet)
    attractors = None     # static pin constraints (solver.Attractors)
    refresh_kin_on_reset: bool = False
    safety_guard: bool = True   # non-finite/runaway state → terminate env
    safety_limit: float = 1e3   # |q| beyond this = blown (1 km arena)

    def __init__(self, cfg: Optional[dict] = None, num_envs: int = 4096):
        self.cfg = cfg or {}
        self.num_envs = num_envs
        task_cfg = self.cfg.get("task", {}) or {}
        self.randomize = bool(task_cfg.get("randomize", False))
        self._dr_params = task_cfg.get("randomization_params", {}) or {}
        self._dr = None

    @property
    def dr(self):
        """Lazily-built DomainRandomizer (model exists after subclass init).
        Replaces `apply_randomizations` (vec_task.py:538-768)."""
        if not self.randomize:
            return None
        if self._dr is None:
            from ..dr.engine import DomainRandomizer
            self._dr = DomainRandomizer(self._dr_params, self.model)
        return self._dr

    # ------------------------------------------------------------------ api
    @property
    def observation_space(self):
        return ("Box", (-self.clip_obs, self.clip_obs), (self.num_obs,))

    @property
    def action_space(self):
        return ("Box", (-self.clip_actions, self.clip_actions),
                (self.num_acts,))

    @property
    def state_space(self):
        return ("Box", (-self.clip_obs, self.clip_obs), (self.num_states,))

    def reset(self, rng) -> tuple:
        """Build initial EnvState + first observations. Mirrors
        `VecTask.reset` returning obs without stepping physics
        (vec_task.py:377-389)."""
        n = self.num_envs
        keys = jax.random.split(rng, n + 1)
        params = self._initial_params(keys[0])
        dr_state = {}
        if self.dr is not None:
            dr = self.dr
            kg, kc1, kc2, kp = jax.random.split(
                jax.random.fold_in(keys[0], 99), 4)
            if dr.randomizes_params:
                base = self.model.default_phys_params()
                if params.body_mass.ndim == base.body_mass.ndim:  # untiled
                    params = dr.tile_params(params, n)
                pkeys = jax.random.split(kp, n)
                params = dr.randomize_params(
                    base, params, pkeys, jnp.ones(n, bool), jnp.zeros(()))
            dr_state = {
                "corr_obs": dr.sample_corr(kc1, (n, self.num_obs), "obs"),
                "corr_act": dr.sample_corr(kc2, (n, self.num_acts), "act"),
                "gravity": dr.randomize_gravity(self.sim.gravity, kg,
                                                jnp.zeros(())),
            }
        state = EnvState(
            art=T.ArtState(
                q=jnp.tile(jnp.asarray(self.model.init_qpos), (n, 1)),
                qd=jnp.zeros((n, self.model.nv))),
            progress=jnp.zeros(n, jnp.int32),
            done=jnp.zeros(n, bool),
            rng=keys[1:],
            params=params,
            aux=self._initial_aux(),
            dr_count=jnp.zeros(n, jnp.int32),
            step_count=jnp.zeros((), jnp.int32),
            dr=dr_state,
        )
        # sample proper reset states for all envs
        reset_keys = jax.vmap(lambda k: jax.random.fold_in(k, 0))(state.rng)
        q, qd, aux_new = self._sample_reset(state, reset_keys)
        state = dataclasses.replace(
            state, art=T.ArtState(q=q, qd=qd),
            aux={**state.aux, **aux_new})
        info = self._fake_info(state)
        obs, aux_up = self._observe(state, info)
        state = dataclasses.replace(state, aux={**state.aux, **aux_up})
        return state, jnp.clip(obs, -self.clip_obs, self.clip_obs)

    def step(self, state: EnvState, actions) -> tuple:
        """One control step for all envs — pure, jit this."""
        n = self.num_envs
        step_count = (state.step_count if state.step_count is not None
                      else jnp.zeros((), jnp.int32))
        # DR action noise BEFORE clamp (vec_task.py:324-327)
        if self.dr is not None and self.dr.act_spec is not None:
            k_act = jax.random.fold_in(
                jax.random.fold_in(state.rng[0], 11), step_count)
            actions = self.dr.action_noise(actions, k_act,
                                           state.dr["corr_act"], step_count)
        actions = jnp.clip(actions, -self.clip_actions, self.clip_actions)
        if "actions" in state.aux:  # tasks exposing last actions in obs
            state = dataclasses.replace(
                state, aux={**state.aux, "actions": actions})

        # --- stage 1-2: physics ------------------------------------------
        new_art, info = self._physics(state, actions)

        # --- safety: explosion/NaN guard ----------------------------------
        # PhysX cannot produce NaN state the way an iterative ABA+APGD
        # stack can under extreme configurations (observed: A1Terrain
        # round-3 run went NaN at ~epoch 115 and, because NaN comparisons
        # are False, its done flags never fired again — 550 epochs of NaN
        # "training"). A blown env here is (a) sanitized so the state
        # pytree stays finite, (b) force-terminated (done, not timeout —
        # no value bootstrap), (c) given zero obs/reward for the one
        # garbage frame. Identity for finite state, so golden
        # bit-stability is unaffected.
        blown = jnp.zeros(n, bool)
        if self.safety_guard:
            # A velocity pinned at the PhysX-style clamp is only a blown
            # signal when the clamp is the huge default (1000 m/s): then
            # hitting 0.95×clamp is never legitimate dynamics — flag it
            # immediately rather than letting the env rack up ~-2700/step
            # rewards until the position bound trips (trifinger_r4 ep 3).
            # But a scene that DECLARES a tight clamp as a stabilizer
            # (Factory: 1 m/s + 2π rad/s, envs/factory/base.py:96, the
            # PhysX add_damping idiom) legitimately rides the clamp — a
            # nut in free fall passes 0.95 m/s within 0.1 s — so the
            # per-dof rule is disabled where the configured clamp is
            # small. Position/NaN checks still protect those dofs.
            from ..physics.step import _vmax_np
            import numpy as np
            vmax = _vmax_np(self.model, self.sim.max_angular_velocity,
                            self.sim.max_linear_velocity)
            vel_thr = jnp.asarray(np.minimum(
                np.where(vmax >= 100.0, 0.95 * vmax, np.inf),
                self.safety_limit).astype(np.float32))
            blown = (~jnp.all(jnp.isfinite(new_art.q), -1)
                     | ~jnp.all(jnp.isfinite(new_art.qd), -1)
                     | (jnp.max(jnp.abs(new_art.q), -1) > self.safety_limit)
                     | jnp.any(jnp.abs(new_art.qd) > vel_thr, -1))

            def _san(x):
                return jnp.clip(
                    jnp.nan_to_num(x, nan=0.0, posinf=self.safety_limit,
                                   neginf=-self.safety_limit),
                    -self.safety_limit, self.safety_limit)

            new_art = T.ArtState(q=_san(new_art.q), qd=_san(new_art.qd))
            # info (kinematics/contact forces) for blown envs is garbage —
            # sanitize so downstream obs kernels can't re-import NaN
            info = jax.tree_util.tree_map(
                lambda x: jnp.where(
                    blown.reshape((n,) + (1,) * (x.ndim - 1)), _san(x), x)
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[:1] == (n,)
                else x, info)

        # --- stage 3: progress + masked auto-reset ------------------------
        progress = state.progress + 1
        rng = jax.vmap(lambda k: jax.random.fold_in(k, 1))(state.rng)
        reset_keys = jax.vmap(lambda k: jax.random.fold_in(k, 2))(state.rng)
        mid_state = dataclasses.replace(state, art=new_art,
                                        progress=progress, rng=rng)
        q_r, qd_r, aux_r = self._sample_reset(mid_state, reset_keys)
        d = state.done

        def sel(new, old):
            mask = d.reshape((n,) + (1,) * (old.ndim - 1))
            return jnp.where(mask, new, old)

        art = T.ArtState(q=sel(q_r, new_art.q), qd=sel(qd_r, new_art.qd))
        aux = dict(mid_state.aux)
        for k, v in aux_r.items():
            aux[k] = sel(v, aux[k])
        progress = jnp.where(d, 0, progress)

        # --- DR re-randomization on reset ∧ frequency (vec_task.py:548-566)
        dr_count = state.dr_count + 1
        params = mid_state.params
        dr_state = dict(state.dr)
        if self.dr is not None:
            dr = self.dr
            rand_mask = d & (state.dr_count >= dr.frequency)
            if dr.randomizes_params:
                base = self.model.default_phys_params()
                pkeys = jax.vmap(lambda k: jax.random.fold_in(k, 4))(state.rng)
                params = dr.randomize_params(base, params, pkeys, rand_mask,
                                             step_count)
            dr_count = jnp.where(rand_mask, 0, dr_count)
            # refresh correlated noise + gravity on the global cadence
            kg = jax.random.fold_in(
                jax.random.fold_in(state.rng[0], 13), step_count)
            kc1, kc2, kg2 = jax.random.split(kg, 3)
            if dr.obs_spec is not None:
                new_c = dr.sample_corr(kc1, (n, self.num_obs), "obs")
                dr_state["corr_obs"] = jnp.where(
                    rand_mask[:, None], new_c, dr_state["corr_obs"])
            if dr.act_spec is not None:
                new_c = dr.sample_corr(kc2, (n, self.num_acts), "act")
                dr_state["corr_act"] = jnp.where(
                    rand_mask[:, None], new_c, dr_state["corr_act"])
            if dr.gravity_spec is not None:
                refresh = (step_count + 1) % dr.frequency == 0
                new_g = dr.randomize_gravity(self.sim.gravity, kg2,
                                             step_count)
                dr_state["gravity"] = jnp.where(refresh, new_g,
                                                dr_state["gravity"])

        state = dataclasses.replace(mid_state, art=art, progress=progress,
                                    aux=aux, dr_count=dr_count, params=params,
                                    step_count=step_count + 1, dr=dr_state)

        # optionally recompute kinematics for reset envs. Default OFF: the
        # reference likewise computes post-reset obs from tensors refreshed
        # before the reset writes landed (sensor staleness for 1 step).
        if self.refresh_kin_on_reset:
            info = self._refresh_info(state, info, d)

        # --- stage 4: obs + reward ----------------------------------------
        obs, aux_up = self._observe(state, info)
        state = dataclasses.replace(state, aux={**state.aux, **aux_up})
        out = self._reward_done(state, obs, actions, info)
        if len(out) == 4:  # optional trailing aux updates (air time, last_*)
            reward, done, task_info, aux_up2 = out
            state = dataclasses.replace(state, aux={**state.aux, **aux_up2})
        else:
            reward, done, task_info = out

        # --- stage 5: timeout (exact vec_task.py:345 semantics) ------------
        timeout = (state.progress >= self.max_episode_length - 1) & done

        if self.safety_guard:
            # blown envs: terminate (reset happens next step's stage 3),
            # zero the garbage frame so it can't reach the learner
            done = done | blown
            reward = jnp.where(blown, 0.0, reward)
            obs = jnp.where(blown[:, None], 0.0, obs)
            task_info = {**task_info, "safety_blown": jnp.sum(blown)}

        state = dataclasses.replace(state, done=done)
        # DR obs noise BEFORE clamp (vec_task.py:347-353)
        if self.dr is not None and self.dr.obs_spec is not None:
            k_obs = jax.random.fold_in(
                jax.random.fold_in(state.rng[0], 12), step_count)
            obs = self.dr.obs_noise(obs, k_obs, state.dr["corr_obs"],
                                    step_count)
        obs = jnp.clip(obs, -self.clip_obs, self.clip_obs)
        states = self._states(state, info)
        if states is not None and self.safety_guard:
            states = jnp.where(blown[:, None], 0.0, states)
        ts = TimeStep(obs=obs, reward=reward, done=done, timeout=timeout,
                      info=task_info, states=states)
        return state, ts

    # ------------------------------------------------------------- plumbing
    def _physics(self, state: EnvState, actions):
        """Default physics: per-env vmap of physics_step with actuator ctrl.

        Tasks with custom force application (thrusters, decimated PD
        loops) override this."""
        contacts = build_ground_contacts(self.model)
        params_batched = self._params_batched()
        actions = self._action_to_ctrl(actions)
        gravity = state.dr.get("gravity")

        def one(art, ctrl, params):
            return physics_step(self.model, self.sim, params, art, ctrl=ctrl,
                                contacts=contacts, height_fn=self.height_fn,
                                n_substeps=self.sim.substeps
                                * self.control_freq_inv, gravity=gravity,
                                pair_contacts=self.pair_contacts,
                                attractors=self.attractors)

        in_axes = (0, 0, 0 if params_batched else None)
        return jax.vmap(one, in_axes=in_axes)(state.art, actions,
                                              state.params)

    def _action_to_ctrl(self, actions):
        """Map policy actions → actuator controls (e.g. PD position targets
        `action_scale·a + default_dof_pos`, `tasks/anymal.py:230-232`)."""
        return actions

    def _params_batched(self) -> bool:
        return self.dr is not None and self.dr.randomizes_params

    def _initial_params(self, key):
        return self.model.default_phys_params()

    def _initial_aux(self) -> dict:
        return {}

    def _batched_fk(self, state):
        from ..physics.kinematics import forward_kinematics
        in_axes = (0, 0, 0 if self._params_batched() else None)
        return jax.vmap(
            lambda q, qd, p: forward_kinematics(self.model, p, q, qd),
            in_axes=in_axes)(state.art.q, state.art.qd, state.params)

    def _fake_info(self, state):
        """Info for the first reset() observation: run FK only."""
        from ..physics.step import StepInfo
        kin = self._batched_fk(state)
        nb = self.model.nbody
        n = self.num_envs
        z3 = jnp.zeros((n, nb, 3))
        return StepInfo(kin=kin, body_contact_force=z3,
                        body_contact_torque=z3,
                        qdd=jnp.zeros((n, self.model.nv)),
                        tau=jnp.zeros((n, self.model.nv)))

    def _refresh_info(self, state, info, done_mask):
        """Recompute kinematics where envs were reset (their info is stale)."""
        kin_new = self._batched_fk(state)
        m = done_mask

        def sel(new, old):
            mask = m.reshape((self.num_envs,) + (1,) * (old.ndim - 1))
            return jnp.where(mask, new, old)

        kin = jax.tree_util.tree_map(sel, kin_new, info.kin)
        return dataclasses.replace(info, kin=kin)

    def _states(self, state, info):
        return None

    # ------------------------------------------------------------ task hooks
    def _sample_reset(self, state: EnvState, keys):
        raise NotImplementedError

    def _observe(self, state: EnvState, info):
        raise NotImplementedError

    def _reward_done(self, state: EnvState, obs, actions, info):
        raise NotImplementedError
