"""Domain-randomization engine — TPU-native.

Reference semantics (`tasks/base/vec_task.py:496-768`, `utils/dr_utils.py`,
`docs/domain_randomization.md`):
  * four groups: `observations` / `actions` (white + correlated noise),
    `sim_params` (gravity), `actor_params` (body/dof/shape properties);
  * distributions gaussian / uniform / loguniform; operations additive /
    scaling — always applied to the ORIGINAL property value, never
    compounded (`dr_utils.py:35-68` original_props);
  * `frequency` gating: an env re-randomizes on reset once ≥ frequency
    steps have passed since its last randomization (`vec_task.py:548-566`,
    randomize_buf); noise closures refresh on the same cadence;
  * linear / constant schedules ramping the randomization strength by
    global frame count (`dr_utils.py:82-87`).

TPU-native design: the reference loops over envs on the host ("not
tensorised yet", `vec_task.py:680-756`); here randomized physics params are
batched per-env arrays inside PhysParams, resampled with masked `where`
under jit — strictly more capable (mass/scale are `setup_only` in the
reference because PhysX can't change them after prepare_sim; here
everything is runtime-randomizable).

Property name mapping (reference gymapi props → PhysParams fields):
  rigid_body_properties.mass        → body_mass        (per body)
  rigid_shape_properties.friction   → geom_friction    (per geom)
  rigid_shape_properties.restitution→ geom_restitution (per geom)
  dof_properties.damping            → dof_damping      (per dof)
  dof_properties.stiffness          → dof_stiffness
  dof_properties.friction           → dof_frictionloss
  dof_properties.armature           → dof_armature
  dof_properties.lower/upper        → dof_lower/dof_upper (solver limit rows)
  tendon_properties.stiffness/damping → ten_kp/ten_kd  (tendon-row CFM)
  <actor>.scale                     → geom_scale       (runtime collision
                                      scaling — PhysX needed setup_only)
  sim_params.gravity                → gravity override (global, traced)
All actor_params specs are scoped to the named actor's body/dof/geom/
tendon index range (model.actor_slices). `color` (visual) is ignored.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..core import types as T

_PROP_MAP = {
    ("rigid_body_properties", "mass"): "body_mass",
    ("rigid_shape_properties", "friction"): "geom_friction",
    ("rigid_shape_properties", "restitution"): "geom_restitution",
    ("dof_properties", "damping"): "dof_damping",
    ("dof_properties", "stiffness"): "dof_stiffness",
    ("dof_properties", "friction"): "dof_frictionloss",
    ("dof_properties", "armature"): "dof_armature",
    ("dof_properties", "lower"): "dof_lower",
    ("dof_properties", "upper"): "dof_upper",
    ("tendon_properties", "stiffness"): "ten_kp",
    ("tendon_properties", "damping"): "ten_kd",
}

# which actor-slice axis each PhysParams field indexes (per-actor scoping
# of the reference's actor_params trees — DR on `hand` must not touch
# `object` bodies)
_FIELD_AXIS = {
    "body_mass": "body", "body_com": "body", "body_inertia": "body",
    "dof_damping": "v", "dof_stiffness": "v", "dof_frictionloss": "v",
    "dof_armature": "v", "dof_lower": "v", "dof_upper": "v",
    "geom_friction": "geom", "geom_restitution": "geom",
    "geom_scale": "geom", "ten_kp": "ten", "ten_kd": "ten",
}


@dataclasses.dataclass(frozen=True)
class AttrSpec:
    field: str          # PhysParams field name
    distribution: str   # gaussian | uniform | loguniform
    operation: str      # additive | scaling
    range: tuple
    schedule: Optional[str] = None
    schedule_steps: int = 1
    setup_only: bool = False
    mask: Any = None    # (item,) bool — actor scope; None = whole model
    uniform_sample: bool = False  # one sample shared across the actor's
    #                               items (actor `scale`: one factor)


@dataclasses.dataclass(frozen=True)
class NoiseSpec:
    distribution: str
    operation: str
    range: tuple
    range_correlated: tuple = (0.0, 0.0)
    schedule: Optional[str] = None
    schedule_steps: int = 1


def _parse_noise(d: dict) -> NoiseSpec:
    return NoiseSpec(
        distribution=d.get("distribution", "gaussian"),
        operation=d.get("operation", "additive"),
        range=tuple(d.get("range", (0.0, 0.0))),
        range_correlated=tuple(d.get("range_correlated", (0.0, 0.0))),
        schedule=d.get("schedule"),
        schedule_steps=int(d.get("schedule_steps", 1)),
    )


class DomainRandomizer:
    """Parsed randomization_params + batched sampling ops (all pure)."""

    def __init__(self, params: Dict[str, Any], model: T.ArticulationModel):
        self.frequency = int(params.get("frequency", 1))
        self.obs_spec = (_parse_noise(params["observations"])
                         if "observations" in params else None)
        self.act_spec = (_parse_noise(params["actions"])
                         if "actions" in params else None)
        self.gravity_spec = None
        sp = params.get("sim_params", {})
        if "gravity" in sp:
            g = sp["gravity"]
            self.gravity_spec = AttrSpec(
                field="gravity", distribution=g.get("distribution", "gaussian"),
                operation=g.get("operation", "additive"),
                range=tuple(g.get("range", (0.0, 0.0))),
                schedule=g.get("schedule"),
                schedule_steps=int(g.get("schedule_steps", 1)))

        import numpy as np
        slices = getattr(model, "actor_slices", None) if model else None

        def scope_mask(field, actor):
            """(item,) bool scoping the spec to one actor's indices."""
            kind = _FIELD_AXIS[field]
            if model is None or not slices:
                return None  # single-actor model / noise-only DR: whole model
            if actor not in slices:
                # config names an actor the scene doesn't build: a task
                # YAML / scene mismatch would silently drop the spec —
                # hard error so it can't rot unnoticed (the reference
                # would KeyError in get_actor_params_info the same way)
                raise ValueError(
                    f"DR actor {actor!r} not in scene actors "
                    f"{sorted(slices)} — task config and scene disagree")
            if kind not in slices[actor]:
                # actor exists but has no entities of this kind (e.g.
                # tendon DR on a tendon-less robot): inert by nature
                import warnings
                warnings.warn(f"DR actor {actor!r} has no {kind!r} axis "
                              "— spec ignored")
                sizes = {"body": model.nbody, "v": model.nv,
                         "geom": model.ngeom, "ten": model.ntendon}
                return np.zeros(sizes[kind], bool)
            sizes = {"body": model.nbody, "v": model.nv,
                     "geom": model.ngeom, "ten": model.ntendon}
            m = np.zeros(sizes[kind], bool)
            a, b = slices[actor][kind]
            m[a:b] = True
            return m

        self.attr_specs = []
        for actor, props in params.get("actor_params", {}).items():
            for prop_name, attrs in props.items():
                if prop_name == "color":
                    continue  # visual only
                if prop_name == "scale":
                    # actor-level geometry scale: ONE factor per env per
                    # actor, applied to the actor's collision geoms at
                    # runtime (the reference can only do this setup_only,
                    # docs/domain_randomization.md:96-100)
                    self.attr_specs.append(AttrSpec(
                        field="geom_scale",
                        distribution=attrs.get("distribution", "uniform"),
                        operation=attrs.get("operation", "scaling"),
                        range=tuple(attrs.get("range", (1.0, 1.0))),
                        schedule=attrs.get("schedule"),
                        schedule_steps=int(attrs.get("schedule_steps", 1)),
                        setup_only=attrs.get("setup_only", False),
                        mask=scope_mask("geom_scale", actor),
                        uniform_sample=True))
                    continue
                for attr, ap in attrs.items():
                    key = (prop_name, attr)
                    if key not in _PROP_MAP:
                        continue
                    field = _PROP_MAP[key]
                    self.attr_specs.append(AttrSpec(
                        field=field,
                        distribution=ap.get("distribution", "uniform"),
                        operation=ap.get("operation", "scaling"),
                        range=tuple(ap.get("range", (1.0, 1.0))),
                        schedule=ap.get("schedule"),
                        schedule_steps=int(ap.get("schedule_steps", 1)),
                        setup_only=ap.get("setup_only", False),
                        mask=scope_mask(field, actor)))
        self.model = model

    # ------------------------------------------------------------- schedules
    @staticmethod
    def _sched_scale(spec, step):
        if spec.schedule == "linear":
            return jnp.minimum(step / spec.schedule_steps, 1.0)
        if spec.schedule == "constant":
            return (step >= spec.schedule_steps).astype(jnp.float32)
        return jnp.asarray(1.0)

    # --------------------------------------------------------------- sampling
    @staticmethod
    def _sample(spec, key, shape, sched):
        """Raw randomization sample per dr_utils.generate_random_samples."""
        dist = spec.distribution
        op = spec.operation
        if dist == "gaussian":
            mu, var = spec.range
            if op == "additive":
                mu, var = mu * sched, var * sched
            else:
                var = var * sched
                mu = mu * sched + 1.0 * (1.0 - sched)
            return mu + var * jax.random.normal(key, shape)
        if dist == "loguniform":
            lo, hi = spec.range
            if op == "additive":
                lo, hi = lo * sched, hi * sched
            else:
                lo = lo * sched + 1.0 * (1.0 - sched)
                hi = hi * sched + 1.0 * (1.0 - sched)
            u = jax.random.uniform(key, shape)
            return jnp.exp(jnp.log(lo) + u * (jnp.log(hi) - jnp.log(lo)))
        lo, hi = spec.range
        if op == "additive":
            lo, hi = lo * sched, hi * sched
        else:
            lo = lo * sched + 1.0 * (1.0 - sched)
            hi = hi * sched + 1.0 * (1.0 - sched)
        return lo + jax.random.uniform(key, shape) * (hi - lo)

    @staticmethod
    def _apply(spec, value, sample):
        return value + sample if spec.operation == "additive" \
            else value * sample

    # ----------------------------------------------------------- noise groups
    def _noise(self, spec: NoiseSpec, x, key, corr, step):
        """White + correlated noise (vec_task.py:607-646). `corr` is the
        per-env N(0,1)/U(0,1) base sample held between randomizations."""
        sched = self._sched_scale(spec, step)
        k1, _ = jax.random.split(key)
        if spec.distribution == "gaussian":
            mu, var = spec.range
            mu_c, var_c = spec.range_correlated
            if spec.operation == "additive":
                mu, var = mu * sched, var * sched
                mu_c, var_c = mu_c * sched, var_c * sched
            else:
                var, var_c = var * sched, var_c * sched
                mu = mu * sched + (1.0 - sched)
                mu_c = mu_c * sched + (1.0 - sched)
            noise = corr * var_c + mu_c \
                + jax.random.normal(k1, x.shape) * var + mu
        else:
            lo, hi = spec.range
            lo_c, hi_c = spec.range_correlated
            if spec.operation == "additive":
                lo, hi = lo * sched, hi * sched
                lo_c, hi_c = lo_c * sched, hi_c * sched
            else:
                lo = lo * sched + (1.0 - sched)
                hi = hi * sched + (1.0 - sched)
                lo_c = lo_c * sched + (1.0 - sched)
                hi_c = hi_c * sched + (1.0 - sched)
            noise = corr * (hi_c - lo_c) + lo_c \
                + jax.random.uniform(k1, x.shape) * (hi - lo) + lo
        return x + noise if spec.operation == "additive" else x * noise

    def obs_noise(self, obs, key, corr, step):
        if self.obs_spec is None:
            return obs
        return self._noise(self.obs_spec, obs, key, corr, step)

    def action_noise(self, actions, key, corr, step):
        if self.act_spec is None:
            return actions
        return self._noise(self.act_spec, actions, key, corr, step)

    def sample_corr(self, key, shape, spec_kind: str):
        """Correlated-noise base sample, refreshed on randomization events."""
        spec = self.obs_spec if spec_kind == "obs" else self.act_spec
        if spec is None:
            return jnp.zeros(shape)
        if spec.distribution == "gaussian":
            return jax.random.normal(key, shape)
        return jax.random.uniform(key, shape)

    # --------------------------------------------------------- actor params
    @property
    def randomizes_params(self) -> bool:
        return bool(self.attr_specs)

    def tile_params(self, base: T.PhysParams, num_envs: int) -> T.PhysParams:
        tile = lambda x: jnp.broadcast_to(
            jnp.asarray(x), (num_envs,) + jnp.asarray(x).shape)
        return jax.tree_util.tree_map(tile, base)

    def randomize_params(self, base: T.PhysParams, current: T.PhysParams,
                         keys, mask, step) -> T.PhysParams:
        """Resample randomized fields where `mask`; keep `current` elsewhere.

        base: un-tiled default params (leaves without env axis).
        current: batched params (leaves with leading env axis N).
        keys: (N,) per-env PRNG keys. mask: (N,) bool.
        """
        if not self.attr_specs:
            return current
        n = mask.shape[0]
        out = current
        for i, spec in enumerate(self.attr_specs):
            cur = getattr(out, spec.field)
            base_v = jnp.asarray(getattr(base, spec.field))
            sched = self._sched_scale(spec, step)
            # one shared sample per env for actor-level scale; otherwise
            # independent per item (dr_utils samples per property entry)
            shape = () if spec.uniform_sample else cur.shape[1:]

            def one(k):
                s = self._sample(spec, jax.random.fold_in(k, 1000 + i),
                                 shape, sched)
                return jnp.broadcast_to(s, cur.shape[1:])

            samples = jax.vmap(one)(keys)
            new_v = self._apply(spec, base_v[None], samples)
            m = mask.reshape((n,) + (1,) * (cur.ndim - 1))
            if spec.mask is not None:
                fm = jnp.asarray(spec.mask).reshape(
                    (1, -1) + (1,) * (cur.ndim - 2))
                new_v = jnp.where(fm, new_v, cur)
            out = dataclasses.replace(out, **{
                spec.field: jnp.where(m, new_v, cur)})
        return out

    def randomize_gravity(self, base_gravity, key, step):
        """Global gravity randomization (sim_params group) → traced (3,)."""
        g = jnp.asarray(base_gravity)
        if self.gravity_spec is None:
            return g
        sched = self._sched_scale(self.gravity_spec, step)
        s = self._sample(self.gravity_spec, key, (3,), sched)
        return self._apply(self.gravity_spec, g, s)
