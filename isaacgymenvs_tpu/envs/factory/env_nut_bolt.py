"""FactoryEnvNutBolt: Franka + table + nut + bolt scene.

Parity with reference `factory/factory_env_nut_bolt.py` (357 LoC) and
`assets/factory/yaml/factory_asset_info_nut_bolt.yaml` (dimensions
transcribed below).  The reference imports SDF-collision mesh URDFs; the
TPU pipeline needs primitive geoms with static candidate sets, so:

  * hex nut -> box of width_min (across-flats) x height, geom offset so
    the nut's hole axis matches the reference origin convention (origin
    sits `bolt_head_height` below the nut bottom face, the fully-screwed
    rest pose);
  * bolt -> hex head box (1.5*major diameter across flats) + square
    shank column, fixed per env ("kinematic" free root, pose-restored
    every step, which replaces the reference's teleporting of a
    fix_base actor through the root-state tensor);
  * one subassembly per run (cfg `desired_subassemblies[0]`): the
    reference samples a subassembly per env at scene build, which is
    incompatible with a single static batched geometry — per-env size
    randomization belongs to the DR engine instead.

Thread engagement for the Screw task is modelled at the articulation
level (see task_nut_bolt_screw.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...io.mjcf import load_mjcf
from ...physics.collide import build_pair_contacts
from .base import FactoryBase, box_model_xml

# assets/factory/yaml/factory_asset_info_nut_bolt.yaml — per subassembly:
# (nut: width_min, width_max, height, flat_length;
#  bolt: width (major diameter), head_height, shank_length; thread_pitch)
NUT_BOLT_INFO = {}
for _size, _nut, _bolt, _pitch in [
    ("m4", (0.007, 0.0080829, 0.0032, 0.00404145),
     (0.004, 0.004, 0.016), 0.0007),
    ("m8", (0.013, 0.01501111, 0.0065, 0.00750555),
     (0.008, 0.008, 0.018), 0.00125),
    ("m12", (0.019, 0.02193931, 0.010, 0.01096966),
     (0.012, 0.012, 0.020), 0.00175),
    ("m16", (0.024, 0.02771281, 0.013, 0.01385641),
     (0.016, 0.016, 0.025), 0.002),
    ("m20", (0.030, 0.03464102, 0.016, 0.01732051),
     (0.020, 0.020, 0.045), 0.0025),
]:
    for _fit in ("tight", "loose"):
        NUT_BOLT_INFO[f"nut_bolt_{_size}_{_fit}"] = {
            "nut_width_min": _nut[0], "nut_width_max": _nut[1],
            "nut_height": _nut[2], "nut_flat_length": _nut[3],
            "bolt_width": _bolt[0], "bolt_head_height": _bolt[1],
            "bolt_shank_length": _bolt[2], "thread_pitch": _pitch,
        }


class FactoryEnvNutBolt(FactoryBase):
    """Nut + bolt actors; nut free, bolt kinematic."""

    nut_free = True  # Screw task overrides: nut rides a screw joint

    def __init__(self, cfg=None, num_envs=128):
        c = cfg or {}
        env_cfg = c.get("env", {})
        subs = env_cfg.get("desired_subassemblies", ["nut_bolt_m16_tight"])
        self.subassembly = subs[0]
        self.nut_bolt_info = NUT_BOLT_INFO[self.subassembly]
        self.nut_bolt_density = env_cfg.get("nut_bolt_density", 7850.0)
        # hex-nut-with-hole volume is ~55% of its bounding box;
        # keep the reference steel density but match the real mass
        self.nut_hollow_factor = env_cfg.get("nut_hollow_factor", 0.55)
        self.nut_bolt_friction = env_cfg.get("nut_bolt_friction", 0.3)
        self.nut_lateral_offset = env_cfg.get("nut_lateral_offset", 0.1)
        # SDF mesh contact for the nut<->bolt interface (reference
        # docs/factory.md:95-128): nut-surface samples vs a voxel SDF of
        # the bolt replace the primitive box-box pair, giving the nut a
        # real threaded bore (it can drop AROUND the shank). Cooking
        # falls back to primitives when only AABB-stub meshes are
        # available and no vendored grid cache exists.
        self.sdf_contact = env_cfg.get("sdf_contact", False)
        self.sdf_sweep = int(env_cfg.get("sdf_sweep", 16))
        self.sdf_samples = int(env_cfg.get("sdf_samples", 256))
        super().__init__(cfg, num_envs)

    # ------------------------------------------------------------- actors
    def _nut_model(self):
        info = self.nut_bolt_info
        w, h = info["nut_width_min"], info["nut_height"]
        zoff = info["bolt_head_height"] + h / 2  # origin convention
        xml = box_model_xml(
            "nut", (w, w, h),
            density=self.nut_bolt_density * self.nut_hollow_factor,
            free=self.nut_free,
            geoms=[("box", (w / 2, w / 2, h / 2), (0, 0, zoff))])
        return load_mjcf(xml)

    def _bolt_model(self):
        info = self.nut_bolt_info
        d = info["bolt_width"]
        hh = info["bolt_head_height"]
        sl = info["bolt_shank_length"]
        head_w = 1.5 * d  # hex head across flats
        xml = box_model_xml(
            "bolt", (head_w, head_w, hh), density=self.nut_bolt_density,
            free=True,
            geoms=[("box", (head_w / 2, head_w / 2, hh / 2),
                    (0, 0, hh / 2)),
                   ("box", (d / 2, d / 2, sl / 2), (0, 0, hh + sl / 2))])
        return load_mjcf(xml)

    def _nutbolt_screw_model(self):
        """Bolt (fixed) + nut on a SCREW joint along the bolt axis:
        z = pitch/(2*pi) * theta is built into the joint's motion
        subspace (physics/kinematics.py), so thread engagement is
        structural — no constraint row to fight the finger contacts.
        Replaces the reference's SDF thread contact
        (factory_env_nut_bolt.py:89-105, docs/factory.md); thread
        friction is emulated by joint frictionloss/damping (real
        threads hold position when external torque is removed)."""
        info = self.nut_bolt_info
        w, h = info["nut_width_min"], info["nut_height"]
        d = info["bolt_width"]
        hh = info["bolt_head_height"]
        sl = info["bolt_shank_length"]
        head_w = 1.5 * d
        pitch = info["thread_pitch"]
        # theta range maps to z travel [-shank_length, +2 mm] via pitch
        th_lo = -sl / pitch * 2 * np.pi
        th_hi = 0.002 / pitch * 2 * np.pi
        den = self.nut_bolt_density
        xml = f"""<mujoco model="nutbolt">
        <compiler inertiafromgeom="true" angle="radian"/>
        <worldbody><body name="bolt">
          <geom type="box" size="{head_w/2} {head_w/2} {hh/2}"
                pos="0 0 {hh/2}" density="{den}"/>
          <geom type="box" size="{d/2} {d/2} {sl/2}"
                pos="0 0 {hh + sl/2}" density="{den}"/>
          <body name="nut" pos="0 0 {sl}">
            <joint type="hinge" name="thread" axis="0 0 1"
                   screw_pitch="{pitch}" limited="true"
                   range="{th_lo} {th_hi}"
                   damping="0.01" frictionloss="0.03"/>
            <geom type="box" size="{w/2} {w/2} {h/2}"
                  pos="0 0 {hh + h/2}" density="{den}"/>
          </body>
        </body></worldbody></mujoco>"""
        return load_mjcf(xml)

    def _env_actors(self):
        th = self.table_height
        if not self.nut_free:  # screw assembly: one fixed-base actor
            return [("nutbolt", self._nutbolt_screw_model(),
                     [0.0, 0.0, th], [1.0, 0, 0, 0])]
        return [
            ("nut", self._nut_model(),
             [0.0, self.nut_lateral_offset, th], [1.0, 0, 0, 0]),
            ("bolt", self._bolt_model(), [0.0, 0.0, th], [1.0, 0, 0, 0]),
        ]

    def _kinematic_actors(self):
        return ["bolt"] if self.nut_free else []

    def _build_scene(self):
        super()._build_scene()
        sl = self.actor_slices
        if self.nut_free:
            self.nut_q = sl["nut"]["q"][0]
            self.nut_v = sl["nut"]["v"][0]
            self.bolt_q = sl["bolt"]["q"][0]
            self.bolt_v = sl["bolt"]["v"][0]
            self.nut_body = self.model.body_index("nut/nut")
            self.bolt_body = self.model.body_index("bolt/bolt")
        else:
            self.nut_body = self.model.body_index("nutbolt/nut")
            self.bolt_body = self.model.body_index("nutbolt/bolt")
            for ji in range(self.model.njnt):
                if self.model.jnt_names[ji] == "nutbolt/thread":
                    self.thread_rot_q = int(self.model.jnt_qadr[ji])
                    self.thread_rot_v = int(self.model.jnt_vadr[ji])

        nf = np.array(self.model.geom_friction, np.float64)
        for gi, nm in enumerate(self.model.geom_names):
            if nm.startswith(("nut/", "bolt/")):
                nf[gi] = self.nut_bolt_friction
            elif nm.startswith("table/"):
                nf[gi] = self.table_friction
            elif nm.startswith("franka/"):
                nf[gi] = self.franka_friction
        object.__setattr__(self.model, "geom_friction", nf)

        use_sdf = self.nut_free and self.sdf_contact
        if use_sdf:
            use_sdf = self._try_sdf_pairs() is not None
        if self.nut_free:
            bp = [("nut/nut", "table/table"),
                  ("nut/nut", "franka/panda_leftfinger"),
                  ("nut/nut", "franka/panda_rightfinger"),
                  ("nut/nut", "franka/panda_hand")]
            if not use_sdf:
                bp.append(("nut/nut", "bolt/bolt"))
        else:  # screw: finger <-> nut only (thread is the joint itself)
            bp = [("nutbolt/nut", "franka/panda_leftfinger"),
                  ("nutbolt/nut", "franka/panda_rightfinger"),
                  ("nutbolt/nut", "franka/panda_hand")]
        self.pair_contacts = build_pair_contacts(self.model, body_pairs=bp)
        if use_sdf:
            from ...physics.collide import add_sdf_pairs
            self.pair_contacts = add_sdf_pairs(
                self.pair_contacts, self.model, self._sdf_specs)

    def _try_sdf_pairs(self):
        """Resolve + cook the nut/bolt meshes; returns the spec list or
        None when real geometry is unavailable (stub assets, no cache)."""
        import warnings
        from ...io.sdf import mesh_sdf_cropped, mesh_surface_points
        from ...utils.assets import full_mesh_path
        size_fit = self.subassembly.replace("nut_bolt_", "")
        rel = "factory/mesh/factory_nut_bolt"
        try:
            nut_mesh = full_mesh_path(
                f"{rel}/factory_nut_{size_fit}_subdiv_3x.obj")
            bolt_mesh = full_mesh_path(f"{rel}/factory_bolt_{size_fit}.obj")
            # restrict samples to the threaded bore: only surface within
            # the bolt major diameter can ever engage the shank, and
            # concentrating the fixed sample budget there is what
            # resolves the ~1 mm thread ridges (the nut's outer flats /
            # the bolt-head backstop are out of SDF scope by design)
            r_keep = 0.6 * self.nut_bolt_info["bolt_width"]
            # cook spacing fine enough for the thread profile:
            # ~pitch/8 resolves the 60° flank wedge (m16: 0.25 mm)
            spacing = self.nut_bolt_info["thread_pitch"] / 8.0
            crop_r = 0.62 * self.nut_bolt_info["bolt_width"] \
                + 4.0 * spacing
            gb_arr = np.asarray(self.model.geom_body)
            nut_geom = int(np.where(gb_arr == self.nut_body)[0][0])
            bolt_geom = int(np.where(gb_arr == self.bolt_body)[0][0])
            self._sdf_specs = [{
                "body_a": self.nut_body, "geom_a": nut_geom,
                "mesh_a": nut_mesh,
                "body_b": self.bolt_body, "geom_b": bolt_geom,
                "mesh_b": bolt_mesh,
                "npts": self.sdf_samples,
                # CCD taps per substep along each sample's path.
                # 16 (default) resolves thread crests under free-fall
                # (the drop test's regime); Pick/Place set 4 in their
                # task yamls — their nut is table-spawned and grasped,
                # relative nut-bolt speeds are small, and the sweep is
                # the dominant per-substep gather cost (measured: Screw,
                # whose thread is a joint and runs no SDF narrowphase,
                # does 38K fps where Place does 1.1K on the same scene)
                "sweep": self.sdf_sweep,
                "spacing": spacing,
                "crop_lo": (-crop_r, -crop_r, -np.inf),
                "crop_hi": (crop_r, crop_r, np.inf),
                "keep_fn": lambda p: np.hypot(p[:, 0], p[:, 1]) < r_keep,
            }]
            # cook eagerly so failure falls back before model assembly
            mesh_surface_points(nut_mesh, 1.0, self.sdf_samples, 0)
            mesh_sdf_cropped(bolt_mesh, 1.0, spacing,
                             self._sdf_specs[0]["crop_lo"],
                             self._sdf_specs[0]["crop_hi"])
            return self._sdf_specs
        except (RuntimeError, FileNotFoundError) as e:
            warnings.warn(f"SDF contact unavailable ({e}); "
                          "falling back to primitive nut-bolt pair")
            return None

    # -------------------------------------------------------------- state
    def _nut_pose(self, q):
        """(pos, quat) of the nut root; single env."""
        return q[self.nut_q:self.nut_q + 3], \
            q[self.nut_q + 3:self.nut_q + 7]

    def _bolt_pose(self, q):
        return q[self.bolt_q:self.bolt_q + 3], \
            q[self.bolt_q + 3:self.bolt_q + 7]
