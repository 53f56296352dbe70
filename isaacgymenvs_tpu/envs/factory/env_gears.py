"""FactoryEnvGears: Franka + table + 3 gears + base plate scene.

Parity with reference `factory/factory_env_gears.py` (409 LoC) and
`assets/factory/yaml/factory_asset_info_gears.yaml` (base height 0.005,
gear height 0.020).  The SDF gear meshes become free boxes of the gear
outer diameter (graspable by the finger pads); the base plate becomes a
kinematic plate + two shaft posts (the real asset's gear shafts),
matching the loose/tight shaft diameter choice.
"""

from __future__ import annotations

import numpy as np

from ...io.mjcf import load_mjcf
from ...physics.collide import build_pair_contacts
from .base import FactoryBase, box_model_xml

GEAR_BASE_HEIGHT = 0.005
GEAR_HEIGHT = 0.020
# outer diameters of the small/medium/large gears (from the reference
# meshes' scale; the exact tooth profile is irrelevant to grasping)
GEAR_DIAMS = {"small": 0.04, "medium": 0.06, "large": 0.08}
SHAFT_DIAM = {"tight": 0.008, "loose": 0.0079}
SHAFT_SPACING = 0.05  # two shafts on the primitive-fallback base plate
SHAFT_HEIGHT = 0.025
# the REAL base mesh's shaft columns (measured from the cooked SDF of
# factory_gear_base_*_subdiv_4x.obj: three r≈4 mm posts on y=0), and
# the authored in-base-frame centers of the gear meshes — the gear OBJ
# coordinates live in the base frame with each gear already mounted
# (factory_gear_small AABB x 0.0395..0.0615 ⇒ center +0.0505, etc.)
REAL_SHAFT_X = {"large": -0.0305, "medium": 0.0200, "small": 0.0505}


class FactoryEnvGears(FactoryBase):
    """Gears free, base plate + shafts kinematic."""

    def __init__(self, cfg=None, num_envs=128):
        c = cfg or {}
        env_cfg = c.get("env", {})
        self.tight_or_loose = env_cfg.get("tight_or_loose", "loose")
        self.gears_lateral_offset = env_cfg.get("gears_lateral_offset",
                                                0.1)
        self.gears_density = env_cfg.get("gears_density", 1000.0)
        # SDF mesh contact (reference docs/factory.md:95-128; the gear
        # URDFs carry `<sdf resolution="256">` hints): small/medium gear
        # surface samples vs an SDF of the real base mesh (plate + three
        # shafts), plus small-gear samples vs an SDF of the medium gear
        # for tooth meshing. The large gear stays a box: upstream ships
        # factory_gear_large.urdf referencing a mesh that is NOT in the
        # repo (only its .mtl exists), so the reference itself cannot
        # load it either.
        self.sdf_contact = env_cfg.get("sdf_contact", False)
        self.sdf_samples = int(env_cfg.get("sdf_samples", 256))
        # cook/locate the grids BEFORE the scene is built: the base
        # plate's shaft layout depends on whether SDF actually loads
        # (flag-only gating would leave the primitive fallback facing
        # shafts at mesh positions it was never designed for)
        self._sdf_data = self._cook_sdf_assets() if self.sdf_contact \
            else None
        self.sdf_active = self._sdf_data is not None
        super().__init__(cfg, num_envs)

    def _cook_sdf_assets(self):
        """Cook or cache-hit every grid/sample set needed; None on any
        failure (stub-only checkout without vendored caches)."""
        import warnings
        from ...io.sdf import mesh_sdf_cropped, mesh_surface_points
        from ...utils.assets import full_mesh_path
        rel = "factory/mesh/factory_gears"
        fit = self.tight_or_loose
        try:
            base_mesh = full_mesh_path(
                f"{rel}/factory_gear_base_{fit}_space_5e-4_subdiv_4x.obj")
            spacing = 5.0e-4      # resolves the r≈5 mm shafts + teeth
            mesh_sdf_cropped(base_mesh, 1.0, spacing)
            data = {"base_mesh": base_mesh, "spacing": spacing,
                    "pts": {}, "gear_mesh": {}}
            for s in ("small", "medium"):
                gm = full_mesh_path(f"{rel}/factory_gear_{s}_space_5e-4.obj")
                pts, _ = mesh_surface_points(gm, 1.0, self.sdf_samples, 0)
                data["gear_mesh"][s] = gm
                # authored in the BASE frame, mounted on its shaft —
                # re-express in OUR gear frame (origin: bore axis,
                # bottom face at z=0)
                data["pts"][s] = pts - np.array(
                    [REAL_SHAFT_X[s], 0.0, GEAR_BASE_HEIGHT], np.float32)
            mesh_sdf_cropped(data["gear_mesh"]["medium"], 1.0, spacing)
            return data
        except (RuntimeError, FileNotFoundError) as e:
            warnings.warn(f"SDF contact unavailable ({e}); "
                          "falling back to primitive gears")
            return None

    def _gear_model(self, size):
        d = GEAR_DIAMS[size]
        xml = box_model_xml(
            f"gear_{size}", (d, d, GEAR_HEIGHT),
            density=self.gears_density, free=True,
            geoms=[("box", (d / 2, d / 2, GEAR_HEIGHT / 2),
                    (0, 0, GEAR_HEIGHT / 2))])
        return load_mjcf(xml)

    def _base_model(self):
        sd = SHAFT_DIAM[self.tight_or_loose]
        geoms = [("box", (0.08, 0.05, GEAR_BASE_HEIGHT / 2),
                  (0, 0, GEAR_BASE_HEIGHT / 2))]
        # shaft posts where the REAL base mesh has them when SDF contact
        # actually LOADED (the SDF gears must agree with the primitive
        # large gear about shaft positions); legacy two-post layout for
        # the primitive fallback
        xs = (list(REAL_SHAFT_X.values()) if self.sdf_active
              else [-SHAFT_SPACING / 2, SHAFT_SPACING / 2])
        for sx in xs:
            geoms.append(("box", (sd / 2, sd / 2, SHAFT_HEIGHT / 2),
                          (sx, 0, GEAR_BASE_HEIGHT + SHAFT_HEIGHT / 2)))
        xml = box_model_xml("base", (0.16, 0.1, GEAR_BASE_HEIGHT),
                            density=8000.0, free=True, geoms=geoms)
        return load_mjcf(xml)

    def _env_actors(self):
        th = self.table_height
        off = self.gears_lateral_offset
        return [
            ("gear_small", self._gear_model("small"),
             [-0.1, off, th], [1.0, 0, 0, 0]),
            ("gear_medium", self._gear_model("medium"),
             [0.0, off, th], [1.0, 0, 0, 0]),
            ("gear_large", self._gear_model("large"),
             [0.1, off, th], [1.0, 0, 0, 0]),
            ("base", self._base_model(), [0.0, 0.0, th], [1.0, 0, 0, 0]),
        ]

    def _kinematic_actors(self):
        return ["base"]

    def _build_scene(self):
        super()._build_scene()
        sl = self.actor_slices
        self.gear_q = {s: sl[f"gear_{s}"]["q"][0]
                       for s in ("small", "medium", "large")}
        self.base_q = sl["base"]["q"][0]
        self.base_body = self.model.body_index("base/base")
        self.base_geom = int(np.where(
            np.asarray(self.model.geom_body) == self.base_body)[0][0])

        use_sdf = self.sdf_active and self._try_sdf_pairs() is not None
        bp = []
        for s in ("small", "medium", "large"):
            g = f"gear_{s}/gear_{s}"
            bp += [(g, "table/table"),
                   (g, "franka/panda_leftfinger"),
                   (g, "franka/panda_rightfinger")]
            # SDF gears interact with the base through the grid (their
            # box geom vs the shaft boxes would block shaft mounting)
            if not (use_sdf and s in ("small", "medium")):
                bp.append((g, "base/base"))
        self.pair_contacts = build_pair_contacts(self.model, body_pairs=bp)
        if use_sdf:
            from ...physics.collide import add_sdf_pairs
            self.pair_contacts = add_sdf_pairs(
                self.pair_contacts, self.model, self._sdf_specs)

    def _try_sdf_pairs(self):
        """Build SDF pair specs from the grids/samples cooked at
        __init__ time (cache hits here); None when cooking failed."""
        if self._sdf_data is None:
            return None
        d = self._sdf_data
        gb_arr = np.asarray(self.model.geom_body)
        specs = []
        for s in ("small", "medium"):
            body = self.model.body_index(f"gear_{s}/gear_{s}")
            geom = int(np.where(gb_arr == body)[0][0])
            specs.append({
                "body_a": body, "geom_a": geom, "pts_a": d["pts"][s],
                "mesh_a": None,
                "body_b": self.base_body, "geom_b": self.base_geom,
                "mesh_b": d["base_mesh"], "spacing": d["spacing"],
            })
        # tooth meshing: small-gear samples vs an SDF of the medium
        # gear (grid authored in the base frame -> grid_pos shifts it
        # into the medium gear's OWN frame)
        sb = self.model.body_index("gear_small/gear_small")
        mb = self.model.body_index("gear_medium/gear_medium")
        specs.append({
            "body_a": sb,
            "geom_a": int(np.where(gb_arr == sb)[0][0]),
            "pts_a": d["pts"]["small"], "mesh_a": None,
            "body_b": mb,
            "geom_b": int(np.where(gb_arr == mb)[0][0]),
            "mesh_b": d["gear_mesh"]["medium"], "spacing": d["spacing"],
            "grid_pos": (-REAL_SHAFT_X["medium"], 0.0,
                         -GEAR_BASE_HEIGHT),
        })
        self._sdf_specs = specs
        return specs
