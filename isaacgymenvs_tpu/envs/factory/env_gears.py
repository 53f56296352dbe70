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
SHAFT_SPACING = 0.05  # two shafts on the base plate
SHAFT_HEIGHT = 0.025


class FactoryEnvGears(FactoryBase):
    """Gears free, base plate + shafts kinematic."""

    def __init__(self, cfg=None, num_envs=128):
        c = cfg or {}
        env_cfg = c.get("env", {})
        self.tight_or_loose = env_cfg.get("tight_or_loose", "loose")
        self.gears_lateral_offset = env_cfg.get("gears_lateral_offset",
                                                0.1)
        self.gears_density = env_cfg.get("gears_density", 1000.0)
        super().__init__(cfg, num_envs)

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
        for sx in (-SHAFT_SPACING / 2, SHAFT_SPACING / 2):
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

        bp = []
        for s in ("small", "medium", "large"):
            g = f"gear_{s}/gear_{s}"
            bp += [(g, "table/table"),
                   (g, "franka/panda_leftfinger"),
                   (g, "franka/panda_rightfinger"),
                   (g, "base/base")]
        self.pair_contacts = build_pair_contacts(self.model, body_pairs=bp)
