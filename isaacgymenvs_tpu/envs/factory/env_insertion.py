"""FactoryEnvInsertion: Franka + table + plug + socket scene.

Parity with reference `factory/factory_env_insertion.py` (320 LoC) and
`assets/factory/yaml/factory_asset_info_insertion.yaml` (dimensions
transcribed below; bnc/dsub/usb connector meshes are out of scope for
the primitive pipeline).  The SDF plug/socket meshes become:

  * plug -> free box (round pegs use width = diameter), length 0.050,
    origin at its bottom face;
  * socket -> kinematic actor: a rim of four wall boxes around the hole
    opening on the table (hole bottom = table top), so the peg can
    physically insert; hole clearance comes straight from the yaml
    (hole diameter/width/depth minus peg size).
"""

from __future__ import annotations

import numpy as np

from ...io.mjcf import load_mjcf
from ...physics.collide import build_pair_contacts
from .base import FactoryBase, box_model_xml

# assets/factory/yaml/factory_asset_info_insertion.yaml
# round: (peg diameter, length, hole diameter, hole height)
# rect:  (peg width, depth, length, hole width, depth, height)
INSERTION_INFO = {}
for _mm, _tight, _loose, _hole in [
    ("4mm", 0.003996, 0.003988, 0.0041),
    ("8mm", 0.007995, 0.007988, 0.0081),
    ("12mm", 0.011994, 0.011988, 0.0122),
    ("16mm", 0.015994, 0.015988, 0.0165),
]:
    for _fit, _d in (("tight", _tight), ("loose", _loose)):
        INSERTION_INFO[f"round_peg_hole_{_mm}_{_fit}"] = {
            "kind": "round", "peg_w": _d, "peg_d": _d, "peg_len": 0.050,
            "hole_w": _hole, "hole_d": _hole, "hole_h": 0.0089916,
            "density": 8000.0, "friction": 0.5,
        }
for _mm, _pw, _pd, _hw, _hd in [
    ("4mm", 0.004, 0.0035, 0.0040922, 0.0035787),
    ("8mm", 0.008, 0.007, 0.0081444, 0.0071340),
    ("12mm", 0.012, 0.008, 0.0121814, 0.0081325),
    ("16mm", 0.016, 0.010, 0.0162182, 0.0101576),
]:
    for _fit in ("tight", "loose"):
        INSERTION_INFO[f"rectangular_peg_hole_{_mm}_{_fit}"] = {
            "kind": "rect", "peg_w": _pw, "peg_d": _pd, "peg_len": 0.050,
            "hole_w": _hw, "hole_d": _hd, "hole_h": 0.0089916,
            "density": 8000.0, "friction": 0.5,
        }


class FactoryEnvInsertion(FactoryBase):
    """Plug free, socket kinematic (rim of wall boxes on the table)."""

    def __init__(self, cfg=None, num_envs=128):
        c = cfg or {}
        env_cfg = c.get("env", {})
        subs = env_cfg.get("desired_subassemblies",
                           ["round_peg_hole_8mm_loose"])
        self.subassembly = subs[0]
        self.insertion_info = INSERTION_INFO[self.subassembly]
        self.plug_lateral_offset = env_cfg.get("plug_lateral_offset", 0.1)
        # SDF mesh contact plug<->socket (reference docs/factory.md:95-128):
        # plug-surface samples vs a voxel SDF of the real socket mesh —
        # true round holes instead of the square rim-box approximation,
        # with rounded rims acting like real chamfers on entry.
        self.sdf_contact = env_cfg.get("sdf_contact", False)
        self.sdf_samples = int(env_cfg.get("sdf_samples", 256))
        super().__init__(cfg, num_envs)

    def _plug_model(self):
        info = self.insertion_info
        w, d, ln = info["peg_w"], info["peg_d"], info["peg_len"]
        xml = box_model_xml(
            "plug", (w, d, ln), density=info["density"], free=True,
            geoms=[("box", (w / 2, d / 2, ln / 2), (0, 0, ln / 2))])
        return load_mjcf(xml)

    def _socket_model(self):
        """Rim of 4 wall boxes around the hole opening."""
        info = self.insertion_info
        hw, hd, hh = info["hole_w"], info["hole_d"], info["hole_h"]
        rim = 2.0 * max(hw, hd)  # wall thickness around the opening
        geoms = [
            ("box", (rim / 2, (hd + 2 * rim) / 2, hh / 2),
             (+(hw + rim) / 2, 0, hh / 2)),
            ("box", (rim / 2, (hd + 2 * rim) / 2, hh / 2),
             (-(hw + rim) / 2, 0, hh / 2)),
            ("box", ((hw + 2 * rim) / 2, rim / 2, hh / 2),
             (0, +(hd + rim) / 2, hh / 2)),
            ("box", ((hw + 2 * rim) / 2, rim / 2, hh / 2),
             (0, -(hd + rim) / 2, hh / 2)),
        ]
        xml = box_model_xml("socket", (rim, rim, hh),
                            density=info["density"], free=True,
                            geoms=geoms)
        return load_mjcf(xml)

    def _env_actors(self):
        th = self.table_height
        return [
            ("plug", self._plug_model(),
             [0.0, self.plug_lateral_offset, th], [1.0, 0, 0, 0]),
            ("socket", self._socket_model(), [0.0, 0.0, th],
             [1.0, 0, 0, 0]),
        ]

    def _kinematic_actors(self):
        return ["socket"]

    def _build_scene(self):
        super()._build_scene()
        sl = self.actor_slices
        self.plug_q = sl["plug"]["q"][0]
        self.plug_v = sl["plug"]["v"][0]
        self.socket_q = sl["socket"]["q"][0]
        self.plug_body = self.model.body_index("plug/plug")
        self.socket_body = self.model.body_index("socket/socket")

        nf = np.array(self.model.geom_friction, np.float64)
        for gi, nm in enumerate(self.model.geom_names):
            if nm.startswith(("plug/", "socket/")):
                nf[gi] = self.insertion_info["friction"]
            elif nm.startswith("table/"):
                nf[gi] = self.table_friction
            elif nm.startswith("franka/"):
                nf[gi] = self.franka_friction
        object.__setattr__(self.model, "geom_friction", nf)

        use_sdf = self.sdf_contact and self._try_sdf_pairs() is not None
        bp = [("plug/plug", "table/table"),
              ("plug/plug", "franka/panda_leftfinger"),
              ("plug/plug", "franka/panda_rightfinger"),
              ("plug/plug", "franka/panda_hand")]
        if not use_sdf:
            bp.append(("plug/plug", "socket/socket"))
        self.pair_contacts = build_pair_contacts(self.model, body_pairs=bp)
        if use_sdf:
            from ...physics.collide import add_sdf_pairs
            self.pair_contacts = add_sdf_pairs(
                self.pair_contacts, self.model, self._sdf_specs)

    def _try_sdf_pairs(self):
        """Resolve + cook plug/socket meshes; None when only AABB-stub
        assets are reachable and no vendored grid cache exists."""
        import warnings
        from ...io.sdf import mesh_sdf_cropped, mesh_surface_points
        from ...utils.assets import full_mesh_path
        kind = self.insertion_info["kind"]
        mm_fit = self.subassembly.split("peg_hole_")[1]   # e.g. 8mm_loose
        mm = mm_fit.split("_")[0]
        rel = "factory/mesh/factory_insertion"
        peg_rel = (f"{rel}/factory_round_peg_{mm_fit}.obj"
                   if kind == "round" else
                   f"{rel}/factory_rectangular_peg_{mm_fit}_subdiv_3x.obj")
        hole_rel = (f"{rel}/factory_round_hole_{mm}_subdiv_3x.obj"
                    if kind == "round" else
                    f"{rel}/factory_rectangular_hole_{mm}_subdiv_3x.obj")
        try:
            peg_mesh = full_mesh_path(peg_rel)
            hole_mesh = full_mesh_path(hole_rel)
            # hole walls are planes (exact under trilinear); spacing only
            # rounds the rims, which acts like a real entry chamfer
            spacing = 4.0e-4
            gb_arr = np.asarray(self.model.geom_body)
            plug_geom = int(np.where(gb_arr == self.plug_body)[0][0])
            socket_geom = int(np.where(gb_arr == self.socket_body)[0][0])
            self._sdf_specs = [{
                "body_a": self.plug_body, "geom_a": plug_geom,
                "mesh_a": peg_mesh,
                "body_b": self.socket_body, "geom_b": socket_geom,
                "mesh_b": hole_mesh,
                "npts": self.sdf_samples, "spacing": spacing,
            }]
            mesh_surface_points(peg_mesh, 1.0, self.sdf_samples, 0)
            mesh_sdf_cropped(hole_mesh, 1.0, spacing)
            return self._sdf_specs
        except (RuntimeError, FileNotFoundError) as e:
            warnings.warn(f"SDF contact unavailable ({e}); "
                          "falling back to the primitive rim-box socket")
            return None

    def _plug_pose(self, q):
        return q[self.plug_q:self.plug_q + 3], \
            q[self.plug_q + 3:self.plug_q + 7]
