"""Mesh → primitive collision approximation.

The reference relies on PhysX convex decomposition of mesh collision
geoms (`asset_options.vhacd`, implicit convex hulls). The TPU pipeline
needs primitive geoms with static candidate sets; mesh collision geoms
are approximated by their bounding box computed from the mesh vertices
(OBJ / STL loaded host-side at scene-construction time).
"""

from __future__ import annotations

import os
import struct

import numpy as np


def load_mesh_vertices(path: str) -> np.ndarray:
    """(n,3) vertex array from .obj (text) or .stl (binary or ascii)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".obj":
        verts = []
        with open(path, "r", errors="ignore") as f:
            for line in f:
                if line.startswith("v "):
                    parts = line.split()
                    verts.append([float(parts[1]), float(parts[2]),
                                  float(parts[3])])
        return np.asarray(verts, np.float64).reshape(-1, 3)
    if ext == ".stl":
        with open(path, "rb") as f:
            head = f.read(5)
            f.seek(0)
            if head == b"solid":
                txt = f.read().decode(errors="ignore")
                if "facet" in txt:  # ascii STL
                    verts = []
                    for line in txt.splitlines():
                        s = line.strip()
                        if s.startswith("vertex"):
                            p = s.split()
                            verts.append([float(p[1]), float(p[2]),
                                          float(p[3])])
                    return np.asarray(verts, np.float64).reshape(-1, 3)
                f.seek(0)
            f.seek(80)
            (ntri,) = struct.unpack("<I", f.read(4))
            data = np.frombuffer(f.read(ntri * 50), dtype=np.uint8)
            data = data.reshape(ntri, 50)
            tri = data[:, 12:48].copy().view("<f4").reshape(ntri, 3, 3)
            return tri.reshape(-1, 3).astype(np.float64)
    raise ValueError(f"unsupported mesh format: {path}")


def mesh_bounding_box(path: str, scale=1.0):
    """(center (3,), half_extents (3,)) of the scaled mesh's AABB in its
    own frame."""
    v = load_mesh_vertices(path) * np.asarray(scale, np.float64)
    if len(v) == 0:
        return np.zeros(3), np.zeros(3)
    lo, hi = v.min(axis=0), v.max(axis=0)
    return 0.5 * (lo + hi), 0.5 * (hi - lo)


def resolve_mesh_path(filename: str, urdf_dir: str):
    """Resolve URDF mesh references: package-relative or urdf-relative."""
    if filename.startswith("package://"):
        filename = filename[len("package://"):]
    base = urdf_dir
    for _ in range(5):  # walk up: package roots sit a few levels above
        c = os.path.join(base, filename)
        if os.path.exists(c):
            return c
        base = os.path.dirname(base)
    return None
