"""Mesh → primitive collision approximation.

The reference relies on PhysX convex decomposition of mesh collision
geoms (`asset_options.vhacd`, implicit convex hulls). The TPU pipeline
needs primitive geoms with static candidate sets; mesh collision geoms
are approximated by their bounding box computed from the mesh vertices
(OBJ / STL loaded host-side at scene-construction time).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess

import numpy as np

_NATIVE_DIR = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native"))
_fastmesh = None
_fastmesh_tried = False


def _load_fastmesh():
    """ctypes-load the native mesh scanner (native/fastmesh.c), building
    it on first use when a C toolchain is present. Returns None (Python
    fallback) when unavailable — behavior is identical either way."""
    global _fastmesh, _fastmesh_tried
    if _fastmesh_tried:
        return _fastmesh
    _fastmesh_tried = True
    so = os.path.join(_NATIVE_DIR, "libfastmesh.so")
    if os.path.exists(os.path.join(_NATIVE_DIR, "Makefile")):
        # always invoke make (no-op when up to date): binaries are NOT
        # committed, and a stale build must never shadow a source edit
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=60)
        except Exception:
            pass  # fall through: a prebuilt .so may still be loadable
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
        lib.fm_mesh_aabb.restype = ctypes.c_int
        lib.fm_mesh_aabb.argtypes = [
            ctypes.c_char_p, ctypes.c_double,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double)]
        _fastmesh = lib
    except OSError:
        _fastmesh = None
    return _fastmesh


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
    own frame. Uses the native scanner when available (uniform scale
    only — the common case); falls back to the Python parsers."""
    s = np.asarray(scale, np.float64)
    lib = _load_fastmesh()
    if lib is not None and s.ndim == 0:
        center = (ctypes.c_double * 3)()
        half = (ctypes.c_double * 3)()
        rc = lib.fm_mesh_aabb(path.encode(), float(s), center, half)
        if rc == 0:
            return np.array(center[:]), np.array(half[:])
    v = load_mesh_vertices(path) * s
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
