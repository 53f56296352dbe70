"""Asset root resolution.

The reference hard-wires `../../assets` relative to its package
(`tasks/base/vec_task.py` asset_root config defaults). Here assets are
vendored into the repo under `assets/` (URDF/MJCF/YAML/motion files
verbatim; collision meshes as 8-corner AABB stubs — the TPU collision
pipeline only consumes mesh bounding boxes, `io/mesh.py`).

Resolution order for `asset_path(rel)`:
  1. $ISAACGYMENVS_TPU_ASSETS (explicit override)
  2. <repo>/assets (vendored — self-contained default)
  3. /root/reference/assets (full-fidelity fallback when mounted)
"""

from __future__ import annotations

import os

_REPO_ASSETS = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "..", "assets"))
_FALLBACK = "/root/reference/assets"


def asset_root() -> str:
    env = os.environ.get("ISAACGYMENVS_TPU_ASSETS")
    if env:
        return env
    if os.path.isdir(_REPO_ASSETS):
        return _REPO_ASSETS
    return _FALLBACK


def asset_path(rel: str) -> str:
    """Resolve a path relative to the asset root, e.g.
    asset_path("mjcf/nv_ant.xml")."""
    for root in ([os.environ["ISAACGYMENVS_TPU_ASSETS"]]
                 if os.environ.get("ISAACGYMENVS_TPU_ASSETS") else []) \
            + [_REPO_ASSETS, _FALLBACK]:
        p = os.path.join(root, rel)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(
        f"asset {rel!r} not found under $ISAACGYMENVS_TPU_ASSETS, "
        f"{_REPO_ASSETS}, or {_FALLBACK}")


def is_stub_mesh(path: str) -> bool:
    """True for vendored AABB placeholders: '# AABB stub of ...' (OBJ)
    or 'solid aabbstub' (ASCII STL). Unreadable files count as stubs —
    cooking from them can't work anyway. Single source of truth shared
    with io/sdf's cache-key wildcarding."""
    try:
        with open(path, "r", errors="ignore") as f:
            head = f.read(256)
        return "AABB stub" in head or "aabbstub" in head
    except OSError:
        return True


def full_mesh_path(rel: str) -> str:
    """Like asset_path, but skips vendored AABB-stub meshes (8 vertices,
    no faces) in favor of a later root with real triangles — used by SDF
    cooking (io/sdf.py), which needs actual geometry. Returns the stub
    as a last resort so callers get a consistent FileNotFoundError/
    cook-failure story."""
    stub = None
    for root in ([os.environ["ISAACGYMENVS_TPU_ASSETS"]]
                 if os.environ.get("ISAACGYMENVS_TPU_ASSETS") else []) \
            + [_REPO_ASSETS, _FALLBACK]:
        p = os.path.join(root, rel)
        if not os.path.exists(p):
            continue
        if is_stub_mesh(p):
            stub = stub or p
            continue
        return p
    if stub:
        return stub
    raise FileNotFoundError(
        f"mesh {rel!r} not found under $ISAACGYMENVS_TPU_ASSETS, "
        f"{_REPO_ASSETS}, or {_FALLBACK}")
