"""Vendored-asset self-containment (VERDICT r1 item 8).

The framework must construct every env without /root/reference mounted:
assets are vendored under <repo>/assets (text files verbatim, collision
meshes as AABB stubs producing identical bounding boxes, io/mesh.py).
"""

import os

import numpy as np
import pytest

import isaacgymenvs_tpu
from isaacgymenvs_tpu.utils import assets as A

REPO_ASSETS = os.path.normpath(
    os.path.join(os.path.dirname(__file__), "..", "assets"))

# every registered task that loads assets from disk (procedural tasks —
# Ingenuity, Quadcopter, BallBalance — author their models at runtime)
DISK_TASKS = ["Cartpole", "Ant", "Humanoid", "Anymal", "AnymalTerrain",
              "A1Terrain", "FrankaCabinet", "FrankaCubeStack",
              "ShadowHand", "AllegroHand", "Trifinger", "HumanoidAMP",
              "FactoryTaskNutBoltPick"]


@pytest.fixture()
def repo_assets_only(monkeypatch):
    """Force resolution away from /root/reference entirely."""
    monkeypatch.setenv("ISAACGYMENVS_TPU_ASSETS", REPO_ASSETS)
    monkeypatch.setattr(A, "_FALLBACK", "/nonexistent")
    yield


def test_asset_path_prefers_vendored(repo_assets_only):
    p = A.asset_path("mjcf/nv_ant.xml")
    assert p.startswith(REPO_ASSETS)


def test_mesh_stub_aabb_matches_reference():
    """AABB stubs reproduce the original meshes' bounding boxes."""
    from isaacgymenvs_tpu.io.mesh import mesh_bounding_box
    rel = "urdf/kuka_allegro_description/meshes/allegro/thumb_base.obj"
    ref = "/root/reference/assets/" + rel
    if not os.path.exists(ref):
        pytest.skip("reference not mounted")
    stub = os.path.join(REPO_ASSETS, rel)
    c0, h0 = mesh_bounding_box(ref)
    c1, h1 = mesh_bounding_box(stub)
    np.testing.assert_allclose(c0, c1, atol=1e-6)
    np.testing.assert_allclose(h0, h1, atol=1e-6)


@pytest.mark.parametrize("task", DISK_TASKS)
def test_env_constructs_from_vendored_assets(task, repo_assets_only):
    env = isaacgymenvs_tpu.make(task=task, num_envs=4)
    assert env.num_obs > 0 and env.num_acts > 0
