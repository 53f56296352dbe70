"""Parser tests against the actual reference assets."""

import numpy as np
import pytest

from isaacgymenvs_tpu.core import types as T
from isaacgymenvs_tpu.io import load_mjcf, load_urdf

ASSETS = "/root/reference/assets"


@pytest.fixture(scope="module")
def ant():
    return load_mjcf(f"{ASSETS}/mjcf/nv_ant.xml")


@pytest.fixture(scope="module")
def humanoid():
    return load_mjcf(f"{ASSETS}/mjcf/nv_humanoid.xml")


@pytest.fixture(scope="module")
def cartpole():
    return load_urdf(f"{ASSETS}/urdf/cartpole.urdf", fix_base=True)


def test_ant_structure(ant):
    # torso + 4×(leg, foot) = 9 bodies; free root + 8 hinges
    assert ant.nbody == 9
    assert ant.njnt == 9
    assert ant.nq == 7 + 8
    assert ant.nv == 6 + 8
    assert ant.nu == 8
    # reference: actions*gears, gears=15 (tasks/ant.py:275-279, nv_ant.xml)
    np.testing.assert_allclose(ant.act_gear, 15.0)
    # default joint: armature 0.01, damping 0.1
    assert np.allclose(ant.dof_armature[6:], 0.01)
    assert np.allclose(ant.dof_damping[6:], 0.1)
    # hinge ranges in radians (e.g. hip ±40°)
    hips = [i for i, n in enumerate(ant.jnt_names) if n.startswith("hip")]
    for h in hips:
        np.testing.assert_allclose(ant.jnt_range[h],
                                   [-40 * np.pi / 180, 40 * np.pi / 180],
                                   atol=1e-5)
    # init_qpos from <custom> numeric
    np.testing.assert_allclose(ant.init_qpos[:3], [0, 0, 0.55], atol=1e-6)
    # geom friction from default class
    body_geoms = ant.geom_body >= 0
    assert np.allclose(ant.geom_friction[body_geoms, 0], 1.5)


def test_ant_mass_positive(ant):
    # density=5 from default class; torso sphere r=.25: m=5*(4/3)π.25³≈0.327
    torso = ant.body_index("torso")
    assert ant.body_mass[torso] > 0.3
    assert (ant.body_mass > 0).all()
    # inertia symmetric PSD
    for i in range(ant.nbody):
        w = np.linalg.eigvalsh(ant.body_inertia[i])
        assert (w > 0).all()


def test_humanoid_structure(humanoid):
    assert humanoid.nbody == 16
    assert humanoid.njnt == 1 + 21  # freejoint + 21 hinges
    assert humanoid.nv == 6 + 21
    assert humanoid.nu == 21
    gears = dict(zip(humanoid.act_names, humanoid.act_gear))
    assert gears["right_hip_y"] == pytest.approx(135.0)
    assert gears["left_ankle_x"] == pytest.approx(22.5)
    # nested default classes: big_joint damping 5, small_joint damping 1
    jidx = {n: i for i, n in enumerate(humanoid.jnt_names)}
    va = humanoid.jnt_vadr
    assert humanoid.dof_damping[va[jidx["right_hip_x"]]] == pytest.approx(5.0)
    assert humanoid.dof_damping[va[jidx["right_ankle_y"]]] == pytest.approx(1.0)
    assert humanoid.dof_stiffness[va[jidx["abdomen_z"]]] == pytest.approx(20.0)


def test_multi_joint_body_ordering(humanoid):
    # lower_waist has abdomen_z then abdomen_y — dofs must be consecutive
    jidx = {n: i for i, n in enumerate(humanoid.jnt_names)}
    assert humanoid.jnt_body[jidx["abdomen_z"]] == humanoid.jnt_body[jidx["abdomen_y"]]
    assert humanoid.jnt_vadr[jidx["abdomen_y"]] == humanoid.jnt_vadr[jidx["abdomen_z"]] + 1


def test_cartpole_structure(cartpole):
    assert cartpole.nbody == 3  # slider, cart, pole
    assert cartpole.njnt == 2
    assert cartpole.nq == 2 and cartpole.nv == 2
    types = dict(zip(cartpole.jnt_names, cartpole.jnt_type))
    assert types["slider_to_cart"] == T.SLIDE
    assert types["cart_to_pole"] == T.HINGE
    # prismatic limits −4..4
    sl = cartpole.jnt_index("slider_to_cart")
    np.testing.assert_allclose(cartpole.jnt_range[sl], [-4, 4])
    assert cartpole.jnt_limited[sl]
    # continuous joint unlimited
    assert not cartpole.jnt_limited[cartpole.jnt_index("cart_to_pole")]
    # masses: cart 1.0, pole 1.0 (from <inertial>)
    assert cartpole.body_mass[cartpole.body_index("cart")] == pytest.approx(1.0)
    assert cartpole.body_mass[cartpole.body_index("pole")] == pytest.approx(1.0)
    # pole inertia derived from collision box at mass 1, com at z=0.47
    pole = cartpole.body_index("pole")
    np.testing.assert_allclose(cartpole.body_com[pole], [0, 0, 0.47], atol=1e-6)
    assert cartpole.body_inertia[pole][0, 0] > 0.05  # ≈ (1/12)(0.06²+1²)


def test_urdf_free_base():
    m = load_urdf(f"{ASSETS}/urdf/cartpole.urdf", fix_base=False)
    assert m.njnt == 3
    assert m.jnt_type[0] == T.FREE
    assert m.nq == 7 + 2 and m.nv == 6 + 2


def test_ant_ground_candidates(ant):
    from isaacgymenvs_tpu.physics.collide import build_ground_contacts
    cs = build_ground_contacts(ant)
    # 1 torso sphere + 12 capsules×2 = 25 candidates
    assert cs.count == 25
    assert (cs.radius > 0).all()


# ---------------------------------------------------------------- poselib
def test_poselib_roundtrip_reference_motion(tmp_path):
    """Load a reference SkeletonMotion .npy, check FK consistency, save,
    and reload through MotionLib (the full offline->runtime path)."""
    from isaacgymenvs_tpu.io import poselib as pl
    src = "/root/reference/assets/amp/motions/amp_humanoid_walk.npy"
    m = pl.SkeletonMotion.from_file(src)
    assert m.rotation.shape[1] == 15 and m.fps > 0
    # FK: pelvis (root) global == root_translation
    gt = m.global_translation
    np.testing.assert_allclose(gt[:, 0], m.root_translation, atol=1e-5)
    # local -> global -> local round trip
    g = pl.SkeletonState(m.skeleton_tree, m.global_rotation,
                         m.root_translation, is_local=False)
    np.testing.assert_allclose(
        np.abs(np.sum(g.local_rotation * m.local_rotation, axis=-1)),
        1.0, atol=1e-4)   # same rotation up to quat sign
    # save + reload via MotionLib
    out = str(tmp_path / "walk_copy.npy")
    m.to_file(out)
    from isaacgymenvs_tpu.io.mjcf import load_mjcf
    from isaacgymenvs_tpu.io.motion import MotionLib
    model = load_mjcf("/root/reference/assets/mjcf/amp_humanoid.xml")
    lib = MotionLib(out, model,
                    key_body_names=["right_hand", "left_hand",
                                    "right_foot", "left_foot"])
    assert lib.fps[0] == m.fps


def test_poselib_retarget_identity():
    """Retargeting a motion onto ITS OWN skeleton with the identity
    mapping and identical tposes reproduces the global rotations."""
    from isaacgymenvs_tpu.io import poselib as pl
    src = "/root/reference/assets/amp/motions/amp_humanoid_walk.npy"
    m = pl.SkeletonMotion.from_file(src)
    tree = m.skeleton_tree
    tpose = pl.SkeletonState.from_rotation_and_root_translation(
        tree, pl.quat_identity((tree.num_joints,)),
        np.zeros(3), is_local=True)
    mapping = {n: n for n in tree.node_names}
    out = m.retarget_to_by_tpose(mapping, tpose, tpose)
    dot = np.abs(np.sum(out.global_rotation * m.global_rotation, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-4)
    np.testing.assert_allclose(out.root_translation, m.root_translation,
                               atol=1e-5)


def test_poselib_skeleton_from_mjcf():
    from isaacgymenvs_tpu.io import poselib as pl
    tree = pl.SkeletonTree.from_mjcf(
        "/root/reference/assets/mjcf/amp_humanoid.xml")
    assert tree.num_joints >= 15
    assert tree.parent_indices[0] == -1
    assert "pelvis" in tree.node_names


def test_fastmesh_native_matches_python():
    import os
    """Native mesh scanner (native/fastmesh.c) returns the same AABBs as
    the Python parsers on every vendored collision mesh."""
    import glob
    import numpy as np
    from isaacgymenvs_tpu.io import mesh as M
    lib = M._load_fastmesh()
    if lib is None:
        import pytest
        pytest.skip("no C toolchain / native lib")
    root = os.path.join(os.path.dirname(__file__), "..", "assets")
    files = (glob.glob(os.path.join(root, "**", "*.obj"), recursive=True)
             + glob.glob(os.path.join(root, "**", "*.stl"), recursive=True))
    assert len(files) > 50
    checked = 0
    for f in files[:120]:
        v = M.load_mesh_vertices(f)
        if len(v) == 0:
            continue
        lo, hi = v.min(0), v.max(0)
        c_py, h_py = 0.5 * (lo + hi), 0.5 * (hi - lo)
        import ctypes
        c = (ctypes.c_double * 3)()
        h = (ctypes.c_double * 3)()
        rc = lib.fm_mesh_aabb(f.encode(), 1.0, c, h)
        assert rc == 0, f
        np.testing.assert_allclose(np.array(c[:]), c_py, atol=1e-9)
        np.testing.assert_allclose(np.array(h[:]), h_py, atol=1e-9)
        checked += 1
    assert checked > 50


def test_poselib_viz_outputs(tmp_path):
    """plot_skeleton_state/motion render non-trivial PNG/GIF headlessly
    (parity: reference poselib/visualization drives an interactive
    matplotlib window; serving hosts have no display)."""
    from isaacgymenvs_tpu.io import poselib as pl
    from isaacgymenvs_tpu.io.poselib_viz import (plot_skeleton_motion,
                                                 plot_skeleton_state)
    from isaacgymenvs_tpu.utils.assets import asset_path
    m = pl.SkeletonMotion.from_file(
        asset_path("amp/motions/amp_humanoid_walk.npy"))
    png = plot_skeleton_state(
        pl.SkeletonState(m.skeleton_tree, m.rotation[0],
                         m.root_translation[0]),
        str(tmp_path / "f0.png"))
    gif = plot_skeleton_motion(m, str(tmp_path / "walk.gif"),
                               max_frames=6)
    import os
    assert os.path.getsize(png) > 5000
    assert os.path.getsize(gif) > 20000
