"""Terrain generator + heightfield lookup tests (reference:
isaacgym.terrain_utils consumed by tasks/anymal_terrain.py:540-674)."""

import jax
import jax.numpy as jnp
import numpy as np

from isaacgymenvs_tpu.io.terrain import (SubTerrain, Terrain,
                                         discrete_obstacles_terrain,
                                         make_height_fn,
                                         pyramid_sloped_terrain,
                                         pyramid_stairs_terrain,
                                         random_uniform_terrain,
                                         stepping_stones_terrain)


def _cell():
    return SubTerrain(width=80, length=80)


def test_pyramid_sloped():
    t = pyramid_sloped_terrain(_cell(), slope=0.3, platform_size=3.0)
    hf = t.height_field_raw
    assert hf[0, 0] == 0
    # rises toward the center, flat 3m platform in the middle
    assert hf[40, 40] > 0
    assert hf[40, 40] == hf[40 - 10, 40]


def test_pyramid_stairs():
    t = pyramid_stairs_terrain(_cell(), step_width=0.31, step_height=0.15,
                               platform_size=3.0)
    hf = t.height_field_raw
    assert hf[0, 0] == 0 and hf[40, 40] > 0
    steps = np.unique(hf)
    assert len(steps) > 3  # multiple concentric levels


def test_random_uniform_bounded():
    t = random_uniform_terrain(_cell(), -0.1, 0.1, 0.05, 0.2)
    h = t.height_field_raw * t.vertical_scale
    assert h.min() >= -0.11 and h.max() <= 0.11
    assert h.std() > 0


def test_discrete_obstacles_and_stones():
    t = discrete_obstacles_terrain(_cell(), 0.15, 1.0, 2.0, 20,
                                   platform_size=3.0)
    assert t.height_field_raw[40, 40] == 0  # platform
    assert len(np.unique(t.height_field_raw)) > 1
    s = stepping_stones_terrain(_cell(), 1.0, 0.4, 0.0, platform_size=3.0)
    assert s.height_field_raw.min() < -100  # deep gaps


def test_terrain_grid_curriculum():
    cfg = dict(terrainType="trimesh", mapLength=8.0, mapWidth=8.0,
               numLevels=4, numTerrains=5, curriculum=True,
               terrainProportions=[0.1, 0.1, 0.35, 0.25, 0.2])
    terr = Terrain(cfg, num_robots=64, seed=0)
    assert terr.env_origins.shape == (4, 5, 3)
    # origins laid out on the cell grid
    np.testing.assert_allclose(terr.env_origins[0, 0, :2], [4.0, 4.0])
    np.testing.assert_allclose(terr.env_origins[1, 2, :2], [12.0, 20.0])
    border = terr.border
    assert (terr.height_field_raw[:border, :] == 0).all()


def test_height_fn_bilinear():
    hf = np.zeros((16, 16), np.int16)
    hf[8:, :] = 100  # step of 0.5 m at x = 0.8 m (scale 0.1 m/px, 5 mm/unit)
    fn = make_height_fn(hf, 0.1, 0.005)
    h, n = fn(jnp.array([0.2, 1.2, 0.75]), jnp.array([0.5, 0.5, 0.5]))
    np.testing.assert_allclose(np.asarray(h), [0.0, 0.5, 0.25], atol=1e-6)
    # flat regions → vertical normal; on the step face it tilts along -x
    np.testing.assert_allclose(np.asarray(n[0]), [0, 0, 1], atol=1e-6)
    assert float(n[2][0]) < -0.9
