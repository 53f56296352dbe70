"""Procedural heightfield terrain: generators + curriculum grid + on-device
lookup.

TPU-native replacement for the external `isaacgym.terrain_utils`
(consumed by the reference at `tasks/anymal_terrain.py:540-674`): the five
procedural generators, the Terrain curriculum grid (numLevels × numTerrains
cells with difficulty scaled by row), and — instead of converting to a
trimesh for a native collider — a bilinear heightfield sampled directly
on-device (`height_fn`) by both the contact solver and the height-sensor
observations (`anymal_terrain.py:501-538`).

Generation is host-side numpy at scene-construction time (the analogue of
the reference's one-shot terrain build); only the final height grid ships
to the device.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SubTerrain:
    """One terrain cell — mirrors isaacgym.terrain_utils.SubTerrain."""

    width: int                 # pixels along x
    length: int                # pixels along y
    vertical_scale: float = 0.005
    horizontal_scale: float = 0.1

    def __post_init__(self):
        self.height_field_raw = np.zeros((self.width, self.length), np.int16)


def random_uniform_terrain(terrain: SubTerrain, min_height, max_height,
                           step=0.05, downsampled_scale=None):
    """Uniform noise sampled on a coarse grid, bilinearly upsampled."""
    if downsampled_scale is None:
        downsampled_scale = terrain.horizontal_scale
    min_h = int(min_height / terrain.vertical_scale)
    max_h = int(max_height / terrain.vertical_scale)
    step_i = max(int(step / terrain.vertical_scale), 1)
    heights_range = np.arange(min_h, max_h + step_i, step_i)
    ratio = downsampled_scale / terrain.horizontal_scale
    nx = max(int(terrain.width / ratio), 2)
    ny = max(int(terrain.length / ratio), 2)
    coarse = np.random.choice(heights_range, (nx, ny))
    # bilinear upsample to (width, length)
    xi = np.linspace(0, nx - 1, terrain.width)
    yi = np.linspace(0, ny - 1, terrain.length)
    x0 = np.floor(xi).astype(int); x1 = np.minimum(x0 + 1, nx - 1)
    y0 = np.floor(yi).astype(int); y1 = np.minimum(y0 + 1, ny - 1)
    fx = (xi - x0)[:, None]; fy = (yi - y0)[None, :]
    up = (coarse[np.ix_(x0, y0)] * (1 - fx) * (1 - fy)
          + coarse[np.ix_(x1, y0)] * fx * (1 - fy)
          + coarse[np.ix_(x0, y1)] * (1 - fx) * fy
          + coarse[np.ix_(x1, y1)] * fx * fy)
    terrain.height_field_raw += up.astype(np.int16)
    return terrain


def sloped_terrain(terrain: SubTerrain, slope=1.0):
    """Constant slope along x."""
    x = np.arange(terrain.width)[:, None]
    max_h = int(slope * (terrain.horizontal_scale / terrain.vertical_scale)
                * terrain.width)
    terrain.height_field_raw += (max_h * x / terrain.width).astype(np.int16)
    return terrain


def pyramid_sloped_terrain(terrain: SubTerrain, slope=1.0, platform_size=1.0):
    """Pyramid rising (slope>0) or sinking to the center, flat platform."""
    x = np.arange(terrain.width)[:, None].astype(float)
    y = np.arange(terrain.length)[None, :].astype(float)
    cx, cy = terrain.width / 2, terrain.length / 2
    xn = (cx - np.abs(cx - x)) / cx
    yn = (cy - np.abs(cy - y)) / cy
    max_h = int(slope * (terrain.horizontal_scale / terrain.vertical_scale)
                * (terrain.width / 2))
    hf = (max_h * xn * yn).astype(np.int16)
    terrain.height_field_raw += hf
    # flatten center platform at its boundary height
    ps = int(platform_size / terrain.horizontal_scale / 2)
    x1, x2 = int(cx) - ps, int(cx) + ps
    y1, y2 = int(cy) - ps, int(cy) + ps
    min_h = min(terrain.height_field_raw[x1, y1], 0)
    max_hc = max(terrain.height_field_raw[x1, y1], 0)
    terrain.height_field_raw = np.clip(terrain.height_field_raw, min_h, max_hc)
    return terrain


def pyramid_stairs_terrain(terrain: SubTerrain, step_width, step_height,
                           platform_size=1.0):
    """Concentric rectangular stairs toward the center."""
    sw = int(step_width / terrain.horizontal_scale)
    sh = int(step_height / terrain.vertical_scale)
    ps = int(platform_size / terrain.horizontal_scale)
    h = 0
    x1, x2 = 0, terrain.width
    y1, y2 = 0, terrain.length
    while (x2 - x1) > ps and (y2 - y1) > ps:
        x1 += sw; x2 -= sw; y1 += sw; y2 -= sw
        h += sh
        terrain.height_field_raw[x1:x2, y1:y2] = h
    return terrain


def discrete_obstacles_terrain(terrain: SubTerrain, max_height, min_size,
                               max_size, num_rects, platform_size=1.0):
    """Random rectangular blocks at ± heights; flat center platform."""
    mh = int(max_height / terrain.vertical_scale)
    mns = int(min_size / terrain.horizontal_scale)
    mxs = int(max_size / terrain.horizontal_scale)
    heights = [-mh, -mh // 2, mh // 2, mh]
    for _ in range(num_rects):
        w = np.random.randint(mns, max(mxs, mns + 1))
        l = np.random.randint(mns, max(mxs, mns + 1))
        sx = np.random.randint(0, max(terrain.width - w, 1))
        sy = np.random.randint(0, max(terrain.length - l, 1))
        terrain.height_field_raw[sx:sx + w, sy:sy + l] = \
            int(np.random.choice(heights))
    ps = int(platform_size / terrain.horizontal_scale / 2)
    cx, cy = terrain.width // 2, terrain.length // 2
    terrain.height_field_raw[cx - ps:cx + ps, cy - ps:cy + ps] = 0
    return terrain


def wave_terrain(terrain: SubTerrain, num_waves=1, amplitude=1.0):
    amp = int(0.5 * amplitude / terrain.vertical_scale)
    if num_waves > 0:
        dx = 2 * np.pi * num_waves / terrain.width
        dy = 2 * np.pi * num_waves / terrain.length
        x = np.arange(terrain.width)[:, None]
        y = np.arange(terrain.length)[None, :]
        terrain.height_field_raw += (
            amp * (np.cos(x * dx) + np.sin(y * dy))).astype(np.int16)
    return terrain


def stairs_terrain(terrain: SubTerrain, step_width, step_height):
    sw = int(step_width / terrain.horizontal_scale)
    sh = int(step_height / terrain.vertical_scale)
    num_steps = terrain.width // sw
    h = sh
    for i in range(num_steps):
        terrain.height_field_raw[i * sw:(i + 1) * sw, :] = h
        h += sh
    return terrain


def stepping_stones_terrain(terrain: SubTerrain, stone_size, stone_distance,
                            max_height, platform_size=1.0, depth=-10.0):
    """Grid of stones separated by deep gaps."""
    ss = max(int(stone_size / terrain.horizontal_scale), 1)
    sd = int(stone_distance / terrain.horizontal_scale)
    mh = int(max_height / terrain.vertical_scale)
    heights = np.arange(-mh - 1, mh + 1, 1) if mh > 0 else np.array([0])
    terrain.height_field_raw[:] = int(depth / terrain.vertical_scale)
    sx = 0
    off_y = np.random.randint(0, ss + sd)
    while sx < terrain.width:
        sy = -off_y
        while sy < terrain.length:
            x2 = min(sx + ss, terrain.width)
            y1, y2 = max(sy, 0), min(sy + ss, terrain.length)
            if y2 > y1:
                terrain.height_field_raw[sx:x2, y1:y2] = \
                    int(np.random.choice(heights))
            sy += ss + sd
        sx += ss + sd
    ps = int(platform_size / terrain.horizontal_scale / 2)
    cx, cy = terrain.width // 2, terrain.length // 2
    terrain.height_field_raw[cx - ps:cx + ps, cy - ps:cy + ps] = 0
    return terrain


def convert_heightfield_to_trimesh(height_field_raw, horizontal_scale,
                                   vertical_scale, slope_threshold=None):
    """Heightfield → (vertices, triangles) — kept for export/visualization
    parity; physics samples the heightfield directly."""
    hf = height_field_raw
    num_rows, num_cols = hf.shape
    y = np.linspace(0, (num_cols - 1) * horizontal_scale, num_cols)
    x = np.linspace(0, (num_rows - 1) * horizontal_scale, num_rows)
    yy, xx = np.meshgrid(y, x)
    vertices = np.zeros((num_rows * num_cols, 3), np.float32)
    vertices[:, 0] = xx.flatten()
    vertices[:, 1] = yy.flatten()
    vertices[:, 2] = hf.flatten() * vertical_scale
    triangles = -np.ones((2 * (num_rows - 1) * (num_cols - 1), 3), np.uint32)
    for i in range(num_rows - 1):
        ind0 = np.arange(0, num_cols - 1) + i * num_cols
        ind1 = ind0 + 1
        ind2 = ind0 + num_cols
        ind3 = ind2 + 1
        start = 2 * i * (num_cols - 1)
        stop = start + 2 * (num_cols - 1)
        triangles[start:stop:2, 0] = ind0
        triangles[start:stop:2, 1] = ind3
        triangles[start:stop:2, 2] = ind1
        triangles[start + 1:stop:2, 0] = ind0
        triangles[start + 1:stop:2, 1] = ind2
        triangles[start + 1:stop:2, 2] = ind3
    return vertices, triangles


class Terrain:
    """Full terrain grid with optional game-inspired curriculum — mirrors
    the reference `Terrain` class (`tasks/anymal_terrain.py:541-674`)."""

    def __init__(self, cfg: dict, num_robots: int, seed: int = 0):
        self.type = cfg.get("terrainType", "plane")
        if self.type in ("none", "plane"):
            return
        np.random.seed(seed)
        self.horizontal_scale = 0.1
        self.vertical_scale = 0.005
        self.border_size = 20.0
        self.env_length = cfg.get("mapLength", 8.0)
        self.env_width = cfg.get("mapWidth", 8.0)
        props = cfg.get("terrainProportions", [0.1, 0.1, 0.35, 0.25, 0.2])
        self.proportions = [sum(props[:i + 1]) for i in range(len(props))]
        self.env_rows = cfg.get("numLevels", 10)       # difficulty levels
        self.env_cols = cfg.get("numTerrains", 20)     # terrain variants
        self.num_maps = self.env_rows * self.env_cols
        self.env_origins = np.zeros((self.env_rows, self.env_cols, 3))

        self.width_px = int(self.env_width / self.horizontal_scale)
        self.length_px = int(self.env_length / self.horizontal_scale)
        self.border = int(self.border_size / self.horizontal_scale)
        tot_rows = self.env_rows * self.length_px + 2 * self.border
        tot_cols = self.env_cols * self.width_px + 2 * self.border
        self.height_field_raw = np.zeros((tot_rows, tot_cols), np.int16)

        if cfg.get("curriculum", False):
            self._curriculum()
        else:
            self._randomized()
        self.heightsamples = self.height_field_raw

    def _cell(self):
        return SubTerrain(width=self.length_px, length=self.width_px,
                          vertical_scale=self.vertical_scale,
                          horizontal_scale=self.horizontal_scale)

    def _paste(self, terrain, i, j):
        sx = self.border + i * self.length_px
        sy = self.border + j * self.width_px
        self.height_field_raw[sx:sx + self.length_px,
                              sy:sy + self.width_px] = terrain.height_field_raw
        # env origin: center of cell; z = max height of central 2x2 m
        ox = (i + 0.5) * self.env_length
        oy = (j + 0.5) * self.env_width
        x1 = int((self.env_length / 2 - 1) / self.horizontal_scale)
        x2 = int((self.env_length / 2 + 1) / self.horizontal_scale)
        y1 = int((self.env_width / 2 - 1) / self.horizontal_scale)
        y2 = int((self.env_width / 2 + 1) / self.horizontal_scale)
        oz = np.max(terrain.height_field_raw[x1:x2, y1:y2]) * self.vertical_scale
        self.env_origins[i, j] = [ox, oy, oz]

    def _randomized(self):
        for k in range(self.num_maps):
            i, j = np.unravel_index(k, (self.env_rows, self.env_cols))
            t = self._cell()
            choice = np.random.uniform(0, 1)
            if choice < 0.1:
                pyramid_sloped_terrain(
                    t, float(np.random.choice([-0.3, -0.2, 0, 0.2, 0.3])))
                if np.random.choice([0, 1]):
                    random_uniform_terrain(t, -0.1, 0.1, 0.05, 0.2)
            elif choice < 0.6:
                step_h = float(np.random.choice([-0.15, 0.15]))
                pyramid_stairs_terrain(t, 0.31, step_h, platform_size=3.0)
            else:
                discrete_obstacles_terrain(t, 0.15, 1.0, 2.0, 40,
                                           platform_size=3.0)
            self._paste(t, i, j)

    def _curriculum(self):
        for j in range(self.env_cols):
            for i in range(self.env_rows):
                t = self._cell()
                difficulty = i / self.env_rows
                choice = j / self.env_cols
                slope = difficulty * 0.4
                step_height = 0.05 + 0.175 * difficulty
                obstacle_h = 0.025 + difficulty * 0.15
                stone_size = 2 - 1.8 * difficulty
                p = self.proportions
                if choice < p[0]:
                    if choice < 0.05:
                        slope *= -1
                    pyramid_sloped_terrain(t, slope, platform_size=3.0)
                elif choice < p[1]:
                    if choice < 0.15:
                        slope *= -1
                    pyramid_sloped_terrain(t, slope, platform_size=3.0)
                    random_uniform_terrain(t, -0.1, 0.1, 0.025, 0.2)
                elif choice < p[3]:
                    if choice < p[2]:
                        step_height *= -1
                    pyramid_stairs_terrain(t, 0.31, step_height,
                                           platform_size=3.0)
                elif choice < p[4]:
                    discrete_obstacles_terrain(t, obstacle_h, 1.0, 2.0, 40,
                                               platform_size=3.0)
                else:
                    stepping_stones_terrain(t, stone_size, 0.1, 0.0,
                                            platform_size=3.0)
                self._paste(t, i, j)


def make_height_fn(height_field_raw: np.ndarray, horizontal_scale: float,
                   vertical_scale: float, origin=(0.0, 0.0)):
    """Build a jit-friendly bilinear heightfield lookup:
    (x, y) → (height, unit normal (…,3)).

    `origin`: world position of grid pixel (0,0) (the reference shifts the
    trimesh by −border_size, `anymal_terrain.py:198-201`).

    Used as `SimParams`-level height_fn by the contact solver AND by the
    height-sensor observations — replacing the reference's trimesh collider
    + manual raycast grid (`anymal_terrain.py:501-538`)."""
    import jax.numpy as jnp

    hf = jnp.asarray(height_field_raw.astype(np.float32) * vertical_scale)
    nx, ny = height_field_raw.shape
    inv_h = 1.0 / horizontal_scale
    ox, oy = origin

    def height_fn(x, y):
        px = jnp.clip((x - ox) * inv_h, 0.0, nx - 1.001)
        py = jnp.clip((y - oy) * inv_h, 0.0, ny - 1.001)
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        fx = px - x0
        fy = py - y0
        h00 = hf[x0, y0]
        h10 = hf[x0 + 1, y0]
        h01 = hf[x0, y0 + 1]
        h11 = hf[x0 + 1, y0 + 1]
        h = (h00 * (1 - fx) * (1 - fy) + h10 * fx * (1 - fy)
             + h01 * (1 - fx) * fy + h11 * fx * fy)
        # gradient of the bilinear patch → surface normal
        dhdx = ((h10 - h00) * (1 - fy) + (h11 - h01) * fy) * inv_h
        dhdy = ((h01 - h00) * (1 - fx) + (h11 - h10) * fx) * inv_h
        n = jnp.stack([-dhdx, -dhdy, jnp.ones_like(h)], axis=-1)
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        return h, n

    return height_fn
