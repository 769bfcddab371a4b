"""Procedural terrain grid generator.

Host-side (numpy + MjSpec) terrain composition mirroring the reference
generator's behavior (terrains/terrain_generator.py:62-277): a num_rows ×
num_cols grid of sub-terrain tiles, either randomly sampled (proportion
weighted) or in curriculum mode where difficulty grows along rows; a border
skirt around the grid; optional overhead lights; seeded RNG.

Design difference from the reference: sub-terrains return plain box/hfield
descriptors (data), and the generator alone writes MjSpec geoms — keeping
terrain math free of spec plumbing.
"""

from __future__ import annotations

import abc
from dataclasses import dataclass, field
from typing import Literal

import mujoco
import numpy as np

_DARK_GRAY = (0.2, 0.2, 0.2, 1.0)


@dataclass
class BoxDesc:
  """An axis-aligned box: full-extent sizes, center position (tile frame)."""

  pos: np.ndarray  # (3,)
  size: np.ndarray  # (3,) full extents
  rgba: tuple[float, float, float, float] | None = None


@dataclass
class HfieldDesc:
  """A heightfield raster (meters) covering the full tile."""

  heights: np.ndarray  # (nx, ny) height in meters
  size_x: float
  size_y: float
  base: float = 0.5  # skirt thickness below z=0


@dataclass
class TerrainOutput:
  origin: np.ndarray  # (3,) spawn point in the tile frame
  boxes: list[BoxDesc] = field(default_factory=list)
  hfield: HfieldDesc | None = None


def height_ramp(t: float, base=(0.25, 0.45, 0.85)) -> tuple[float, ...]:
  """Simple height-indexed color ramp: dark→light as t goes 0→1."""
  t = float(np.clip(t, 0.0, 1.0))
  return tuple(np.clip(np.asarray(base) * (0.6 + 0.8 * t), 0, 1)) + (1.0,)


def ring_boxes(
  center_xy: tuple[float, float],
  outer: tuple[float, float],
  width: float,
  z: float,
  height: float,
) -> list[BoxDesc]:
  """Four boxes forming a hollow rectangular ring of strip width `width`.

  Top/bottom strips span the full outer x extent; left/right strips fill
  the remaining y extent (matching the reference's stair ring layout,
  primitive_terrains.py:135-195)."""
  cx, cy = center_xy
  ox, oy = outer
  out = []
  # strips along +y / -y edges
  for sy in (+1, -1):
    out.append(
      BoxDesc(
        pos=np.array([cx, cy + sy * (oy / 2 - width / 2), z]),
        size=np.array([ox, width, height]),
      )
    )
  # strips along +x / -x edges (inset so corners are not doubled)
  for sx in (+1, -1):
    out.append(
      BoxDesc(
        pos=np.array([cx + sx * (ox / 2 - width / 2), cy, z]),
        size=np.array([width, oy - 2 * width, height]),
      )
    )
  return out


def border_boxes(
  outer: tuple[float, float],
  inner: tuple[float, float],
  height: float,
  center: tuple[float, float, float],
) -> list[BoxDesc]:
  """Hollow rectangular border (reference terrains/utils.py:36)."""
  cx, cy, cz = center
  tx = (outer[0] - inner[0]) / 2
  ty = (outer[1] - inner[1]) / 2
  out = []
  for sy in (+1, -1):
    out.append(
      BoxDesc(
        pos=np.array([cx, cy + sy * (inner[1] / 2 + ty / 2), cz]),
        size=np.array([outer[0], ty, height]),
      )
    )
  for sx in (+1, -1):
    out.append(
      BoxDesc(
        pos=np.array([cx + sx * (inner[0] / 2 + tx / 2), cy, cz]),
        size=np.array([tx, inner[1], height]),
      )
    )
  return out


@dataclass
class SubTerrainCfg(abc.ABC):
  proportion: float = 1.0
  size: tuple[float, float] = (10.0, 10.0)  # overwritten by the generator

  @abc.abstractmethod
  def build(self, difficulty: float, rng: np.random.Generator) -> TerrainOutput:
    """Generate terrain descriptors for one tile at the given difficulty."""


@dataclass(kw_only=True)
class TerrainGeneratorCfg:
  seed: int | None = None
  curriculum: bool = False
  size: tuple[float, float]
  border_width: float = 0.0
  border_height: float = 1.0
  num_rows: int = 1
  num_cols: int = 1
  color_scheme: Literal["height", "random", "none"] = "height"
  sub_terrains: dict[str, SubTerrainCfg] = field(default_factory=dict)
  difficulty_range: tuple[float, float] = (0.0, 1.0)
  add_lights: bool = False


class TerrainGenerator:
  """Builds the terrain grid into an MjSpec and records tile spawn origins."""

  def __init__(self, cfg: TerrainGeneratorCfg) -> None:
    if not cfg.sub_terrains:
      raise ValueError("At least one sub_terrain must be specified.")
    self.cfg = cfg
    for sub in cfg.sub_terrains.values():
      sub.size = cfg.size
    seed = cfg.seed if cfg.seed is not None else 0
    self.rng = np.random.default_rng(seed)
    self.terrain_origins = np.zeros((cfg.num_rows, cfg.num_cols, 3))

  def build(self, spec: mujoco.MjSpec) -> None:
    body = spec.worldbody.add_body(name="terrain")
    subs = list(self.cfg.sub_terrains.values())
    proportions = np.array([s.proportion for s in subs], dtype=float)
    proportions /= proportions.sum()

    geom_count = 0
    for row in range(self.cfg.num_rows):
      for col in range(self.cfg.num_cols):
        sub, difficulty = self._pick(subs, proportions, row, col)
        tile_corner = self._tile_corner(row, col)
        output = sub.build(difficulty, self.rng)
        if output.hfield is not None:
          geom_count = self._add_hfield(
            spec, body, output.hfield, tile_corner, row, col, geom_count
          )
        for box in output.boxes:
          rgba = self._resolve_color(box)
          body.add_geom(
            name=f"terrain_{geom_count}",
            type=mujoco.mjtGeom.mjGEOM_BOX,
            size=list(box.size / 2.0),
            pos=list(np.asarray(box.pos) + tile_corner),
            rgba=list(rgba),
          )
          geom_count += 1
        self.terrain_origins[row, col] = output.origin + tile_corner

    self._add_border(body, geom_count)
    if self.cfg.add_lights:
      self._add_lights(body)

  # -- internals -------------------------------------------------------------

  def _pick(self, subs, proportions, row: int, col: int):
    lo, hi = self.cfg.difficulty_range
    if self.cfg.curriculum:
      # Column selects type by cumulative proportion; difficulty grows along
      # rows with uniform jitter (reference terrain_generator.py:149-175).
      idx = int(np.min(np.where(col / self.cfg.num_cols + 0.001
                                < np.cumsum(proportions))[0]))
      difficulty = (row + self.rng.uniform()) / self.cfg.num_rows
      difficulty = lo + (hi - lo) * difficulty
    else:
      idx = int(self.rng.choice(len(subs), p=proportions))
      difficulty = self.rng.uniform(lo, hi)
    return subs[idx], difficulty

  def _tile_corner(self, row: int, col: int) -> np.ndarray:
    sx, sy = self.cfg.size
    return np.array(
      [
        row * sx - self.cfg.num_rows * sx * 0.5,
        col * sy - self.cfg.num_cols * sy * 0.5,
        0.0,
      ]
    )

  def _add_hfield(self, spec, body, hf: HfieldDesc, tile_corner, row, col,
                  geom_count: int) -> int:
    """Write an hfield asset + geom for one tile.

    MuJoCo hfield data is (nrow, ncol) with columns along x and rows along
    y, normalized to [0, 1] over elevation size[2]; the geom sits at the
    tile center with z chosen so raster heights are world heights."""
    import numpy as np  # noqa: PLC0415 (local to avoid confusing jit users)

    h = hf.heights
    h_min, h_max = float(h.min()), float(h.max())
    elevation = max(h_max - h_min, 1e-6)
    normalized = (h - h_min) / elevation
    name = f"hfield_{row}_{col}"
    spec.add_hfield(
      name=name,
      size=[hf.size_x / 2, hf.size_y / 2, elevation, hf.base],
      nrow=h.shape[1],
      ncol=h.shape[0],
      userdata=normalized.T.reshape(-1),
    )
    center = tile_corner + np.array([hf.size_x / 2, hf.size_y / 2, h_min])
    body.add_geom(
      name=f"terrain_{geom_count}",
      type=mujoco.mjtGeom.mjGEOM_HFIELD,
      hfieldname=name,
      pos=list(center),
      rgba=[0.45, 0.45, 0.45, 1.0],
    )
    return geom_count + 1

  def _resolve_color(self, box: BoxDesc):
    if self.cfg.color_scheme == "height" and box.rgba is not None:
      return box.rgba
    if self.cfg.color_scheme == "random":
      return tuple(self.rng.uniform(0.3, 0.8, 3)) + (1.0,)
    return (0.5, 0.5, 0.5, 1.0)

  def _add_border(self, body, geom_count: int) -> None:
    if self.cfg.border_width <= 0:
      return
    inner = (
      self.cfg.num_rows * self.cfg.size[0],
      self.cfg.num_cols * self.cfg.size[1],
    )
    outer = (inner[0] + 2 * self.cfg.border_width,
             inner[1] + 2 * self.cfg.border_width)
    for i, box in enumerate(
      border_boxes(outer, inner, abs(self.cfg.border_height),
                   (0, 0, -self.cfg.border_height / 2))
    ):
      body.add_geom(
        name=f"terrain_{geom_count + i}",
        type=mujoco.mjtGeom.mjGEOM_BOX,
        size=list(box.size / 2.0),
        pos=list(box.pos),
        rgba=list(_DARK_GRAY),
      )

  def _add_lights(self, body) -> None:
    w = self.cfg.size[0] * self.cfg.num_rows
    h = self.cfg.size[1] * self.cfg.num_cols
    z = max(w, h) * 0.6
    for i, (x, y) in enumerate(
      [(0, 0), (-w / 2, -h / 2), (-w / 2, h / 2), (w / 2, -h / 2), (w / 2, h / 2)]
    ):
      s = 0.4 if i == 0 else 0.2
      body.add_light(
        pos=(x, y, z),
        type=mujoco.mjtLightType.mjLIGHT_SPOT,
        diffuse=(s, s, s * 0.95),
        specular=(0.1, 0.1, 0.1),
        cutoff=70,
        exponent=2,
      )
