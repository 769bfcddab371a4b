"""Terrain importer: builds the terrain MjSpec and owns env origins.

Round-1 scope: terrain_type="plane" (infinite ground plane) and grid env
origins; the procedural generator grid + curriculum origins (reference
terrains/terrain_importer.py:55-240, terrain_generator.py) land with the
rough-terrain milestone. The curriculum state (terrain_levels/types) is
already carried functionally so velocity-task curriculum terms can hook in.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Literal

import jax.numpy as jnp
import mujoco
import numpy as np

if TYPE_CHECKING:
  from mjlab_tpu.terrains.terrain_generator import TerrainGeneratorCfg


@dataclass
class TerrainImporterCfg:
  terrain_type: Literal["plane", "generator"] = "plane"
  terrain_generator: "TerrainGeneratorCfg | None" = None
  max_init_terrain_level: int | None = None
  num_envs: int = 1  # filled by Scene
  env_spacing: float = 2.0  # filled by Scene
  friction: tuple[float, float, float] = (1.0, 0.005, 0.0001)


class TerrainImporter:
  def __init__(self, cfg: TerrainImporterCfg) -> None:
    self.cfg = cfg
    self._spec = mujoco.MjSpec()
    self._spec.modelname = "terrain"
    self.env_origins = None
    self.terrain_origins = None
    self._generator = None

    if cfg.terrain_type == "plane":
      # Plane lives in a body named "terrain" so body/subtree contact
      # matching works uniformly (reference terrain_importer.py:154-162).
      self._spec.worldbody.add_body(name="terrain").add_geom(
        name="terrain",
        type=mujoco.mjtGeom.mjGEOM_PLANE,
        size=[0.0, 0.0, 1.0],
        friction=list(cfg.friction),
        rgba=[0.45, 0.45, 0.45, 1.0],
      )
    elif cfg.terrain_type == "generator":
      from mjlab_tpu.terrains.terrain_generator import TerrainGenerator

      assert cfg.terrain_generator is not None
      self._generator = TerrainGenerator(cfg.terrain_generator)
      self._generator.build(self._spec)
      self.terrain_origins = self._generator.terrain_origins  # (rows, cols, 3)
    else:
      raise ValueError(f"Unknown terrain type {cfg.terrain_type}")

  @property
  def spec(self) -> mujoco.MjSpec:
    return self._spec

  def initialize(self, ctx) -> None:
    self._ctx = ctx
    n = self.cfg.num_envs
    if self.terrain_origins is not None:
      rows, cols = self.terrain_origins.shape[:2]
      max_level = self.cfg.max_init_terrain_level
      max_level = rows if max_level is None else min(max_level + 1, rows)
      rng = np.random.default_rng(0)
      levels = rng.integers(0, max_level, n)
      types = np.arange(n) % cols
      self._init_levels = levels
      self._init_types = types
      origins = self.terrain_origins[levels, types]
      self.env_origins = origins.astype(np.dtype(ctx.dtype))
    else:
      side = int(np.ceil(np.sqrt(n)))
      ii, jj = np.unravel_index(np.arange(n), (side, side))
      origins = np.zeros((n, 3))
      origins[:, 0] = (ii - (side - 1) / 2) * self.cfg.env_spacing
      origins[:, 1] = (jj - (side - 1) / 2) * self.cfg.env_spacing
      self.env_origins = origins.astype(np.dtype(ctx.dtype))

  def init_state(self) -> dict:
    n = self.cfg.num_envs
    if self.terrain_origins is None:
      return {}
    return {
      "terrain_levels": jnp.asarray(self._init_levels, dtype=jnp.int32),
      "terrain_types": jnp.asarray(self._init_types, dtype=jnp.int32),
    }

  # Functional env-origin lookup for curriculum terrains.
  def origins_for(self, levels, types):
    table = jnp.asarray(self.terrain_origins, dtype=self._ctx.dtype)
    return table[levels, types]

  def update_env_origins(self, env_mask, move_up, move_down):
    """Promote/demote robots across difficulty rows (reference
    terrain_importer.py:186-201), masked-functional."""
    if self.terrain_origins is None:
      return
    st = self._ctx.ns("scene")["terrain"]
    rows = self.terrain_origins.shape[0]
    levels = st["terrain_levels"]
    delta = move_up.astype(jnp.int32) - move_down.astype(jnp.int32)
    new_levels = jnp.clip(levels + delta, 0, rows - 1)
    st["terrain_levels"] = jnp.where(env_mask, new_levels, levels)

  @property
  def env_origins_dynamic(self):
    """Current origins: static grid, or terrain-level-driven when curriculum."""
    if self.terrain_origins is None:
      return self.env_origins
    st = self._ctx.ns("scene")["terrain"]
    return self.origins_for(st["terrain_levels"], st["terrain_types"])

  @property
  def terrain_levels(self):
    st = self._ctx.ns("scene")["terrain"]
    return st["terrain_levels"]

  @property
  def max_terrain_level(self) -> int:
    return 1 if self.terrain_origins is None else self.terrain_origins.shape[0]
