"""Scene composition: terrain + entities + sensors into one MjSpec.

Mirrors reference scene/scene.py:26-173: loads visual defaults, attaches the
terrain spec and entity specs with `name/` prefixes, builds sensors, computes
env origins (terrain-driven or grid), and fans out initialize/reset/update to
elements. Host-side; the compiled model flows into physics.put_model.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.entity import Entity, EntityCfg
from mjlab_tpu.sensors import BuiltinSensor, Sensor, SensorCfg
from mjlab_tpu.terrains import TerrainImporter, TerrainImporterCfg

_SCENE_XML = Path(__file__).parent / "scene.xml"


@dataclass(kw_only=True)
class SceneCfg:
  num_envs: int = 1
  env_spacing: float = 2.0
  terrain: TerrainImporterCfg | None = None
  entities: dict[str, EntityCfg] = field(default_factory=dict)
  sensors: tuple[SensorCfg, ...] = field(default_factory=tuple)
  extent: float | None = None


class Scene:
  def __init__(self, scene_cfg: SceneCfg) -> None:
    self._cfg = scene_cfg
    self._entities: dict[str, Entity] = {}
    self._sensors: dict[str, Sensor] = {}
    self._terrain: TerrainImporter | None = None
    self._default_env_origins: np.ndarray | None = None

    self._spec = mujoco.MjSpec.from_file(str(_SCENE_XML))
    if self._cfg.extent is not None:
      self._spec.stat.extent = self._cfg.extent
    self._add_terrain()
    self._add_entities()
    self._add_sensors()

  def compile(self) -> mujoco.MjModel:
    return self._spec.compile()

  # -- attributes -----------------------------------------------------------

  @property
  def spec(self) -> mujoco.MjSpec:
    return self._spec

  @property
  def env_origins(self):
    if self._terrain is not None and self._terrain.env_origins is not None:
      return self._terrain.env_origins
    assert self._default_env_origins is not None
    return self._default_env_origins

  @property
  def env_spacing(self) -> float:
    return self._cfg.env_spacing

  @property
  def entities(self) -> dict[str, Entity]:
    return self._entities

  @property
  def sensors(self) -> dict[str, Sensor]:
    return self._sensors

  @property
  def terrain(self) -> TerrainImporter | None:
    return self._terrain

  @property
  def num_envs(self) -> int:
    return self._cfg.num_envs

  def __getitem__(self, key: str) -> Any:
    if key == "terrain":
      if self._terrain is None:
        raise KeyError("No terrain configured in this scene.")
      return self._terrain
    if key in self._sensors:
      return self._sensors[key]
    if key in self._entities:
      return self._entities[key]
    available = list(self._entities) + list(self._sensors)
    if self._terrain is not None:
      available.append("terrain")
    raise KeyError(f"Scene element '{key}' not found. Available: {available}")

  # -- lifecycle -------------------------------------------------------------

  def initialize(self, mj_model: mujoco.MjModel, ctx) -> None:
    if self._terrain is None or self._terrain.env_origins is None:
      # Grid origins from spacing (reference terrain_importer.py:225-240).
      n = self._cfg.num_envs
      side = int(np.ceil(np.sqrt(n)))
      ii, jj = np.unravel_index(np.arange(n), (side, side))
      origins = np.zeros((n, 3))
      origins[:, 0] = (ii - (side - 1) / 2) * self._cfg.env_spacing
      origins[:, 1] = (jj - (side - 1) / 2) * self._cfg.env_spacing
      self._default_env_origins = origins.astype(np.dtype(ctx.dtype))
    for ent in self._entities.values():
      ent.initialize(mj_model, ctx)
    for sensor in self._sensors.values():
      sensor.initialize(mj_model, ctx)
    if self._terrain is not None:
      self._terrain.initialize(ctx)

  def init_state(self) -> dict:
    state: dict = {"sensors": {}, "terrain": {}}
    for name, sensor in self._sensors.items():
      state["sensors"][name] = sensor.init_state()
    if self._terrain is not None:
      state["terrain"] = self._terrain.init_state()
    return state

  def reset(self, env_mask=None) -> None:
    for ent in self._entities.values():
      ent.reset(env_mask)
    for sensor in self._sensors.values():
      sensor.reset(env_mask)

  def update(self, dt: float) -> None:
    for ent in self._entities.values():
      ent.update(dt)
    for sensor in self._sensors.values():
      sensor.update(dt)

  def write_data_to_sim(self) -> None:
    for ent in self._entities.values():
      ent.write_data_to_sim()

  # -- composition -------------------------------------------------------------

  def _add_entities(self) -> None:
    for ent_name, ent_cfg in self._cfg.entities.items():
      ent = Entity(ent_cfg)
      self._entities[ent_name] = ent
      frame = self._spec.worldbody.add_frame()
      self._spec.attach(ent.spec, prefix=f"{ent_name}/", frame=frame)

  def _add_terrain(self) -> None:
    if self._cfg.terrain is None:
      return
    self._cfg.terrain.num_envs = self._cfg.num_envs
    self._cfg.terrain.env_spacing = self._cfg.env_spacing
    self._terrain = TerrainImporter(self._cfg.terrain)
    frame = self._spec.worldbody.add_frame()
    self._spec.attach(self._terrain.spec, frame=frame)

  def _add_sensors(self) -> None:
    for sensor_cfg in self._cfg.sensors:
      sns = sensor_cfg.build()
      sns.edit_spec(self._spec, self._entities)
      self._sensors[sensor_cfg.name] = sns
    for sns in self._spec.sensors:
      if sns.name not in self._sensors:
        self._sensors[sns.name] = BuiltinSensor.from_existing(sns.name)
