from mjlab_tpu.entity.entity import (
  Entity,
  EntityArticulationInfoCfg,
  EntityCfg,
  EntityIndexing,
)
from mjlab_tpu.entity.data import EntityData

__all__ = [
  "Entity",
  "EntityArticulationInfoCfg",
  "EntityCfg",
  "EntityData",
  "EntityIndexing",
]
