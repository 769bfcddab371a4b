from mjlab_tpu.terrains.primitive_terrains import (
  BoxFlatTerrainCfg,
  BoxInvertedPyramidStairsTerrainCfg,
  BoxPyramidStairsTerrainCfg,
  BoxRandomGridTerrainCfg,
)
from mjlab_tpu.terrains.terrain_generator import (
  SubTerrainCfg,
  TerrainGenerator,
  TerrainGeneratorCfg,
)
from mjlab_tpu.terrains.terrain_importer import TerrainImporter, TerrainImporterCfg

__all__ = [
  "BoxFlatTerrainCfg",
  "BoxInvertedPyramidStairsTerrainCfg",
  "BoxPyramidStairsTerrainCfg",
  "BoxRandomGridTerrainCfg",
  "SubTerrainCfg",
  "TerrainGenerator",
  "TerrainGeneratorCfg",
  "TerrainImporter",
  "TerrainImporterCfg",
]
