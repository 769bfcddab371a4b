from mjlab_tpu.terrains.primitive_terrains import (
  BoxFlatTerrainCfg,
  BoxInvertedPyramidStairsTerrainCfg,
  BoxPyramidStairsTerrainCfg,
  BoxRandomGridTerrainCfg,
)
from mjlab_tpu.terrains.heightfield_terrains import (
  HfInvertedPyramidSlopedTerrainCfg,
  HfPyramidSlopedTerrainCfg,
  HfRandomUniformTerrainCfg,
  HfWaveTerrainCfg,
)
from mjlab_tpu.terrains.terrain_generator import (
  SubTerrainCfg,
  TerrainGenerator,
  TerrainGeneratorCfg,
)
from mjlab_tpu.terrains.terrain_importer import TerrainImporter, TerrainImporterCfg

__all__ = [
  "BoxFlatTerrainCfg",
  "HfInvertedPyramidSlopedTerrainCfg",
  "HfPyramidSlopedTerrainCfg",
  "HfRandomUniformTerrainCfg",
  "HfWaveTerrainCfg",
  "BoxInvertedPyramidStairsTerrainCfg",
  "BoxPyramidStairsTerrainCfg",
  "BoxRandomGridTerrainCfg",
  "SubTerrainCfg",
  "TerrainGenerator",
  "TerrainGeneratorCfg",
  "TerrainImporter",
  "TerrainImporterCfg",
]
