"""Terrain presets (reference terrains/config.py)."""

from mjlab_tpu.terrains.primitive_terrains import (
  BoxFlatTerrainCfg,
  BoxInvertedPyramidStairsTerrainCfg,
  BoxPyramidStairsTerrainCfg,
)
from mjlab_tpu.terrains.terrain_generator import TerrainGeneratorCfg

ROUGH_TERRAINS_CFG = TerrainGeneratorCfg(
  size=(8.0, 8.0),
  border_width=20.0,
  num_rows=10,
  num_cols=20,
  sub_terrains={
    "flat": BoxFlatTerrainCfg(proportion=0.4),
    "pyramid_stairs": BoxPyramidStairsTerrainCfg(
      proportion=0.3,
      step_height_range=(0.0, 0.1),
      step_width=0.3,
      platform_width=3.0,
      border_width=1.0,
    ),
    "pyramid_stairs_inv": BoxInvertedPyramidStairsTerrainCfg(
      proportion=0.3,
      step_height_range=(0.0, 0.1),
      step_width=0.3,
      platform_width=3.0,
      border_width=1.0,
    ),
  },
  add_lights=False,
)


# Extended preset with heightfield terrains — the reference disables these
# ("compilation issues in mujoco-warp", reference terrains/config.py); the
# TPU narrowphase supports hfields, so they are first-class here.
from mjlab_tpu.terrains.heightfield_terrains import (  # noqa: E402
  HfPyramidSlopedTerrainCfg,
  HfRandomUniformTerrainCfg,
  HfWaveTerrainCfg,
)

ROUGH_TERRAINS_WITH_HF_CFG = TerrainGeneratorCfg(
  size=(8.0, 8.0),
  border_width=20.0,
  num_rows=10,
  num_cols=20,
  sub_terrains={
    "flat": BoxFlatTerrainCfg(proportion=0.2),
    "pyramid_stairs": BoxPyramidStairsTerrainCfg(
      proportion=0.2,
      step_height_range=(0.0, 0.1),
      step_width=0.3,
      platform_width=3.0,
      border_width=1.0,
    ),
    "pyramid_stairs_inv": BoxInvertedPyramidStairsTerrainCfg(
      proportion=0.2,
      step_height_range=(0.0, 0.1),
      step_width=0.3,
      platform_width=3.0,
      border_width=1.0,
    ),
    "hf_pyramid_slope": HfPyramidSlopedTerrainCfg(
      proportion=0.1,
      slope_range=(0.0, 0.4),
      platform_width=2.0,
      border_width=0.25,
    ),
    "random_rough": HfRandomUniformTerrainCfg(
      proportion=0.2,
      noise_range=(0.02, 0.10),
      noise_step=0.02,
      border_width=0.25,
    ),
    "wave": HfWaveTerrainCfg(
      proportion=0.1,
      amplitude_range=(0.0, 0.2),
      num_waves=4,
      border_width=0.25,
    ),
  },
  add_lights=False,
)
