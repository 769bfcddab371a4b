"""Terrain tests: generator grid determinism, curriculum difficulty ordering,
importer env origins, hfield assets (reference terrains/ behavior)."""

import mujoco
import numpy as np
import pytest

from mjlab_tpu.terrains import (
  BoxFlatTerrainCfg,
  BoxInvertedPyramidStairsTerrainCfg,
  BoxPyramidStairsTerrainCfg,
  BoxRandomGridTerrainCfg,
  HfPyramidSlopedTerrainCfg,
  HfRandomUniformTerrainCfg,
  TerrainGenerator,
  TerrainGeneratorCfg,
  TerrainImporter,
  TerrainImporterCfg,
)


def _gen_cfg(**kwargs):
  defaults = dict(
    seed=42,
    size=(4.0, 4.0),
    num_rows=3,
    num_cols=2,
    sub_terrains={
      "flat": BoxFlatTerrainCfg(proportion=0.5),
      "stairs": BoxPyramidStairsTerrainCfg(
        proportion=0.5, step_height_range=(0.05, 0.2), step_width=0.3,
        platform_width=1.0,
      ),
    },
  )
  defaults.update(kwargs)
  return TerrainGeneratorCfg(**defaults)


class TestTerrainGenerator:
  def test_grid_shape_and_compile(self):
    gen = TerrainGenerator(_gen_cfg())
    spec = mujoco.MjSpec()
    gen.build(spec)
    model = spec.compile()
    assert gen.terrain_origins.shape == (3, 2, 3)
    assert model.ngeom > 3 * 2  # at least one geom per tile

  def test_seeded_determinism(self):
    outs = []
    for _ in range(2):
      gen = TerrainGenerator(_gen_cfg())
      spec = mujoco.MjSpec()
      gen.build(spec)
      model = spec.compile()
      outs.append((gen.terrain_origins.copy(), model.geom_pos.copy()))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])

  def test_different_seed_differs(self):
    g1 = TerrainGenerator(_gen_cfg(seed=1))
    g2 = TerrainGenerator(_gen_cfg(seed=2))
    s1, s2 = mujoco.MjSpec(), mujoco.MjSpec()
    g1.build(s1)
    g2.build(s2)
    assert not np.array_equal(g1.terrain_origins, g2.terrain_origins)

  def test_curriculum_difficulty_grows_along_rows(self):
    """In curriculum mode stair heights (∝ difficulty) must be nondecreasing
    with the row index (reference terrain_generator.py:149-175)."""
    cfg = _gen_cfg(
      curriculum=True,
      num_rows=4,
      num_cols=1,
      sub_terrains={
        "stairs": BoxPyramidStairsTerrainCfg(
          proportion=1.0, step_height_range=(0.0, 0.4), step_width=0.3,
          platform_width=1.0,
        )
      },
    )
    gen = TerrainGenerator(cfg)
    spec = mujoco.MjSpec()
    gen.build(spec)
    # Origin z of the center platform equals total stair rise → grows by row.
    z = gen.terrain_origins[:, 0, 2]
    assert (np.diff(z) > 0).all()

  def test_border(self):
    cfg = _gen_cfg(border_width=1.0)
    gen = TerrainGenerator(cfg)
    spec = mujoco.MjSpec()
    gen.build(spec)
    spec.compile()
    cfg2 = _gen_cfg(border_width=0.0)
    gen2 = TerrainGenerator(cfg2)
    spec2 = mujoco.MjSpec()
    gen2.build(spec2)
    assert len(spec.geoms) == len(spec2.geoms) + 4

  def test_empty_subterrains_raises(self):
    with pytest.raises(ValueError):
      TerrainGenerator(_gen_cfg(sub_terrains={}))


class TestSubTerrains:
  def _build(self, sub, difficulty=0.5):
    sub.size = (4.0, 4.0)
    return sub.build(difficulty, np.random.default_rng(0))

  def test_flat_origin_center(self):
    out = self._build(BoxFlatTerrainCfg())
    np.testing.assert_allclose(out.origin, [2.0, 2.0, 0.0])
    assert len(out.boxes) == 1

  def test_stairs_platform_height(self):
    sub = BoxPyramidStairsTerrainCfg(
      step_height_range=(0.1, 0.1), step_width=0.4, platform_width=1.0
    )
    out = self._build(sub, difficulty=1.0)
    n = sub._num_steps()
    np.testing.assert_allclose(out.origin[2], (n + 1) * 0.1, rtol=1e-6)

  def test_inverted_stairs_descend(self):
    sub = BoxInvertedPyramidStairsTerrainCfg(
      step_height_range=(0.1, 0.1), step_width=0.4, platform_width=1.0
    )
    out = self._build(sub, difficulty=1.0)
    assert out.origin[2] < 0

  def test_random_grid(self):
    sub = BoxRandomGridTerrainCfg(
      grid_width=0.5, grid_height_range=(0.0, 0.1), platform_width=1.0
    )
    out = self._build(sub)
    assert len(out.boxes) > 4

  def test_hfield_terrains(self):
    for sub in (
      HfPyramidSlopedTerrainCfg(slope_range=(0.1, 0.4)),
      HfRandomUniformTerrainCfg(noise_range=(0.0, 0.06), noise_step=0.02),
    ):
      out = self._build(sub)
      assert out.hfield is not None
      assert out.hfield.heights.ndim == 2

  def test_hfield_compiles(self):
    cfg = _gen_cfg(
      sub_terrains={
        "slope": HfPyramidSlopedTerrainCfg(
          proportion=1.0, slope_range=(0.1, 0.4)
        )
      },
      num_rows=2,
      num_cols=1,
    )
    gen = TerrainGenerator(cfg)
    spec = mujoco.MjSpec()
    gen.build(spec)
    model = spec.compile()
    assert model.nhfield == 2


class _Ctx:
  dtype = "float64"


class TestTerrainImporter:
  def test_plane(self):
    imp = TerrainImporter(TerrainImporterCfg(terrain_type="plane", num_envs=9,
                                             env_spacing=2.0))
    imp.initialize(_Ctx())
    assert imp.env_origins.shape == (9, 3)
    # Square grid centered at origin.
    np.testing.assert_allclose(imp.env_origins.mean(axis=0), 0.0, atol=1e-9)
    assert imp.max_terrain_level == 1

  def test_generator_origins_on_tiles(self):
    imp = TerrainImporter(
      TerrainImporterCfg(
        terrain_type="generator",
        terrain_generator=_gen_cfg(),
        num_envs=16,
        max_init_terrain_level=1,
      )
    )
    imp.initialize(_Ctx())
    assert imp.env_origins.shape == (16, 3)
    # With max_init_terrain_level=1, all levels are in {0, 1}.
    assert imp._init_levels.max() <= 1
    # Every origin must be one of the terrain tile origins.
    tile_origins = imp.terrain_origins.reshape(-1, 3)
    for o in imp.env_origins:
      assert np.min(np.linalg.norm(tile_origins - o, axis=1)) < 1e-9
