from mjlab_tpu.terrains.terrain_importer import TerrainImporter, TerrainImporterCfg

__all__ = ["TerrainImporter", "TerrainImporterCfg"]
