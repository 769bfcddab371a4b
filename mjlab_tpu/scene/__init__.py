from mjlab_tpu.scene.scene import Scene, SceneCfg

__all__ = ["Scene", "SceneCfg"]
