from mjlab_tpu.viewer.base import BaseViewer, ViewerConfig
from mjlab_tpu.viewer.debug_visualizer import DebugVisualizer
from mjlab_tpu.viewer.offscreen_renderer import OffscreenRenderer

__all__ = [
  "BaseViewer",
  "DebugVisualizer",
  "OffscreenRenderer",
  "ViewerConfig",
]


def make_viewer(kind: str, env, policy, cfg: "ViewerConfig | None" = None):
  """Viewer factory: "native" (mujoco window) or "offscreen"."""
  if kind == "native":
    from mjlab_tpu.viewer.native import NativeMujocoViewer

    return NativeMujocoViewer(env, policy, cfg)
  raise ValueError(f"Unknown viewer kind '{kind}' (native)")
