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
  """Viewer factory: "native" (mujoco window) or "viser" (browser)."""
  if kind == "native":
    from mjlab_tpu.viewer.native import NativeMujocoViewer

    return NativeMujocoViewer(env, policy, cfg)
  if kind == "viser":
    from mjlab_tpu.viewer.viser_play import ViserViewer

    return ViserViewer(env, policy, cfg)
  raise ValueError(f"Unknown viewer kind '{kind}' (native|viser)")
