"""Browser (viser/websocket) viewer.

The reference ships a full viser stack (viewer/viser_scene.py + viser_play.py
+ viser_reward_plotter.py, ~2k LoC). viser is not available in this build
environment; this module provides the same entry point, gated on the
dependency, with a minimal scene implementation when it is installed.
"""

from __future__ import annotations

import numpy as np

from mjlab_tpu.viewer.base import BaseViewer, ViewerConfig


class ViserViewer(BaseViewer):
  """Browser viewer: streams geom poses of the selected env over websocket."""

  def __init__(self, env, policy, cfg: ViewerConfig | None = None,
               port: int = 8080):
    try:
      import viser  # noqa: F401
    except ImportError as e:
      raise ImportError(
        "ViserViewer requires the 'viser' package (pip install viser). "
        "Use --viewer native for the MuJoCo window viewer."
      ) from e
    super().__init__(env, policy, cfg)
    self._port = port
    self._server = None
    self._frames: list = []

  def setup(self) -> None:
    import mujoco
    import viser

    self._server = viser.ViserServer(port=self._port)
    m = self.env.sim.mj_model
    self._mj_model = m
    self._mj_data = mujoco.MjData(m)
    # One frame per geom; primitive shapes mapped to viser primitives.
    for g in range(m.ngeom):
      gtype = m.geom_type[g]
      size = m.geom_size[g]
      rgba = m.geom_rgba[g]
      name = f"/geom_{g}"
      if gtype == mujoco.mjtGeom.mjGEOM_SPHERE:
        h = self._server.scene.add_icosphere(name, radius=float(size[0]),
                                             color=tuple(rgba[:3]))
      elif gtype == mujoco.mjtGeom.mjGEOM_BOX:
        h = self._server.scene.add_box(name, dimensions=tuple(2 * size[:3]),
                                       color=tuple(rgba[:3]))
      elif gtype in (mujoco.mjtGeom.mjGEOM_CAPSULE,
                     mujoco.mjtGeom.mjGEOM_CYLINDER):
        h = self._server.scene.add_icosphere(name, radius=float(size[0]),
                                             color=tuple(rgba[:3]))
      else:
        h = None
      self._frames.append(h)

  def is_running(self) -> bool:
    return self._server is not None

  def sync_env_to_viewer(self) -> None:
    import mujoco

    data = self.env.state.data
    self._mj_data.qpos[:] = np.asarray(data.qpos[self.env_idx])
    mujoco.mj_forward(self._mj_model, self._mj_data)
    for g, handle in enumerate(self._frames):
      if handle is None:
        continue
      handle.position = tuple(self._mj_data.geom_xpos[g])

  def close(self) -> None:
    if self._server is not None:
      self._server.stop()
