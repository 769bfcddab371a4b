"""Native MuJoCo window viewer with env cycling and debug overlays.

Mirrors the reference NativeMujocoViewer (viewer/native.py:45): a passive
mujoco.viewer window driven by the paced BaseViewer loop; keyboard controls
(space pause, ±speed, [] env cycling); command-term debug arrows drawn into
the user scene each frame."""

from __future__ import annotations

import numpy as np

from mjlab_tpu.viewer.base import BaseViewer, ViewerConfig
from mjlab_tpu.viewer.debug_visualizer import MjvDebugVisualizer

_KEY_SPACE = 32
_KEY_LBRACKET = 91
_KEY_RBRACKET = 93
_KEY_MINUS = 45
_KEY_EQUAL = 61


class NativeMujocoViewer(BaseViewer):
  def __init__(self, env, policy, cfg: ViewerConfig | None = None):
    super().__init__(env, policy, cfg)
    import mujoco
    import mujoco.viewer

    self._mj = mujoco
    self.mj_model = self.env.sim.mj_model
    self.mj_data = mujoco.MjData(self.mj_model)
    self._viewer = None

  def setup(self) -> None:
    self._viewer = self._mj.viewer.launch_passive(
      self.mj_model, self.mj_data, key_callback=self._on_key,
      show_left_ui=False, show_right_ui=False,
    )
    cam = self._viewer.cam
    cam.distance = self.cfg.distance
    cam.elevation = self.cfg.elevation
    cam.azimuth = self.cfg.azimuth

  def _on_key(self, key: int) -> None:
    if key == _KEY_SPACE:
      self.toggle_pause()
    elif key == _KEY_RBRACKET:
      self.next_env()
    elif key == _KEY_LBRACKET:
      self.prev_env()
    elif key == _KEY_EQUAL:
      self.speed_up()
    elif key == _KEY_MINUS:
      self.slow_down()

  def is_running(self) -> bool:
    return self._viewer is not None and self._viewer.is_running()

  def sync_env_to_viewer(self) -> None:
    data = self.env.state.data
    self.mj_data.qpos[:] = np.asarray(data.qpos[self.env_idx])
    self.mj_data.qvel[:] = np.asarray(data.qvel[self.env_idx])
    self._mj.mj_forward(self.mj_model, self.mj_data)

    # Camera tracking of the configured body.
    if (
      self.cfg.origin_type == ViewerConfig.OriginType.ASSET_BODY
      and self.cfg.body_name
    ):
      entity = self.env.scene[self.cfg.asset_name]
      body_id = entity.indexing.body_ids[
        entity.body_names.index(self.cfg.body_name)
      ]
      self._viewer.cam.lookat[:] = self.mj_data.xpos[body_id]

    # Debug overlays from command terms.
    scn = self._viewer.user_scn
    scn.ngeom = 0
    viz = MjvDebugVisualizer(scn, self.env_idx)
    cm = getattr(self.env, "command_manager", None)
    if cm is not None and hasattr(cm, "debug_vis_callback"):
      cm.debug_vis_callback(viz)
    self._viewer.sync()

  def close(self) -> None:
    if self._viewer is not None:
      self._viewer.close()
