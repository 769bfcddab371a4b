"""Offscreen rgb_array rendering for video recording.

Syncs env-0 state from the device to a host MjData and renders with
mujoco.Renderer (reference viewer/offscreen_renderer.py:13; requires a GL
backend — set MUJOCO_GL=egl for headless)."""

from __future__ import annotations

import numpy as np


class OffscreenRenderer:
  def __init__(self, env, height: int = 480, width: int = 640,
               camera: str | int = -1) -> None:
    import mujoco

    self._mj = mujoco
    self.env = env
    self.mj_model = env.sim.mj_model
    self.mj_data = mujoco.MjData(self.mj_model)
    self.camera = camera
    self._renderer = mujoco.Renderer(self.mj_model, height=height, width=width)

  def render(self, env_idx: int = 0) -> np.ndarray:
    self.mj_data.qpos[:] = np.asarray(self.env.state.data.qpos[env_idx])
    self.mj_data.qvel[:] = np.asarray(self.env.state.data.qvel[env_idx])
    self._mj.mj_forward(self.mj_model, self.mj_data)
    self._renderer.update_scene(self.mj_data, camera=self.camera)
    return self._renderer.render()

  def close(self) -> None:
    self._renderer.close()
