"""Offscreen rgb_array rendering for video recording.

Syncs the selected env's state from the device to a host MjData and renders
with mujoco.Renderer (reference viewer/offscreen_renderer.py; requires a GL
backend — set MUJOCO_GL=egl for headless). Feature parity with the
reference: tracking camera driven by ViewerConfig (free / asset-body), the
debug-visualizer callback (command arrows, tracking ghosts), and additional
envs composited into the frame as extra geoms (reference
offscreen_renderer.py:60-86)."""

from __future__ import annotations

import numpy as np

from mjlab_tpu.viewer.base import ViewerConfig
from mjlab_tpu.viewer.debug_visualizer import MjvDebugVisualizer

_MAX_ENVS = 32  # cap on composited envs per frame (host FK each)


class OffscreenRenderer:
  def __init__(self, env, height: int = 480, width: int = 640,
               camera: str | int | None = None,
               max_envs: int = _MAX_ENVS) -> None:
    import mujoco

    self._mj = mujoco
    self.env = env
    self.mj_model = env.sim.mj_model
    self.mj_data = mujoco.MjData(self.mj_model)
    self.max_envs = max_envs
    if self.mj_model.vis.global_.offheight < height:
      self.mj_model.vis.global_.offheight = height
    if self.mj_model.vis.global_.offwidth < width:
      self.mj_model.vis.global_.offwidth = width
    self._renderer = mujoco.Renderer(self.mj_model, height=height, width=width)
    self._opt = mujoco.MjvOption()
    self._pert = mujoco.MjvPerturb()
    self.camera = camera if camera is not None else self._setup_camera()

  def _setup_camera(self):
    """Camera from the env's ViewerConfig: free, or tracking the configured
    body (reference _setup_camera)."""
    mj = self._mj
    cfg: ViewerConfig = getattr(self.env.cfg, "viewer", None) or ViewerConfig()
    cam = mj.MjvCamera()
    mj.mjv_defaultFreeCamera(self.mj_model, cam)
    if (
      cfg.origin_type == ViewerConfig.OriginType.ASSET_BODY and cfg.body_name
    ):
      entity = self.env.scene[cfg.asset_name]
      body_id = entity.indexing.body_ids[
        entity.body_names.index(cfg.body_name)
      ]
      cam.type = mj.mjtCamera.mjCAMERA_TRACKING.value
      cam.trackbodyid = int(body_id)
      cam.fixedcamid = -1
    cam.distance = cfg.distance
    cam.elevation = cfg.elevation
    cam.azimuth = cfg.azimuth
    return cam

  def render(self, env_idx: int = 0, debug_vis: bool = True) -> np.ndarray:
    mj = self._mj
    data = self.env.state.data
    self.mj_data.qpos[:] = np.asarray(data.qpos[env_idx])
    self.mj_data.qvel[:] = np.asarray(data.qvel[env_idx])
    mj.mj_forward(self.mj_model, self.mj_data)
    self._renderer.update_scene(self.mj_data, camera=self.camera)

    # Debug overlays (update_scene reset the scene, so draw after it).
    if debug_vis:
      if hasattr(self.env, "ensure_derived"):
        self.env.ensure_derived()
      cm = getattr(self.env, "command_manager", None)
      if cm is not None and hasattr(cm, "debug_vis_callback"):
        viz = MjvDebugVisualizer(
          self._renderer.scene, env_idx, mj_model=self.mj_model
        )
        cm.debug_vis_callback(viz)

    # Composite the other envs into the same frame.
    n = min(self.env.num_envs, self.max_envs)
    for i in range(n):
      if i == env_idx:
        continue
      self.mj_data.qpos[:] = np.asarray(data.qpos[i])
      self.mj_data.qvel[:] = np.asarray(data.qvel[i])
      mj.mj_forward(self.mj_model, self.mj_data)
      mj.mjv_addGeoms(
        self.mj_model, self.mj_data, self._opt, self._pert,
        mj.mjtCatBit.mjCAT_DYNAMIC.value, self._renderer.scene,
      )
    return self._renderer.render()

  def close(self) -> None:
    self._renderer.close()
