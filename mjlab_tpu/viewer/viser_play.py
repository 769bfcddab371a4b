"""Browser (viser/websocket) viewer.

TPU-side counterpart of the reference's viser stack (viewer/viser_play.py +
viser_scene.py + viser_reward_plotter.py): meshes extracted from the MjModel
(viser_conversions), geom-group GUI, pause/speed/env-cycling controls, and
live reward plots. The `viser` package is optional in this environment; the
import is gated in the constructor and everything viser-independent lives in
viser_conversions / viser_reward_plotter for testability.
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
    self._scene = None
    self._plotter = None

  def setup(self) -> None:
    import mujoco
    import viser

    from mjlab_tpu.viewer.viser_reward_plotter import ViserRewardPlotter
    from mjlab_tpu.viewer.viser_scene import ViserMjScene

    self._server = viser.ViserServer(port=self._port, verbose=False)
    m = self.env.sim.mj_model
    self._mj_model = m
    self._mj_data = mujoco.MjData(m)

    self._scene = ViserMjScene(self._server, m)
    self._scene.add_geom_group_gui()
    self._scene.add_options_gui(self.env.num_envs)
    self._build_controls()

    reward_terms = list(getattr(self.env.reward_manager, "active_terms", []))
    if reward_terms:
      self._plotter = ViserRewardPlotter(self._server, reward_terms)

  def _build_controls(self) -> None:
    gui = self._server.gui
    with gui.add_folder("Playback"):
      pause = gui.add_button("Pause / resume")
      pause.on_click(lambda _: self.toggle_pause())
      faster = gui.add_button("Speed up")
      faster.on_click(lambda _: self.speed_up())
      slower = gui.add_button("Slow down")
      slower.on_click(lambda _: self.slow_down())
      nxt = gui.add_button("Next env")
      nxt.on_click(lambda _: self.next_env())
      prv = gui.add_button("Prev env")
      prv.on_click(lambda _: self.prev_env())

  def is_running(self) -> bool:
    return self._server is not None

  def sync_env_to_viewer(self) -> None:
    import mujoco

    # Env-index slider lives in the scene GUI; adopt it for state sync.
    self.env_idx = self._scene.env_idx = int(self._scene.env_idx)

    self._mj_data.qpos[:] = self.get_env_qpos()
    mujoco.mj_forward(self._mj_model, self._mj_data)

    # Debug overlays (command-term arrows/frames/ghosts) queue into the
    # scene and flush with the pose update below.
    if self._scene.debug_visualization_enabled:
      if hasattr(self.env, "ensure_derived"):
        self.env.ensure_derived()
      cm = getattr(self.env, "command_manager", None)
      if cm is not None and hasattr(cm, "debug_vis_callback"):
        cm.debug_vis_callback(self._scene)

    self._scene.update(
      np.asarray(self._mj_data.geom_xpos), np.asarray(self._mj_data.geom_xmat)
    )

    # Contact markers from the engine's batched contact state.
    if self._scene.show_contact_points or self._scene.show_contact_forces:
      from mjlab_tpu.viewer.contact_vis import compute_contact_visuals

      c = self.env.state.data.contact
      m = self._mj_model
      self._scene.update_contacts(
        compute_contact_visuals(
          np.asarray(c.dist[self.env_idx]),
          np.asarray(c.includemargin[self.env_idx]),
          np.asarray(c.pos[self.env_idx]),
          np.asarray(c.frame[self.env_idx]),
          np.asarray(self.env.contact_forces()[self.env_idx]),
          meansize=float(m.stat.meansize),
          meanmass=float(m.stat.meanmass),
          contactwidth=float(m.vis.scale.contactwidth),
          contactheight=float(m.vis.scale.contactheight),
          forcewidth=float(m.vis.scale.forcewidth),
          force_map=float(m.vis.map.force),
        )
      )

    # Camera tracking of the configured body for connected clients.
    if self._scene.camera_tracking_enabled and self.cfg.body_name:
      entity = self.env.scene[self.cfg.asset_name]
      body_id = entity.indexing.body_ids[
        entity.body_names.index(self.cfg.body_name)
      ]
      self._scene.track_camera(np.asarray(self._mj_data.xpos[body_id]))

    if self._plotter is not None:
      values = {
        k.split("/", 1)[1]: (
          float(np.asarray(v)[self.env_idx]) if np.ndim(v) else float(v)
        )
        for k, v in self.env.step_log.items()
        if k.startswith("Episode_Reward/")
      }
      if values:
        self._plotter.update(values)

  def close(self) -> None:
    if self._scene is not None:
      self._scene.remove()
    if self._server is not None:
      self._server.stop()
      self._server = None
