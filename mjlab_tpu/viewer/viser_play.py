"""Browser (viser/websocket) viewer.

TPU-side counterpart of the reference's viser stack (viewer/viser_play.py +
viser_scene.py + viser_reward_plotter.py): a Controls tab with an HTML
status display, pause/reset/speed buttons and the full visualization GUI; a
Rewards tab with live plots; a Geoms tab with group toggles. Every env is
rendered simultaneously from the batched device state (body xpos/xquat come
straight off the Data pytree — no per-env host FK), with hide-others /
camera-tracking recentring handled by ViserMjScene. The `viser` package is
optional in this environment; the import is gated in the constructor and
everything viser-independent lives in viser_scene / viser_conversions /
contact_vis for headless testability.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np

from mjlab_tpu.viewer.base import BaseViewer, ViewerConfig


class ViserViewer(BaseViewer):
  """Browser viewer: streams batched body poses of ALL envs over websocket."""

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
    self._threadpool: ThreadPoolExecutor | None = None
    self._counter = 0
    self._prev_env_idx = 0

  def setup(self) -> None:
    import viser

    from mjlab_tpu.viewer.viser_reward_plotter import ViserRewardPlotter
    from mjlab_tpu.viewer.viser_scene import ViserMjScene

    self._server = viser.ViserServer(port=self._port, verbose=False)
    self._threadpool = ThreadPoolExecutor(max_workers=1)
    m = self.env.sim.mj_model
    self._mj_model = m

    self._scene = ViserMjScene(self._server, m, num_envs=self.env.num_envs)

    tabs = self._server.gui.add_tab_group()
    with tabs.add_tab("Controls"):
      with self._server.gui.add_folder("Info"):
        self._status_html = self._server.gui.add_html("")
      self._build_controls()
      self._scene.create_visualization_gui(
        camera_distance=self.cfg.distance,
        camera_azimuth=self.cfg.azimuth,
        camera_elevation=self.cfg.elevation,
      )

    reward_terms = list(getattr(self.env.reward_manager, "active_terms", []))
    if reward_terms:
      with tabs.add_tab("Rewards"):
        self._plotter = ViserRewardPlotter(self._server, reward_terms)

    self._scene.create_geom_groups_gui(tabs)
    # Browser-side drag perturbation (beyond the reference viser stack).
    self._scene.enable_perturbation()
    self._prev_env_idx = self._scene.env_idx
    self._update_status_display()

  def sync_viewer_to_env(self) -> None:
    """Apply the browser drag-gizmo spring force to the selected env
    (counterpart of the native viewer's ctrl-drag xfrc sync)."""
    if self._scene is None:
      return
    import jax.numpy as jnp

    perturb = self._scene.pop_perturbation()
    data = self.env.state.data
    if perturb is None:
      if getattr(self, "_perturb_was_active", False):
        self._perturb_was_active = False
        self.env.state = self.env.state.replace(
          data=data.replace(xfrc_applied=jnp.zeros_like(data.xfrc_applied))
        )
      return

    body, force = perturb
    self._perturb_was_active = True
    xfrc = np.zeros(data.xfrc_applied.shape[1:], dtype=np.float64)
    xfrc[body, :3] = force
    self.env.state = self.env.state.replace(
      data=data.replace(
        xfrc_applied=data.xfrc_applied.at[self.env_idx].set(
          jnp.asarray(xfrc, dtype=data.xfrc_applied.dtype)
        )
      )
    )

  def _build_controls(self) -> None:
    gui = self._server.gui
    with gui.add_folder("Simulation"):
      pause = gui.add_button("Pause")

      def _toggle(_) -> None:
        self.toggle_pause()
        pause.label = "Play" if self.paused else "Pause"
        self._update_status_display()

      pause.on_click(_toggle)

      reset = gui.add_button("Reset Environment")

      def _reset(_) -> None:
        self.reset_environment()
        self._update_status_display()

      reset.on_click(_reset)

      faster = gui.add_button("Speed up")
      faster.on_click(lambda _: (self.speed_up(), self._update_status_display()))
      slower = gui.add_button("Slow down")
      slower.on_click(
        lambda _: (self.slow_down(), self._update_status_display())
      )

  def is_running(self) -> bool:
    return self._server is not None

  def reset_environment(self) -> None:
    super().reset_environment()
    if self._plotter is not None:
      self._plotter.clear_histories()

  def sync_env_to_viewer(self) -> None:
    # Env-index slider lives in the scene GUI; adopt it for state sync.
    self.env_idx = int(self._scene.env_idx)
    self._counter += 1

    if self._counter % 10 == 0:
      self._update_status_display()
      if self._scene.env_idx != self._prev_env_idx:
        self._prev_env_idx = self._scene.env_idx
        if self._plotter is not None:
          self._plotter.clear_histories()
        if self._scene.debug_visualization_enabled:
          self._scene.clear_debug_all()
      if self._plotter is not None and not self.paused:
        values = {
          k.split("/", 1)[1]: (
            float(np.asarray(v)[self.env_idx]) if np.ndim(v) else float(v)
          )
          for k, v in self.env.step_log.items()
          if k.startswith("Episode_Reward/")
        }
        if values:
          self._plotter.update(values)

    # Debug overlays (command-term arrows/frames/ghosts) queue into the
    # scene and flush with the pose update below.
    self._scene.clear()
    if self._scene.debug_visualization_enabled:
      if hasattr(self.env, "ensure_derived"):
        self.env.ensure_derived()
      cm = getattr(self.env, "command_manager", None)
      if cm is not None and hasattr(cm, "debug_vis_callback"):
        cm.debug_vis_callback(self._scene)

    # Contact markers from the engine's batched contact state.
    contacts = None
    if self._scene.show_contact_points or self._scene.show_contact_forces:
      from mjlab_tpu.viewer.contact_vis import compute_contact_visuals

      c = self.env.state.data.contact
      m = self._mj_model
      contacts = compute_contact_visuals(
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

    # Throttle pose streaming to every 2nd loop frame unless a settings
    # change requested an immediate repaint (reference viser_play.py:160).
    if self._counter % 2 != 0 and not self._scene.needs_update:
      return

    d = self.env.state.data
    body_xpos = np.asarray(d.xpos)
    body_xquat = np.asarray(d.xquat)
    mocap_pos = (
      np.asarray(d.mocap_pos) if d.mocap_pos.shape[-2] else None
    )
    mocap_quat = (
      np.asarray(d.mocap_quat) if d.mocap_quat.shape[-2] else None
    )

    def update_scene() -> None:
      self._scene.update(
        body_xpos, body_xquat, mocap_pos, mocap_quat,
        env_idx=self.env_idx, contacts=contacts,
      )
      self._server.flush()

    # Off-thread submit: serialization of large batched updates must not
    # stall the sim loop (reference viser_play.py:165-171).
    self._threadpool.submit(update_scene)

  def close(self) -> None:
    if self._plotter is not None:
      self._plotter.cleanup()
    if self._threadpool is not None:
      self._threadpool.shutdown(wait=True)
    if self._scene is not None:
      self._scene.remove()
    if self._server is not None:
      self._server.stop()
      self._server = None

  def _update_status_display(self) -> None:
    """HTML status block (reference viser_play.py:198-206)."""
    self._status_html.content = f"""
      <div style="font-size: 0.85em; line-height: 1.25; padding: 0 1em 0.5em 1em;">
        <strong>Status:</strong> {"Paused" if self.paused else "Running"}<br/>
        <strong>Frames:</strong> {self.timing.frames}<br/>
        <strong>Speed:</strong> {self.timing.speed:.0%}<br/>
        <strong>FPS:</strong> {self.timing.smoothed_fps:.1f}
      </div>
      """
