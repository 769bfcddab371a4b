"""Native MuJoCo window viewer with env cycling, interactive perturbation,
debug overlays and live reward plots.

Mirrors the reference NativeMujocoViewer (viewer/native.py:45): a passive
mujoco.viewer window driven by the paced BaseViewer loop; keyboard controls
routed through the thread-safe action queue (ENTER reset, space pause,
-/= speed, ,/. or [] env cycling, P reward plots, R debug overlays,
Shift+C contact points, Shift+F contact forces); ctrl-drag perturbation
forces broadcast back into the batched device state (reference
native.py:197-205); other envs rendered as ghosts; command-term debug
arrows drawn into the user scene each frame; per-reward-term mjvFigure
panels with rolling history and percentile y-autoscaling (reference
native.py:337-397 — whose set_figures call the reference ships commented
out; here it runs when the viewer handle supports it)."""

from __future__ import annotations

import time
from collections import deque

import numpy as np

from mjlab_tpu.viewer.base import BaseViewer, ViewerAction, ViewerConfig
from mjlab_tpu.viewer.contact_vis import compute_contact_visuals
from mjlab_tpu.viewer.debug_visualizer import MjvDebugVisualizer

_KEY_ENTER = 257
_KEY_SPACE = 32
_KEY_COMMA = 44
_KEY_PERIOD = 46
_KEY_LBRACKET = 91
_KEY_RBRACKET = 93
_KEY_MINUS = 45
_KEY_EQUAL = 61
_KEY_C = 67
_KEY_F = 70
_KEY_P = 80
_KEY_R = 82

# Ghost rendering of non-selected envs is capped: each ghost is a full
# mj_forward + mjv_addGeoms per frame on the host.
_MAX_GHOST_ENVS = 4


class RewardFigures:
  """Per-term mjvFigure panels with rolling history (data side is viewer-
  independent and unit-testable)."""

  def __init__(self, term_names: list[str], history: int = 200,
               max_panels: int = 12) -> None:
    import mujoco

    self.term_names = list(term_names)[:max_panels]
    self.history = history
    self._histories = {n: deque(maxlen=history) for n in self.term_names}
    self.figures = {}
    for name in self.term_names:
      fig = mujoco.MjvFigure()
      mujoco.mjv_defaultFigure(fig)
      fig.title = name[:99].encode() if isinstance(name, str) else name
      fig.flg_ticklabel[1] = 1
      fig.gridsize[0] = 2
      fig.gridsize[1] = 3
      fig.range[0][0] = -history
      fig.range[0][1] = 0
      fig.figurergba[3] = 0.35
      self.figures[name] = fig

  def append(self, values: dict[str, float]) -> None:
    for name in self.term_names:
      v = float(values.get(name, np.nan))
      if np.isfinite(v):
        self._histories[name].append(v)
      self._write(name)

  def _write(self, name: str) -> None:
    fig = self.figures[name]
    hist = self._histories[name]
    n = min(len(hist), self.history)
    fig.linepnt[0] = n
    for i in range(n):
      fig.linedata[0][2 * i] = float(-i)
      fig.linedata[0][2 * i + 1] = float(hist[-1 - i])
    if n >= 5:
      data = np.fromiter(hist, dtype=float, count=n)
      lo, hi = np.percentile(data, 5.0), np.percentile(data, 95.0)
      span = max(hi - lo, 1e-3)
      lo, hi = lo - 0.1 * span, hi + 0.1 * span
    elif n >= 1:
      v = float(hist[-1])
      span = max(abs(v), 1e-3)
      lo, hi = v - span, v + span
    else:
      lo, hi = -1.0, 1.0
    fig.range[1][0] = float(lo)
    fig.range[1][1] = float(hi)

  def viewport_figures(self, viewport_width: int, viewport_height: int,
                       panel_w: int = 240, panel_h: int = 150):
    """(viewport, figure) pairs laid out in a right-edge column grid."""
    import mujoco

    out = []
    cols = max(1, viewport_width // max(panel_w, 1) // 4)
    for i, name in enumerate(self.term_names):
      col, row = i % cols, i // cols
      x = viewport_width - (col + 1) * panel_w
      y = viewport_height - (row + 1) * panel_h
      if y < 0:
        break
      vp = mujoco.MjrRect(x, y, panel_w, panel_h)
      out.append((vp, self.figures[name]))
    return out


class NativeMujocoViewer(BaseViewer):
  def __init__(self, env, policy, cfg: ViewerConfig | None = None,
               enable_perturbations: bool = True, verbose: bool = False):
    super().__init__(env, policy, cfg)
    import mujoco
    import mujoco.viewer

    self._mj = mujoco
    self.mj_model = self.env.sim.mj_model
    self.mj_data = mujoco.MjData(self.mj_model)
    self._viewer = None
    self._show_plots = True
    self._show_debug_vis = True
    self._show_contact_points = False
    self._show_contact_forces = False
    self.enable_perturbations = enable_perturbations
    self._verbose = verbose
    self._last_status = 0.0
    self._vd = None  # scratch MjData for ghost envs
    terms = list(getattr(getattr(env, "reward_manager", None), "active_terms",
                         []))
    self._reward_figs = RewardFigures(terms) if terms else None

  def setup(self) -> None:
    self._viewer = self._mj.viewer.launch_passive(
      self.mj_model, self.mj_data, key_callback=self._on_key,
      show_left_ui=False, show_right_ui=False,
    )
    cam = self._viewer.cam
    cam.distance = self.cfg.distance
    cam.elevation = self.cfg.elevation
    cam.azimuth = self.cfg.azimuth
    if self.env.num_envs > 1:
      self._vd = self._mj.MjData(self.mj_model)

  def _on_key(self, key: int) -> None:
    # Runs on the viewer thread: queue only (reference native.py:224-256).
    if key == _KEY_ENTER:
      self.request(ViewerAction.RESET)
    elif key == _KEY_SPACE:
      self.request(ViewerAction.TOGGLE_PAUSE)
    elif key in (_KEY_RBRACKET, _KEY_PERIOD):
      self.request(ViewerAction.NEXT_ENV)
    elif key in (_KEY_LBRACKET, _KEY_COMMA):
      self.request(ViewerAction.PREV_ENV)
    elif key == _KEY_EQUAL:
      self.request(ViewerAction.SPEED_UP)
    elif key == _KEY_MINUS:
      self.request(ViewerAction.SPEED_DOWN)
    elif key in (_KEY_P, _KEY_R, _KEY_C, _KEY_F):
      self.request(ViewerAction.CUSTOM, key)

  def _handle_custom_action(self, action, payload) -> bool:
    if payload == _KEY_P:
      self._show_plots = not self._show_plots
    elif payload == _KEY_R:
      self._show_debug_vis = not self._show_debug_vis
    elif payload == _KEY_C:
      self._show_contact_points = not self._show_contact_points
    elif payload == _KEY_F:
      self._show_contact_forces = not self._show_contact_forces
    else:
      return False
    return True

  def is_running(self) -> bool:
    return self._viewer is not None and self._viewer.is_running()

  def sync_viewer_to_env(self) -> None:
    """Broadcast viewer perturbation forces into the batched device state
    (reference native.py:197-205: the passive viewer writes ctrl-drag
    forces into the attached MjData's xfrc_applied on sync)."""
    if not self.enable_perturbations:
      return
    xfrc = np.asarray(self.mj_data.xfrc_applied)
    if not xfrc.any():
      return
    import jax.numpy as jnp

    data = self.env.state.data
    self.env.state = self.env.state.replace(
      data=data.replace(
        xfrc_applied=jnp.broadcast_to(
          jnp.asarray(xfrc, dtype=data.xfrc_applied.dtype)[None],
          data.xfrc_applied.shape,
        )
      )
    )

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

    # Debug overlays from command terms (R toggles).
    scn = self._viewer.user_scn
    scn.ngeom = 0
    if self._show_debug_vis:
      if hasattr(self.env, "ensure_derived"):
        self.env.ensure_derived()
      viz = MjvDebugVisualizer(scn, self.env_idx, mj_model=self.mj_model)
      cm = getattr(self.env, "command_manager", None)
      if cm is not None and hasattr(cm, "debug_vis_callback"):
        cm.debug_vis_callback(viz)

    # Contact point / force markers (Shift+C / Shift+F).
    if self._show_contact_points or self._show_contact_forces:
      self._draw_contacts(scn, data)

    # Ghost render of other envs (reference native.py:178-192).
    if self._vd is not None and self.env.num_envs > 1:
      import itertools

      others = [i for i in range(self.env.num_envs) if i != self.env_idx]
      for i in itertools.islice(others, _MAX_GHOST_ENVS):
        self._vd.qpos[:] = np.asarray(data.qpos[i])
        self._vd.qvel[:] = np.asarray(data.qvel[i])
        self._mj.mj_forward(self.mj_model, self._vd)
        self._mj.mjv_addGeoms(
          self.mj_model, self._vd, self._mj.MjvOption(), self._mj.MjvPerturb(),
          self._mj.mjtCatBit.mjCAT_DYNAMIC.value, scn,
        )

    # Periodic timing telemetry (reference base.py FPS/timing accounting).
    if self._verbose and time.perf_counter() - self._last_status > 5.0:
      self._last_status = time.perf_counter()
      print(f"[viewer] {self.timing.status_line()}", flush=True)

    # Live reward plots (set_figures availability depends on mujoco version).
    if self._reward_figs is not None and hasattr(self._viewer, "set_figures"):
      if self._show_plots:
        values = {
          k.split("/", 1)[1]: float(np.asarray(v)[self.env_idx])
          if np.ndim(v) else float(v)
          for k, v in self.env.step_log.items()
          if k.startswith("Episode_Reward/")
        }
        self._reward_figs.append(values)
        vp = self._viewer.viewport
        self._viewer.set_figures(
          self._reward_figs.viewport_figures(vp.width, vp.height)
        )
      else:
        self._viewer.set_figures([])
    self._viewer.sync()

  def _draw_contacts(self, scn, data) -> None:
    """Contact discs + force arrows for the selected env, from the engine's
    batched contact state (markers via viewer/contact_vis.py)."""
    mj = self._mj
    c = data.contact
    forces = self.env.contact_forces()[self.env_idx]
    vis = compute_contact_visuals(
      np.asarray(c.dist[self.env_idx]),
      np.asarray(c.includemargin[self.env_idx]),
      np.asarray(c.pos[self.env_idx]),
      np.asarray(c.frame[self.env_idx]),
      np.asarray(forces),
      meansize=float(self.mj_model.stat.meansize),
      meanmass=float(self.mj_model.stat.meanmass),
      contactwidth=float(self.mj_model.vis.scale.contactwidth),
      contactheight=float(self.mj_model.vis.scale.contactheight),
      forcewidth=float(self.mj_model.vis.scale.forcewidth),
      force_map=float(self.mj_model.vis.map.force),
    )
    if self._show_contact_points:
      for k in range(vis.count):
        if scn.ngeom >= scn.maxgeom:
          return
        g = scn.geoms[scn.ngeom]
        mj.mjv_initGeom(
          g, mj.mjtGeom.mjGEOM_CYLINDER, vis.point_size[k],
          vis.point_pos[k], vis.point_mat[k].reshape(9),
          np.array([0.9, 0.6, 0.2, 0.8], dtype=np.float32),
        )
        scn.ngeom += 1
    if self._show_contact_forces:
      for k in range(len(vis.force_pos)):
        if scn.ngeom >= scn.maxgeom:
          return
        g = scn.geoms[scn.ngeom]
        mj.mjv_initGeom(
          g, mj.mjtGeom.mjGEOM_ARROW,
          np.array([vis.force_width, vis.force_width, vis.force_len[k]]),
          vis.force_pos[k], vis.force_mat[k].reshape(9),
          np.array([1.0, 0.0, 0.0, 0.8], dtype=np.float32),
        )
        scn.ngeom += 1

  def close(self) -> None:
    if self._viewer is not None:
      self._viewer.close()
