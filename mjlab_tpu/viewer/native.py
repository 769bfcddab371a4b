"""Native MuJoCo window viewer with env cycling, debug overlays and live
reward plots.

Mirrors the reference NativeMujocoViewer (viewer/native.py:45): a passive
mujoco.viewer window driven by the paced BaseViewer loop; keyboard controls
(space pause, ±speed, [] env cycling, R toggles reward plots); command-term
debug arrows drawn into the user scene each frame; per-reward-term
mjvFigure panels with rolling history and percentile y-autoscaling
(reference native.py:337-397 — whose set_figures call the reference ships
commented out; here it runs when the viewer handle supports it)."""

from __future__ import annotations

from collections import deque

import numpy as np

from mjlab_tpu.viewer.base import BaseViewer, ViewerConfig
from mjlab_tpu.viewer.debug_visualizer import MjvDebugVisualizer

_KEY_SPACE = 32
_KEY_LBRACKET = 91
_KEY_RBRACKET = 93
_KEY_MINUS = 45
_KEY_EQUAL = 61
_KEY_R = 82


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
  def __init__(self, env, policy, cfg: ViewerConfig | None = None):
    super().__init__(env, policy, cfg)
    import mujoco
    import mujoco.viewer

    self._mj = mujoco
    self.mj_model = self.env.sim.mj_model
    self.mj_data = mujoco.MjData(self.mj_model)
    self._viewer = None
    self._show_plots = True
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
    elif key == _KEY_R:
      self._show_plots = not self._show_plots

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

  def close(self) -> None:
    if self._viewer is not None:
      self._viewer.close()
