"""Viewer base: real-time pacing loop with policy-in-the-loop stepping.

Mirrors the reference BaseViewer (viewer/base.py:77-316): speed multipliers,
pause/resume, a thread-safe action queue (key callbacks run on the viewer
thread and must not touch env state directly), per-frame sim/render timing
telemetry with smoothed FPS, and the device→host state sync needed to drive
CPU MuJoCo rendering from the batched TPU state (reference viewer loop sync,
play.py:246-249). `sync_viewer_to_env` is the reverse hook: viewers that
support interactive perturbation push host-side forces back into the batched
device state before each step (reference native.py:197-205).
"""

from __future__ import annotations

import enum
import time
from collections import deque
from dataclasses import dataclass
from typing import Any, Callable

import numpy as np


@dataclass
class ViewerConfig:
  class OriginType(enum.Enum):
    WORLD = "world"
    ASSET_BODY = "asset_body"

  origin_type: OriginType = OriginType.WORLD
  asset_name: str = "robot"
  body_name: str = ""
  distance: float = 3.0
  elevation: float = -5.0
  azimuth: float = 90.0


@dataclass
class ViewerTiming:
  """Accumulated + smoothed loop telemetry (reference base.py:100-121)."""

  sim_time: float = 0.0
  render_time: float = 0.0
  frames: int = 0
  speeds: tuple[float, ...] = (0.125, 0.25, 0.5, 1.0, 2.0, 4.0)
  speed_idx: int = 3
  smoothed_fps: float = 0.0
  _fps_accum_frames: int = 0
  _fps_accum_time: float = 0.0
  _fps_alpha: float = 0.35
  _fps_update_interval: float = 0.5

  @property
  def speed(self) -> float:
    return self.speeds[self.speed_idx]

  def record_frame(self, frame_time: float) -> None:
    self.frames += 1
    self._fps_accum_frames += 1
    self._fps_accum_time += frame_time
    if self._fps_accum_time >= self._fps_update_interval:
      inst = self._fps_accum_frames / self._fps_accum_time
      self.smoothed_fps = (
        inst
        if self.smoothed_fps == 0.0
        else self._fps_alpha * inst + (1 - self._fps_alpha) * self.smoothed_fps
      )
      self._fps_accum_frames = 0
      self._fps_accum_time = 0.0

  def status_line(self) -> str:
    n = max(self.frames, 1)
    return (
      f"{self.smoothed_fps:5.1f} fps | speed x{self.speed:g} | "
      f"sim {1e3 * self.sim_time / n:6.2f} ms | "
      f"render {1e3 * self.render_time / n:6.2f} ms"
    )


class ViewerAction(enum.Enum):
  RESET = "reset"
  TOGGLE_PAUSE = "toggle_pause"
  SPEED_UP = "speed_up"
  SPEED_DOWN = "speed_down"
  PREV_ENV = "prev_env"
  NEXT_ENV = "next_env"
  CUSTOM = "custom"


class BaseViewer:
  """Drives env.step(policy(obs)) at (paced) real time and renders one env."""

  def __init__(self, env, policy: Callable, cfg: ViewerConfig | None = None):
    self.env = env.unwrapped if hasattr(env, "unwrapped") else env
    self.policy = policy
    self.cfg = cfg or getattr(self.env.cfg, "viewer", None) or ViewerConfig()
    self.timing = ViewerTiming()
    self.paused = False
    self.env_idx = 0
    self._obs = None
    # Key callbacks run on the render thread: queue, drain on the main loop.
    self._actions: deque[tuple[ViewerAction, Any]] = deque()

  # -- lifecycle hooks implemented by concrete viewers ---------------------------

  def setup(self) -> None: ...

  def sync_env_to_viewer(self) -> None: ...

  def sync_viewer_to_env(self) -> None:
    """Push viewer-side interaction (perturbation forces) into the env."""

  def is_running(self) -> bool:
    return True

  def close(self) -> None: ...

  # -- thread-safe requests (call from key callbacks) -----------------------------

  def request(self, action: ViewerAction | str, payload: Any = None) -> None:
    if isinstance(action, str):
      try:
        action = ViewerAction[action]
      except KeyError:
        action = ViewerAction.CUSTOM
    self._actions.append((action, payload))

  def _process_actions(self) -> None:
    while self._actions:
      action, payload = self._actions.popleft()
      if action == ViewerAction.RESET:
        self.reset_environment()
      elif action == ViewerAction.TOGGLE_PAUSE:
        self.toggle_pause()
      elif action == ViewerAction.SPEED_UP:
        self.speed_up()
      elif action == ViewerAction.SPEED_DOWN:
        self.speed_down()
      elif action == ViewerAction.NEXT_ENV:
        self.next_env()
      elif action == ViewerAction.PREV_ENV:
        self.prev_env()
      else:
        self._handle_custom_action(action, payload)

  def _handle_custom_action(self, action: ViewerAction, payload: Any) -> bool:
    del action, payload
    return False

  # -- loop -----------------------------------------------------------------------

  def step_simulation(self) -> None:
    if self._obs is None:
      self._obs, _ = self.env.reset()
    t0 = time.perf_counter()
    action = self.policy(self._obs)
    self._obs, *_ = self.env.step(action)
    self.timing.sim_time += time.perf_counter() - t0

  def reset_environment(self) -> None:
    self._obs, _ = self.env.reset()

  def run(self, max_steps: int | None = None) -> None:
    self.setup()
    step_dt = self.env.step_dt
    steps = 0
    try:
      while self.is_running():
        frame_start = time.perf_counter()
        self._process_actions()
        if not self.paused:
          self.sync_viewer_to_env()
          self.step_simulation()
          steps += 1
        t0 = time.perf_counter()
        self.sync_env_to_viewer()
        self.timing.render_time += time.perf_counter() - t0
        if max_steps is not None and steps >= max_steps:
          break
        # Real-time pacing with the speed multiplier.
        target = step_dt / self.timing.speed
        elapsed = time.perf_counter() - frame_start
        if elapsed < target:
          time.sleep(target - elapsed)
        self.timing.record_frame(time.perf_counter() - frame_start)
    finally:
      self.close()

  # -- controls ---------------------------------------------------------------------

  def toggle_pause(self) -> None:
    self.paused = not self.paused

  def speed_up(self) -> None:
    self.timing.speed_idx = min(
      self.timing.speed_idx + 1, len(self.timing.speeds) - 1
    )

  def slow_down(self) -> None:
    self.timing.speed_idx = max(self.timing.speed_idx - 1, 0)

  # Reference naming (base.py increase/decrease_speed).
  speed_down = slow_down

  def next_env(self) -> None:
    self.env_idx = (self.env_idx + 1) % self.env.num_envs

  def prev_env(self) -> None:
    self.env_idx = (self.env_idx - 1) % self.env.num_envs

  # -- host state sync ---------------------------------------------------------------

  def get_env_qpos(self) -> np.ndarray:
    """qpos of the selected env, synced device → host."""
    return np.asarray(self.env.state.data.qpos[self.env_idx])
