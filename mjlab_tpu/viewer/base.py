"""Viewer base: real-time pacing loop with policy-in-the-loop stepping.

Mirrors the reference BaseViewer (viewer/base.py:77-316): speed
multipliers, pause/resume, per-frame timing telemetry, and the
device→host state sync needed to drive CPU MuJoCo rendering from the
batched TPU state (reference viewer loop sync, play.py:246-249).
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import Callable

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
  sim_time: float = 0.0
  render_time: float = 0.0
  frames: int = 0
  speeds: tuple[float, ...] = (0.125, 0.25, 0.5, 1.0, 2.0, 4.0)
  speed_idx: int = 3

  @property
  def speed(self) -> float:
    return self.speeds[self.speed_idx]


class BaseViewer:
  """Drives env.step(policy(obs)) at (paced) real time and renders env 0."""

  def __init__(self, env, policy: Callable, cfg: ViewerConfig | None = None):
    self.env = env.unwrapped if hasattr(env, "unwrapped") else env
    self.policy = policy
    self.cfg = cfg or getattr(self.env.cfg, "viewer", None) or ViewerConfig()
    self.timing = ViewerTiming()
    self.paused = False
    self.env_idx = 0
    self._obs = None

  # -- lifecycle hooks implemented by concrete viewers ---------------------------

  def setup(self) -> None: ...

  def sync_env_to_viewer(self) -> None: ...

  def is_running(self) -> bool:
    return True

  def close(self) -> None: ...

  # -- loop -----------------------------------------------------------------------

  def step_simulation(self) -> None:
    if self._obs is None:
      self._obs, _ = self.env.reset()
    t0 = time.perf_counter()
    action = self.policy(self._obs)
    self._obs, *_ = self.env.step(action)
    self.timing.sim_time += time.perf_counter() - t0

  def run(self, max_steps: int | None = None) -> None:
    self.setup()
    step_dt = self.env.step_dt
    steps = 0
    try:
      while self.is_running():
        frame_start = time.perf_counter()
        if not self.paused:
          self.step_simulation()
          steps += 1
        t0 = time.perf_counter()
        self.sync_env_to_viewer()
        self.timing.render_time += time.perf_counter() - t0
        self.timing.frames += 1
        if max_steps is not None and steps >= max_steps:
          break
        # Real-time pacing with the speed multiplier.
        target = step_dt / self.timing.speed
        elapsed = time.perf_counter() - frame_start
        if elapsed < target:
          time.sleep(target - elapsed)
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

  def next_env(self) -> None:
    self.env_idx = (self.env_idx + 1) % self.env.num_envs

  def prev_env(self) -> None:
    self.env_idx = (self.env_idx - 1) % self.env.num_envs

  # -- host state sync ---------------------------------------------------------------

  def get_env_qpos(self) -> np.ndarray:
    """qpos of the selected env, synced device → host."""
    return np.asarray(self.env.state.data.qpos[self.env_idx])
