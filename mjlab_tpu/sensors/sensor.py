"""Sensor framework (reference sensor/sensor.py:21-111).

Lifecycle: `edit_spec` (pre-compile additions to the MjSpec), `initialize`
(bind indices post-compile), functional `init_state`/`update`/`reset`, and a
`data` property reading the current env state.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Generic, TypeVar

import mujoco

T = TypeVar("T")


@dataclass
class SensorCfg:
  name: str = ""

  def build(self) -> "Sensor":
    raise NotImplementedError


class Sensor(Generic[T]):
  cfg: SensorCfg

  def edit_spec(self, spec: mujoco.MjSpec, entities: dict[str, Any]) -> None:
    """Add required elements to the scene spec (pre-compile)."""

  def initialize(self, mj_model: mujoco.MjModel, ctx) -> None:
    """Bind indices after compilation; keep a handle to the state context."""
    self._ctx = ctx

  def init_state(self) -> dict:
    return {}

  @property
  def data(self) -> T:
    raise NotImplementedError

  def update(self, dt: float) -> None:
    pass

  def reset(self, env_mask=None) -> None:
    pass
