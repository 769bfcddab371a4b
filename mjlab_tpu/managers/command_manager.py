"""Command manager: per-env command generation with resampling clocks.

Mirrors reference managers/command_manager.py: CommandTerm lifecycle
(_resample_command on expired clocks / reset, _update_command every step,
_update_metrics), metrics surfaced as Metrics/<term>/<metric> at reset.
All masked (no env-id gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, ManagerTermBase
from mjlab_tpu.managers.manager_term_config import CommandTermCfg


class CommandTerm(ManagerTermBase):
  """Stateful command term. Subclasses implement command property getters and
  the _resample/_update hooks operating on their state dict."""

  def __init__(self, cfg: CommandTermCfg, env):
    super().__init__(cfg, env)
    self._term_name: str | None = None

  @property
  def state(self) -> dict:
    return self._env.ns("command")[self._term_name]

  @property
  def command(self) -> jax.Array:
    raise NotImplementedError

  def init_state(self) -> dict:
    return {
      "time_left": jnp.zeros(self.num_envs, dtype=self._env.dtype),
      "metrics": self._init_metrics(),
      **self._init_term_state(),
    }

  def _init_metrics(self) -> dict:
    return {}

  def _init_term_state(self) -> dict:
    return {}

  def _resample_command(self, env_mask) -> None:
    raise NotImplementedError

  def _update_command(self) -> None:
    pass

  def _update_metrics(self) -> None:
    pass

  def _resample_time(self, env_mask) -> None:
    lo, hi = self.cfg.resampling_time_range
    new_t = jax.random.uniform(
      self._env.next_key(), (self.num_envs,), minval=lo, maxval=hi,
      dtype=self._env.dtype,
    )
    self.state["time_left"] = jnp.where(env_mask, new_t, self.state["time_left"])

  def compute(self, dt: float) -> None:
    st = self.state
    st["time_left"] = st["time_left"] - dt
    expired = st["time_left"] <= 0.0
    self._resample_time(expired)
    self._resample_command(expired)
    self._update_command()
    self._update_metrics()

  def reset(self, env_mask=None) -> dict:
    if env_mask is None:
      env_mask = jnp.ones(self.num_envs, dtype=bool)
    self._resample_time(env_mask)
    self._resample_command(env_mask)
    self._update_command()
    metrics = {}
    for name, value in self.state["metrics"].items():
      metrics[name] = jnp.sum(jnp.where(env_mask, value, 0.0))
      self.state["metrics"][name] = jnp.where(env_mask, 0.0, value)
    return metrics


class CommandManager(ManagerBase):
  NS = "command"

  def __init__(self, cfg: dict[str, CommandTermCfg], env):
    self.cfg = cfg
    super().__init__(env)
    env.ns(self.NS).update(self.init_state())

  def _prepare_terms(self) -> None:
    self._terms: dict[str, CommandTerm] = {}
    for name, term_cfg in self.cfg.items():
      if term_cfg is None:
        continue
      assert term_cfg.class_type is not None
      term = term_cfg.class_type(term_cfg, self._env)
      term._term_name = name
      self._terms[name] = term

  @property
  def active_terms(self) -> list[str]:
    return list(self._terms)

  def init_state(self) -> dict:
    return {n: t.init_state() for n, t in self._terms.items()}

  def get_command(self, name: str) -> jax.Array:
    return self._terms[name].command

  def get_term(self, name: str) -> CommandTerm:
    return self._terms[name]

  def compute(self, dt: float) -> None:
    for term in self._terms.values():
      term.compute(dt)

  def reset(self, env_mask=None) -> dict:
    log = {}
    for name, term in self._terms.items():
      metrics = term.reset(env_mask)
      for metric_name, value in metrics.items():
        log[f"Metrics/{name}/{metric_name}"] = value
    return log

  # Viewer hook (reference command_manager.py:31-36).
  def debug_vis_callback(self, visualizer) -> None:
    for term in self._terms.values():
      if getattr(term.cfg, "debug_vis", False) and hasattr(term, "debug_vis"):
        term.debug_vis(visualizer)


class NullCommandManager:
  """No-op command manager (reference command_manager.py:162)."""

  active_terms: list[str] = []

  def init_state(self) -> dict:
    return {}

  def get_command(self, name: str):
    raise KeyError("No command manager configured.")

  def compute(self, dt: float) -> None:
    pass

  def reset(self, env_mask=None) -> dict:
    return {}

  def __str__(self):
    return "<NullCommandManager>"
