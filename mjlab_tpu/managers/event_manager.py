"""Event manager: startup / reset / interval modes.

Mirrors reference managers/event_manager.py. Reset/interval events run inside
the jitted step with masked application (jnp.where) instead of env-id gathers.
Startup events run eagerly once at load time (reference applies them before
CUDA-graph capture — here, before the step function is traced).

Event term signature: `func(env, env_mask, **params)` — terms write state via
the entity/EnvContext write API with the mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase
from mjlab_tpu.managers.manager_term_config import EventTermCfg


class EventManager(ManagerBase):
  NS = "event"

  def __init__(self, cfg: dict[str, EventTermCfg], env):
    self.cfg = cfg
    super().__init__(env)
    env.ns(self.NS).update(self.init_state())

  def _prepare_terms(self) -> None:
    self._mode_terms: dict[str, list[str]] = {}
    self._terms: dict[str, EventTermCfg] = {}
    self.domain_randomization_fields: set[str] = set()
    for name, term_cfg in self.cfg.items():
      if term_cfg is None:
        continue
      self._resolve_common_term_cfg(name, term_cfg)
      self._mode_terms.setdefault(term_cfg.mode, []).append(name)
      self._terms[name] = term_cfg
      if term_cfg.domain_randomization and "field" in term_cfg.params:
        self.domain_randomization_fields.add(term_cfg.params["field"])

  @property
  def available_modes(self) -> list[str]:
    return list(self._mode_terms)

  @property
  def active_terms(self) -> dict[str, list[str]]:
    return dict(self._mode_terms)

  def init_state(self) -> dict:
    state: dict = {"interval_time_left": {}, "last_trigger_step": {}}
    for name in self._mode_terms.get("interval", []):
      cfg = self._terms[name]
      lo, hi = cfg.interval_range_s
      key = self._env.next_key()
      t = jax.random.uniform(
        key, (self.num_envs,), minval=lo, maxval=hi, dtype=self._env.dtype
      )
      state["interval_time_left"][name] = t
    for name in self._mode_terms.get("reset", []):
      if self._terms[name].min_step_count_between_reset > 0:
        state["last_trigger_step"][name] = jnp.zeros(
          (self.num_envs,), dtype=jnp.int32
        )
    return state

  def apply(self, mode: str, env_mask=None, dt: float | None = None,
            global_env_step_count=None) -> None:
    ns = self._env.ns(self.NS) if mode in ("interval", "reset") else None
    for name in self._mode_terms.get(mode, []):
      cfg = self._terms[name]
      if mode == "interval":
        time_left = ns["interval_time_left"][name] - dt
        fire = time_left <= 0.0
        lo, hi = cfg.interval_range_s
        resample = jax.random.uniform(
          self._env.next_key(), (self.num_envs,), minval=lo, maxval=hi,
          dtype=self._env.dtype,
        )
        ns["interval_time_left"][name] = jnp.where(fire, resample, time_left)
        cfg.func(self._env, fire, **cfg.params)
      elif mode == "reset":
        mask = env_mask
        if cfg.min_step_count_between_reset > 0 and global_env_step_count is not None:
          # Per-env trigger spacing (reference event_manager.py:146-172):
          # fire only for envs whose last trigger is at least
          # min_step_count_between_reset steps in the past.
          last = ns["last_trigger_step"][name]
          ok = (global_env_step_count - last) >= cfg.min_step_count_between_reset
          mask = jnp.logical_and(mask, ok)
          ns["last_trigger_step"][name] = jnp.where(
            mask, jnp.asarray(global_env_step_count, dtype=last.dtype), last
          )
        cfg.func(self._env, mask, **cfg.params)
      elif mode == "startup":
        mask = jnp.ones(self.num_envs, dtype=bool)
        cfg.func(self._env, mask, **cfg.params)
      else:
        raise ValueError(f"Unknown event mode {mode}")

  def reset(self, env_mask=None) -> dict:
    return {}
