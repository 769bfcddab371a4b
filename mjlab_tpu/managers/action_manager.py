"""Action manager: splits the flat action vector across ordered ActionTerms.

Mirrors reference managers/action_manager.py: `process_action` once per env
step (scale/offset), `apply_action` every physics substep. Buffers
(action/prev_action, per-term processed actions) live in the env state
pytree under the "action" namespace.
"""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, ManagerTermBase
from mjlab_tpu.managers.manager_term_config import ActionTermCfg


class ActionTerm(ManagerTermBase):
  def __init__(self, cfg: ActionTermCfg, env):
    super().__init__(cfg, env)
    self._asset = env.scene[cfg.asset_name]
    self._term_name: str | None = None

  @property
  def action_dim(self) -> int:
    raise NotImplementedError

  @property
  def state(self) -> dict:
    return self._env.ns("action")["terms"][self._term_name]

  @state.setter
  def state(self, value: dict) -> None:
    self._env.ns("action")["terms"][self._term_name] = value

  def init_state(self) -> dict:
    return {}

  def process_actions(self, actions) -> None:
    raise NotImplementedError

  def apply_actions(self) -> None:
    raise NotImplementedError

  def reset(self, env_mask=None) -> None:
    pass


class ActionManager(ManagerBase):
  NS = "action"

  def __init__(self, cfg: dict[str, ActionTermCfg], env):
    self.cfg = cfg
    super().__init__(env)
    env.ns(self.NS).update(self.init_state())

  def _prepare_terms(self) -> None:
    self._term_names: list[str] = []
    self._terms: dict[str, ActionTerm] = {}
    for name, term_cfg in self.cfg.items():
      if term_cfg is None:
        continue
      assert term_cfg.class_type is not None, f"Action term {name} needs class_type"
      term = term_cfg.class_type(term_cfg, self._env)
      term._term_name = name
      self._term_names.append(name)
      self._terms[name] = term

  # -- state --------------------------------------------------------------------

  def init_state(self) -> dict:
    B, A = self.num_envs, self.total_action_dim
    dtype = self._env.dtype
    return {
      "action": jnp.zeros((B, A), dtype=dtype),
      "prev_action": jnp.zeros((B, A), dtype=dtype),
      "terms": {n: t.init_state() for n, t in self._terms.items()},
    }

  @property
  def total_action_dim(self) -> int:
    return sum(self.action_term_dim)

  @property
  def action_term_dim(self) -> list[int]:
    return [self._terms[n].action_dim for n in self._term_names]

  @property
  def active_terms(self) -> list[str]:
    return list(self._term_names)

  @property
  def action(self):
    return self._env.ns(self.NS)["action"]

  @property
  def prev_action(self):
    return self._env.ns(self.NS)["prev_action"]

  def get_term(self, name: str) -> ActionTerm:
    return self._terms[name]

  # -- step ----------------------------------------------------------------------

  def process_action(self, action) -> None:
    # Cast at the env boundary: callers (gym, tests under x64, torch interop)
    # may hand f64 actions; everything downstream is env.dtype and a f64
    # value reaching a f32 scatter is a future JAX hard error.
    action = jnp.asarray(action, dtype=self._env.dtype)
    ns = self._env.ns(self.NS)
    ns["prev_action"] = ns["action"]
    ns["action"] = action
    idx = 0
    for name in self._term_names:
      term = self._terms[name]
      term_action = action[:, idx : idx + term.action_dim]
      term.process_actions(term_action)
      idx += term.action_dim

  def apply_action(self) -> None:
    for name in self._term_names:
      self._terms[name].apply_actions()

  def reset(self, env_mask=None) -> dict:
    ns = self._env.ns(self.NS)
    if env_mask is None:
      ns["action"] = jnp.zeros_like(ns["action"])
      ns["prev_action"] = jnp.zeros_like(ns["prev_action"])
    else:
      m = env_mask[:, None]
      ns["action"] = jnp.where(m, 0.0, ns["action"])
      ns["prev_action"] = jnp.where(m, 0.0, ns["prev_action"])
    for name in self._term_names:
      self._terms[name].reset(env_mask)
    return {}
