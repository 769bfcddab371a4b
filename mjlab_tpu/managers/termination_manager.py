"""Termination manager: ORs term outputs into terminated vs truncated.

Mirrors reference managers/termination_manager.py:86-119 (time_out flag
separates truncation for bootstrapping; Episode_Termination/<name> counts
logged at reset).
"""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase
from mjlab_tpu.managers.manager_term_config import TerminationTermCfg


class TerminationManager(ManagerBase):
  NS = "termination"

  def __init__(self, cfg: dict[str, TerminationTermCfg], env):
    self.cfg = cfg
    super().__init__(env)
    env.ns(self.NS).update(self.init_state())

  def _prepare_terms(self) -> None:
    self._term_names: list[str] = []
    self._term_cfgs: list[TerminationTermCfg] = []
    for name, term_cfg in self.cfg.items():
      if term_cfg is None:
        continue
      self._resolve_common_term_cfg(name, term_cfg)
      self._term_names.append(name)
      self._term_cfgs.append(term_cfg)

  def __str__(self) -> str:
    from mjlab_tpu.utils.logging import render_table

    rows = [[i, n, c.time_out] for i, (n, c) in enumerate(
      zip(self._term_names, self._term_cfgs))]
    return render_table("Active Termination Terms",
                        ["Index", "Name", "Time Out"], rows)

  @property
  def active_terms(self) -> list[str]:
    return list(self._term_names)

  def get_term_cfg(self, name: str) -> TerminationTermCfg:
    return self._term_cfgs[self._term_names.index(name)]

  def init_state(self) -> dict:
    B = self.num_envs
    return {
      "terminated": jnp.zeros(B, dtype=bool),
      "time_outs": jnp.zeros(B, dtype=bool),
      "episode_counts": {n: jnp.zeros(B, dtype=bool) for n in self._term_names},
    }

  @property
  def terminated(self):
    return self._env.ns(self.NS)["terminated"]

  @property
  def time_outs(self):
    return self._env.ns(self.NS)["time_outs"]

  @property
  def dones(self):
    return jnp.logical_or(self.terminated, self.time_outs)

  def get_term(self, name: str):
    return self._env.ns(self.NS)["episode_counts"][name]

  def compute(self):
    ns = self._env.ns(self.NS)
    terminated = jnp.zeros(self.num_envs, dtype=bool)
    time_outs = jnp.zeros(self.num_envs, dtype=bool)
    for name, cfg in zip(self._term_names, self._term_cfgs):
      value = cfg.func(self._env, **cfg.params).astype(bool)
      ns["episode_counts"][name] = value
      if cfg.time_out:
        time_outs = jnp.logical_or(time_outs, value)
      else:
        terminated = jnp.logical_or(terminated, value)
    ns["terminated"] = terminated
    ns["time_outs"] = time_outs
    return jnp.logical_or(terminated, time_outs)

  def reset(self, env_mask=None) -> dict:
    ns = self._env.ns(self.NS)
    log = {}
    for name in self._term_names:
      v = ns["episode_counts"][name]
      if env_mask is not None:
        v = jnp.logical_and(v, env_mask)
      log[f"Episode_Termination/{name}"] = jnp.sum(v.astype(jnp.int32))
    return log
