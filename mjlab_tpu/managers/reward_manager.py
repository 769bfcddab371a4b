"""Reward manager: reward = Σ term(env, **params) · weight · dt.

Mirrors reference managers/reward_manager.py:60-111 — zero-weight terms are
skipped, per-term episodic sums are accumulated and surfaced (summed over
resetting envs) in the reset log for Episode_Reward/<name> metrics.
"""

from __future__ import annotations

import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase, ManagerTermBase
from mjlab_tpu.managers.manager_term_config import RewardTermCfg


class RewardManager(ManagerBase):
  NS = "reward"

  def __init__(self, cfg: dict[str, RewardTermCfg], env):
    self.cfg = cfg
    super().__init__(env)
    env.ns(self.NS).update(self.init_state())

  def _prepare_terms(self) -> None:
    self._term_names: list[str] = []
    self._term_cfgs: list[RewardTermCfg] = []
    for name, term_cfg in self.cfg.items():
      if term_cfg is None:
        continue
      self._resolve_common_term_cfg(name, term_cfg)
      if term_cfg.weight == 0.0:
        continue
      if isinstance(term_cfg.func, ManagerTermBase):
        term_cfg.func.NS = self.NS
        term_cfg.func._term_name = name
      self._term_names.append(name)
      self._term_cfgs.append(term_cfg)

  def __str__(self) -> str:
    from mjlab_tpu.utils.logging import render_table

    rows = [[i, n, c.weight] for i, (n, c) in enumerate(
      zip(self._term_names, self._term_cfgs))]
    return render_table("Active Reward Terms", ["Index", "Name", "Weight"],
                        rows)

  @property
  def active_terms(self) -> list[str]:
    return list(self._term_names)

  def get_term_cfg(self, name: str) -> RewardTermCfg:
    return self._term_cfgs[self._term_names.index(name)]

  def init_state(self) -> dict:
    B = self.num_envs
    term_state = {}
    for name, cfg in zip(self._term_names, self._term_cfgs):
      if isinstance(cfg.func, ManagerTermBase):
        term_state[name] = cfg.func.init_state()
    return {
      "episode_sums": {
        n: jnp.zeros(B, dtype=self._env.dtype) for n in self._term_names
      },
      # Weights as state so reward_weight curriculum can stage them in-trace.
      "weights": {
        n: jnp.asarray(c.weight, dtype=self._env.dtype)
        for n, c in zip(self._term_names, self._term_cfgs)
      },
      "term_state": term_state,
    }

  def compute(self, dt: float):
    ns = self._env.ns(self.NS)
    total = jnp.zeros(self.num_envs, dtype=self._env.dtype)
    for name, cfg in zip(self._term_names, self._term_cfgs):
      value = cfg.func(self._env, **cfg.params) * ns["weights"][name] * dt
      total = total + value
      ns["episode_sums"][name] = ns["episode_sums"][name] + value
    return total

  def reset(self, env_mask=None) -> dict:
    """Clear episodic sums for masked envs; return per-term sums (over
    resetting envs) for logging."""
    ns = self._env.ns(self.NS)
    log = {}
    for name, cfg in zip(self._term_names, self._term_cfgs):
      if isinstance(cfg.func, ManagerTermBase):
        cfg.func.reset(env_mask)
    for name in self._term_names:
      sums = ns["episode_sums"][name]
      if env_mask is None:
        log[f"Episode_Reward/{name}"] = jnp.sum(sums)
        ns["episode_sums"][name] = jnp.zeros_like(sums)
      else:
        log[f"Episode_Reward/{name}"] = jnp.sum(jnp.where(env_mask, sums, 0.0))
        ns["episode_sums"][name] = jnp.where(env_mask, 0.0, sums)
    return log
