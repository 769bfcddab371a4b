"""Observation manager.

Per-term pipeline (order preserved from reference
managers/observation_manager.py:164-190): compute → noise → clip → scale →
delay → history → concat. Buffers are functional (utils/buffers) with state
in the env pytree under "observation".
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerBase
from mjlab_tpu.managers.manager_term_config import (
  ObservationGroupCfg,
  ObservationTermCfg,
)
from mjlab_tpu.utils import noise as noise_utils
from mjlab_tpu.utils.buffers import CircularBuffer, DelayBuffer


class ObservationManager(ManagerBase):
  NS = "observation"

  def __init__(self, cfg: dict[str, ObservationGroupCfg], env):
    self.cfg = cfg
    super().__init__(env)
    self._infer_dims()
    env.ns(self.NS).update(self.init_state())

  def _prepare_terms(self) -> None:
    self._group_term_names: dict[str, list[str]] = {}
    self._group_term_cfgs: dict[str, list[ObservationTermCfg]] = {}
    self._group_concatenate: dict[str, bool] = {}
    self._delay_buffers: dict[tuple[str, str], DelayBuffer] = {}
    self._history_buffers: dict[tuple[str, str], CircularBuffer] = {}
    self._noise_models: dict[tuple[str, str], noise_utils.NoiseModel] = {}

    for group_name, group_cfg in self.cfg.items():
      if group_cfg is None:
        continue
      self._group_term_names[group_name] = []
      self._group_term_cfgs[group_name] = []
      self._group_concatenate[group_name] = group_cfg.concatenate_terms
      for term_name, term_cfg in group_cfg.terms.items():
        if term_cfg is None:
          continue
        self._resolve_common_term_cfg(f"{group_name}/{term_name}", term_cfg)
        if not group_cfg.enable_corruption:
          term_cfg.noise = None
        if group_cfg.history_length is not None:
          term_cfg.history_length = group_cfg.history_length
          term_cfg.flatten_history_dim = group_cfg.flatten_history_dim
        self._group_term_names[group_name].append(term_name)
        self._group_term_cfgs[group_name].append(term_cfg)
        key = (group_name, term_name)
        if term_cfg.delay_max_lag > 0:
          self._delay_buffers[key] = DelayBuffer(
            min_lag=term_cfg.delay_min_lag,
            max_lag=term_cfg.delay_max_lag,
            batch_size=self.num_envs,
            per_env=term_cfg.delay_per_env,
            hold_prob=term_cfg.delay_hold_prob,
            update_period=term_cfg.delay_update_period,
            per_env_phase=term_cfg.delay_per_env_phase,
          )
        if term_cfg.history_length > 0:
          self._history_buffers[key] = CircularBuffer(
            max_len=term_cfg.history_length, batch_size=self.num_envs
          )
        if term_cfg.noise is not None and isinstance(
          term_cfg.noise, noise_utils.NoiseModelCfg
        ):
          cls = term_cfg.noise.class_type or noise_utils.NoiseModel
          self._noise_models[key] = cls(term_cfg.noise, num_envs=self.num_envs)

  def _infer_dims(self) -> None:
    """Dry-run terms on the current (eager) state to infer shapes."""
    self._group_obs_term_dim: dict[str, list[tuple[int, ...]]] = {}
    self._group_obs_dim: dict[str, tuple[int, ...] | list] = {}
    for group_name in self._group_term_names:
      dims = []
      for term_name, term_cfg in zip(
        self._group_term_names[group_name], self._group_term_cfgs[group_name]
      ):
        out = term_cfg.func(self._env, **term_cfg.params)
        shape = tuple(out.shape)
        if term_cfg.history_length > 0:
          if term_cfg.flatten_history_dim:
            shape = (shape[0], int(np.prod(shape[1:])) * term_cfg.history_length)
          else:
            shape = (shape[0], term_cfg.history_length) + shape[1:]
        dims.append(shape[1:])
      self._group_obs_term_dim[group_name] = dims
      if self._group_concatenate[group_name]:
        self._group_obs_dim[group_name] = (sum(d[-1] for d in dims),)
      else:
        self._group_obs_dim[group_name] = dims

  # -- properties ----------------------------------------------------------------

  def __str__(self) -> str:
    from mjlab_tpu.utils.logging import render_table

    blocks = []
    for group, names in self.active_terms.items():
      rows = []
      for i, n in enumerate(names):
        dim = self._group_obs_term_dim[group][i]
        rows.append([i, n, dim])
      blocks.append(render_table(
        f"Active Observation Terms in Group: '{group}' "
        f"(shape: {self._group_obs_dim[group]})",
        ["Index", "Name", "Shape"], rows))
    return "\n".join(blocks)

  @property
  def active_terms(self) -> dict[str, list[str]]:
    return self._group_term_names

  @property
  def group_obs_dim(self):
    return self._group_obs_dim

  @property
  def group_obs_term_dim(self):
    return self._group_obs_term_dim

  @property
  def group_obs_concatenate(self):
    return self._group_concatenate

  # -- state ----------------------------------------------------------------------

  def init_state(self) -> dict:
    state: dict = {"delay": {}, "history": {}, "noise": {}}
    for (g, t), db in self._delay_buffers.items():
      cfg = self._term_cfg(g, t)
      example = cfg.func(self._env, **cfg.params)
      state["delay"][f"{g}/{t}"] = db.init_state(example, self._env.next_key())
    for (g, t), hb in self._history_buffers.items():
      cfg = self._term_cfg(g, t)
      example = cfg.func(self._env, **cfg.params)
      state["history"][f"{g}/{t}"] = hb.init_state(example)
    for (g, t), nm in self._noise_models.items():
      cfg = self._term_cfg(g, t)
      example = cfg.func(self._env, **cfg.params)
      state["noise"][f"{g}/{t}"] = nm.init_state(example)
    return state

  def _term_cfg(self, group, term) -> ObservationTermCfg:
    i = self._group_term_names[group].index(term)
    return self._group_term_cfgs[group][i]

  # -- compute ----------------------------------------------------------------------

  def compute(self, update_history: bool = False) -> dict:
    return {
      g: self.compute_group(g, update_history) for g in self._group_term_names
    }

  def compute_group(self, group_name: str, update_history: bool = False):
    ns = self._env.ns(self.NS)
    group_obs = {}
    for term_name, term_cfg in zip(
      self._group_term_names[group_name], self._group_term_cfgs[group_name]
    ):
      key = (group_name, term_name)
      skey = f"{group_name}/{term_name}"
      obs = term_cfg.func(self._env, **term_cfg.params)
      if isinstance(term_cfg.noise, noise_utils.NoiseCfg):
        obs = term_cfg.noise.apply(self._env.next_key(), obs)
      elif isinstance(term_cfg.noise, noise_utils.NoiseModelCfg):
        nm = self._noise_models[key]
        obs = nm.apply(ns["noise"][skey], self._env.next_key(), obs)
      if term_cfg.clip is not None:
        obs = jnp.clip(obs, term_cfg.clip[0], term_cfg.clip[1])
      if term_cfg.scale is not None:
        obs = obs * jnp.asarray(term_cfg.scale, dtype=obs.dtype)
      if term_cfg.delay_max_lag > 0:
        db = self._delay_buffers[key]
        ns["delay"][skey] = db.append(ns["delay"][skey], obs, self._env.next_key())
        obs = db.compute(ns["delay"][skey])
      if term_cfg.history_length > 0:
        hb = self._history_buffers[key]
        if update_history:
          ns["history"][skey] = hb.append(ns["history"][skey], obs)
        full = hb.buffer(ns["history"][skey])
        if term_cfg.flatten_history_dim:
          obs = full.reshape(self.num_envs, -1)
        else:
          obs = full
      group_obs[term_name] = obs
    if self._group_concatenate[group_name]:
      return jnp.concatenate(list(group_obs.values()), axis=-1)
    return group_obs

  def reset(self, env_mask=None) -> dict:
    ns = self._env.ns(self.NS)
    for (g, t), db in self._delay_buffers.items():
      ns["delay"][f"{g}/{t}"] = db.reset(ns["delay"][f"{g}/{t}"], env_mask)
    for (g, t), hb in self._history_buffers.items():
      ns["history"][f"{g}/{t}"] = hb.reset(ns["history"][f"{g}/{t}"], env_mask)
    for (g, t), nm in self._noise_models.items():
      ns["noise"][f"{g}/{t}"] = nm.reset(
        ns["noise"][f"{g}/{t}"], self._env.next_key(), env_mask
      )
    return {}
