"""VecEnv adapter matching the reference's rsl_rl wrapper surface
(reference rl/vecenv_wrapper.py:11-111): dict observations, combined dones,
extras["time_outs"] for bootstrapping (suppressed for finite-horizon tasks),
optional action clipping, reset-on-construct."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv


class RlVecEnvWrapper:
  def __init__(self, env: ManagerBasedRlEnv, clip_actions: float | None = None):
    self.env = env.unwrapped if hasattr(env, "unwrapped") else env
    self.clip_actions = clip_actions
    self.num_envs = self.env.num_envs
    self.num_actions = self.env.action_manager.total_action_dim
    self.max_episode_length = self.env.max_episode_length
    self.obs, _ = self.env.reset()

  @property
  def cfg(self) -> Any:
    return self.env.cfg

  @property
  def episode_length_buf(self):
    return self.env.episode_length_buf

  def get_observations(self):
    return self.obs

  def reset(self):
    self.obs, extras = self.env.reset()
    return self.obs, extras

  def step(self, actions):
    if self.clip_actions is not None:
      actions = jnp.clip(actions, -self.clip_actions, self.clip_actions)
    obs, rew, terminated, time_outs, extras = self.env.step(actions)
    dones = terminated | time_outs
    self.obs = obs
    if not self.env.cfg.is_finite_horizon:
      extras["time_outs"] = time_outs
    return obs, rew, dones, extras

  def close(self):
    self.env.close()


# Reference-parity alias.
RslRlVecEnvWrapper = RlVecEnvWrapper
