"""Noise configurations (functional — every application takes a PRNG key).

Mirrors the reference utils/noise surface (noise_cfg.py:22-103,
noise_model.py:35-84): Constant/Uniform/Gaussian noise with add/scale/abs
operations, and the stateful NoiseModelWithAdditiveBias whose per-env bias is
resampled on episode reset. State lives in the env-state pytree.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal

import jax
import jax.numpy as jnp


@dataclass
class NoiseCfg:
  operation: Literal["add", "scale", "abs"] = "add"

  def apply(self, key: jax.Array, data: jax.Array) -> jax.Array:
    raise NotImplementedError

  def _combine(self, data, noise):
    if self.operation == "add":
      return data + noise
    if self.operation == "scale":
      return data * noise
    if self.operation == "abs":
      return jnp.broadcast_to(noise, data.shape)
    raise ValueError(f"Unknown operation {self.operation}")


@dataclass
class ConstantNoiseCfg(NoiseCfg):
  bias: float = 0.0

  def apply(self, key, data):
    del key
    return self._combine(data, jnp.asarray(self.bias, dtype=data.dtype))


@dataclass
class UniformNoiseCfg(NoiseCfg):
  n_min: float = -1.0
  n_max: float = 1.0

  def apply(self, key, data):
    noise = jax.random.uniform(
      key, data.shape, dtype=data.dtype, minval=self.n_min, maxval=self.n_max
    )
    return self._combine(data, noise)


@dataclass
class GaussianNoiseCfg(NoiseCfg):
  mean: float = 0.0
  std: float = 1.0

  def apply(self, key, data):
    noise = self.mean + self.std * jax.random.normal(key, data.shape, data.dtype)
    return self._combine(data, noise)


@dataclass
class NoiseModelCfg:
  class_type: type | None = None
  noise_cfg: NoiseCfg | None = None


class NoiseModel:
  """Stateless base noise model."""

  def __init__(self, cfg: NoiseModelCfg, num_envs: int):
    self.cfg = cfg
    self.num_envs = num_envs

  def init_state(self, example: jax.Array) -> dict:
    """Allocate per-env state shaped like `example` ((B, ...) term output)."""
    del example
    return {}

  def apply(self, state: dict, key: jax.Array, data: jax.Array) -> jax.Array:
    if self.cfg.noise_cfg is None:
      return data
    return self.cfg.noise_cfg.apply(key, data)

  def reset(self, state: dict, key: jax.Array, env_mask) -> dict:
    return state


@dataclass
class NoiseModelWithAdditiveBiasCfg(NoiseModelCfg):
  bias_noise_cfg: NoiseCfg | None = None

  def __post_init__(self):
    self.class_type = NoiseModelWithAdditiveBias


class NoiseModelWithAdditiveBias(NoiseModel):
  """Episode-constant per-env additive bias + per-step noise (reference
  noise_model.py:35-84)."""

  def init_state(self, example: jax.Array) -> dict:
    return {"bias": jnp.zeros_like(example)}

  def apply(self, state, key, data):
    out = super().apply(state, key, data)
    return out + state["bias"]

  def reset(self, state, key, env_mask) -> dict:
    cfg: NoiseModelWithAdditiveBiasCfg = self.cfg  # type: ignore[assignment]
    bias = state["bias"]
    if cfg.bias_noise_cfg is not None:
      new_bias = cfg.bias_noise_cfg.apply(key, jnp.zeros_like(bias))
      m = env_mask.reshape(env_mask.shape + (1,) * (bias.ndim - 1))
      bias = jnp.where(m, new_bias, bias)
    return {"bias": bias}
