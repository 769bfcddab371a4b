"""Stock termination terms (reference envs/mdp/terminations.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

_DEFAULT = SceneEntityCfg("robot")


def time_out(env) -> jax.Array:
  return env.episode_length_buf >= env.max_episode_length


def bad_orientation(
  env, limit_angle: float, asset_cfg: SceneEntityCfg = _DEFAULT
) -> jax.Array:
  g = env.scene[asset_cfg.name].data.projected_gravity_b
  return jnp.abs(jnp.arccos(jnp.clip(-g[:, 2], -1.0, 1.0))) > limit_angle


def root_height_below_minimum(
  env, minimum_height: float, asset_cfg: SceneEntityCfg = _DEFAULT
) -> jax.Array:
  return env.scene[asset_cfg.name].data.root_link_pos_w[:, 2] < minimum_height


def nan_detection(env) -> jax.Array:
  """Flag envs whose physics state went NaN/Inf (reference
  terminations.py:45-47 + nan_guard.py:85-104). Resetting poisons no other
  envs since the batch axis is fully independent."""
  d = env.data
  bad_q = ~jnp.isfinite(d.qpos).all(axis=-1)
  bad_v = ~jnp.isfinite(d.qvel).all(axis=-1)
  bad_a = ~jnp.isfinite(d.qacc).all(axis=-1)
  return bad_q | bad_v | bad_a
