"""Velocity-task privileged (critic) observation terms
(reference tasks/velocity/mdp/observations.py)."""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv

_DEFAULT_ASSET_CFG = SceneEntityCfg("robot")


def foot_height(
  env: "ManagerBasedRlEnv", asset_cfg: SceneEntityCfg = _DEFAULT_ASSET_CFG
) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  return asset.data.site_pos_w[:, asset_cfg.site_ids, 2]


def foot_air_time(env: "ManagerBasedRlEnv", sensor_name: str) -> jax.Array:
  return env.scene[sensor_name].data.current_air_time


def foot_contact(env: "ManagerBasedRlEnv", sensor_name: str) -> jax.Array:
  return (env.scene[sensor_name].data.found > 0).astype(env.dtype)


def foot_contact_forces(env: "ManagerBasedRlEnv", sensor_name: str) -> jax.Array:
  forces = env.scene[sensor_name].data.force
  flat = forces.reshape(forces.shape[0], -1)
  return jnp.sign(flat) * jnp.log1p(jnp.abs(flat))
