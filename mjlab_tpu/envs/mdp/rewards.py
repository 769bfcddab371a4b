"""Stock reward terms (reference envs/mdp/rewards.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.core.strings import resolve_matching_names_values
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

_DEFAULT = SceneEntityCfg("robot")


def is_alive(env) -> jax.Array:
  return (~env.termination_manager.terminated).astype(env.dtype)


def is_terminated(env) -> jax.Array:
  return env.termination_manager.terminated.astype(env.dtype)


def joint_torques_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  return jnp.sum(jnp.square(asset.data.actuator_force), axis=1)


def joint_acc_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  return jnp.sum(jnp.square(asset.data.joint_acc[:, asset_cfg.joint_ids]), axis=1)


def joint_vel_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  return jnp.sum(jnp.square(asset.data.joint_vel[:, asset_cfg.joint_ids]), axis=1)


def action_rate_l2(env) -> jax.Array:
  return jnp.sum(
    jnp.square(env.action_manager.action - env.action_manager.prev_action), axis=1
  )


def joint_pos_limits(env, asset_cfg: SceneEntityCfg = _DEFAULT) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  soft = asset.data.soft_joint_pos_limits
  q = asset.data.joint_pos[:, asset_cfg.joint_ids]
  out = -jnp.clip(q - soft[:, asset_cfg.joint_ids, 0], max=0.0)
  out = out + jnp.clip(q - soft[:, asset_cfg.joint_ids, 1], min=0.0)
  return jnp.sum(out, axis=1)


class posture:
  """Exp-kernel posture reward with per-joint std (class term so the std
  regex-dict resolves once; reference envs/mdp/rewards.py:73-104)."""

  def __init__(self, cfg, env):
    asset = env.scene[cfg.params["asset_cfg"].name]
    self.default_joint_pos = asset.data.default_joint_pos
    _, joint_names = asset.find_joints(cfg.params["asset_cfg"].joint_names)
    _, _, std = resolve_matching_names_values(
      data=cfg.params["std"], list_of_strings=joint_names
    )
    self.std = np.asarray(std, dtype=np.dtype(env.dtype))

  def __call__(self, env, std, asset_cfg: SceneEntityCfg) -> jax.Array:
    del std
    asset = env.scene[asset_cfg.name]
    q = asset.data.joint_pos[:, asset_cfg.joint_ids]
    q0 = self.default_joint_pos[:, asset_cfg.joint_ids]
    err2 = jnp.square(q - q0)
    return jnp.exp(-jnp.mean(err2 / (self.std**2), axis=1))


def electrical_power_cost(env, asset_cfg: SceneEntityCfg = _DEFAULT) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  mech = asset.data.actuator_force * asset.data.joint_vel
  return jnp.sum(jnp.clip(mech, min=0.0), axis=1)


def flat_orientation_l2(env, asset_cfg: SceneEntityCfg = _DEFAULT) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  return jnp.sum(jnp.square(asset.data.projected_gravity_b[:, :2]), axis=1)
