"""Tracking-task terminations: anchor/body deviation limits
(reference tasks/tracking/mdp/terminations.py)."""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from mjlab_tpu.core import math as mt
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.tasks.tracking.mdp.commands import MotionCommand
from mjlab_tpu.tasks.tracking.mdp.rewards import _get_body_indexes

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv


def bad_anchor_pos(
  env: "ManagerBasedRlEnv", command_name: str, threshold: float
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  return (
    jnp.linalg.norm(command.anchor_pos_w - command.robot_anchor_pos_w, axis=1)
    > threshold
  )


def bad_anchor_pos_z_only(
  env: "ManagerBasedRlEnv", command_name: str, threshold: float
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  return (
    jnp.abs(command.anchor_pos_w[:, -1] - command.robot_anchor_pos_w[:, -1])
    > threshold
  )


def bad_anchor_ori(
  env: "ManagerBasedRlEnv",
  asset_cfg: SceneEntityCfg,
  command_name: str,
  threshold: float,
) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  command: MotionCommand = env.command_manager.get_term(command_name)
  motion_grav_b = mt.quat_apply_inverse(
    command.anchor_quat_w, asset.data.gravity_vec_w
  )
  robot_grav_b = mt.quat_apply_inverse(
    command.robot_anchor_quat_w, asset.data.gravity_vec_w
  )
  return jnp.abs(motion_grav_b[:, 2] - robot_grav_b[:, 2]) > threshold


def bad_motion_body_pos(
  env: "ManagerBasedRlEnv",
  command_name: str,
  threshold: float,
  body_names: tuple[str, ...] | None = None,
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  idx = _get_body_indexes(command, body_names)
  error = jnp.linalg.norm(
    command.body_pos_relative_w[:, idx] - command.robot_body_pos_w[:, idx], axis=-1
  )
  return jnp.any(error > threshold, axis=-1)


def bad_motion_body_pos_z_only(
  env: "ManagerBasedRlEnv",
  command_name: str,
  threshold: float,
  body_names: tuple[str, ...] | None = None,
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  idx = _get_body_indexes(command, body_names)
  error = jnp.abs(
    command.body_pos_relative_w[:, idx, -1] - command.robot_body_pos_w[:, idx, -1]
  )
  return jnp.any(error > threshold, axis=-1)
