"""Tracking-task rewards: exp-kernel motion-matching errors
(reference tasks/tracking/mdp/rewards.py)."""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from mjlab_tpu.core import math as mt
from mjlab_tpu.tasks.tracking.mdp.commands import MotionCommand

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv


def _get_body_indexes(
  command: MotionCommand, body_names: tuple[str, ...] | None
) -> list[int]:
  return [
    i
    for i, name in enumerate(command.cfg.body_names)
    if body_names is None or name in body_names
  ]


def motion_global_anchor_position_error_exp(
  env: "ManagerBasedRlEnv", command_name: str, std: float
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  error = jnp.sum(
    jnp.square(command.anchor_pos_w - command.robot_anchor_pos_w), axis=-1
  )
  return jnp.exp(-error / std**2)


def motion_global_anchor_orientation_error_exp(
  env: "ManagerBasedRlEnv", command_name: str, std: float
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  error = (
    mt.quat_error_magnitude(command.anchor_quat_w, command.robot_anchor_quat_w) ** 2
  )
  return jnp.exp(-error / std**2)


def motion_relative_body_position_error_exp(
  env: "ManagerBasedRlEnv",
  command_name: str,
  std: float,
  body_names: tuple[str, ...] | None = None,
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  idx = _get_body_indexes(command, body_names)
  error = jnp.sum(
    jnp.square(
      command.body_pos_relative_w[:, idx] - command.robot_body_pos_w[:, idx]
    ),
    axis=-1,
  )
  return jnp.exp(-error.mean(-1) / std**2)


def motion_relative_body_orientation_error_exp(
  env: "ManagerBasedRlEnv",
  command_name: str,
  std: float,
  body_names: tuple[str, ...] | None = None,
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  idx = _get_body_indexes(command, body_names)
  error = (
    mt.quat_error_magnitude(
      command.body_quat_relative_w[:, idx], command.robot_body_quat_w[:, idx]
    )
    ** 2
  )
  return jnp.exp(-error.mean(-1) / std**2)


def motion_global_body_linear_velocity_error_exp(
  env: "ManagerBasedRlEnv",
  command_name: str,
  std: float,
  body_names: tuple[str, ...] | None = None,
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  idx = _get_body_indexes(command, body_names)
  error = jnp.sum(
    jnp.square(command.body_lin_vel_w[:, idx] - command.robot_body_lin_vel_w[:, idx]),
    axis=-1,
  )
  return jnp.exp(-error.mean(-1) / std**2)


def motion_global_body_angular_velocity_error_exp(
  env: "ManagerBasedRlEnv",
  command_name: str,
  std: float,
  body_names: tuple[str, ...] | None = None,
) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  idx = _get_body_indexes(command, body_names)
  error = jnp.sum(
    jnp.square(command.body_ang_vel_w[:, idx] - command.robot_body_ang_vel_w[:, idx]),
    axis=-1,
  )
  return jnp.exp(-error.mean(-1) / std**2)
