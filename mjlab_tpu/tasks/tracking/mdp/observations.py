"""Tracking-task observations: anchor-frame motion targets
(reference tasks/tracking/mdp/observations.py)."""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from mjlab_tpu.core import math as mt
from mjlab_tpu.tasks.tracking.mdp.commands import MotionCommand

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv


def motion_anchor_pos_b(env: "ManagerBasedRlEnv", command_name: str) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  pos, _ = mt.subtract_frame_transforms(
    command.robot_anchor_pos_w,
    command.robot_anchor_quat_w,
    command.anchor_pos_w,
    command.anchor_quat_w,
  )
  return pos.reshape(env.num_envs, -1)


def motion_anchor_ori_b(env: "ManagerBasedRlEnv", command_name: str) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  _, ori = mt.subtract_frame_transforms(
    command.robot_anchor_pos_w,
    command.robot_anchor_quat_w,
    command.anchor_pos_w,
    command.anchor_quat_w,
  )
  mat = mt.quat_to_mat(ori)
  return mat[..., :2].reshape(mat.shape[0], -1)


def robot_body_pos_b(env: "ManagerBasedRlEnv", command_name: str) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  nb = len(command.cfg.body_names)
  anchor_pos = jnp.broadcast_to(
    command.robot_anchor_pos_w[:, None, :], (env.num_envs, nb, 3)
  )
  anchor_quat = jnp.broadcast_to(
    command.robot_anchor_quat_w[:, None, :], (env.num_envs, nb, 4)
  )
  pos_b, _ = mt.subtract_frame_transforms(
    anchor_pos, anchor_quat, command.robot_body_pos_w, command.robot_body_quat_w
  )
  return pos_b.reshape(env.num_envs, -1)


def robot_body_ori_b(env: "ManagerBasedRlEnv", command_name: str) -> jax.Array:
  command: MotionCommand = env.command_manager.get_term(command_name)
  nb = len(command.cfg.body_names)
  anchor_pos = jnp.broadcast_to(
    command.robot_anchor_pos_w[:, None, :], (env.num_envs, nb, 3)
  )
  anchor_quat = jnp.broadcast_to(
    command.robot_anchor_quat_w[:, None, :], (env.num_envs, nb, 4)
  )
  _, ori_b = mt.subtract_frame_transforms(
    anchor_pos, anchor_quat, command.robot_body_pos_w, command.robot_body_quat_w
  )
  mat = mt.quat_to_mat(ori_b)
  return mat[..., :2].reshape(mat.shape[0], -1)
