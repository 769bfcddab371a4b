"""Velocity-task curriculum terms.

Functional ports of reference tasks/velocity/mdp/curriculums.py: terrain
difficulty progression by walked distance, staged command-range growth, and
staged reward weights. Stage selection uses the traced common_step_counter
(jnp.where), not host branching, so the whole step stays one XLA program.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, TypedDict

import jax
import jax.numpy as jnp

from mjlab_tpu.managers.manager_base import ManagerTermBase
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv

_DEFAULT_SCENE_CFG = SceneEntityCfg("robot")


class VelocityStage(TypedDict, total=False):
  step: int
  lin_vel_x: tuple[float, float] | None
  lin_vel_y: tuple[float, float] | None
  ang_vel_z: tuple[float, float] | None


class RewardWeightStage(TypedDict):
  step: int
  weight: float


def terrain_levels_vel(
  env: "ManagerBasedRlEnv",
  env_mask: jax.Array,
  command_name: str,
  asset_cfg: SceneEntityCfg = _DEFAULT_SCENE_CFG,
) -> jax.Array:
  """Promote robots that walked far; demote those that walked < half the
  commanded distance (reference curriculums.py:30-64), masked-functional."""
  asset = env.scene[asset_cfg.name]
  terrain = env.scene.terrain
  assert terrain is not None and terrain.terrain_origins is not None
  command = env.command_manager.get_command(command_name)

  distance = jnp.linalg.norm(
    asset.data.root_link_pos_w[:, :2] - env.scene.env_origins[:, :2], axis=1
  )
  move_up = distance > terrain.cfg.terrain_generator.size[0] / 2
  move_down = distance < (
    jnp.linalg.norm(command[:, :2], axis=1) * env.max_episode_length_s * 0.5
  )
  move_down = move_down & ~move_up
  terrain.update_env_origins(env_mask, move_up, move_down)
  return jnp.mean(terrain.terrain_levels.astype(env.dtype))


class commands_vel(ManagerTermBase):
  """Stage command-velocity ranges by global step count
  (reference curriculums.py:67-92). Writes the command term's in-state
  ranges so resampling picks them up in-trace."""

  metric_keys = (
    "lin_vel_x_min", "lin_vel_x_max",
    "lin_vel_y_min", "lin_vel_y_max",
    "ang_vel_z_min", "ang_vel_z_max",
  )

  def __call__(
    self,
    env: "ManagerBasedRlEnv",
    env_mask: jax.Array,
    command_name: str,
    velocity_stages: list[VelocityStage],
  ) -> dict:
    del env_mask
    term = env.command_manager.get_term(command_name)
    ranges = term.state["ranges"]
    step = env.common_step_counter
    for stage in velocity_stages:
      passed = step > stage["step"]
      for key in ("lin_vel_x", "lin_vel_y", "ang_vel_z"):
        if stage.get(key) is not None:
          staged = jnp.asarray(stage[key], dtype=env.dtype)
          ranges[key] = jnp.where(passed, staged, ranges[key])
    return {
      "lin_vel_x_min": ranges["lin_vel_x"][0],
      "lin_vel_x_max": ranges["lin_vel_x"][1],
      "lin_vel_y_min": ranges["lin_vel_y"][0],
      "lin_vel_y_max": ranges["lin_vel_y"][1],
      "ang_vel_z_min": ranges["ang_vel_z"][0],
      "ang_vel_z_max": ranges["ang_vel_z"][1],
    }


class reward_weight(ManagerTermBase):
  """Stage a reward term's weight by global step count
  (reference curriculums.py:95-107). The weight lives in the reward
  manager's state so the staged value applies in-trace."""

  metric_keys = ("weight",)

  def __call__(
    self,
    env: "ManagerBasedRlEnv",
    env_mask: jax.Array,
    reward_name: str,
    weight_stages: list[RewardWeightStage],
  ) -> dict:
    del env_mask
    weights = env.ns("reward")["weights"]
    step = env.common_step_counter
    w = weights[reward_name]
    for stage in weight_stages:
      w = jnp.where(step > stage["step"], stage["weight"], w)
    weights[reward_name] = w
    return {"weight": w}
