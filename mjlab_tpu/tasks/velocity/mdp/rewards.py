"""Velocity-task reward terms.

Functional ports of reference tasks/velocity/mdp/rewards.py: exp-kernel
velocity tracking, posture by speed regime, gait shaping (air time,
clearance, swing height, slip, soft landing), and whole-body penalties.
Step metrics are emitted through env.step_log (the reference writes
env.extras["log"] in-place, rewards.py:119,143,223,258,279).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.core.strings import resolve_matching_names_values
from mjlab_tpu.managers.manager_base import ManagerTermBase
from mjlab_tpu.managers.manager_term_config import RewardTermCfg
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg
from mjlab_tpu.core import math as mt

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv

_DEFAULT_ASSET_CFG = SceneEntityCfg("robot")


def _command_activation(env, command_name, command_threshold):
  """1.0 where |command| exceeds the threshold, else 0.0."""
  command = env.command_manager.get_command(command_name)
  total = jnp.linalg.norm(command[:, :2], axis=1) + jnp.abs(command[:, 2])
  return (total > command_threshold).astype(env.dtype)


def track_linear_velocity(
  env: "ManagerBasedRlEnv",
  std: float,
  command_name: str,
  asset_cfg: SceneEntityCfg = _DEFAULT_ASSET_CFG,
) -> jax.Array:
  """Exp-kernel tracking of commanded base-frame linear velocity (z assumed 0)."""
  asset = env.scene[asset_cfg.name]
  command = env.command_manager.get_command(command_name)
  actual = asset.data.root_link_lin_vel_b
  xy_error = jnp.sum(jnp.square(command[:, :2] - actual[:, :2]), axis=1)
  z_error = jnp.square(actual[:, 2])
  return jnp.exp(-(xy_error + z_error) / std**2)


def track_angular_velocity(
  env: "ManagerBasedRlEnv",
  std: float,
  command_name: str,
  asset_cfg: SceneEntityCfg = _DEFAULT_ASSET_CFG,
) -> jax.Array:
  """Exp-kernel tracking of commanded yaw rate (xy rates assumed 0)."""
  asset = env.scene[asset_cfg.name]
  command = env.command_manager.get_command(command_name)
  actual = asset.data.root_link_ang_vel_b
  z_error = jnp.square(command[:, 2] - actual[:, 2])
  xy_error = jnp.sum(jnp.square(actual[:, :2]), axis=1)
  return jnp.exp(-(z_error + xy_error) / std**2)


def flat_orientation(
  env: "ManagerBasedRlEnv",
  std: float,
  asset_cfg: SceneEntityCfg = _DEFAULT_ASSET_CFG,
) -> jax.Array:
  """Exp-kernel uprightness; uses a specific body if body_ids given."""
  asset = env.scene[asset_cfg.name]
  if asset_cfg.body_ids:
    body_quat_w = asset.data.body_link_quat_w[:, asset_cfg.body_ids, :][:, 0]
    gravity_b = mt.quat_apply_inverse(body_quat_w, asset.data.gravity_vec_w)
    xy_sq = jnp.sum(jnp.square(gravity_b[:, :2]), axis=1)
  else:
    xy_sq = jnp.sum(jnp.square(asset.data.projected_gravity_b[:, :2]), axis=1)
  return jnp.exp(-xy_sq / std**2)


def self_collision_cost(env: "ManagerBasedRlEnv", sensor_name: str) -> jax.Array:
  """Number of self-collisions found by the contact sensor."""
  sensor = env.scene[sensor_name]
  return jnp.squeeze(sensor.data.found, axis=-1).astype(env.dtype)


def body_angular_velocity_penalty(
  env: "ManagerBasedRlEnv",
  asset_cfg: SceneEntityCfg = _DEFAULT_ASSET_CFG,
) -> jax.Array:
  asset = env.scene[asset_cfg.name]
  ang_vel = asset.data.body_link_ang_vel_w[:, asset_cfg.body_ids, :][:, 0]
  return jnp.sum(jnp.square(ang_vel[:, :2]), axis=1)


def angular_momentum_penalty(env: "ManagerBasedRlEnv", sensor_name: str) -> jax.Array:
  """Penalize whole-body angular momentum (encourages natural arm swing)."""
  angmom = env.scene[sensor_name].data
  mag_sq = jnp.sum(jnp.square(angmom), axis=-1)
  env.step_log["Metrics/angular_momentum_mean"] = jnp.mean(jnp.sqrt(mag_sq))
  return mag_sq


def feet_air_time(
  env: "ManagerBasedRlEnv",
  sensor_name: str,
  threshold_min: float = 0.05,
  threshold_max: float = 0.5,
  command_name: str | None = None,
  command_threshold: float = 0.5,
) -> jax.Array:
  """Reward feet spending time in [threshold_min, threshold_max] air windows."""
  sensor = env.scene[sensor_name]
  air = sensor.data.current_air_time
  in_range = (air > threshold_min) & (air < threshold_max)
  reward = jnp.sum(in_range.astype(env.dtype), axis=1)
  in_air = (air > 0).astype(env.dtype)
  env.step_log["Metrics/air_time_mean"] = jnp.sum(air * in_air) / jnp.clip(
    jnp.sum(in_air), min=1
  )
  if command_name is not None:
    reward = reward * _command_activation(env, command_name, command_threshold)
  return reward


def feet_clearance(
  env: "ManagerBasedRlEnv",
  target_height: float,
  command_name: str | None = None,
  command_threshold: float = 0.01,
  asset_cfg: SceneEntityCfg = _DEFAULT_ASSET_CFG,
) -> jax.Array:
  """Penalize clearance error weighted by horizontal foot speed."""
  asset = env.scene[asset_cfg.name]
  foot_z = asset.data.site_pos_w[:, asset_cfg.site_ids, 2]
  foot_vel_xy = asset.data.site_lin_vel_w[:, asset_cfg.site_ids, :2]
  vel_norm = jnp.linalg.norm(foot_vel_xy, axis=-1)
  cost = jnp.sum(jnp.abs(foot_z - target_height) * vel_norm, axis=1)
  if command_name is not None:
    cost = cost * _command_activation(env, command_name, command_threshold)
  return cost


class feet_swing_height(ManagerTermBase):
  """Penalize peak swing-height error, evaluated at landing.

  Stateful: tracks per-foot peak height while airborne (pytree state;
  reference rewards.py:180-229 keeps a torch buffer)."""

  def init_state(self) -> dict:
    n_sites = len(self.cfg.params["asset_cfg"].site_ids)
    return {
      "peak_heights": jnp.zeros((self.num_envs, n_sites), dtype=self._env.dtype)
    }

  def __call__(
    self,
    env: "ManagerBasedRlEnv",
    sensor_name: str,
    target_height: float,
    command_name: str,
    command_threshold: float,
    asset_cfg: SceneEntityCfg,
  ) -> jax.Array:
    asset = env.scene[asset_cfg.name]
    contact_sensor = env.scene[sensor_name]
    foot_heights = asset.data.site_pos_w[:, asset_cfg.site_ids, 2]
    in_air = contact_sensor.data.found == 0
    peaks = jnp.where(
      in_air, jnp.maximum(self.state["peak_heights"], foot_heights),
      self.state["peak_heights"],
    )
    first_contact = contact_sensor.compute_first_contact(dt=env.step_dt)
    active = _command_activation(env, command_name, command_threshold)
    error = peaks / target_height - 1.0
    fc = first_contact.astype(env.dtype)
    cost = jnp.sum(jnp.square(error) * fc, axis=1) * active
    env.step_log["Metrics/peak_height_mean"] = jnp.sum(peaks * fc) / jnp.clip(
      jnp.sum(fc), min=1
    )
    self.state["peak_heights"] = jnp.where(first_contact, 0.0, peaks)
    return cost


def feet_slip(
  env: "ManagerBasedRlEnv",
  sensor_name: str,
  command_name: str,
  command_threshold: float = 0.01,
  asset_cfg: SceneEntityCfg = _DEFAULT_ASSET_CFG,
) -> jax.Array:
  """Penalize squared horizontal foot speed while in contact."""
  asset = env.scene[asset_cfg.name]
  contact_sensor = env.scene[sensor_name]
  active = _command_activation(env, command_name, command_threshold)
  in_contact = (contact_sensor.data.found > 0).astype(env.dtype)
  foot_vel_xy = asset.data.site_lin_vel_w[:, asset_cfg.site_ids, :2]
  vel_norm = jnp.linalg.norm(foot_vel_xy, axis=-1)
  cost = jnp.sum(jnp.square(vel_norm) * in_contact, axis=1) * active
  env.step_log["Metrics/slip_velocity_mean"] = jnp.sum(
    vel_norm * in_contact
  ) / jnp.clip(jnp.sum(in_contact), min=1)
  return cost


def soft_landing(
  env: "ManagerBasedRlEnv",
  sensor_name: str,
  command_name: str | None = None,
  command_threshold: float = 0.05,
) -> jax.Array:
  """Penalize impact force magnitude at first contact."""
  contact_sensor = env.scene[sensor_name]
  force_mag = jnp.linalg.norm(contact_sensor.data.force, axis=-1)
  fc = contact_sensor.compute_first_contact(dt=env.step_dt).astype(env.dtype)
  landing_impact = force_mag * fc
  cost = jnp.sum(landing_impact, axis=1)
  env.step_log["Metrics/landing_force_mean"] = jnp.sum(landing_impact) / jnp.clip(
    jnp.sum(fc), min=1
  )
  if command_name is not None:
    cost = cost * _command_activation(env, command_name, command_threshold)
  return cost


class variable_posture(ManagerTermBase):
  """Exp-kernel posture reward with speed-regime-dependent per-joint stds
  (standing / walking / running; reference rewards.py:291-359)."""

  def __init__(self, cfg: RewardTermCfg, env: "ManagerBasedRlEnv"):
    super().__init__(cfg, env)
    asset = env.scene[cfg.params["asset_cfg"].name]
    self.default_joint_pos = asset.data.default_joint_pos
    _, joint_names = asset.find_joints(cfg.params["asset_cfg"].joint_names)
    stds = []
    for key in ("std_standing", "std_walking", "std_running"):
      _, _, values = resolve_matching_names_values(
        data=cfg.params[key], list_of_strings=joint_names
      )
      stds.append(np.asarray(values, dtype=np.dtype(env.dtype)))
    self.std_standing, self.std_walking, self.std_running = stds

  def __call__(
    self,
    env: "ManagerBasedRlEnv",
    std_standing,
    std_walking,
    std_running,
    asset_cfg: SceneEntityCfg,
    command_name: str,
    walking_threshold: float = 0.5,
    running_threshold: float = 1.5,
  ) -> jax.Array:
    del std_standing, std_walking, std_running  # resolved in __init__
    asset = env.scene[asset_cfg.name]
    command = env.command_manager.get_command(command_name)
    total_speed = jnp.linalg.norm(command[:, :2], axis=1) + jnp.abs(command[:, 2])

    std = jnp.where(
      (total_speed < walking_threshold)[:, None],
      self.std_standing,
      jnp.where(
        (total_speed < running_threshold)[:, None],
        self.std_walking,
        self.std_running,
      ),
    )
    q = asset.data.joint_pos[:, asset_cfg.joint_ids]
    q0 = self.default_joint_pos[:, asset_cfg.joint_ids]
    err_sq = jnp.square(q - q0)
    return jnp.exp(-jnp.mean(err_sq / jnp.square(std), axis=1))
