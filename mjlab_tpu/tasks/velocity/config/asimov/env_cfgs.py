"""Asimov biped velocity-tracking configurations
(reference tasks/velocity/config/asimov/env_cfgs.py)."""

from __future__ import annotations

from mjlab_tpu.asset_zoo.robots.asimov.asimov_constants import (
  ASIMOV_ACTION_SCALE,
  get_asimov_robot_cfg,
)
from mjlab_tpu.envs import ManagerBasedRlEnvCfg
from mjlab_tpu.sensors import ContactMatch, ContactSensorCfg
from mjlab_tpu.tasks.velocity.velocity_env_cfg import create_velocity_env_cfg
from mjlab_tpu.terrains import TerrainImporterCfg
from mjlab_tpu.utils.retval import retval

# Asimov walking/running posture stds: wide canted hip pitch, constrained
# ankles (limited ROM) — reference asimov/env_cfgs.py:59-82.
_POSTURE_STD_WALKING = {
  r".*hip_pitch.*": 0.5,
  r".*hip_roll.*": 0.25,
  r".*hip_yaw.*": 0.2,
  r".*knee.*": 0.5,
  r".*ankle_pitch.*": 0.2,
  r".*ankle_roll.*": 0.12,
}
_POSTURE_STD_RUNNING = {
  r".*hip_pitch.*": 0.8,
  r".*hip_roll.*": 0.35,
  r".*hip_yaw.*": 0.3,
  r".*knee.*": 0.8,
  r".*ankle_pitch.*": 0.25,
  r".*ankle_roll.*": 0.15,
}


def _make_cfg(terrain: TerrainImporterCfg | None) -> ManagerBasedRlEnvCfg:
  feet_ground_cfg = ContactSensorCfg(
    name="feet_ground_contact",
    primary=ContactMatch(
      mode="subtree",
      pattern=r"^(left_ankle_roll_link|right_ankle_roll_link)$",
      entity="robot",
    ),
    secondary=ContactMatch(mode="body", pattern="terrain"),
    fields=("found", "force"),
    reduce="netforce",
    num_slots=1,
    track_air_time=True,
  )
  self_collision_cfg = ContactSensorCfg(
    name="self_collision",
    primary=ContactMatch(mode="subtree", pattern="pelvis_link", entity="robot"),
    secondary=ContactMatch(mode="subtree", pattern="pelvis_link", entity="robot"),
    fields=("found",),
    reduce="none",
    num_slots=1,
  )
  cfg = create_velocity_env_cfg(
    robot_cfg=get_asimov_robot_cfg(),
    action_scale=ASIMOV_ACTION_SCALE,
    viewer_body_name="pelvis_link",
    site_names=(
      "left_ankle_roll_joint_site",
      "right_ankle_roll_joint_site",
    ),
    feet_sensor_cfg=feet_ground_cfg,
    self_collision_sensor_cfg=self_collision_cfg,
    foot_friction_geom_names=(
      "left_ankle_roll_link_collision",
      "right_ankle_roll_link_collision",
    ),
    posture_std_standing={".*": 0.05},
    posture_std_walking=_POSTURE_STD_WALKING,
    posture_std_running=_POSTURE_STD_RUNNING,
    body_ang_vel_weight=-0.08,  # narrow stance → less stable
    angular_momentum_weight=-0.03,
    self_collision_weight=-1.0,
    air_time_weight=0.5,  # lighter robot: encourage flight phases
    terrain=terrain,
  )
  twist = cfg.commands["twist"]
  twist.viz.z_offset = 0.8
  # Conservative ranges: narrow stance, canted hips, limited ankle ROM.
  twist.ranges.lin_vel_x = (-0.8, 0.8)
  twist.ranges.lin_vel_y = (-0.6, 0.6)
  twist.ranges.ang_vel_z = (-0.6, 0.6)
  return cfg


@retval
def ASIMOV_ROUGH_ENV_CFG() -> ManagerBasedRlEnvCfg:
  return _make_cfg(terrain=None)


@retval
def ASIMOV_FLAT_ENV_CFG() -> ManagerBasedRlEnvCfg:
  return _make_cfg(terrain=TerrainImporterCfg(terrain_type="plane"))
