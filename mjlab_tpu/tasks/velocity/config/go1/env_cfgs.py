"""Unitree Go1 velocity-tracking configurations
(reference tasks/velocity/config/go1/env_cfgs.py)."""

from __future__ import annotations

from mjlab_tpu.asset_zoo.robots.unitree_go1.go1_constants import (
  GO1_ACTION_SCALE,
  get_go1_robot_cfg,
)
from mjlab_tpu.envs import ManagerBasedRlEnvCfg
from mjlab_tpu.managers.manager_term_config import TerminationTermCfg
from mjlab_tpu.sensors import ContactMatch, ContactSensorCfg
from mjlab_tpu.tasks.velocity import mdp
from mjlab_tpu.tasks.velocity.velocity_env_cfg import create_velocity_env_cfg
from mjlab_tpu.terrains import TerrainImporterCfg
from mjlab_tpu.utils.retval import retval

_FOOT_NAMES = ("FR", "FL", "RR", "RL")
_GEOM_NAMES = tuple(f"{n}_foot_collision" for n in _FOOT_NAMES)


def _make_cfg(terrain: TerrainImporterCfg | None) -> ManagerBasedRlEnvCfg:
  feet_ground_cfg = ContactSensorCfg(
    name="feet_ground_contact",
    primary=ContactMatch(mode="geom", pattern=_GEOM_NAMES, entity="robot"),
    secondary=ContactMatch(mode="body", pattern="terrain"),
    fields=("found", "force"),
    reduce="netforce",
    num_slots=1,
    track_air_time=True,
  )
  nonfoot_ground_cfg = ContactSensorCfg(
    name="nonfoot_ground_touch",
    primary=ContactMatch(
      mode="geom",
      entity="robot",
      pattern=r".*_collision\d*$",
      exclude=tuple(_GEOM_NAMES),
    ),
    secondary=ContactMatch(mode="body", pattern="terrain"),
    fields=("found",),
    reduce="none",
    num_slots=1,
  )
  cfg = create_velocity_env_cfg(
    robot_cfg=get_go1_robot_cfg(),
    action_scale=GO1_ACTION_SCALE,
    viewer_body_name="trunk",
    site_names=_FOOT_NAMES,
    feet_sensor_cfg=feet_ground_cfg,
    self_collision_sensor_cfg=nonfoot_ground_cfg,
    foot_friction_geom_names=_GEOM_NAMES,
    posture_std_standing={
      r".*(FR|FL|RR|RL)_(hip|thigh)_joint.*": 0.05,
      r".*(FR|FL|RR|RL)_calf_joint.*": 0.1,
    },
    posture_std_walking={
      r".*(FR|FL|RR|RL)_(hip|thigh)_joint.*": 0.3,
      r".*(FR|FL|RR|RL)_calf_joint.*": 0.6,
    },
    posture_std_running={
      r".*(FR|FL|RR|RL)_(hip|thigh)_joint.*": 0.3,
      r".*(FR|FL|RR|RL)_calf_joint.*": 0.6,
    },
    body_ang_vel_weight=0.0,
    angular_momentum_weight=0.0,
    self_collision_weight=0.0,
    air_time_weight=0.0,
    terrain=terrain,
  )
  cfg.terminations["illegal_contact"] = TerminationTermCfg(
    func=mdp.illegal_contact, params={"sensor_name": "nonfoot_ground_touch"}
  )
  return cfg


@retval
def UNITREE_GO1_ROUGH_ENV_CFG() -> ManagerBasedRlEnvCfg:
  return _make_cfg(terrain=None)


@retval
def UNITREE_GO1_FLAT_ENV_CFG() -> ManagerBasedRlEnvCfg:
  return _make_cfg(terrain=TerrainImporterCfg(terrain_type="plane"))
