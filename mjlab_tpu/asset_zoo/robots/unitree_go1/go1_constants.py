"""Unitree Go1 (quadruped) configuration.

Mirrors reference asset_zoo/robots/unitree_go1/go1_constants.py: single-stage
geared motors, 10 Hz PD tuning, feet-vs-full collision presets.
"""

from __future__ import annotations

import copy
from pathlib import Path

import mujoco

from mjlab_tpu.asset_zoo import load_asset_dir
from mjlab_tpu.asset_zoo.robots import action_scale_from_articulation
from mjlab_tpu.asset_zoo.robots.unitree_motors import GO1_HIP_MOTOR, GO1_KNEE_MOTOR
from mjlab_tpu.entity import EntityArticulationInfoCfg, EntityCfg
from mjlab_tpu.utils.spec_config import ActuatorCfg, CollisionCfg

GO1_XML = Path(__file__).resolve().parent / "xmls" / "go1.xml"

NATURAL_FREQ_HZ = 10.0
DAMPING_RATIO = 2.0


def get_spec() -> mujoco.MjSpec:
  spec = mujoco.MjSpec.from_file(str(GO1_XML))
  spec.assets = load_asset_dir(GO1_XML)
  return spec


_HIP_KP, _HIP_KD = GO1_HIP_MOTOR.pd_gains(NATURAL_FREQ_HZ, DAMPING_RATIO)
_KNEE_KP, _KNEE_KD = GO1_KNEE_MOTOR.pd_gains(NATURAL_FREQ_HZ, DAMPING_RATIO)

GO1_HIP_ACTUATOR_CFG = ActuatorCfg(
  joint_names_expr=(".*_hip_joint", ".*_thigh_joint"),
  effort_limit=GO1_HIP_MOTOR.effort_limit,
  stiffness=_HIP_KP,
  damping=_HIP_KD,
  armature=GO1_HIP_MOTOR.reflected_inertia,
)
GO1_KNEE_ACTUATOR_CFG = ActuatorCfg(
  joint_names_expr=(".*_calf_joint",),
  effort_limit=GO1_KNEE_MOTOR.effort_limit,
  stiffness=_KNEE_KP,
  damping=_KNEE_KD,
  armature=GO1_KNEE_MOTOR.reflected_inertia,
)

INIT_STATE = EntityCfg.InitialStateCfg(
  pos=(0.0, 0.0, 0.278),
  joint_pos={
    ".*thigh_joint": 0.9,
    ".*calf_joint": -1.8,
    ".*R_hip_joint": 0.1,
    ".*L_hip_joint": -0.1,
  },
  joint_vel={".*": 0.0},
)

_FOOT_REGEX = "^[FR][LR]_foot_collision$"

FEET_ONLY_COLLISION = CollisionCfg(
  geom_names_expr=(_FOOT_REGEX,),
  contype=0,
  conaffinity=1,
  condim=3,
  priority=1,
  friction=(0.6,),
  solimp=(0.9, 0.95, 0.023),
)

FULL_COLLISION = CollisionCfg(
  geom_names_expr=(".*_collision",),
  condim={_FOOT_REGEX: 3, ".*_collision": 1},
  priority={_FOOT_REGEX: 1},
  friction={_FOOT_REGEX: (0.6,)},
  solimp={_FOOT_REGEX: (0.9, 0.95, 0.023)},
  contype=1,
  conaffinity=0,
)

GO1_ARTICULATION = EntityArticulationInfoCfg(
  actuators=(GO1_HIP_ACTUATOR_CFG, GO1_KNEE_ACTUATOR_CFG),
  soft_joint_pos_limit_factor=0.9,
)

GO1_ACTION_SCALE = action_scale_from_articulation(GO1_ARTICULATION, factor=0.25)


def get_go1_robot_cfg() -> EntityCfg:
  """Fresh Go1 EntityCfg (new instance per call to avoid shared mutation)."""
  return EntityCfg(
    init_state=copy.deepcopy(INIT_STATE),
    collisions=(FULL_COLLISION,),
    spec_fn=get_spec,
    articulation=GO1_ARTICULATION,
  )
