"""Asimov bipedal robot configuration.

Fork-specific biped using G1-series motors with softer PD tuning (8 Hz,
ζ=1.8) for its lighter frame; feet are mesh collision geoms on the ankle
roll links (reference asset_zoo/robots/asimov/asimov_constants.py).

Sign conventions: the left/right legs have mirrored joint axes, so the
knees-bent keyframe uses opposite signs per side (reference
asimov_constants.py:165-187).
"""

from __future__ import annotations

import copy
from pathlib import Path

import mujoco

from mjlab_tpu.asset_zoo import load_asset_dir
from mjlab_tpu.asset_zoo.robots import action_scale_from_articulation
from mjlab_tpu.asset_zoo.robots.unitree_motors import (
  MOTOR_5020,
  MOTOR_7520_14,
  MOTOR_7520_22,
)
from mjlab_tpu.entity import EntityArticulationInfoCfg, EntityCfg
from mjlab_tpu.utils.spec_config import ActuatorCfg, CollisionCfg

ASIMOV_XML = Path(__file__).resolve().parent / "xmls" / "asimov.xml"

NATURAL_FREQ_HZ = 8.0  # softer than G1's 10 Hz: ~50% of the mass
DAMPING_RATIO = 1.8

# Parallel-linkage ankles: two 5020s per joint.
MOTOR_5020_X2 = MOTOR_5020.scaled(2.0)


def get_spec() -> mujoco.MjSpec:
  spec = mujoco.MjSpec.from_file(str(ASIMOV_XML))
  spec.assets = load_asset_dir(ASIMOV_XML)
  return spec


def _actuator_cfg(motor, joint_names_expr: tuple[str, ...]) -> ActuatorCfg:
  kp, kd = motor.pd_gains(NATURAL_FREQ_HZ, DAMPING_RATIO)
  return ActuatorCfg(
    joint_names_expr=joint_names_expr,
    effort_limit=motor.effort_limit,
    armature=motor.reflected_inertia,
    stiffness=kp,
    damping=kd,
  )


ASIMOV_ACTUATOR_HIP_PITCH_YAW = _actuator_cfg(
  MOTOR_7520_14, (".*_hip_pitch_joint", ".*_hip_yaw_joint")
)
ASIMOV_ACTUATOR_HIP_ROLL_KNEE = _actuator_cfg(
  MOTOR_7520_22, (".*_hip_roll_joint", ".*_knee_joint")
)
ASIMOV_ACTUATOR_ANKLE = _actuator_cfg(
  MOTOR_5020_X2, (".*_ankle_pitch_joint", ".*_ankle_roll_joint")
)

STANDING_KEYFRAME = EntityCfg.InitialStateCfg(
  pos=(0, 0, 0.709),
  joint_pos={".*": 0.0},
  joint_vel={".*": 0.0},
)

KNEES_BENT_KEYFRAME = EntityCfg.InitialStateCfg(
  pos=(0, 0, 0.73),
  joint_pos={
    "left_hip_pitch_joint": 0.2,
    "right_hip_pitch_joint": -0.2,  # mirrored axis
    ".*_hip_roll_joint": 0.0,
    ".*_hip_yaw_joint": 0.0,
    "left_knee_joint": -0.4,  # left axis (0,-1,0): negative extends back
    "right_knee_joint": 0.4,  # right axis (0,1,0): positive extends back
    "left_ankle_pitch_joint": -0.25,
    "right_ankle_pitch_joint": 0.25,
    ".*_ankle_roll_joint": 0.0,
  },
  joint_vel={".*": 0.0},
)

_FOOT_REGEX = r"^(left|right)_ankle_roll_link_collision$"

FULL_COLLISION = CollisionCfg(
  geom_names_expr=(".*_collision",),
  condim={_FOOT_REGEX: 3, ".*_collision": 1},
  priority={_FOOT_REGEX: 1},
  friction={_FOOT_REGEX: (0.8,)},
)

FULL_COLLISION_WITHOUT_SELF = CollisionCfg(
  geom_names_expr=(".*_collision",),
  contype=0,
  conaffinity=1,
  condim={_FOOT_REGEX: 3, ".*_collision": 1},
  priority={_FOOT_REGEX: 1},
  friction={_FOOT_REGEX: (0.8,)},
)

FEET_ONLY_COLLISION = CollisionCfg(
  geom_names_expr=(_FOOT_REGEX,),
  contype=0,
  conaffinity=1,
  condim=3,
  priority=1,
  friction=(0.8,),
)

ASIMOV_ARTICULATION = EntityArticulationInfoCfg(
  actuators=(
    ASIMOV_ACTUATOR_HIP_PITCH_YAW,
    ASIMOV_ACTUATOR_HIP_ROLL_KNEE,
    ASIMOV_ACTUATOR_ANKLE,
  ),
  soft_joint_pos_limit_factor=0.9,
)

# 0.3 multiplier (vs G1's 0.25): more responsive control on the lighter robot.
ASIMOV_ACTION_SCALE = action_scale_from_articulation(ASIMOV_ARTICULATION, factor=0.3)


def get_asimov_robot_cfg() -> EntityCfg:
  """Fresh Asimov EntityCfg (new instance per call)."""
  return EntityCfg(
    init_state=copy.deepcopy(KNEES_BENT_KEYFRAME),
    collisions=(FEET_ONLY_COLLISION,),
    spec_fn=get_spec,
    articulation=ASIMOV_ARTICULATION,
  )
