"""Asimov-toe bipedal robot configuration (parallel-ankle tendon variant).

The toe variant's ankles are driven by two tendon position actuators per
foot (left/right_ankle_A/B, kp=300, built into the XML) implementing the
linearized pitch/roll → A/B mapping; the AnklePrToTendonAction term targets
them. Joint actuators here cover hips, knees, and passive-spring toes
(reference asset_zoo/robots/asimov/asimov_toe_constants.py; effort limits
from the encos current limits, asimov_toe_constants.py:117-120).
"""

from __future__ import annotations

import copy
from pathlib import Path

import mujoco

from mjlab_tpu.asset_zoo import load_asset_dir
from mjlab_tpu.asset_zoo.robots import action_scale_from_articulation
from mjlab_tpu.asset_zoo.robots.unitree_motors import MOTOR_7520_14, MOTOR_7520_22
from mjlab_tpu.entity import EntityArticulationInfoCfg, EntityCfg
from mjlab_tpu.utils.spec_config import ActuatorCfg, CollisionCfg

ASIMOV_TOE_XML = Path(__file__).resolve().parent / "xmls" / "asimov_toe.xml"

NATURAL_FREQ_HZ = 8.0
DAMPING_RATIO = 1.8


def get_spec() -> mujoco.MjSpec:
  spec = mujoco.MjSpec.from_file(str(ASIMOV_TOE_XML))
  spec.assets = load_asset_dir(ASIMOV_TOE_XML)
  return spec


def _actuator_cfg(
  motor, joint_names_expr: tuple[str, ...], effort_limit: float
) -> ActuatorCfg:
  kp, kd = motor.pd_gains(NATURAL_FREQ_HZ, DAMPING_RATIO)
  return ActuatorCfg(
    joint_names_expr=joint_names_expr,
    effort_limit=effort_limit,
    armature=motor.reflected_inertia,
    stiffness=kp,
    damping=kd,
  )


ASIMOV_ACTUATOR_HIP_PITCH = _actuator_cfg(
  MOTOR_7520_14, (".*_hip_pitch_joint",), effort_limit=55.0
)
ASIMOV_ACTUATOR_HIP_ROLL = _actuator_cfg(
  MOTOR_7520_22, (".*_hip_roll_joint",), effort_limit=90.0
)
ASIMOV_ACTUATOR_HIP_YAW = _actuator_cfg(
  MOTOR_7520_14, (".*_hip_yaw_joint",), effort_limit=60.0
)
ASIMOV_ACTUATOR_KNEE = _actuator_cfg(
  MOTOR_7520_22, (".*_knee_joint",), effort_limit=50.0
)

# Toes: passive spring with low control authority (URDF spring/damping).
ASIMOV_TOE_ACTUATOR = ActuatorCfg(
  joint_names_expr=("left_toe_joint", "right_toe_joint"),
  effort_limit=5.0,
  armature=0.0001,
  stiffness=50.0,
  damping=0.8,
)

STANDING_KEYFRAME = EntityCfg.InitialStateCfg(
  pos=(0, 0, 0.71),
  joint_pos={".*": 0.0},
  joint_vel={".*": 0.0},
)

# Mirrored axes, hardware-corrected signs: left knee axis (0,1,0) extends
# back with positive angle, right with negative.
KNEES_BENT_KEYFRAME = EntityCfg.InitialStateCfg(
  pos=(0, 0, 0.73),
  joint_pos={
    "left_hip_pitch_joint": 0.2,
    "right_hip_pitch_joint": -0.2,
    ".*_hip_roll_joint": 0.0,
    ".*_hip_yaw_joint": 0.0,
    "left_knee_joint": 0.4,
    "right_knee_joint": -0.4,
    "left_ankle_pitch_joint": -0.25,
    "right_ankle_pitch_joint": 0.25,
    ".*_ankle_roll_joint": 0.0,
    ".*_toe_joint": 0.0,
  },
  joint_vel={".*": 0.0},
)

_FOOT_REGEX = r"^(left|right)_(foot|toe)\d+_collision$"

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
    ASIMOV_ACTUATOR_HIP_PITCH,
    ASIMOV_ACTUATOR_HIP_ROLL,
    ASIMOV_ACTUATOR_HIP_YAW,
    ASIMOV_ACTUATOR_KNEE,
    ASIMOV_TOE_ACTUATOR,
  ),
  soft_joint_pos_limit_factor=0.9,
)

ASIMOV_ACTION_SCALE = action_scale_from_articulation(ASIMOV_ARTICULATION, factor=0.25)


def get_asimov_robot_cfg() -> EntityCfg:
  """Fresh Asimov-toe EntityCfg (new instance per call)."""
  return EntityCfg(
    init_state=copy.deepcopy(KNEES_BENT_KEYFRAME),
    collisions=(FEET_ONLY_COLLISION,),
    spec_fn=get_spec,
    articulation=ASIMOV_ARTICULATION,
  )
