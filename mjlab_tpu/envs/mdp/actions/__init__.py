from mjlab_tpu.envs.mdp.actions.joint_actions import (
  JointAction,
  JointActionCfg,
  JointPositionAction,
  JointPositionActionCfg,
)

__all__ = [
  "JointAction",
  "JointActionCfg",
  "JointPositionAction",
  "JointPositionActionCfg",
]
from mjlab_tpu.envs.mdp.actions.ankle_ab_action import (  # noqa: E402
  AnklePrToTendonAction,
  AnklePrToTendonActionCfg,
)

__all__ += ["AnklePrToTendonAction", "AnklePrToTendonActionCfg"]
