from mjlab_tpu.envs.manager_based_env import ManagerBasedEnv, ManagerBasedEnvCfg
from mjlab_tpu.envs.manager_based_rl_env import (
  ManagerBasedRlEnv,
  ManagerBasedRlEnvCfg,
)

__all__ = [
  "ManagerBasedEnv",
  "ManagerBasedEnvCfg",
  "ManagerBasedRlEnv",
  "ManagerBasedRlEnvCfg",
]
