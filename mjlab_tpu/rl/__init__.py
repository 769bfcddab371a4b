from mjlab_tpu.rl.config import (  # noqa: F401
  PpoActorCriticCfg,
  PpoAlgorithmCfg,
  RlOnPolicyRunnerCfg,
  RslRlOnPolicyRunnerCfg,
  RslRlPpoActorCriticCfg,
  RslRlPpoAlgorithmCfg,
)
