"""RL configuration dataclasses.

Mirrors the reference's typed config surface over rsl_rl
(rl/config.py:8-110): actor-critic architecture, PPO hyperparameters, and
on-policy runner settings — consumed by the JAX PPO learner in
mjlab_tpu.rl.ppo instead of an external torch trainer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal


@dataclass
class PpoActorCriticCfg:
  init_noise_std: float = 1.0
  noise_std_type: Literal["scalar", "log"] = "scalar"
  actor_obs_normalization: bool = False
  critic_obs_normalization: bool = False
  actor_hidden_dims: tuple[int, ...] = (256, 256, 128)
  critic_hidden_dims: tuple[int, ...] = (256, 256, 128)
  activation: str = "elu"

  class_name: str = "ActorCritic"


@dataclass
class PpoAlgorithmCfg:
  num_learning_epochs: int = 5
  num_mini_batches: int = 4
  learning_rate: float = 1e-3
  schedule: Literal["adaptive", "fixed"] = "adaptive"
  gamma: float = 0.99
  lam: float = 0.95
  entropy_coef: float = 0.01
  desired_kl: float = 0.01
  max_grad_norm: float = 1.0
  value_loss_coef: float = 1.0
  use_clipped_value_loss: bool = True
  clip_param: float = 0.2
  normalize_advantage_per_mini_batch: bool = False

  class_name: str = "PPO"


@dataclass
class RlOnPolicyRunnerCfg:
  seed: int = 42
  device: str = "tpu"
  num_steps_per_env: int = 24
  max_iterations: int = 30_000
  empirical_normalization: bool = False
  policy: PpoActorCriticCfg = field(default_factory=PpoActorCriticCfg)
  algorithm: PpoAlgorithmCfg = field(default_factory=PpoAlgorithmCfg)
  save_interval: int = 50
  experiment_name: str = "experiment"
  run_name: str = ""
  logger: Literal["tensorboard", "wandb"] = "tensorboard"
  wandb_project: str = "mjlab_tpu"
  resume: bool = False
  load_run: str = ".*"
  load_checkpoint: str = "model_.*.pt"
  clip_actions: float | None = None
  # Rollout execution mode. True: the whole iteration — rollout lax.scan +
  # GAE + PPO epochs — is ONE XLA program (right for real TPU hardware: no
  # host round-trips). False: the rollout runs as a host loop of per-step
  # jitted calls feeding one jitted update — needed on runtimes where
  # scan-over-env programs hit a slow relay path (docs/PERF_NOTES.md).
  # None (default): auto — False on the tunneled 'axon' relay, True on
  # every real backend.
  fused_rollout: bool | None = None
  # Host-loop dispatch batching (only used when the host-loop mode is
  # active). rollout_chunk=k unrolls k env steps into ONE jitted program
  # (Python unroll, NOT lax.scan — the relay's scan slow path does not
  # apply), cutting per-call dispatch overhead ~k×; T % k leftover steps
  # run singly. epoch_chunk=True runs each PPO epoch (on-device
  # permutation + every minibatch SGD step) as one jitted call instead of
  # num_mini_batches calls. Both are math-identical to the unchunked path
  # (pinned by tests/test_runner_modes.py).
  # rollout_chunk default is 1 (round 5): the r3 A/B that picked 8 measured
  # DISPATCH rate only; under forced execution chunk=8 ties chunk=1 on real
  # throughput (793 vs 791 env-steps/s at 1024 envs) and its 8x-unrolled
  # decimation temps EXHAUST single-chip HBM at 4096 envs (TPU worker
  # fault/OOM), while chunk=1 trains 4096 envs cleanly — 2.63M dispatch
  # env-steps/s, finite loss (tools/AB_RESULTS_r5.jsonl). Set >1 only for
  # small-env configs where launch overhead dominates and memory is slack.
  rollout_chunk: int = 1
  epoch_chunk: bool = False
  # Pack the host-loop rollout carry (env state + obs + params + norms +
  # transition buffers) into a few flat dtype buffers at the jit boundary
  # (utils/packing.py) — cuts ~150 per-call leaf crossings to ~25 on
  # relay-bound runtimes. Math-identical (tests/test_runner_modes.py).
  packed_hostloop: bool = False


# Reference-parity aliases (reference rl/config.py names).
RslRlPpoActorCriticCfg = PpoActorCriticCfg
RslRlPpoAlgorithmCfg = PpoAlgorithmCfg
RslRlOnPolicyRunnerCfg = RlOnPolicyRunnerCfg
