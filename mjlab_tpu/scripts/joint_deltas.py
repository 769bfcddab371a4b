"""Policy analysis: per-joint action statistics from a checkpoint
(reference scripts/joint_deltas.py — absolute joint targets and deltas).

Rolls a policy out and reports, per joint: mean/std/min/max of the
commanded position targets and their per-step deltas.

  python -m mjlab_tpu.scripts.joint_deltas <Task-ID> \
      [--checkpoint path] [--steps 200] [--num_envs 16]
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
  import gymnasium as gym
  import jax.numpy as jnp

  import mjlab_tpu.tasks as tasks
  from mjlab_tpu.rl.runner import OnPolicyRunner
  from mjlab_tpu.scripts.cli import parse_args
  from mjlab_tpu.utils.logging import render_table

  positionals, overrides = parse_args(sys.argv[1:])
  if not positionals:
    print("usage: joint_deltas <Task-ID> [--checkpoint ..] [--steps N]")
    sys.exit(1)
  task = positionals[0]
  steps = int(overrides.get("steps", "200"))
  num_envs = int(overrides.get("num_envs", "16"))

  env_cfg = tasks.load_cfg_from_registry(task, "env_cfg_entry_point")
  agent_cfg = tasks.load_cfg_from_registry(task, "rl_cfg_entry_point")
  env_cfg.scene.num_envs = num_envs
  env = gym.make(task, cfg=env_cfg).unwrapped

  ckpt = overrides.get("checkpoint")
  if ckpt:
    runner = OnPolicyRunner(env, agent_cfg)
    runner.load(ckpt)
    policy = runner.get_inference_policy()
  else:
    act_dim = env.action_manager.total_action_dim

    def policy(obs):
      return jnp.zeros((num_envs, act_dim))

  term = env.action_manager.get_term("joint_pos")
  joint_names = list(getattr(term, "_actuator_names", []))

  obs, _ = env.reset(seed=0)
  targets = []
  for _ in range(steps):
    obs, *_ = env.step(policy(obs))
    targets.append(np.asarray(term.processed_actions))
  t = np.stack(targets)  # (T, B, A)
  deltas = np.abs(np.diff(t, axis=0))

  rows = []
  for j, name in enumerate(joint_names or range(t.shape[-1])):
    rows.append(
      [
        name,
        f"{t[..., j].mean():+.3f}",
        f"{t[..., j].std():.3f}",
        f"{t[..., j].min():+.3f}",
        f"{t[..., j].max():+.3f}",
        f"{deltas[..., j].mean():.4f}",
        f"{deltas[..., j].max():.4f}",
      ]
    )
  print(
    render_table(
      f"Joint position targets over {steps} steps × {num_envs} envs",
      ["Joint", "Mean", "Std", "Min", "Max", "|Δ| mean", "|Δ| max"],
      rows,
    )
  )


if __name__ == "__main__":
  main()
