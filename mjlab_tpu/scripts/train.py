"""Training entry point (reference scripts/train.py).

Usage:
  python -m mjlab_tpu.scripts.train Mjlab-Velocity-Flat-Unitree-G1 \
      --env.scene.num_envs 4096 --agent.max_iterations 1000
"""

from __future__ import annotations

import os
import sys
from dataclasses import asdict

import gymnasium as gym


def run_train(task: str, overrides: dict[str, str]) -> None:
  import jax

  import mjlab_tpu.tasks as tasks
  from mjlab_tpu.distributed import initialize_multihost
  from mjlab_tpu.rl.runner import OnPolicyRunner
  from mjlab_tpu.scripts.cli import apply_overrides

  # Multi-host pod bootstrap (no-op single-process; DCN crossed only here
  # and at checkpoint I/O).
  if initialize_multihost():
    print(f"[train] multi-host: process {jax.process_index()}"
          f"/{jax.process_count()}", flush=True)

  env_cfg = tasks.load_cfg_from_registry(task, "env_cfg_entry_point")
  agent_cfg = tasks.load_cfg_from_registry(task, "rl_cfg_entry_point")

  env_over = {k[4:]: v for k, v in overrides.items() if k.startswith("env.")}
  agent_over = {k[6:]: v for k, v in overrides.items() if k.startswith("agent.")}
  apply_overrides(env_cfg, env_over)
  apply_overrides(agent_cfg, agent_over)

  log_root = overrides.get("log_dir", os.path.join("logs", agent_cfg.experiment_name))
  os.makedirs(log_root, exist_ok=True)

  print(f"[train] task={task} num_envs={env_cfg.scene.num_envs} "
        f"devices={jax.devices()}", flush=True)

  env = gym.make(task, cfg=env_cfg).unwrapped
  runner = OnPolicyRunner(env, agent_cfg, log_dir=log_root)

  # Optional NaN guard (reference train.py --enable-nan-guard; note: each
  # guard check is a device→host pull — see docs/PERF_NOTES.md for the cost
  # on the axon runtime).
  if overrides.get("enable_nan_guard", "false").lower() in ("1", "true"):
    from mjlab_tpu.utils.nan_guard import NanGuard, NanGuardCfg

    guard = NanGuard(
      NanGuardCfg(enabled=True, output_dir=os.path.join(log_root, "nan_dumps")),
      env,
    )
    orig_iter = runner._train_iter

    def guarded_iter(state):
      out = orig_iter(state)
      runner.env.state = out[0].env_state
      if guard.watch():
        raise RuntimeError("NaN detected; state dumped (see nan_dumps/).")
      return out

    runner._train_iter = guarded_iter

  # Record the resolved config for the run (reference train.py:117-118).
  try:
    import yaml

    with open(os.path.join(log_root, "agent_cfg.yaml"), "w") as f:
      yaml.safe_dump(asdict(agent_cfg), f)
  except Exception:
    pass

  if overrides.get("agent.resume", "false").lower() in ("1", "true"):
    from mjlab_tpu.utils.os import resolve_latest_checkpoint

    ckpt = resolve_latest_checkpoint(log_root)
    if ckpt:
      print(f"[train] resuming from {ckpt}", flush=True)
      runner.load(ckpt)

  # Optional profiler trace (--profile <n_iters>): captures an XLA/TPU trace
  # of the first n training iterations, viewable in TensorBoard/Perfetto
  # (the reference has no profiler integration; SURVEY §5).
  profile_iters = int(overrides.get("profile", "0"))
  if profile_iters > 0:
    trace_dir = os.path.join(log_root, "profile")
    print(f"[train] profiling first {profile_iters} iters → {trace_dir}",
          flush=True)
    with jax.profiler.trace(trace_dir):
      runner.learn(profile_iters)
    runner.learn(agent_cfg.max_iterations - profile_iters)
  else:
    runner.learn(agent_cfg.max_iterations)
  runner.save(os.path.join(log_root, f"model_{runner.iteration}"))


def main() -> None:
  from mjlab_tpu.scripts.cli import format_help, parse_args

  positionals, overrides = parse_args(sys.argv[1:])
  if not positionals:
    import mjlab_tpu.tasks as tasks

    print("usage: train <Task-ID> [--env.x.y v] [--agent.x v]")
    print("run `train <Task-ID> --help` to list every overridable field")
    print("available tasks:")
    for t in tasks.list_tasks():
      print(f"  {t}")
    sys.exit(1)
  if "help" in overrides:
    # Generated per-field help for the task's nested configs (reference
    # tyro CLI, scripts/train.py:127-156).
    import mjlab_tpu.tasks as tasks

    task = positionals[0]
    print(
      format_help(
        {
          "env": tasks.load_cfg_from_registry(task, "env_cfg_entry_point"),
          "agent": tasks.load_cfg_from_registry(task, "rl_cfg_entry_point"),
        },
        usage=f"usage: train {task} [--env.<field> v] [--agent.<field> v] "
        "[--log_dir d] [--profile n] [--enable_nan_guard]",
      )
    )
    sys.exit(0)
  run_train(positionals[0], overrides)


if __name__ == "__main__":
  main()
