"""Benchmark harness: env-steps/s on the flagship G1 velocity task.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); the driver-set north star
is >=1M env-steps/s aggregate at 4096 envs/chip, so vs_baseline is reported
relative to that 1M env-steps/s target.

Env overrides: BENCH_TASK, BENCH_NUM_ENVS, BENCH_STEPS, BENCH_WARMUP.
BENCH_MODE=train benches the FULL PPO training iteration (rollout +
minibatch updates) instead of bare env stepping.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
  os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
  import jax
  import jax.numpy as jnp

  jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

  task = os.environ.get("BENCH_TASK", "Mjlab-Velocity-Flat-Unitree-G1")
  num_envs = int(os.environ.get("BENCH_NUM_ENVS", "4096"))
  steps = int(os.environ.get("BENCH_STEPS", "50"))
  warmup = int(os.environ.get("BENCH_WARMUP", "5"))

  import mjlab_tpu.tasks as tasks
  from mjlab_tpu.envs import ManagerBasedRlEnv

  cfg = tasks.load_cfg_from_registry(task, "env_cfg_entry_point")
  cfg.scene.num_envs = num_envs
  cfg.sim.dtype = "float32"
  env = ManagerBasedRlEnv(cfg)

  if os.environ.get("BENCH_MODE") == "train":
    _bench_train(task, env, num_envs)
    return
  env.reset(seed=0)

  key = jax.random.key(0)
  action = 0.1 * jax.random.normal(
    key, (num_envs, env.action_manager.total_action_dim), dtype=env.dtype
  )

  state = env.state
  step = env._jit_step
  for _ in range(warmup):
    state, out = step(state, action)
  jax.tree_util.tree_map(
    lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
    out,
  )

  t0 = time.perf_counter()
  for _ in range(steps):
    state, out = step(state, action)
  jax.block_until_ready(out[1])
  dt = time.perf_counter() - t0

  env_steps_per_s = num_envs * steps / dt

  # Sanity: physics stayed finite. (This device→host pull happens AFTER the
  # timed region — on the axon runtime any D2H permanently slows the device,
  # see docs/PERF_NOTES.md.)
  import numpy as np

  qpos = np.asarray(jax.device_get(state.qpos if hasattr(state, "qpos")
                                   else state.data.qpos))
  finite = bool(np.isfinite(qpos).all())

  target = 1_000_000.0
  print(
    json.dumps(
      {
        "metric": f"env_steps_per_s ({task}, {num_envs} envs, "
        f"{jax.devices()[0].platform}, finite={finite})",
        "value": round(env_steps_per_s, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_steps_per_s / target, 4),
      }
    )
  )


def _bench_train(task: str, env, num_envs: int) -> None:
  """Full PPO training-iteration throughput (rollout + update)."""
  import jax

  import mjlab_tpu.tasks as tasks
  from mjlab_tpu.rl.runner import OnPolicyRunner

  agent = tasks.load_cfg_from_registry(task, "rl_cfg_entry_point")
  runner = OnPolicyRunner(env, agent)
  state = runner.state
  # Two warmup iterations: the second still compiles host-loop helpers.
  for _ in range(2):
    state, metrics = runner._train_iter(state)
  jax.block_until_ready(metrics["Loss/loss"])

  iters = int(os.environ.get("BENCH_STEPS", "5"))
  t0 = time.perf_counter()
  for _ in range(iters):
    state, metrics = runner._train_iter(state)
  jax.block_until_ready(metrics["Loss/loss"])
  dt = time.perf_counter() - t0
  steps = num_envs * agent.num_steps_per_env * iters
  target = 1_000_000.0
  v = steps / dt
  print(
    json.dumps(
      {
        "metric": f"train_env_steps_per_s ({task}, {num_envs} envs, full PPO "
        f"iteration, {jax.devices()[0].platform})",
        "value": round(v, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(v / target, 4),
      }
    )
  )


if __name__ == "__main__":
  sys.exit(main())
