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
  # Honor JAX_PLATFORMS=cpu before backend init: the tunneled TPU PJRT
  # plugin only respects the jax.config value, not the env var (see
  # __graft_entry__.dryrun_multichip) — without this, CLI test runs on
  # virtual CPU meshes would silently land on the single tunneled chip.
  if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")
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

  # Motion sources for tracking tasks, in precedence order:
  # --motion-file (direct npz path) > --registry-name (artifact registry —
  # reference scripts/train.py:48-64; here utils/artifacts.py resolves
  # from wandb when configured, else from the local filesystem registry;
  # motions come from scripts/csv_to_npz.py).
  motion = overrides.get("motion_file") or overrides.get("motion-file")
  registry_name = overrides.get("registry_name") or overrides.get(
    "registry-name"
  )
  if not motion and registry_name:
    from mjlab_tpu.utils.artifacts import resolve_motion_file

    motion = resolve_motion_file(str(registry_name))
    print(f"[train] registry artifact {registry_name} -> {motion}")
  if motion:
    apply_overrides(env_cfg, {"commands.motion.motion_file": motion})

  log_root = overrides.get("log_dir", os.path.join("logs", agent_cfg.experiment_name))
  os.makedirs(log_root, exist_ok=True)

  print(f"[train] task={task} num_envs={env_cfg.scene.num_envs} "
        f"devices={jax.devices()}", flush=True)

  # Multi-chip data parallelism (net-new vs reference — SURVEY §2.10
  # "must build"): shard the env batch over all visible devices unless
  # --mesh off / --mesh <n> overrides. Learner params replicate; gradient
  # and metric reductions ride XLA collectives over ICI.
  mesh = None
  mesh_arg = overrides.get("mesh", "auto")
  if mesh_arg not in ("off", "0", "false"):
    auto = mesh_arg in ("auto", "true")
    n_want = len(jax.devices()) if auto else int(mesh_arg)
    num_envs = env_cfg.scene.num_envs
    if num_envs % n_want:
      if not auto:
        raise SystemExit(
          f"[train] --env.scene.num_envs={num_envs} is not divisible by "
          f"--mesh {n_want} devices; pick a divisible env count or "
          f"--mesh off."
        )
      # Auto mode degrades to the largest device count that divides the
      # env batch (worst case 1 = single device).
      while num_envs % n_want:
        n_want -= 1
    if n_want > 1:
      from mjlab_tpu.distributed import make_env_mesh

      mesh = make_env_mesh(n_want)
      print(
        f"[train] env-sharded data parallelism: {num_envs} envs over "
        f"{n_want} devices (mesh={dict(mesh.shape)})",
        flush=True,
      )

  env = gym.make(task, cfg=env_cfg).unwrapped
  runner = OnPolicyRunner(env, agent_cfg, log_dir=log_root, mesh=mesh)

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
  # Training video recording (--video <n_frames> [--video_interval iters]):
  # the reference wraps the env in gym.wrappers.RecordVideo and records
  # rollout frames inline (reference scripts/train.py:90-98,
  # envs/manager_based_rl_env.py:154-169). Pulling frames from the device
  # every step would throttle a TPU run, and EGL cannot share a process
  # with torch in this image (mesa/torch symbol clash → SIGSEGV), so here
  # training pauses every video_interval iterations, checkpoints, and
  # records a clip of the CURRENT policy in a clean CPU subprocess via
  # `play --video` — training state is untouched.
  video_frames = int(overrides.get("video", "0"))
  video_interval = int(
    overrides.get("video_interval", str(agent_cfg.save_interval))
  )

  def record_clip() -> None:
    import subprocess

    video_dir = os.path.join(log_root, "videos")
    os.makedirs(video_dir, exist_ok=True)
    path = os.path.join(video_dir, f"iter_{runner.iteration}.mp4")
    ckpt = os.path.join(video_dir, f"ckpt_{runner.iteration}")
    runner.save(ckpt, export=False)  # orbax only: keeps torch out of here
    cmd = [
      sys.executable, "-m", "mjlab_tpu.scripts.play", task,
      "--policy", "trained", "--checkpoint", os.path.abspath(ckpt),
      "--num_envs", "2", "--steps", str(video_frames),
      "--video", path, "--seed", str(runner.iteration),
    ]
    for k, v in env_over.items():
      if k != "scene.num_envs":  # clips always render a small env batch
        cmd += [f"--env.{k}", str(v)]
    for k, v in agent_over.items():
      cmd += [f"--agent.{k}", str(v)]
    if motion:
      cmd += ["--motion-file", motion]
    sub_env = dict(os.environ, JAX_PLATFORMS="cpu")
    sub_env.setdefault("MUJOCO_GL", "egl")
    r = subprocess.run(cmd, env=sub_env, capture_output=True, text=True,
                       timeout=3600)
    if r.returncode == 0 and os.path.exists(path):
      print(f"[train] wrote {video_frames}-frame clip → {path}", flush=True)
    else:  # GL-less hosts etc.: skip, never kill the run
      print(
        f"[train] video recording skipped: {(r.stderr or r.stdout)[-500:]}",
        flush=True,
      )

  if profile_iters > 0:
    trace_dir = os.path.join(log_root, "profile")
    print(f"[train] profiling first {profile_iters} iters → {trace_dir}",
          flush=True)
    with jax.profiler.trace(trace_dir):
      runner.learn(profile_iters)
    runner.learn(agent_cfg.max_iterations - profile_iters)
  elif video_frames > 0:
    done = 0
    while done < agent_cfg.max_iterations:
      seg = min(video_interval, agent_cfg.max_iterations - done)
      runner.learn(seg)
      done += seg
      record_clip()
  else:
    runner.learn(agent_cfg.max_iterations)
  runner.save(os.path.join(log_root, f"model_{runner.iteration}"))

  # Machine-readable record of the run's final metrics (consumed by the
  # multi-device CLI parity test and handy for sweeps).
  if runner.last_metrics is not None:
    import json

    with open(os.path.join(log_root, "final_metrics.json"), "w") as f:
      json.dump({"iteration": runner.iteration, **runner.last_metrics}, f)


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
        "[--log_dir d] [--profile n] [--enable_nan_guard] "
        "[--mesh auto|off|<n_devices>] [--motion-file p.npz] "
        "[--registry-name artifact[:alias]] "
        "[--video n_frames [--video_interval iters]]",
      )
    )
    sys.exit(0)
  run_train(positionals[0], overrides)


if __name__ == "__main__":
  main()
