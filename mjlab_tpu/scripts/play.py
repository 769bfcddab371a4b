"""Policy playback / evaluation entry point (reference scripts/play.py).

Usage:
  python -m mjlab_tpu.scripts.play Mjlab-Velocity-Flat-Unitree-G1 \
      [--checkpoint logs/g1_velocity/model_100] [--policy zero|random|trained]
      [--num_envs 4] [--steps 200] [--viewer native|viser|none]
      [--video rollout.mp4]

PLAY-mode overrides mirror the reference (play.py:47-91): infinite episode,
no observation corruption, no pushes.
"""

from __future__ import annotations

import sys

import gymnasium as gym
import numpy as np


def apply_play_overrides(env_cfg) -> None:
  """Eval-friendly config surgery (reference play.py:47-91)."""
  # Effectively infinite but int32-safe as a step count (episode_length_buf
  # is int32; 1e6 s at 50 Hz control = 5e7 steps).
  env_cfg.episode_length_s = 1.0e6
  for group in env_cfg.observations.values():
    group.enable_corruption = False
  env_cfg.events.pop("push_robot", None)
  if env_cfg.scene.terrain is not None and (
    env_cfg.scene.terrain.terrain_generator is not None
  ):
    gen = env_cfg.scene.terrain.terrain_generator
    gen.num_rows = min(gen.num_rows, 3)
    gen.num_cols = min(gen.num_cols, 3)
    gen.curriculum = False


def run_play(task: str, overrides: dict[str, str]) -> None:
  # Honor JAX_PLATFORMS=cpu before backend init (the tunneled TPU plugin
  # only respects the config value — see scripts/train.py).
  import os

  if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax

    jax.config.update("jax_platforms", "cpu")
  import jax
  import jax.numpy as jnp

  import mjlab_tpu.tasks as tasks
  from mjlab_tpu.rl.runner import OnPolicyRunner
  from mjlab_tpu.scripts.cli import apply_overrides

  env_cfg = tasks.load_cfg_from_registry(task, "env_cfg_entry_point")
  agent_cfg = tasks.load_cfg_from_registry(task, "rl_cfg_entry_point")
  agent_over = {k[6:]: v for k, v in overrides.items() if k.startswith("agent.")}
  apply_overrides(agent_cfg, agent_over)
  apply_play_overrides(env_cfg)
  env_cfg.scene.num_envs = int(overrides.pop("num_envs", "1"))
  env_over = {k[4:]: v for k, v in overrides.items() if k.startswith("env.")}
  apply_overrides(env_cfg, env_over)

  # Motion sources: --motion-file (direct path) > --registry-name
  # (artifact registry, utils/artifacts.py — reference wandb flow,
  # scripts/play.py:167-181 / train.py:48-64).
  motion = overrides.get("motion_file") or overrides.get("motion-file")
  registry_name = overrides.get("registry_name") or overrides.get(
    "registry-name"
  )
  if not motion and registry_name:
    from mjlab_tpu.utils.artifacts import resolve_motion_file

    motion = resolve_motion_file(str(registry_name))
  if motion:
    apply_overrides(env_cfg, {"commands.motion.motion_file": motion})

  policy_kind = overrides.get("policy", "trained" if "checkpoint" in overrides
                              else "zero")
  steps = int(overrides.get("steps", "1000"))
  viewer_kind = overrides.get("viewer", "none")

  env = gym.make(task, cfg=env_cfg).unwrapped
  act_dim = env.action_manager.total_action_dim
  B = env.num_envs

  if policy_kind == "trained":
    runner = OnPolicyRunner(env, agent_cfg)
    ckpt = overrides.get("checkpoint")
    run_path = overrides.get("run_path") or overrides.get("run-path")
    if ckpt is None and run_path:
      # Registry run path with local cache (reference utils/os.py:87-113).
      from mjlab_tpu.utils.artifacts import get_checkpoint_path

      ckpt_path, was_cached = get_checkpoint_path("logs", str(run_path))
      ckpt = str(ckpt_path)
      print(f"[play] registry checkpoint {run_path} -> {ckpt} "
            f"(cached={was_cached})")
    if ckpt is None:
      from mjlab_tpu.utils.os import resolve_latest_checkpoint

      ckpt = resolve_latest_checkpoint(f"logs/{agent_cfg.experiment_name}")
      if ckpt is None:
        raise FileNotFoundError("No checkpoint found; pass --checkpoint")
    runner.load(ckpt)
    policy = runner.get_inference_policy()
  elif policy_kind == "random":
    key_holder = [jax.random.key(0)]

    def policy(obs):
      key_holder[0], k = jax.random.split(key_holder[0])
      return jax.random.normal(k, (B, act_dim)) * 0.1
  else:  # zero

    def policy(obs):
      return jnp.zeros((B, act_dim))

  if viewer_kind in ("native", "viser"):
    from mjlab_tpu.viewer import make_viewer

    make_viewer(viewer_kind, env, policy).run(max_steps=steps)
    return

  # Optional video recording (reference records via the offscreen renderer;
  # requires a GL backend, e.g. MUJOCO_GL=egl on headless machines).
  video_path = overrides.get("video")
  renderer = None
  frames: list[np.ndarray] = []
  if video_path:
    from mjlab_tpu.viewer.offscreen_renderer import OffscreenRenderer

    renderer = OffscreenRenderer(env)

  # Headless rollout with reward stats.
  obs, _ = env.reset(seed=int(overrides.get("seed", "0")))
  total = np.zeros(B)
  for i in range(steps):
    obs, rew, term, trunc, extras = env.step(policy(obs))
    total += np.asarray(rew)
    if renderer is not None:
      frames.append(renderer.render())
  print(f"[play] {task}: {steps} steps, mean reward/step "
        f"{total.mean() / steps:.4f}, base z "
        f"{np.asarray(env.state.data.qpos[:, 2]).round(3)}")
  if renderer is not None:
    import imageio

    fps = round(1.0 / env.step_dt)
    imageio.mimsave(video_path, frames, fps=fps)
    renderer.close()
    print(f"[play] wrote {len(frames)} frames to {video_path} ({fps} fps)")


def main() -> None:
  from mjlab_tpu.scripts.cli import parse_args

  positionals, overrides = parse_args(sys.argv[1:])
  if not positionals:
    print("usage: play <Task-ID> [--checkpoint ..] [--policy zero|random|trained]")
    sys.exit(1)
  if "help" in overrides:
    import mjlab_tpu.tasks as tasks
    from mjlab_tpu.scripts.cli import format_help

    task = positionals[0]
    print(
      format_help(
        {"env": tasks.load_cfg_from_registry(task, "env_cfg_entry_point")},
        usage=f"usage: play {task} [--env.<field> v] [--checkpoint ..] "
        "[--policy zero|random|trained] [--num_envs n] [--steps n] "
        "[--viewer native|viser|none] [--video out.mp4]",
      )
    )
    sys.exit(0)
  run_play(positionals[0], overrides)


if __name__ == "__main__":
  main()
