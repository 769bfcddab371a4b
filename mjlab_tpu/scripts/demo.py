"""Pretrained tracking-policy demo (reference scripts/demo.py:13-35).

Downloads (or reads from the local cache) a pretrained checkpoint + motion
and plays it in the viewer:

  python -m mjlab_tpu.scripts.demo [--viewer native] [--num_envs 8]
"""

from __future__ import annotations

import sys


def main() -> None:
  from mjlab_tpu.scripts.cli import parse_args
  from mjlab_tpu.scripts.gcs import (
    ensure_default_checkpoint,
    ensure_default_motion,
  )
  from mjlab_tpu.scripts.play import run_play

  _, overrides = parse_args(sys.argv[1:])
  try:
    checkpoint = ensure_default_checkpoint()
    motion = ensure_default_motion()
  except RuntimeError as e:
    print(f"Failed to obtain demo assets: {e}")
    sys.exit(1)

  overrides.setdefault("checkpoint", checkpoint)
  overrides.setdefault("num_envs", "8")
  overrides.setdefault("policy", "trained")
  overrides["env.commands.motion.motion_file"] = motion
  overrides["env.commands.motion.sampling_mode"] = "uniform"
  run_play("Mjlab-Tracking-Flat-Unitree-G1", overrides)


if __name__ == "__main__":
  main()
