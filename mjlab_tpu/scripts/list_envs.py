"""List registered Mjlab-* tasks (reference scripts/list_envs.py)."""

from __future__ import annotations

import gymnasium as gym

import mjlab_tpu.tasks as tasks


def main() -> None:
  ids = tasks.list_tasks()
  if not ids:
    print("No Mjlab-* tasks registered.")
    return
  width = max(len(t) for t in ids) + 2
  print(f"{'Task ID':<{width}} Entry point")
  print("-" * (width + 40))
  for tid in ids:
    spec = gym.spec(tid)
    print(f"{tid:<{width}} {spec.entry_point}")


if __name__ == "__main__":
  main()
