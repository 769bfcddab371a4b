"""Filesystem helpers: checkpoint resolution, yaml dump
(reference utils/os.py:52-113; the wandb download path is stubbed until a
network-enabled deployment)."""

from __future__ import annotations

import os
import re
from pathlib import Path


def resolve_checkpoint(
  run_dir: str | Path, run_regex: str = ".*", ckpt_regex: str = r"model_(\d+)"
) -> str | None:
  """Newest checkpoint of the newest matching run (reference utils/os.py:52-84)."""
  root = Path(run_dir)
  if not root.is_dir():
    return None
  runs = sorted(
    [d for d in root.iterdir() if d.is_dir() and re.match(run_regex, d.name)]
  ) or [root]
  for run in reversed(runs):
    best_iter, best = -1, None
    for f in run.iterdir():
      m = re.match(ckpt_regex, f.name)
      if m:
        it = int(m.group(1))
        if it > best_iter:
          best_iter, best = it, f
    if best is not None:
      return str(best).removesuffix(".pkl")
  return None


def resolve_latest_checkpoint(log_root: str | Path) -> str | None:
  return resolve_checkpoint(log_root)


def dump_yaml(path: str | Path, data: dict) -> None:
  import yaml

  os.makedirs(Path(path).parent, exist_ok=True)
  with open(path, "w") as f:
    yaml.safe_dump(data, f)
