"""Filesystem helpers: checkpoint resolution, yaml dump
(reference utils/os.py:52-113). The reference's wandb artifact flows
(utils/os.py:87-113) live in utils/artifacts.py: a wandb backend when
configured, else a local filesystem registry (docs/FAQ.md "Where is the
wandb artifact-registry download?")."""

from __future__ import annotations

import os
import re
from pathlib import Path


def resolve_checkpoint(
  run_dir: str | Path,
  run_regex: str = ".*",
  ckpt_regex: str = r"model_(\d+)(\.pkl)?",
) -> str | None:
  """Newest checkpoint of the newest matching run (reference utils/os.py:52-84).

  A checkpoint is either an Orbax directory `model_<it>` or a legacy
  `model_<it>.pkl` file; the regex must FULL-match so sibling artifacts like
  `model_<it>_policy.pt` don't shadow it."""
  root = Path(run_dir)
  if not root.is_dir():
    return None

  def newest_in(run: Path) -> tuple[int, Path | None]:
    best_iter, best = -1, None
    for f in run.iterdir():
      m = re.fullmatch(ckpt_regex, f.name)
      if m:
        it = int(m.group(1))
        if it > best_iter:
          best_iter, best = it, f
    return best_iter, best

  # The root itself may hold checkpoints directly (subdirs can be Orbax
  # checkpoint dirs or artifacts, not runs) — check it first.
  _, best = newest_in(root)
  if best is not None:
    return str(best).removesuffix(".pkl")
  runs = sorted(
    d for d in root.iterdir() if d.is_dir() and re.fullmatch(run_regex, d.name)
  )
  for run in reversed(runs):
    _, best = newest_in(run)
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
