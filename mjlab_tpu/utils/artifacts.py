"""Artifact registry: named, versioned artifact resolution and publishing.

The reference resolves training artifacts through the wandb registry —
motion datasets by `--registry-name` (reference scripts/train.py:48-64),
checkpoints by run path with a local download cache (reference
utils/os.py:87-113), and uploads the exported policy on every save
(reference tasks/velocity/rl/runner.py:16-38). This deployment has no
egress, so the same surface is provided over two backends:

- LocalRegistry (default): a filesystem registry rooted at
  MJLAB_REGISTRY_DIR (default ~/.mjlab_registry). Layout:
  `<root>/<name>/v<N>/<files>`; the alias `latest` resolves to the
  highest version. `publish` copies files in as a new version.
- WandbRegistry: used automatically when the `wandb` package is importable
  AND WANDB_API_KEY is set (or WANDB_MODE not disabled) — same call
  signatures, delegating to the wandb Api.

Names accept an optional `:alias` suffix (`my-motion:latest`, `:v3`);
bare names mean `:latest`, matching the reference's convention.
"""

from __future__ import annotations

import os
import re
import shutil
from pathlib import Path


def _registry_root() -> Path:
  return Path(
    os.environ.get("MJLAB_REGISTRY_DIR", "~/.mjlab_registry")
  ).expanduser()


class LocalRegistry:
  """Filesystem-backed artifact registry (no-egress deployments)."""

  def __init__(self, root: str | Path | None = None):
    self.root = Path(root) if root else _registry_root()

  def _versions(self, name: str) -> list[tuple[int, Path]]:
    d = self.root / name
    if not d.is_dir():
      return []
    out = []
    for v in d.iterdir():
      m = re.fullmatch(r"v(\d+)", v.name)
      if m and v.is_dir():
        out.append((int(m.group(1)), v))
    return sorted(out)

  def resolve(self, name: str) -> Path:
    """Directory of the named artifact (alias `latest` or `v<N>`)."""
    base, _, alias = name.partition(":")
    alias = alias or "latest"
    versions = self._versions(base)
    if not versions:
      raise FileNotFoundError(
        f"artifact '{base}' not found in local registry {self.root} "
        f"(publish one with ArtifactRegistry.publish, or pass a direct "
        f"file path instead of a registry name)"
      )
    if alias == "latest":
      return versions[-1][1]
    m = re.fullmatch(r"v(\d+)", alias)
    if m:
      want = int(m.group(1))
      for n, p in versions:
        if n == want:
          return p
    raise FileNotFoundError(f"artifact '{base}' has no version '{alias}'")

  def publish(self, path: str | Path, name: str) -> Path:
    """Copy a file or directory into the registry as a new version."""
    src = Path(path)
    if not src.exists():
      raise FileNotFoundError(str(src))
    versions = self._versions(name)
    next_v = (versions[-1][0] + 1) if versions else 1
    dst = self.root / name / f"v{next_v}"
    dst.mkdir(parents=True, exist_ok=True)
    if src.is_dir():
      shutil.copytree(src, dst / src.name, dirs_exist_ok=True)
    else:
      shutil.copy2(src, dst / src.name)
    return dst


class WandbRegistry:
  """wandb-backed registry with the same surface (egress deployments)."""

  def resolve(self, name: str) -> Path:
    import wandb

    if ":" not in name:
      name = name + ":latest"
    artifact = wandb.Api().artifact(name)
    return Path(artifact.download())

  def publish(self, path: str | Path, name: str) -> Path:
    import wandb

    if wandb.run is None:
      raise RuntimeError("WandbRegistry.publish requires an active wandb run")
    wandb.save(str(path), base_path=str(Path(path).parent))
    return Path(path)


def get_registry():
  """wandb when importable+configured, else the local registry."""
  if os.environ.get("WANDB_API_KEY") and os.environ.get(
    "WANDB_MODE", ""
  ) not in ("disabled", "offline"):
    try:
      import wandb  # noqa: F401

      return WandbRegistry()
    except ImportError:
      pass
  return LocalRegistry()


def resolve_motion_file(registry_name: str) -> str:
  """`--registry-name` → path to motion.npz (reference train.py:48-64:
  download the artifact, use `<dir>/motion.npz`; here any single .npz in
  the artifact also counts, so locally-published motions need no rename)."""
  d = get_registry().resolve(registry_name)
  motion = Path(d) / "motion.npz"
  if motion.exists():
    return str(motion)
  npz = sorted(Path(d).rglob("*.npz"))
  if len(npz) == 1:
    return str(npz[0])
  raise FileNotFoundError(
    f"artifact '{registry_name}' ({d}) does not contain motion.npz "
    f"(found {len(npz)} .npz files)"
  )


def get_checkpoint_path(
  log_path: str | Path, run_path: str | Path
) -> tuple[Path, bool]:
  """Checkpoint from a registry run path, with local cache (reference
  utils/os.py:87-113). Returns (checkpoint_path, was_cached). For the
  local backend, `run_path` is an artifact name whose files include
  `model_<it>*` entries; the newest is picked, cached under
  `<log_path>/registry_checkpoints/<name>`."""
  from mjlab_tpu.utils.os import resolve_checkpoint

  run_id = str(run_path).split("/")[-1].replace(":", "_")
  cache_dir = Path(log_path) / "registry_checkpoints" / run_id
  cached = resolve_checkpoint(cache_dir)
  if cached:
    return Path(cached), True
  src = get_registry().resolve(str(run_path))
  found = resolve_checkpoint(src)
  if not found:
    raise FileNotFoundError(
      f"no model_<iteration> checkpoint inside artifact '{run_path}' ({src})"
    )
  cache_dir.mkdir(parents=True, exist_ok=True)
  srcp = Path(found)
  dst = cache_dir / srcp.name
  if srcp.is_dir():
    shutil.copytree(srcp, dst, dirs_exist_ok=True)
  else:
    shutil.copy2(srcp, dst)
  return dst, False
