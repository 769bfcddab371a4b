"""Task registry: importing this package registers all Mjlab-* gym ids.

Mirrors the reference's recursive config-package importer
(tasks/__init__.py:1-5 → third_party/.../importer.py:15) plus the registry
load helper (parse_cfg.py:22). External packages can register additional
tasks through the `mjlab_tpu.tasks` entry-point group
(reference src/mjlab/__init__.py:22-34).
"""

from __future__ import annotations

import importlib
import pkgutil
from typing import Any

import gymnasium as gym


def _import_config_packages() -> None:
  pkg = importlib.import_module(__name__)
  for mod in pkgutil.walk_packages(pkg.__path__, prefix=f"{__name__}."):
    leaf = mod.name.rsplit(".", 1)[-1]
    if ".config." in mod.name and mod.ispkg:
      importlib.import_module(mod.name)
    elif leaf == "config" and mod.ispkg:
      importlib.import_module(mod.name)


def _import_external_tasks() -> None:
  try:
    from importlib.metadata import entry_points

    for ep in entry_points(group="mjlab_tpu.tasks"):
      ep.load()
  except Exception:
    pass


def load_cfg_from_registry(task_name: str, entry_point_key: str) -> Any:
  """Resolve a config registered in gym kwargs: either a config instance
  (via @retval) or a "module:attr" string (reference parse_cfg.py:22)."""
  spec = gym.spec(task_name.split(":")[-1])
  cfg_entry = spec.kwargs.get(entry_point_key)
  if cfg_entry is None:
    raise ValueError(
      f"Task '{task_name}' has no '{entry_point_key}'. "
      f"Available kwargs: {list(spec.kwargs)}"
    )
  if isinstance(cfg_entry, str):
    mod_name, attr = cfg_entry.split(":")
    obj = getattr(importlib.import_module(mod_name), attr)
    return obj() if callable(obj) else obj
  if callable(cfg_entry):
    return cfg_entry()
  import copy

  return copy.deepcopy(cfg_entry)


def list_tasks(prefix: str = "Mjlab-") -> list[str]:
  return sorted(tid for tid in gym.registry if tid.startswith(prefix))


_import_config_packages()
_import_external_tasks()
