"""NaN guard: rolling physics-state snapshots + dump-on-NaN.

Functional analog of the reference guard (utils/nan_guard.py): the jitted
step computes a cheap per-step NaN flag (surfaced in the step log); the
host-side guard keeps a ring of recent state snapshots and, on the first
flagged step, dumps the last `buffer_size` states for up to
`max_envs_to_dump` envs as npz plus the model as .mjb, with `latest`
symlinks (reference nan_guard.py:125-171). Training-time mitigation is
separate: the `nan_detection` termination resets poisoned envs
(envs/mdp/terminations.py).
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass
from pathlib import Path

import jax
import numpy as np


@dataclass
class NanGuardCfg:
  enabled: bool = False
  buffer_size: int = 20
  max_envs_to_dump: int = 4
  output_dir: str = "nan_dumps"


class NanGuard:
  def __init__(self, cfg: NanGuardCfg, env) -> None:
    self.cfg = cfg
    self.env = env
    self._ring: deque = deque(maxlen=cfg.buffer_size)
    self._fired = False

  def watch(self) -> bool:
    """Call once per host step AFTER env.step. Returns True on first NaN."""
    if not self.cfg.enabled or self._fired:
      return False
    data = self.env.state.data
    # np.array (not asarray): device_get of an already-host-resident array
    # returns it uncopied, and ring snapshots must not alias live state.
    snap = {
      "qpos": np.array(jax.device_get(data.qpos)),
      "qvel": np.array(jax.device_get(data.qvel)),
      "qacc": np.array(jax.device_get(data.qacc)),
      "ctrl": np.array(jax.device_get(data.ctrl)),
      "time": np.array(jax.device_get(data.time)),
    }
    self._ring.append(snap)
    nan_mask = (
      np.isnan(snap["qpos"]).any(axis=-1)
      | np.isnan(snap["qvel"]).any(axis=-1)
      | np.isinf(snap["qpos"]).any(axis=-1)
      | np.isinf(snap["qvel"]).any(axis=-1)
    )
    if not nan_mask.any():
      return False
    self._fired = True
    self._dump(np.nonzero(nan_mask)[0][: self.cfg.max_envs_to_dump])
    return True

  def _dump(self, env_ids: np.ndarray) -> None:
    import mujoco

    out = Path(self.cfg.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    stamp = time.strftime("%Y%m%d_%H%M%S")
    run_dir = out / f"nan_{stamp}"
    run_dir.mkdir(exist_ok=True)

    for env_id in env_ids:
      arrays = {
        key: np.stack([s[key][env_id] for s in self._ring])
        for key in self._ring[0]
      }
      np.savez(run_dir / f"env_{env_id}.npz", **arrays)
    mujoco.mj_saveModel(
      self.env.sim.mj_model, str(run_dir / "model.mjb"), None
    )
    latest = out / "latest"
    try:
      if latest.is_symlink() or latest.exists():
        latest.unlink()
      latest.symlink_to(run_dir.name)
    except OSError:
      pass
    print(
      f"[nan_guard] NaN detected! Dumped {len(env_ids)} envs × "
      f"{len(self._ring)} states to {run_dir}"
    )
