"""Replay/scrub a NaN-guard dump in the MuJoCo viewer
(reference scripts/nan_viz.py).

Usage: python -m mjlab_tpu.scripts.nan_viz [dump_dir] [--env N] [--fps 10]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import numpy as np


def main() -> None:
  import mujoco

  from mjlab_tpu.scripts.cli import parse_args

  positionals, overrides = parse_args(sys.argv[1:])
  dump_dir = Path(positionals[0] if positionals else "nan_dumps/latest")
  env_id = int(overrides.get("env", "0"))
  fps = float(overrides.get("fps", "10"))

  if not (dump_dir / "model.mjb").exists():
    print(
      "usage: nan_viz [dump_dir] [--env N] [--fps 10]\n"
      f"no NaN-guard dump found at '{dump_dir}' — run training with "
      "--enable_nan_guard to produce one (see utils/nan_guard.py)."
    )
    sys.exit(1)
  model = mujoco.MjModel.from_binary_path(str(dump_dir / "model.mjb"))
  states = np.load(dump_dir / f"env_{env_id}.npz")
  qpos = states["qpos"]
  print(f"Replaying {qpos.shape[0]} frames of env {env_id} from {dump_dir}")

  data = mujoco.MjData(model)
  try:
    if not (os.environ.get("DISPLAY") or sys.platform == "darwin"):
      raise RuntimeError("no display")
    import mujoco.viewer as viewer

    with viewer.launch_passive(model, data) as v:
      frame = 0
      while v.is_running():
        data.qpos[:] = np.nan_to_num(qpos[frame % qpos.shape[0]])
        mujoco.mj_forward(model, data)
        v.sync()
        frame += 1
        time.sleep(1.0 / fps)
  except Exception as e:  # headless fallback: print state stats
    print(f"(viewer unavailable: {e}) — frame stats:")
    for i in range(qpos.shape[0]):
      bad = np.isnan(qpos[i]).sum() + np.isinf(qpos[i]).sum()
      print(f"frame {i:3d}: |qpos|max={np.nanmax(np.abs(qpos[i])):.3e} bad={bad}")


if __name__ == "__main__":
  main()
