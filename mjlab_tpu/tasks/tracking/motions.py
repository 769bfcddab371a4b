"""Motion-file helpers for the tracking task.

The reference sources motion npz files from a wandb artifact registry
(reference scripts/train.py:48-64, utils/os.py:87-113). That download path
is descoped here (no wandb in the deployment image — docs/FAQ.md); motions
are local npz files produced by `scripts/csv_to_npz.py` and passed to
train/play via the first-class `--motion-file` flag.

`make_standing_motion` synthesizes a minimal valid motion — the robot's
init keyframe held for T frames with zero velocities — so the tracking
pipeline (MotionLoader indexing, RSI, anchor retargeting, adaptive
sampling) can run end-to-end without mocap data. Used by the bench harness
and tests.
"""

from __future__ import annotations

import numpy as np


def make_standing_motion(robot_cfg, path, T: int = 60, dt: float = 0.02) -> str:
  """Write a standing motion npz: FK of the entity's init keyframe held for
  T frames (zero joint/body velocities). Returns str(path).

  The npz layout matches MotionLoader (tasks/tracking/mdp/commands.py:39-61;
  reference tracking/mdp/commands.py:32-68): fps, joint_pos, joint_vel,
  body_pos_w, body_quat_w, body_lin_vel_w, body_ang_vel_w over the entity's
  bodies (world excluded).
  """
  import mujoco

  from mjlab_tpu.entity import Entity

  entity = Entity(robot_cfg)
  model = entity.spec.compile()
  data = mujoco.MjData(model)
  mujoco.mj_resetDataKeyframe(model, data, 0)
  mujoco.mj_forward(model, data)
  nb = model.nbody - 1  # entity bodies (world excluded)
  np.savez(
    path,
    fps=np.asarray(1.0 / dt),
    joint_pos=np.tile(data.qpos[7:], (T, 1)),
    joint_vel=np.zeros((T, model.nv - 6)),
    body_pos_w=np.tile(data.xpos[1:], (T, 1, 1)),
    body_quat_w=np.tile(data.xquat[1:], (T, 1, 1)),
    body_lin_vel_w=np.zeros((T, nb, 3)),
    body_ang_vel_w=np.zeros((T, nb, 3)),
  )
  return str(path)
