"""Motion preprocessing: CSV mocap → tracking-ready npz.

Pipeline (reference scripts/csv_to_npz.py): load CSV rows
[base_pos(3), base_quat wxyz(4), joint_pos(nj)] at input_fps → lerp/slerp
resample to output_fps → finite-difference velocities (SO(3) log for
angular) → replay through forward kinematics to harvest per-body
pos/quat/lin/ang velocities → save npz compatible with
tracking MotionLoader.

Usage:
  python -m mjlab_tpu.scripts.csv_to_npz input.csv --output motion.npz \
      [--input_fps 30] [--output_fps 50] [--robot g1]
"""

from __future__ import annotations

import sys

import numpy as np


def _slerp_batch(q0: np.ndarray, q1: np.ndarray, t: np.ndarray) -> np.ndarray:
  """Vectorized quaternion slerp (wxyz)."""
  dot = np.sum(q0 * q1, axis=-1, keepdims=True)
  q1 = np.where(dot < 0, -q1, q1)
  dot = np.abs(dot)
  theta = np.arccos(np.clip(dot, -1.0, 1.0))
  sin_theta = np.sin(theta)
  near = sin_theta < 1e-6
  w0 = np.where(near, 1.0 - t, np.sin((1.0 - t) * theta) / np.maximum(sin_theta, 1e-12))
  w1 = np.where(near, t, np.sin(t * theta) / np.maximum(sin_theta, 1e-12))
  out = w0 * q0 + w1 * q1
  return out / np.linalg.norm(out, axis=-1, keepdims=True)


def _quat_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
  w1, x1, y1, z1 = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
  w2, x2, y2, z2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
  return np.stack(
    [
      w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
      w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
      w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
      w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ],
    axis=-1,
  )


def _so3_finite_diff(quats: np.ndarray, dt: float) -> np.ndarray:
  """Angular velocity by SO(3) log of q_{t+1} q_t⁻¹ (world frame)."""
  q0 = quats[:-1]
  q1 = quats[1:]
  conj = q0 * np.array([1, -1, -1, -1])
  dq = _quat_mul(q1, conj)
  dq = np.where(dq[..., :1] < 0, -dq, dq)
  angle = 2.0 * np.arccos(np.clip(dq[..., 0:1], -1.0, 1.0))
  axis = dq[..., 1:]
  norm = np.linalg.norm(axis, axis=-1, keepdims=True)
  axis = axis / np.maximum(norm, 1e-12)
  w = angle * axis / dt
  return np.concatenate([w, w[-1:]], axis=0)


def resample(base_pos, base_quat, joint_pos, input_fps, output_fps):
  t_in = np.arange(base_pos.shape[0]) / input_fps
  duration = t_in[-1]
  t_out = np.arange(0.0, duration, 1.0 / output_fps)
  idx = np.minimum(
    np.searchsorted(t_in, t_out, side="right") - 1, len(t_in) - 2
  )
  blend = ((t_out - t_in[idx]) * input_fps)[:, None]
  pos = base_pos[idx] * (1 - blend) + base_pos[idx + 1] * blend
  joints = joint_pos[idx] * (1 - blend) + joint_pos[idx + 1] * blend
  quat = _slerp_batch(base_quat[idx], base_quat[idx + 1], blend)
  return pos, quat, joints


def process(
  csv_path: str,
  robot: str = "g1",
  input_fps: float = 30.0,
  output_fps: float = 50.0,
) -> dict[str, np.ndarray]:
  import mujoco

  from mjlab_tpu.entity import Entity

  if robot == "g1":
    from mjlab_tpu.asset_zoo.robots.unitree_g1.g1_constants import (
      get_g1_robot_cfg,
    )

    entity = Entity(get_g1_robot_cfg())
  else:
    raise ValueError(f"Unsupported robot {robot}")

  raw = np.loadtxt(csv_path, delimiter=",")
  base_pos, base_quat, joint_pos = raw[:, :3], raw[:, 3:7], raw[:, 7:]
  base_quat = base_quat / np.linalg.norm(base_quat, axis=-1, keepdims=True)

  pos, quat, joints = resample(base_pos, base_quat, joint_pos, input_fps,
                               output_fps)
  dt = 1.0 / output_fps
  lin_vel = np.gradient(pos, dt, axis=0)
  ang_vel = _so3_finite_diff(quat, dt)
  joint_vel = np.gradient(joints, dt, axis=0)

  # Replay through forward kinematics (host MuJoCo) to harvest body frames.
  model = entity.spec.compile()
  data = mujoco.MjData(model)
  T = pos.shape[0]
  nb = model.nbody - 1
  body_pos = np.zeros((T, nb, 3))
  body_quat = np.zeros((T, nb, 4))
  body_lin_vel = np.zeros((T, nb, 3))
  body_ang_vel = np.zeros((T, nb, 3))
  for t in range(T):
    data.qpos[:3] = pos[t]
    data.qpos[3:7] = quat[t]
    data.qpos[7:] = joints[t]
    data.qvel[:3] = lin_vel[t]
    data.qvel[3:6] = ang_vel[t]
    data.qvel[6:] = joint_vel[t]
    mujoco.mj_forward(model, data)
    body_pos[t] = data.xpos[1:]
    body_quat[t] = data.xquat[1:]
    # World-frame body velocities from cvel (stored about subtree COM frame).
    for b in range(1, model.nbody):
      vel = np.zeros(6)
      mujoco.mj_objectVelocity(
        model, data, mujoco.mjtObj.mjOBJ_XBODY, b, vel, 0
      )
      body_ang_vel[t, b - 1] = vel[:3]
      body_lin_vel[t, b - 1] = vel[3:]

  return {
    "fps": np.asarray(output_fps),
    "joint_pos": joints.astype(np.float32),
    "joint_vel": joint_vel.astype(np.float32),
    "body_pos_w": body_pos.astype(np.float32),
    "body_quat_w": body_quat.astype(np.float32),
    "body_lin_vel_w": body_lin_vel.astype(np.float32),
    "body_ang_vel_w": body_ang_vel.astype(np.float32),
  }


def main() -> None:
  from mjlab_tpu.scripts.cli import parse_args

  positionals, overrides = parse_args(sys.argv[1:])
  if not positionals:
    print("usage: csv_to_npz input.csv --output motion.npz "
          "[--input_fps 30] [--output_fps 50] [--robot g1]")
    sys.exit(1)
  out = overrides.get("output", positionals[0].rsplit(".", 1)[0] + ".npz")
  arrays = process(
    positionals[0],
    robot=overrides.get("robot", "g1"),
    input_fps=float(overrides.get("input_fps", "30")),
    output_fps=float(overrides.get("output_fps", "50")),
  )
  np.savez(out, **arrays)
  print(f"Wrote {out}: {arrays['joint_pos'].shape[0]} frames at "
        f"{float(arrays['fps'])} fps")


if __name__ == "__main__":
  main()
