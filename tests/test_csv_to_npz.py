"""Motion-pipeline test: CSV mocap → csv_to_npz.process → npz consumed by
the tracking MotionLoader (reference scripts/csv_to_npz.py end-to-end).

Pure host-side (numpy + MuJoCo C forward kinematics) — no JAX compile."""

import numpy as np
import pytest

from mjlab_tpu.scripts.csv_to_npz import process, resample


def _synthetic_csv(tmp_path, n_frames=61, input_fps=30.0, nj=29):
  """Smooth synthetic G1 trajectory: walk forward, yaw slowly, swing joints."""
  t = np.arange(n_frames) / input_fps
  base_pos = np.stack([0.4 * t, 0.05 * np.sin(t), 0.78 + 0.02 * np.cos(t)], -1)
  yaw = 0.3 * t
  base_quat = np.stack(
    [np.cos(yaw / 2), np.zeros_like(yaw), np.zeros_like(yaw), np.sin(yaw / 2)],
    -1,
  )
  joint_pos = 0.3 * np.sin(
    2.0 * t[:, None] + np.linspace(0, np.pi, nj)[None, :]
  )
  rows = np.concatenate([base_pos, base_quat, joint_pos], axis=-1)
  path = tmp_path / "motion.csv"
  np.savetxt(path, rows, delimiter=",")
  return str(path), base_pos, base_quat, joint_pos


def test_resample_endpoints_and_rate():
  t_in = 30.0
  pos = np.linspace([0, 0, 0], [1, 2, 3], 31)
  quat = np.tile([1.0, 0, 0, 0], (31, 1))
  joints = np.linspace([0.0, -1.0], [1.0, 1.0], 31)
  p, q, j = resample(pos, quat, joints, t_in, 60.0)
  # 1 s of motion at 60 fps.
  assert p.shape[0] == 60
  np.testing.assert_allclose(p[0], pos[0], atol=1e-12)
  # Lerp exactness on linear input.
  np.testing.assert_allclose(p[30], pos[15], atol=1e-9)
  np.testing.assert_allclose(j[30], joints[15], atol=1e-9)
  np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-12)


@pytest.mark.slow
def test_process_and_motion_loader_roundtrip(tmp_path):
  path, base_pos, base_quat, joint_pos = _synthetic_csv(tmp_path)
  out = process(path, robot="g1", input_fps=30.0, output_fps=50.0)

  # Shape/rate contract.
  T = out["joint_pos"].shape[0]
  assert abs(T - 100) <= 1  # 2 s at 50 fps
  assert float(out["fps"]) == 50.0
  nb = out["body_pos_w"].shape[1]
  assert out["body_quat_w"].shape == (T, nb, 4)
  for k, v in out.items():
    assert np.isfinite(v).all(), f"{k} has non-finite values"

  # Root body (pelvis) follows the commanded base trajectory.
  np.testing.assert_allclose(
    out["body_pos_w"][0, 0], base_pos[0], atol=1e-5
  )
  # FK-harvested root linear velocity ≈ d/dt of root position.
  num_vel = np.gradient(out["body_pos_w"][:, 0], 1.0 / 50.0, axis=0)
  np.testing.assert_allclose(
    out["body_lin_vel_w"][2:-2, 0], num_vel[2:-2], atol=0.05
  )
  # Quats normalized.
  np.testing.assert_allclose(
    np.linalg.norm(out["body_quat_w"], axis=-1), 1.0, atol=1e-5
  )

  # npz round-trip into the tracking MotionLoader.
  npz = tmp_path / "motion.npz"
  np.savez(npz, **out)
  from mjlab_tpu.tasks.tracking.mdp.commands import MotionLoader

  loader = MotionLoader(str(npz), body_indexes=np.asarray([0, nb - 1]),
                        dtype=np.float32)
  assert loader.time_step_total == T
  assert loader.body_pos_w.shape == (T, 2, 3)
  assert loader.joint_pos.dtype == np.float32
