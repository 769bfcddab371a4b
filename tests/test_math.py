"""Parity tests: mjlab_tpu.core.math vs MuJoCo's mju_* C routines."""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.core import math as mt


@pytest.fixture
def rng():
  return np.random.default_rng(0)


def random_quats(rng, n=64):
  q = rng.standard_normal((n, 4))
  return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_mul(rng):
  qa, qb = random_quats(rng), random_quats(rng)
  got = np.asarray(mt.quat_mul(jnp.asarray(qa), jnp.asarray(qb)))
  for i in range(len(qa)):
    want = np.zeros(4)
    mujoco.mju_mulQuat(want, qa[i], qb[i])
    np.testing.assert_allclose(got[i], want, atol=1e-12)


def test_quat_apply(rng):
  q = random_quats(rng)
  v = rng.standard_normal((len(q), 3))
  got = np.asarray(mt.quat_apply(jnp.asarray(q), jnp.asarray(v)))
  got_inv = np.asarray(mt.quat_apply_inverse(jnp.asarray(q), jnp.asarray(v)))
  for i in range(len(q)):
    want = np.zeros(3)
    mujoco.mju_rotVecQuat(want, v[i], q[i])
    np.testing.assert_allclose(got[i], want, atol=1e-12)
    mat = np.zeros(9)
    mujoco.mju_quat2Mat(mat, q[i])
    np.testing.assert_allclose(got_inv[i], mat.reshape(3, 3).T @ v[i], atol=1e-12)


def test_quat_to_mat_roundtrip(rng):
  q = random_quats(rng)
  m = np.asarray(mt.quat_to_mat(jnp.asarray(q)))
  for i in range(len(q)):
    want = np.zeros(9)
    mujoco.mju_quat2Mat(want, q[i])
    np.testing.assert_allclose(m[i].ravel(), want, atol=1e-12)
  q2 = np.asarray(mt.mat_to_quat(jnp.asarray(m)))
  # Sign-canonical comparison.
  qc = np.where(q[:, :1] < 0, -q, q)
  np.testing.assert_allclose(q2, qc, atol=1e-9)


def test_axis_angle(rng):
  axis = rng.standard_normal((32, 3))
  axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
  angle = rng.uniform(-np.pi, np.pi, 32)
  got = np.asarray(mt.axis_angle_to_quat(jnp.asarray(axis), jnp.asarray(angle)))
  for i in range(32):
    want = np.zeros(4)
    mujoco.mju_axisAngle2Quat(want, axis[i], angle[i])
    np.testing.assert_allclose(got[i], want, atol=1e-12)


def test_quat_integrate(rng):
  q = random_quats(rng, 32)
  w = rng.standard_normal((32, 3))
  dt = 0.01
  got = np.asarray(mt.quat_integrate(jnp.asarray(q), jnp.asarray(w), dt))
  for i in range(32):
    want = q[i].copy()
    mujoco.mju_quatIntegrate(want, w[i], dt)
    np.testing.assert_allclose(got[i], want, atol=1e-10)


def test_quat_sub(rng):
  qa, qb = random_quats(rng, 32), random_quats(rng, 32)
  got = np.asarray(mt.quat_sub(jnp.asarray(qa), jnp.asarray(qb)))
  for i in range(32):
    want = np.zeros(3)
    mujoco.mju_subQuat(want, qa[i], qb[i])
    np.testing.assert_allclose(got[i], want, atol=1e-9)


def test_quat_exp_log_roundtrip(rng):
  v = rng.uniform(-1.5, 1.5, (64, 3))
  q = mt.quat_exp(jnp.asarray(v))
  v2 = np.asarray(mt.quat_log(q))
  np.testing.assert_allclose(v2, v, atol=1e-9)


def test_yaw_quat(rng):
  q = random_quats(rng, 16)
  yq = np.asarray(mt.yaw_quat(jnp.asarray(q)))
  # Yaw quat must rotate x-axis into the heading of q's x-axis projected to xy.
  x = np.array([1.0, 0, 0])
  for i in range(16):
    fwd = np.zeros(3)
    mujoco.mju_rotVecQuat(fwd, x, q[i])
    fwd[2] = 0
    fwd /= np.linalg.norm(fwd)
    got = np.asarray(mt.quat_apply(jnp.asarray(yq[i]), jnp.asarray(x)))
    np.testing.assert_allclose(got, fwd, atol=1e-9)


def test_euler_roundtrip(rng):
  roll = rng.uniform(-np.pi, np.pi, 32)
  pitch = rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, 32)
  yaw = rng.uniform(-np.pi, np.pi, 32)
  q = mt.quat_from_euler_xyz(jnp.asarray(roll), jnp.asarray(pitch), jnp.asarray(yaw))
  r2, p2, y2 = mt.euler_xyz_from_quat(q)
  np.testing.assert_allclose(np.asarray(r2), roll, atol=1e-9)
  np.testing.assert_allclose(np.asarray(p2), pitch, atol=1e-9)
  np.testing.assert_allclose(np.asarray(y2), yaw, atol=1e-9)


def test_frame_transforms(rng):
  q01, q12 = random_quats(rng, 16), random_quats(rng, 16)
  t01 = rng.standard_normal((16, 3))
  t12 = rng.standard_normal((16, 3))
  t02, q02 = mt.combine_frame_transforms(
    jnp.asarray(t01), jnp.asarray(q01), jnp.asarray(t12), jnp.asarray(q12)
  )
  t12b, q12b = mt.subtract_frame_transforms(
    jnp.asarray(t01), jnp.asarray(q01), t02, q02
  )
  np.testing.assert_allclose(np.asarray(t12b), t12, atol=1e-9)
  np.testing.assert_allclose(
    np.abs(np.sum(np.asarray(q12b) * q12, axis=-1)), 1.0, atol=1e-9
  )


def test_slerp_endpoints(rng):
  q0, q1 = random_quats(rng, 8), random_quats(rng, 8)
  s0 = np.asarray(mt.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 0.0))
  s1 = np.asarray(mt.quat_slerp(jnp.asarray(q0), jnp.asarray(q1), 1.0))
  np.testing.assert_allclose(np.abs(np.sum(s0 * q0, -1)), 1.0, atol=1e-9)
  np.testing.assert_allclose(np.abs(np.sum(s1 * q1, -1)), 1.0, atol=1e-9)
