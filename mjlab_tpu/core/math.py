"""Quaternion / SO(3) / pose math on JAX arrays.

TPU-native counterpart of the math surface the reference uses from
`third_party/isaaclab/isaaclab/utils/math.py` plus the spatial-rotation helpers
the physics engine needs. All functions broadcast over leading batch axes and
operate on the trailing axis; quaternions are wxyz (MuJoCo convention).

These are re-derived from standard rigid-body math, validated against MuJoCo's
`mju_*` C routines in tests/test_math.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Vectors.
# ---------------------------------------------------------------------------


def normalize(x: jax.Array, axis: int = -1, eps: float = 1e-9) -> jax.Array:
  """Normalize along `axis`, safe at zero norm."""
  n = jnp.linalg.norm(x, axis=axis, keepdims=True)
  return x / jnp.maximum(n, eps)


def wrap_to_pi(angle: jax.Array) -> jax.Array:
  """Wrap angles to [-pi, pi)."""
  return jnp.mod(angle + jnp.pi, 2 * jnp.pi) - jnp.pi


# ---------------------------------------------------------------------------
# Quaternions (wxyz).
# ---------------------------------------------------------------------------


def quat_identity(shape: tuple[int, ...] = (), dtype=jnp.float32) -> jax.Array:
  q = jnp.zeros(shape + (4,), dtype=dtype)
  return q.at[..., 0].set(1.0)


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
  """Hamilton product u ⊗ v."""
  uw, ux, uy, uz = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
  vw, vx, vy, vz = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
  return jnp.stack(
    [
      uw * vw - ux * vx - uy * vy - uz * vz,
      uw * vx + ux * vw + uy * vz - uz * vy,
      uw * vy - ux * vz + uy * vw + uz * vx,
      uw * vz + ux * vy - uy * vx + uz * vw,
    ],
    axis=-1,
  )


def quat_conjugate(q: jax.Array) -> jax.Array:
  return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inv(q: jax.Array) -> jax.Array:
  """Inverse of a unit quaternion (= conjugate)."""
  return quat_conjugate(q)


def quat_normalize(q: jax.Array) -> jax.Array:
  return normalize(q)


def quat_unique(q: jax.Array) -> jax.Array:
  """Canonical sign: non-negative scalar part."""
  return jnp.where(q[..., 0:1] < 0, -q, q)


def quat_apply(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate vector v by quaternion q (active rotation), Rodrigues form."""
  s, u = q[..., 0:1], q[..., 1:4]
  t = 2.0 * jnp.cross(u, v)
  return v + s * t + jnp.cross(u, t)


def quat_apply_inverse(q: jax.Array, v: jax.Array) -> jax.Array:
  """Rotate v by q^{-1} (world → local for a frame rotation q)."""
  return quat_apply(quat_conjugate(q), v)


# Aliases matching the Isaac Lab naming used throughout the reference MDP code.
quat_rotate = quat_apply
quat_rotate_inverse = quat_apply_inverse


def quat_to_mat(q: jax.Array) -> jax.Array:
  """Rotation matrix (..., 3, 3) from unit quaternion."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  xx, yy, zz = x * x, y * y, z * z
  xy, xz, yz = x * y, x * z, y * z
  wx, wy, wz = w * x, w * y, w * z
  m = jnp.stack(
    [
      1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
      2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
      2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ],
    axis=-1,
  )
  return m.reshape(q.shape[:-1] + (3, 3))


matrix_from_quat = quat_to_mat


def mat_to_quat(m: jax.Array) -> jax.Array:
  """Unit quaternion from rotation matrix, branch-free (Shepperd's method)."""
  m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
  m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
  m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
  tr = m00 + m11 + m22

  # Four candidate quaternions (unnormalized), one per dominant component.
  qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
  qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
  qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
  qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

  # Pick the numerically largest branch.
  scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
  best = jnp.argmax(scores, axis=-1)
  cands = jnp.stack([qw, qx, qy, qz], axis=-2)
  q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
  q = q.squeeze(-2)
  return quat_unique(normalize(q))


quat_from_matrix = mat_to_quat


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
  """Quaternion from unit axis (..., 3) and angle (...,)."""
  half = 0.5 * angle
  s = jnp.sin(half)
  return jnp.concatenate([jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_from_angle_axis(angle: jax.Array, axis: jax.Array) -> jax.Array:
  return axis_angle_to_quat(axis, angle)


def quat_exp(v: jax.Array) -> jax.Array:
  """Exponential map so(3) → unit quaternion, v = axis*angle (rotation vector)."""
  angle = jnp.linalg.norm(v, axis=-1, keepdims=True)
  small = angle < 1e-9
  safe = jnp.where(small, 1.0, angle)
  axis = v / safe
  half = 0.5 * angle[..., 0]
  q = jnp.concatenate(
    [jnp.cos(half)[..., None], axis * jnp.sin(half)[..., None]], axis=-1
  )
  q_small = jnp.concatenate([jnp.ones_like(half)[..., None], 0.5 * v], axis=-1)
  return jnp.where(small, normalize(q_small), q)


def quat_log(q: jax.Array) -> jax.Array:
  """Log map: unit quaternion → rotation vector (axis*angle)."""
  q = quat_unique(q)
  sin_half = jnp.linalg.norm(q[..., 1:4], axis=-1, keepdims=True)
  cos_half = q[..., 0:1]
  angle = 2.0 * jnp.arctan2(sin_half, cos_half)
  scale = jnp.where(sin_half < 1e-9, 2.0, angle / jnp.maximum(sin_half, 1e-12))
  return scale * q[..., 1:4]


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
  """Integrate quaternion by angular velocity omega (local frame), MuJoCo-style.

  Matches mju_quatIntegrate: q' = q ⊗ exp(omega*dt) with omega in the body
  (child) frame — the convention mj_integratePos uses for free/ball joints.
  """
  return quat_normalize(quat_mul(q, quat_exp(omega * dt)))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
  """Velocity-space difference: rotation vector taking qb to qa (mju_subQuat)."""
  return quat_log(quat_mul(quat_conjugate(qb), qa))


def quat_error_magnitude(q1: jax.Array, q2: jax.Array) -> jax.Array:
  """Geodesic angle between two orientations."""
  dq = quat_mul(quat_conjugate(q1), q2)
  sin_half = jnp.linalg.norm(dq[..., 1:4], axis=-1)
  cos_half = jnp.abs(dq[..., 0])
  return 2.0 * jnp.arctan2(sin_half, cos_half)


def yaw_quat(q: jax.Array) -> jax.Array:
  """Extract the yaw-only rotation of q (rotation about world z)."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
  half = 0.5 * yaw
  zeros = jnp.zeros_like(half)
  return jnp.stack([jnp.cos(half), zeros, zeros, jnp.sin(half)], axis=-1)


def euler_xyz_from_quat(q: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
  """Intrinsic XYZ (roll, pitch, yaw) Euler angles from quaternion."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  roll = jnp.arctan2(2.0 * (w * x + y * z), 1.0 - 2.0 * (x * x + y * y))
  sinp = jnp.clip(2.0 * (w * y - z * x), -1.0, 1.0)
  pitch = jnp.arcsin(sinp)
  yaw = jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))
  return roll, pitch, yaw


def quat_from_euler_xyz(
  roll: jax.Array, pitch: jax.Array, yaw: jax.Array
) -> jax.Array:
  """Quaternion from intrinsic XYZ Euler angles."""
  e = jnp.broadcast_arrays(roll, pitch, yaw)
  zero_axis = jnp.zeros(e[0].shape + (1,), dtype=e[0].dtype)
  one = jnp.ones_like(zero_axis)

  def _single(angle, axis3):
    return axis_angle_to_quat(axis3, angle)

  qx = _single(e[0], jnp.concatenate([one, zero_axis, zero_axis], axis=-1))
  qy = _single(e[1], jnp.concatenate([zero_axis, one, zero_axis], axis=-1))
  qz = _single(e[2], jnp.concatenate([zero_axis, zero_axis, one], axis=-1))
  return quat_mul(qz, quat_mul(qy, qx))


def quat_slerp(q0: jax.Array, q1: jax.Array, t) -> jax.Array:
  """Spherical interpolation from q0 (t=0) to q1 (t=1)."""
  t = jnp.asarray(t)
  dot = jnp.sum(q0 * q1, axis=-1, keepdims=True)
  q1 = jnp.where(dot < 0, -q1, q1)
  dot = jnp.abs(dot)
  # Fall back to lerp for nearly-parallel quaternions.
  theta = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
  sin_theta = jnp.sin(theta)
  use_lerp = sin_theta < 1e-6
  w0 = jnp.where(
    use_lerp, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(use_lerp, 1.0, sin_theta)
  )
  w1 = jnp.where(
    use_lerp, t, jnp.sin(t * theta) / jnp.where(use_lerp, 1.0, sin_theta)
  )
  return normalize(w0 * q0 + w1 * q1)


# ---------------------------------------------------------------------------
# Pose composition (frame transforms).
# ---------------------------------------------------------------------------


def combine_frame_transforms(
  t01: jax.Array, q01: jax.Array, t12: jax.Array, q12: jax.Array
) -> tuple[jax.Array, jax.Array]:
  """Compose transforms: frame 2 expressed in frame 0."""
  t02 = t01 + quat_apply(q01, t12)
  q02 = quat_mul(q01, q12)
  return t02, q02


def subtract_frame_transforms(
  t01: jax.Array, q01: jax.Array, t02: jax.Array, q02: jax.Array
) -> tuple[jax.Array, jax.Array]:
  """Relative transform: frame 2 expressed in frame 1."""
  qinv = quat_conjugate(q01)
  t12 = quat_apply(qinv, t02 - t01)
  q12 = quat_mul(qinv, q02)
  return t12, q12


# ---------------------------------------------------------------------------
# Sampling (explicit-key API replacing the reference's global torch RNG).
# ---------------------------------------------------------------------------


def sample_uniform(key: jax.Array, lo, hi, shape, dtype=jnp.float32) -> jax.Array:
  lo = jnp.asarray(lo, dtype=dtype)
  hi = jnp.asarray(hi, dtype=dtype)
  return jax.random.uniform(key, shape, dtype=dtype) * (hi - lo) + lo


def sample_log_uniform(key: jax.Array, lo, hi, shape, dtype=jnp.float32) -> jax.Array:
  lo = jnp.asarray(lo, dtype=dtype)
  hi = jnp.asarray(hi, dtype=dtype)
  return jnp.exp(
    jax.random.uniform(key, shape, dtype=dtype) * (jnp.log(hi) - jnp.log(lo))
    + jnp.log(lo)
  )


def sample_gaussian(key: jax.Array, mean, std, shape, dtype=jnp.float32) -> jax.Array:
  return jax.random.normal(key, shape, dtype=dtype) * std + mean


def sample_uniform_quat(key: jax.Array, shape=(), dtype=jnp.float32) -> jax.Array:
  """Uniformly distributed random unit quaternion."""
  u = jax.random.uniform(key, shape + (3,), dtype=dtype)
  a, b, c = u[..., 0], u[..., 1], u[..., 2]
  two_pi = 2.0 * jnp.pi
  return jnp.stack(
    [
      jnp.sqrt(1.0 - a) * jnp.sin(two_pi * b),
      jnp.sqrt(1.0 - a) * jnp.cos(two_pi * b),
      jnp.sqrt(a) * jnp.sin(two_pi * c),
      jnp.sqrt(a) * jnp.cos(two_pi * c),
    ],
    axis=-1,
  )
