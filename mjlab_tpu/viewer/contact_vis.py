"""Contact point / force visual computation (pure numpy, viewer-agnostic).

The reference computes per-contact visuals inline in its viser scene manager
(reference viewer/viser_scene.py:713-850: cylinder markers sized by
vis.scale.contactwidth/height, force arrows scaled by vis.map.force /
stat.meanmass). Here the math is a standalone vectorized module consumed by
BOTH viewer stacks — the native viewer writes the results into mjvScene user
geoms, the viser viewer into batched mesh handles — and unit-tested without
any GUI dependency. Inputs come from the engine's batched contact state
(dist/pos/frame + decoded wrench), not from an MjData.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def rotation_from_z(vecs: np.ndarray) -> np.ndarray:
  """Batched rotation matrices taking +z to each (unit) direction. (N, 3) →
  (N, 3, 3); antiparallel handled by a 180° flip about x."""
  vecs = np.asarray(vecs, dtype=np.float64)
  z = np.array([0.0, 0.0, 1.0])
  c = vecs @ z  # cos(angle)
  out = np.empty(vecs.shape[:-1] + (3, 3))
  # Rodrigues with the UNNORMALIZED axis v = z × dir (|v| = sin θ):
  # R = I + [v]ₓ + [v]ₓ² (1 − c) / s².
  v = np.cross(np.broadcast_to(z, vecs.shape), vecs)
  s = np.linalg.norm(v, axis=-1)
  safe = s > 1e-12
  K = np.zeros_like(out)
  K[..., 0, 1] = -v[..., 2]
  K[..., 0, 2] = v[..., 1]
  K[..., 1, 0] = v[..., 2]
  K[..., 1, 2] = -v[..., 0]
  K[..., 2, 0] = -v[..., 1]
  K[..., 2, 1] = v[..., 0]
  eye = np.broadcast_to(np.eye(3), out.shape)
  factor = np.where(safe, (1 - c) / np.maximum(s * s, 1e-24), 0.0)
  R = eye + np.where(safe[..., None, None], K + factor[..., None, None] * (K @ K), 0.0)
  # Antiparallel: rotate pi about x.
  flip = np.diag([1.0, -1.0, -1.0])
  out[:] = np.where((~safe & (c < 0))[..., None, None], flip, R)
  return out


def mat_to_wxyz(R: np.ndarray) -> np.ndarray:
  """Batched rotation matrix → unit quaternion (w, x, y, z). (N, 3, 3) → (N, 4).
  Shepperd's method, vectorized."""
  R = np.asarray(R, dtype=np.float64)
  t = np.trace(R, axis1=-2, axis2=-1)
  q = np.empty(R.shape[:-2] + (4,))
  # Branch per element (N small — visual marker counts).
  for i in np.ndindex(R.shape[:-2]):
    m = R[i]
    if t[i] > 0:
      s = np.sqrt(t[i] + 1.0) * 2
      q[i] = [0.25 * s, (m[2, 1] - m[1, 2]) / s, (m[0, 2] - m[2, 0]) / s,
              (m[1, 0] - m[0, 1]) / s]
    elif m[0, 0] >= m[1, 1] and m[0, 0] >= m[2, 2]:
      s = np.sqrt(1.0 + m[0, 0] - m[1, 1] - m[2, 2]) * 2
      q[i] = [(m[2, 1] - m[1, 2]) / s, 0.25 * s, (m[0, 1] + m[1, 0]) / s,
              (m[0, 2] + m[2, 0]) / s]
    elif m[1, 1] >= m[2, 2]:
      s = np.sqrt(1.0 + m[1, 1] - m[0, 0] - m[2, 2]) * 2
      q[i] = [(m[0, 2] - m[2, 0]) / s, (m[0, 1] + m[1, 0]) / s, 0.25 * s,
              (m[1, 2] + m[2, 1]) / s]
    else:
      s = np.sqrt(1.0 + m[2, 2] - m[0, 0] - m[1, 1]) * 2
      q[i] = [(m[1, 0] - m[0, 1]) / s, (m[0, 2] + m[2, 0]) / s,
              (m[1, 2] + m[2, 1]) / s, 0.25 * s]
  return q


@dataclass
class ContactVisuals:
  """Batched marker transforms for the active contacts of one env."""

  # Contact point cylinders (squat disc spanning the contact plane).
  point_pos: np.ndarray  # (K, 3)
  point_mat: np.ndarray  # (K, 3, 3) z = contact normal
  point_size: np.ndarray  # (K, 3) [w, w, h]
  # Force arrows: shaft (unit z cylinder scaled) + head.
  force_pos: np.ndarray  # (K, 3) arrow base
  force_mat: np.ndarray  # (K, 3, 3) z = force direction
  force_len: np.ndarray  # (K,)
  force_width: float

  @property
  def count(self) -> int:
    return len(self.point_pos)

  @staticmethod
  def empty() -> "ContactVisuals":
    return ContactVisuals(
      point_pos=np.zeros((0, 3)),
      point_mat=np.zeros((0, 3, 3)),
      point_size=np.zeros((0, 3)),
      force_pos=np.zeros((0, 3)),
      force_mat=np.zeros((0, 3, 3)),
      force_len=np.zeros((0,)),
      force_width=0.0,
    )


def compute_contact_visuals(
  dist: np.ndarray,
  includemargin: np.ndarray,
  pos: np.ndarray,
  frame: np.ndarray,
  force_local: np.ndarray,
  *,
  meansize: float = 0.1,
  meanmass: float = 1.0,
  contactwidth: float = 0.3,
  contactheight: float = 0.1,
  forcewidth: float = 0.1,
  force_map: float = 0.005,
) -> ContactVisuals:
  """Vectorized contact visuals for one env's contact slots.

  Args: dist/includemargin (C,), pos (C, 3), frame (C, 3, 3) rows
  [n, t1, t2], force_local (C, >=3) contact-frame force. Scale defaults
  mirror mjVisual (vis.scale.contactwidth etc.); arrow length =
  |f| · force_map / meanmass (reference viser_scene.py:748-770).
  """
  dist = np.asarray(dist)
  active = np.nonzero(dist < np.asarray(includemargin))[0]
  pos = np.asarray(pos)[active]
  frame = np.asarray(frame)[active]
  f_local = np.asarray(force_local)[active, :3]

  # World force: rows of `frame` are the contact axes.
  f_world = np.einsum("ci,cij->cj", f_local, frame)
  fmag = np.linalg.norm(f_world, axis=-1)
  keep = fmag > 1e-6
  fdir = np.where(
    keep[:, None], f_world / np.maximum(fmag, 1e-12)[:, None], 0.0
  )

  point_mat = rotation_from_z(frame[:, 0])
  w = contactwidth * meansize
  h = contactheight * meansize
  point_size = np.tile([w, w, h], (len(active), 1))

  force_mat = rotation_from_z(fdir[keep])
  force_len = fmag[keep] * (force_map / max(meanmass, 1e-12))
  return ContactVisuals(
    point_pos=pos,
    point_mat=point_mat,
    point_size=point_size,
    force_pos=pos[keep],
    force_mat=force_mat,
    force_len=force_len,
    force_width=forcewidth * meansize,
  )
