"""Forward kinematics: generalized coordinates → Cartesian frames.

TPU-native equivalent of the mjwarp kinematics kernels (the reference gets
these from mujoco_warp's `forward`, see SURVEY §2.9). Written single-world;
the body loop is unrolled at trace time (tree structure is static), producing
pure gather/elementwise XLA ops that fuse and vmap cleanly over envs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import mujoco

from mjlab_tpu.core import math as mt
from mjlab_tpu.physics.types import Data, Model, Topology

_FREE = mujoco.mjtJoint.mjJNT_FREE
_BALL = mujoco.mjtJoint.mjJNT_BALL
_HINGE = mujoco.mjtJoint.mjJNT_HINGE
_SLIDE = mujoco.mjtJoint.mjJNT_SLIDE


def kinematics(tp: Topology, m: Model, d: Data) -> Data:
  """Compute body/geom/site frames from qpos."""
  dtype = d.qpos.dtype
  xpos = [jnp.zeros(3, dtype=dtype)]
  xquat = [jnp.asarray([1.0, 0, 0, 0], dtype=dtype)]
  xanchor = [None] * tp.njnt
  xaxis = [None] * tp.njnt

  for i in range(1, tp.nbody):
    pid = int(tp.body_parentid[i])
    pos = xpos[pid] + mt.quat_apply(xquat[pid], m.body_pos[i])
    quat = mt.quat_mul(xquat[pid], m.body_quat[i])

    jadr, jnum = int(tp.body_jntadr[i]), int(tp.body_jntnum[i])
    for k in range(jnum):
      j = jadr + k
      jtype = int(tp.jnt_type[j])
      qadr = int(tp.jnt_qposadr[j])
      if jtype == _FREE:
        pos = d.qpos[qadr : qadr + 3]
        quat = mt.quat_normalize(d.qpos[qadr + 3 : qadr + 7])
        xanchor[j] = pos
        xaxis[j] = jnp.asarray([0.0, 0.0, 1.0], dtype=dtype)
        continue
      anchor = pos + mt.quat_apply(quat, m.jnt_pos[j])
      axis = mt.quat_apply(quat, m.jnt_axis[j])
      xanchor[j] = anchor
      xaxis[j] = axis
      if jtype == _SLIDE:
        pos = pos + axis * (d.qpos[qadr] - m.qpos0[qadr])
      elif jtype == _BALL:
        qloc = mt.quat_normalize(d.qpos[qadr : qadr + 4])
        quat = mt.quat_mul(quat, qloc)
        pos = anchor - mt.quat_apply(quat, m.jnt_pos[j])
      elif jtype == _HINGE:
        qloc = mt.axis_angle_to_quat(m.jnt_axis[j], d.qpos[qadr] - m.qpos0[qadr])
        quat = mt.quat_mul(quat, qloc)
        pos = anchor - mt.quat_apply(quat, m.jnt_pos[j])
      else:
        raise NotImplementedError(f"joint type {jtype}")
    xpos.append(pos)
    xquat.append(quat)

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  xmat = mt.quat_to_mat(xquat)

  # Inertial, geom and site frames (vectorized gathers over constant ids).
  bid = tp.geom_bodyid
  xipos = xpos + mt.quat_apply(xquat, m.body_ipos)
  ximat = mt.quat_to_mat(mt.quat_mul(xquat, m.body_iquat))
  geom_xpos = xpos[bid] + mt.quat_apply(xquat[bid], m.geom_pos)
  geom_xmat = mt.quat_to_mat(mt.quat_mul(xquat[bid], m.geom_quat))
  sid = tp.site_bodyid
  site_xpos = xpos[sid] + mt.quat_apply(xquat[sid], m.site_pos)
  site_xmat = mt.quat_to_mat(mt.quat_mul(xquat[sid], m.site_quat))

  if tp.njnt:
    xanchor_a = jnp.stack(xanchor)
    xaxis_a = jnp.stack(xaxis)
  else:
    xanchor_a = jnp.zeros((0, 3), dtype=dtype)
    xaxis_a = jnp.zeros((0, 3), dtype=dtype)

  return d.replace(
    xpos=xpos,
    xquat=xquat,
    xmat=xmat,
    xipos=xipos,
    ximat=ximat,
    geom_xpos=geom_xpos,
    geom_xmat=geom_xmat,
    site_xpos=site_xpos,
    site_xmat=site_xmat,
    xanchor=xanchor_a,
    xaxis=xaxis_a,
  )


def integrate_pos(
  tp: Topology, m: Model, qpos: jax.Array, qvel: jax.Array, dt
) -> jax.Array:
  """Integrate position coordinates by velocity (mj_integratePos semantics)."""
  parts = []
  for j in range(tp.njnt):
    jtype = int(tp.jnt_type[j])
    qadr = int(tp.jnt_qposadr[j])
    dadr = int(tp.jnt_dofadr[j])
    if jtype == _FREE:
      pos = qpos[qadr : qadr + 3] + dt * qvel[dadr : dadr + 3]
      quat = mt.quat_integrate(
        qpos[qadr + 3 : qadr + 7], qvel[dadr + 3 : dadr + 6], dt
      )
      parts.append(pos)
      parts.append(quat)
    elif jtype == _BALL:
      parts.append(mt.quat_integrate(qpos[qadr : qadr + 4], qvel[dadr : dadr + 3], dt))
    else:
      parts.append(qpos[qadr : qadr + 1] + dt * qvel[dadr : dadr + 1])
  if not parts:
    return qpos
  return jnp.concatenate(parts)
