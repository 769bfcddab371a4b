"""Forward kinematics: generalized coordinates → Cartesian frames.

TPU-native equivalent of the mjwarp kinematics kernels (the reference gets
these from mujoco_warp's `forward`, see SURVEY §2.9). Tree passes are
LEVEL-VECTORIZED: all bodies at the same tree depth are processed in one
batched op-group (partitioned by joint signature), so the trace is O(depth)
rather than O(nbody) — smaller XLA programs and wider vector ops, which
matters both for compile time and for TPU VPU utilization once vmapped over
thousands of envs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.core import math as mt
from mjlab_tpu.physics.types import Data, Model, Topology

_FREE = int(mujoco.mjtJoint.mjJNT_FREE)
_BALL = int(mujoco.mjtJoint.mjJNT_BALL)
_HINGE = int(mujoco.mjtJoint.mjJNT_HINGE)
_SLIDE = int(mujoco.mjtJoint.mjJNT_SLIDE)


@functools.lru_cache(maxsize=64)
def level_groups(tp: Topology) -> tuple[tuple[tuple[int, ...], np.ndarray], ...]:
  """Per tree level: [(joint_signature, body_ids)] partitions (host-side)."""
  out = []
  for ids in tp.body_levels:
    groups: dict[tuple[int, ...], list[int]] = {}
    for i in ids:
      jadr, jnum = int(tp.body_jntadr[i]), int(tp.body_jntnum[i])
      sig = tuple(int(tp.jnt_type[jadr + k]) for k in range(jnum))
      groups.setdefault(sig, []).append(int(i))
    out.append(tuple((sig, np.asarray(b)) for sig, b in groups.items()))
  return tuple(out)


def kinematics(tp: Topology, m: Model, d: Data) -> Data:
  """Compute body/geom/site frames from qpos."""
  dtype = d.qpos.dtype
  xpos = jnp.zeros((tp.nbody, 3), dtype=dtype)
  xquat = jnp.zeros((tp.nbody, 4), dtype=dtype).at[:, 0].set(1.0)
  xanchor = jnp.zeros((tp.njnt, 3), dtype=dtype)
  xaxis = jnp.tile(jnp.asarray([0.0, 0.0, 1.0], dtype=dtype), (tp.njnt, 1))

  for level in level_groups(tp):
    for sig, ids in level:
      pid = tp.body_parentid[ids]
      pos = xpos[pid] + mt.quat_apply(xquat[pid], m.body_pos[ids])
      quat = mt.quat_mul(xquat[pid], m.body_quat[ids])

      if sig == ():
        pass
      elif sig == (_FREE,):
        j = tp.body_jntadr[ids]
        qadr = tp.jnt_qposadr[j]
        gq = qadr[:, None] + np.arange(7)[None]
        qp = d.qpos[gq]  # (n, 7)
        pos = qp[:, :3]
        quat = mt.quat_normalize(qp[:, 3:7])
        xanchor = xanchor.at[j].set(pos)
      elif sig in ((_HINGE,), (_SLIDE,), (_BALL,)):
        j = tp.body_jntadr[ids]
        qadr = tp.jnt_qposadr[j]
        anchor = pos + mt.quat_apply(quat, m.jnt_pos[j])
        axis = mt.quat_apply(quat, m.jnt_axis[j])
        xanchor = xanchor.at[j].set(anchor)
        xaxis = xaxis.at[j].set(axis)
        if sig == (_SLIDE,):
          pos = pos + axis * (d.qpos[qadr] - m.qpos0[qadr])[:, None]
        else:
          if sig == (_BALL,):
            gq = qadr[:, None] + np.arange(4)[None]
            qloc = mt.quat_normalize(d.qpos[gq])
          else:
            qloc = mt.axis_angle_to_quat(
              m.jnt_axis[j], d.qpos[qadr] - m.qpos0[qadr]
            )
          quat = mt.quat_mul(quat, qloc)
          pos = anchor - mt.quat_apply(quat, m.jnt_pos[j])
      else:
        # General multi-joint body: sequential per body (rare — e.g. gimbals).
        new_pos, new_quat = [], []
        for bi, i in enumerate(ids):
          p, q = pos[bi], quat[bi]
          jadr = int(tp.body_jntadr[i])
          for k, jtype in enumerate(sig):
            jj = jadr + k
            qadr1 = int(tp.jnt_qposadr[jj])
            if jtype == _FREE:
              p = d.qpos[qadr1 : qadr1 + 3]
              q = mt.quat_normalize(d.qpos[qadr1 + 3 : qadr1 + 7])
              xanchor = xanchor.at[jj].set(p)
              continue
            anchor1 = p + mt.quat_apply(q, m.jnt_pos[jj])
            axis1 = mt.quat_apply(q, m.jnt_axis[jj])
            xanchor = xanchor.at[jj].set(anchor1)
            xaxis = xaxis.at[jj].set(axis1)
            if jtype == _SLIDE:
              p = p + axis1 * (d.qpos[qadr1] - m.qpos0[qadr1])
            elif jtype == _BALL:
              qloc = mt.quat_normalize(d.qpos[qadr1 : qadr1 + 4])
              q = mt.quat_mul(q, qloc)
              p = anchor1 - mt.quat_apply(q, m.jnt_pos[jj])
            else:
              qloc = mt.axis_angle_to_quat(
                m.jnt_axis[jj], d.qpos[qadr1] - m.qpos0[qadr1]
              )
              q = mt.quat_mul(q, qloc)
              p = anchor1 - mt.quat_apply(q, m.jnt_pos[jj])
          new_pos.append(p)
          new_quat.append(q)
        pos = jnp.stack(new_pos)
        quat = jnp.stack(new_quat)

      xpos = xpos.at[ids].set(pos)
      xquat = xquat.at[ids].set(quat)

  # Mocap bodies: frame driven directly by mocap_pos/quat (mj_kinematics;
  # mocap bodies are static children of world, so no descendant has been
  # computed from the pre-override frame).
  mocap_ids = np.nonzero(tp.body_mocapid >= 0)[0]
  if len(mocap_ids):
    mid = tp.body_mocapid[mocap_ids]
    xpos = xpos.at[mocap_ids].set(d.mocap_pos[mid])
    xquat = xquat.at[mocap_ids].set(mt.quat_normalize(d.mocap_quat[mid]))

  xmat = mt.quat_to_mat(xquat)
  bid = tp.geom_bodyid
  xipos = xpos + mt.quat_apply(xquat, m.body_ipos)
  ximat = mt.quat_to_mat(mt.quat_mul(xquat, m.body_iquat))
  geom_xpos = xpos[bid] + mt.quat_apply(xquat[bid], m.geom_pos)
  geom_xmat = mt.quat_to_mat(mt.quat_mul(xquat[bid], m.geom_quat))
  sid = tp.site_bodyid
  site_xpos = xpos[sid] + mt.quat_apply(xquat[sid], m.site_pos)
  site_xmat = mt.quat_to_mat(mt.quat_mul(xquat[sid], m.site_quat))

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
    xanchor=xanchor,
    xaxis=xaxis,
  )


@functools.lru_cache(maxsize=64)
def _joint_type_ids(tp: Topology) -> dict[int, np.ndarray]:
  return {
    t: np.nonzero(tp.jnt_type == t)[0] for t in (_FREE, _BALL, _HINGE, _SLIDE)
  }


def integrate_pos(
  tp: Topology, m: Model, qpos: jax.Array, qvel: jax.Array, dt
) -> jax.Array:
  """Integrate position coordinates by velocity (mj_integratePos semantics),
  vectorized per joint type."""
  groups = _joint_type_ids(tp)
  out = qpos

  ids = groups[_HINGE]
  scalar_q = np.concatenate([tp.jnt_qposadr[ids], tp.jnt_qposadr[groups[_SLIDE]]])
  scalar_v = np.concatenate([tp.jnt_dofadr[ids], tp.jnt_dofadr[groups[_SLIDE]]])
  if len(scalar_q):
    out = out.at[scalar_q].set(qpos[scalar_q] + dt * qvel[scalar_v])

  ids = groups[_FREE]
  if len(ids):
    qadr = tp.jnt_qposadr[ids]
    dadr = tp.jnt_dofadr[ids]
    gq3 = qadr[:, None] + np.arange(3)[None]
    gq4 = qadr[:, None] + 3 + np.arange(4)[None]
    gv3 = dadr[:, None] + np.arange(3)[None]
    gv4 = dadr[:, None] + 3 + np.arange(3)[None]
    out = out.at[gq3].set(qpos[gq3] + dt * qvel[gv3])
    out = out.at[gq4].set(mt.quat_integrate(qpos[gq4], qvel[gv4], dt))

  ids = groups[_BALL]
  if len(ids):
    qadr = tp.jnt_qposadr[ids]
    dadr = tp.jnt_dofadr[ids]
    gq4 = qadr[:, None] + np.arange(4)[None]
    gv3 = dadr[:, None] + np.arange(3)[None]
    out = out.at[gq4].set(mt.quat_integrate(qpos[gq4], qvel[gv3], dt))

  return out
