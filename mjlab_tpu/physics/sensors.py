"""Builtin sensor evaluation — pure functions of (Topology, Model, Data).

Covers the sensor set the reference robots/tasks use (gyro, velocimeter,
accelerometer, subtreeangmom; reference asset XMLs) plus the common frame/
joint/subtree sensors wrapped by the reference's BuiltinSensor
(sensor/builtin_sensor.py:15-101). Unsupported types raise at trace time.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.physics import smooth
from mjlab_tpu.core import math as mt
from mjlab_tpu.physics.types import Data, Model, Topology

_S = mujoco.mjtSensor
_OBJ = mujoco.mjtObj

_POS_STAGE = {
  _S.mjSENS_FRAMEPOS, _S.mjSENS_FRAMEQUAT, _S.mjSENS_FRAMEXAXIS,
  _S.mjSENS_FRAMEYAXIS, _S.mjSENS_FRAMEZAXIS, _S.mjSENS_JOINTPOS,
  _S.mjSENS_SUBTREECOM, _S.mjSENS_ACTUATORPOS, _S.mjSENS_MAGNETOMETER,
  _S.mjSENS_CLOCK, _S.mjSENS_TENDONPOS, _S.mjSENS_JOINTLIMITPOS,
  _S.mjSENS_E_POTENTIAL,
}
_VEL_STAGE = {
  _S.mjSENS_GYRO, _S.mjSENS_VELOCIMETER, _S.mjSENS_FRAMELINVEL,
  _S.mjSENS_FRAMEANGVEL, _S.mjSENS_JOINTVEL, _S.mjSENS_SUBTREELINVEL,
  _S.mjSENS_SUBTREEANGMOM, _S.mjSENS_ACTUATORVEL, _S.mjSENS_TENDONVEL,
  _S.mjSENS_JOINTLIMITVEL, _S.mjSENS_E_KINETIC,
}
_ACC_STAGE = {
  _S.mjSENS_ACCELEROMETER, _S.mjSENS_ACTUATORFRC, _S.mjSENS_FRAMELINACC,
  _S.mjSENS_FRAMEANGACC, _S.mjSENS_JOINTLIMITFRC, _S.mjSENS_JOINTACTFRC,
}


def _limit_row(tp: Topology, joint_id: int) -> int | None:
  """efc row of a joint's limit constraint (static layout: limit rows follow
  the dof-friction block in limited_joint_ids order; constraint.py)."""
  pos = np.nonzero(tp.limited_joint_ids == joint_id)[0]
  if len(pos) == 0:
    return None
  return len(tp.friction_dof_ids) + int(pos[0])


def _obj_frame(tp: Topology, d: Data, objtype: int, objid: int):
  if objtype == _OBJ.mjOBJ_SITE:
    return d.site_xpos[objid], d.site_xmat[objid], int(tp.site_bodyid[objid])
  if objtype == _OBJ.mjOBJ_BODY:
    return d.xipos[objid], d.ximat[objid], objid
  if objtype == _OBJ.mjOBJ_XBODY:
    return d.xpos[objid], d.xmat[objid], objid
  if objtype == _OBJ.mjOBJ_GEOM:
    return d.geom_xpos[objid], d.geom_xmat[objid], int(tp.geom_bodyid[objid])
  raise NotImplementedError(f"sensor objtype {objtype}")


def _point_vel(tp: Topology, d: Data, body: int, point: jax.Array) -> jax.Array:
  """World-frame linear velocity of a point attached to `body`."""
  origin = d.subtree_com[tp.body_rootid[body]]
  w = d.cvel[body, :3]
  v = d.cvel[body, 3:]
  return v + jnp.cross(w, point - origin)


def _subtree_dynamics(tp: Topology, m: Model, d: Data) -> Data:
  """subtree_linvel and subtree_angmom (mj_subtreeVel equivalent)."""
  dtype = d.qpos.dtype
  mass = m.body_mass
  # Per-body com velocity and angular momentum about own com.
  origin = d.subtree_com[tp.body_rootid]
  w = d.cvel[:, :3]
  v_com = d.cvel[:, 3:] + jnp.cross(w, d.xipos - origin)
  imat_local = jax.vmap(jnp.diag)(m.body_inertia)
  iw = d.ximat @ imat_local @ jnp.swapaxes(d.ximat, -1, -2)
  L_own = jnp.einsum("bij,bj->bi", iw, w)
  P = mass[:, None] * v_com

  sub = jnp.asarray(tp.body_subtree_mask, dtype=dtype)
  msum = jnp.maximum(sub @ mass, 1e-12)
  com_sub = (sub @ (mass[:, None] * d.xipos)) / msum[:, None]
  linvel = (sub @ P) / msum[:, None]

  # Angular momentum about the subtree com: Σ L_i + (c_i − C) × P_i.
  # Expand per (subtree, body) pair via the mask.
  rel = d.xipos[None, :, :] - com_sub[:, None, :]  # (nsub, nbody, 3)
  angmom = sub[:, :, None] * (L_own[None] + jnp.cross(rel, P[None]))
  angmom = jnp.sum(angmom, axis=1)
  return d.replace(subtree_linvel=linvel, subtree_angmom=angmom)


def _rne_postconstraint_cacc(tp: Topology, m: Model, d: Data) -> jax.Array:
  """Body spatial accelerations including qacc (for accelerometer sensors)."""
  dtype = d.qpos.dtype
  grav = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])
  cacc = [grav]
  for i in range(1, tp.nbody):
    pid = int(tp.body_parentid[i])
    dadr, dnum = int(tp.body_dofadr[i]), int(tp.body_dofnum[i])
    ca = cacc[pid]
    if dnum:
      sl = slice(dadr, dadr + dnum)
      ca = ca + d.cdof_dot[sl].T @ d.qvel[sl] + d.cdof[sl].T @ d.qacc[sl]
    cacc.append(ca)
  return jnp.stack(cacc)


def sensor_pos(tp: Topology, m: Model, d: Data) -> Data:
  return _eval_stage(tp, m, d, _POS_STAGE)


def sensor_vel(tp: Topology, m: Model, d: Data) -> Data:
  if any(int(t) == _S.mjSENS_SUBTREELINVEL or int(t) == _S.mjSENS_SUBTREEANGMOM
         for t in tp.sensor_type):
    d = _subtree_dynamics(tp, m, d)
  return _eval_stage(tp, m, d, _VEL_STAGE)


def sensor_acc(tp: Topology, m: Model, d: Data) -> Data:
  if not any(int(t) in _ACC_STAGE for t in tp.sensor_type):
    return d
  return _eval_stage(tp, m, d, _ACC_STAGE)


def _eval_stage(tp: Topology, m: Model, d: Data, stage: set) -> Data:
  if tp.nsensor == 0:
    return d
  sensordata = d.sensordata
  cacc = None
  for s in range(tp.nsensor):
    stype = int(tp.sensor_type[s])
    if stype not in stage:
      continue
    adr, dim = int(tp.sensor_adr[s]), int(tp.sensor_dim[s])
    objtype, objid = int(tp.sensor_objtype[s]), int(tp.sensor_objid[s])

    if stype == _S.mjSENS_GYRO:
      pos, mat, body = _obj_frame(tp, d, objtype, objid)
      val = mat.T @ d.cvel[body, :3]
    elif stype == _S.mjSENS_VELOCIMETER:
      pos, mat, body = _obj_frame(tp, d, objtype, objid)
      val = mat.T @ _point_vel(tp, d, body, pos)
    elif stype == _S.mjSENS_ACCELEROMETER:
      if cacc is None:
        cacc = _rne_postconstraint_cacc(tp, m, d)
      pos, mat, body = _obj_frame(tp, d, objtype, objid)
      origin = d.subtree_com[tp.body_rootid[body]]
      w = d.cvel[body, :3]
      a_lin = (
        cacc[body, 3:]
        + jnp.cross(cacc[body, :3], pos - origin)
        + jnp.cross(w, _point_vel(tp, d, body, pos))
      )
      val = mat.T @ a_lin
    elif stype == _S.mjSENS_FRAMEPOS:
      pos, _, _ = _obj_frame(tp, d, objtype, objid)
      val = pos
    elif stype == _S.mjSENS_FRAMEQUAT:
      _, mat, _ = _obj_frame(tp, d, objtype, objid)
      val = mt.mat_to_quat(mat)
    elif stype in (_S.mjSENS_FRAMEXAXIS, _S.mjSENS_FRAMEYAXIS, _S.mjSENS_FRAMEZAXIS):
      _, mat, _ = _obj_frame(tp, d, objtype, objid)
      col = {_S.mjSENS_FRAMEXAXIS: 0, _S.mjSENS_FRAMEYAXIS: 1,
             _S.mjSENS_FRAMEZAXIS: 2}[stype]
      val = mat[:, col]
    elif stype == _S.mjSENS_FRAMELINVEL:
      pos, _, body = _obj_frame(tp, d, objtype, objid)
      val = _point_vel(tp, d, body, pos)
    elif stype == _S.mjSENS_FRAMEANGVEL:
      _, _, body = _obj_frame(tp, d, objtype, objid)
      val = d.cvel[body, :3]
    elif stype == _S.mjSENS_JOINTPOS:
      val = d.qpos[int(tp.jnt_qposadr[objid]) : int(tp.jnt_qposadr[objid]) + 1]
    elif stype == _S.mjSENS_JOINTVEL:
      val = d.qvel[int(tp.jnt_dofadr[objid]) : int(tp.jnt_dofadr[objid]) + 1]
    elif stype == _S.mjSENS_SUBTREECOM:
      val = d.subtree_com[objid]
    elif stype == _S.mjSENS_SUBTREELINVEL:
      val = d.subtree_linvel[objid]
    elif stype == _S.mjSENS_SUBTREEANGMOM:
      val = d.subtree_angmom[objid]
    elif stype == _S.mjSENS_ACTUATORPOS:
      val = d.actuator_length[objid : objid + 1]
    elif stype == _S.mjSENS_ACTUATORVEL:
      val = d.actuator_velocity[objid : objid + 1]
    elif stype == _S.mjSENS_ACTUATORFRC:
      val = d.actuator_force[objid : objid + 1]
    elif stype == _S.mjSENS_MAGNETOMETER:
      _, mat, _ = _obj_frame(tp, d, objtype, objid)
      val = mat.T @ m.opt.magnetic
    elif stype == _S.mjSENS_CLOCK:
      val = d.time.reshape(1)
    elif stype == _S.mjSENS_TENDONPOS:
      val = (jnp.asarray(tp.tendon_qmat[objid], dtype=d.qpos.dtype)
             @ d.qpos).reshape(1)
    elif stype == _S.mjSENS_TENDONVEL:
      val = (jnp.asarray(tp.tendon_vmat[objid], dtype=d.qpos.dtype)
             @ d.qvel).reshape(1)
    elif stype in (_S.mjSENS_JOINTLIMITPOS, _S.mjSENS_JOINTLIMITVEL,
                   _S.mjSENS_JOINTLIMITFRC):
      row = _limit_row(tp, objid)
      if row is None:
        val = jnp.zeros(1, dtype=d.qpos.dtype)
      else:
        active = d.efc_pos[row] < d.efc_margin[row]
        if stype == _S.mjSENS_JOINTLIMITPOS:
          v = d.efc_pos[row] - d.efc_margin[row]
        elif stype == _S.mjSENS_JOINTLIMITVEL:
          v = d.efc_J[row] @ d.qvel
        else:
          v = d.efc_force[row]
        val = jnp.where(active, v, 0.0).reshape(1)
    elif stype == _S.mjSENS_JOINTACTFRC:
      val = d.qfrc_actuator[int(tp.jnt_dofadr[objid]) :
                            int(tp.jnt_dofadr[objid]) + 1]
    elif stype == _S.mjSENS_E_POTENTIAL:
      # mj_energyPos: gravitational + joint-spring potential.
      grav = -jnp.sum(m.body_mass * (d.xipos @ m.opt.gravity))
      dq = d.qpos - m.qpos_spring
      hinge_slide = np.isin(
        tp.jnt_type,
        [int(mujoco.mjtJoint.mjJNT_HINGE), int(mujoco.mjtJoint.mjJNT_SLIDE)],
      )
      qadr = tp.jnt_qposadr[hinge_slide]
      k = m.jnt_stiffness[np.nonzero(hinge_slide)[0]]
      spring = 0.5 * jnp.sum(k * jnp.square(dq[qadr])) if len(qadr) else 0.0
      val = (grav + spring).reshape(1)
    elif stype == _S.mjSENS_E_KINETIC:
      val = (0.5 * d.qvel @ (d.qM @ d.qvel)).reshape(1)
    elif stype in (_S.mjSENS_FRAMELINACC, _S.mjSENS_FRAMEANGACC):
      if cacc is None:
        cacc = _rne_postconstraint_cacc(tp, m, d)
      pos, _, body = _obj_frame(tp, d, objtype, objid)
      if stype == _S.mjSENS_FRAMEANGACC:
        val = cacc[body, :3]
      else:
        origin = d.subtree_com[tp.body_rootid[body]]
        w = d.cvel[body, :3]
        val = (
          cacc[body, 3:]
          + jnp.cross(cacc[body, :3], pos - origin)
          + jnp.cross(w, _point_vel(tp, d, body, pos))
        )
    else:
      raise NotImplementedError(f"sensor type {stype}")
    sensordata = sensordata.at[adr : adr + dim].set(val.reshape(dim))
  return d.replace(sensordata=sensordata)
