"""Builtin sensor evaluation — pure functions of (Topology, Model, Data).

Covers the full sensor catalog wrapped by the reference's BuiltinSensor
(sensor/builtin_sensor.py:15-101): IMU (gyro/velocimeter/accelerometer/
magnetometer), frame pos/quat/axes/vel/acc, joint/tendon/actuator state,
joint-limit rows, subtree com/momentum, energies, clock, plus the
interaction sensors — force/torque (cfrc_int backward pass over the
post-constraint accelerations), touch (contact normal forces inside the
site zone), rangefinder (analytic raycasts), tendonactuatorfrc.
Unsupported types raise at trace time.
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
  _S.mjSENS_E_POTENTIAL, _S.mjSENS_RANGEFINDER,
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
  _S.mjSENS_FORCE, _S.mjSENS_TORQUE, _S.mjSENS_TOUCH,
  _S.mjSENS_TENDONACTFRC,
}


def _limit_row(tp: Topology, joint_id: int) -> int | None:
  """efc row of a joint's limit constraint (static layout: limit rows follow
  the equality and dof-friction blocks in limited_joint_ids order;
  constraint.py efc_row_types)."""
  base = tp.neq_rows + len(tp.friction_dof_ids)
  pos = np.nonzero(tp.limited_joint_ids == joint_id)[0]
  if len(pos):
    return base + int(pos[0])
  pos = np.nonzero(tp.limited_ball_joint_ids == joint_id)[0]
  if len(pos):
    return base + len(tp.limited_joint_ids) + int(pos[0])
  return None


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


def _world_contact_wrench(tp: Topology, m: Model, d: Data):
  """Per-slot world-frame contact (force, torque) acting on body2 at the
  contact point, masked to active slots. Returns (f_w, t_w): (C, 3) each."""
  from mjlab_tpu.physics import constraint as _ct

  cf = _ct.contact_forces(tp, m, d)  # (C, 6) contact-frame [f_n f_t1 f_t2 | torques]
  # contact.frame rows are the axes in world coords: world = Σ_k local_k · frame[k].
  f_w = jnp.einsum("ck,cki->ci", cf[:, :3], d.contact.frame)
  t_w = jnp.einsum("ck,cki->ci", cf[:, 3:], d.contact.frame)
  active = (d.contact.dist < d.contact.includemargin).astype(f_w.dtype)
  return f_w * active[:, None], t_w * active[:, None]


def _cfrc_int(tp: Topology, m: Model, d: Data, cacc: jax.Array) -> jax.Array:
  """(nbody, 6) interaction wrench [torque, force] each body exerts through
  its parent joint, about the body's com-based frame origin
  (subtree_com[rootid], world axes) — mj_rnePostConstraint's cfrc_int,
  consumed by force/torque sensors (mujoco mj_sensorAcc)."""
  from mjlab_tpu.physics import constraint as _ct

  dtype = d.qpos.dtype
  roots = d.subtree_com[tp.body_rootid]  # (nbody, 3)

  # External wrenches per body: applied forces + contacts (cfrc_ext).
  f_app = d.xfrc_applied[:, :3]
  t_app = d.xfrc_applied[:, 3:]
  cfrc_ext = jnp.concatenate(
    [t_app + jnp.cross(d.xipos - roots, f_app), f_app], axis=-1
  )
  st = _ct.slot_tables(tp, m.opt.cone)
  if len(st.condim):
    f_w, t_w = _world_contact_wrench(tp, m, d)
    pos = d.contact.pos
    # The decoded wrench acts on body2 along +normal; body1 gets the negation.
    for sign, bodies in ((1.0, st.b2), (-1.0, st.b1)):
      t_at = t_w + jnp.cross(pos - roots[bodies], f_w)
      cfrc_ext = cfrc_ext.at[bodies].add(
        sign * jnp.concatenate([t_at, f_w], axis=-1)
      )

  # Body momentum-rate bias, then subtree accumulation (all bodies of a
  # subtree share the same com-frame origin, so the sum is consistent).
  Iv = smooth.inert_mul(d.cinert, d.cvel)
  cfrc_com = smooth.inert_mul(d.cinert, cacc) + smooth.cross_force(d.cvel, Iv)
  own = cfrc_com - cfrc_ext
  sub = jnp.asarray(tp.body_subtree_mask, dtype=dtype)
  return sub @ own


def _inside_site(tp: Topology, site_id: int, local: jax.Array) -> jax.Array:
  """Whether points `local` (S, 3) in the site frame lie inside the site
  volume (touch-sensor zone; mujoco mju_insideGeom for the site types)."""
  g = mujoco.mjtGeom
  stype = int(tp.site_type[site_id])
  size = tp.site_size[site_id]
  x, y, z = local[:, 0], local[:, 1], local[:, 2]
  if stype == g.mjGEOM_SPHERE:
    return jnp.sum(local * local, -1) <= size[0] ** 2
  if stype == g.mjGEOM_ELLIPSOID:
    s = local / np.maximum(size, 1e-12)
    return jnp.sum(s * s, -1) <= 1.0
  if stype == g.mjGEOM_CAPSULE:
    zc = jnp.clip(z, -size[1], size[1])
    return x * x + y * y + (z - zc) ** 2 <= size[0] ** 2
  if stype == g.mjGEOM_CYLINDER:
    return (x * x + y * y <= size[0] ** 2) & (jnp.abs(z) <= size[1])
  if stype == g.mjGEOM_BOX:
    return jnp.all(jnp.abs(local) <= size[None, :], axis=-1)
  raise NotImplementedError(f"touch-sensor site type {stype}")


_RAY_MISS = 1e10


def _ray_quadratic(a, b, c):
  """Smallest non-negative root of a t² + 2b t + c = 0, else miss."""
  det = b * b - a * c
  ok = det >= 0
  sq = jnp.sqrt(jnp.maximum(det, 0.0))
  t0 = (-b - sq) / a
  t1 = (-b + sq) / a
  t = jnp.where(t0 >= 0, t0, jnp.where(t1 >= 0, t1, _RAY_MISS))
  return jnp.where(ok, t, _RAY_MISS)


def _ray_geom(gtype: int, size: np.ndarray, gpos, gmat, o, v) -> jax.Array:
  """Ray (o, v) vs one geom → distance along v, _RAY_MISS when no hit.

  Analytic primitives only (plane/sphere/capsule/ellipsoid/cylinder/box);
  hfield and mesh geoms are skipped by the caller (mujoco's mj_ray BVH
  path; not needed by any shipped robot — rangefinders see primitives)."""
  g = mujoco.mjtGeom
  lo = gmat.T @ (o - gpos)
  lv = gmat.T @ v
  if gtype == g.mjGEOM_PLANE:
    denom = lv[2]
    t = jnp.where(jnp.abs(denom) > 1e-12, -lo[2] / denom, _RAY_MISS)
    x = lo + t * lv
    ok = (t >= 0) & (denom < 0)
    if size[0] > 0:
      ok = ok & (jnp.abs(x[0]) <= size[0])
    if size[1] > 0:
      ok = ok & (jnp.abs(x[1]) <= size[1])
    return jnp.where(ok, t, _RAY_MISS)
  if gtype == g.mjGEOM_SPHERE:
    return _ray_quadratic(lv @ lv, lo @ lv, lo @ lo - size[0] ** 2)
  if gtype == g.mjGEOM_ELLIPSOID:
    s = 1.0 / np.maximum(size, 1e-12)
    eo, ev = lo * s, lv * s
    return _ray_quadratic(ev @ ev, eo @ ev, eo @ eo - 1.0)
  if gtype == g.mjGEOM_CAPSULE:
    r, h = float(size[0]), float(size[1])
    # Infinite cylinder on xy, clipped to |z| <= h.
    a = lv[0] ** 2 + lv[1] ** 2
    b = lo[0] * lv[0] + lo[1] * lv[1]
    c = lo[0] ** 2 + lo[1] ** 2 - r * r
    t_cyl = _ray_quadratic(jnp.maximum(a, 1e-12), b, c)
    z = lo[2] + t_cyl * lv[2]
    t_cyl = jnp.where(jnp.abs(z) <= h, t_cyl, _RAY_MISS)
    best = t_cyl
    for zc in (-h, h):
      co = lo - jnp.asarray([0.0, 0.0, zc], dtype=lo.dtype)
      t_cap = _ray_quadratic(lv @ lv, co @ lv, co @ co - r * r)
      zcap = lo[2] + t_cap * lv[2]
      t_cap = jnp.where((zcap - zc) * np.sign(zc or 1.0) >= 0, t_cap, _RAY_MISS)
      best = jnp.minimum(best, t_cap)
    return best
  if gtype == g.mjGEOM_CYLINDER:
    r, h = float(size[0]), float(size[1])
    a = lv[0] ** 2 + lv[1] ** 2
    b = lo[0] * lv[0] + lo[1] * lv[1]
    c = lo[0] ** 2 + lo[1] ** 2 - r * r
    t_side = _ray_quadratic(jnp.maximum(a, 1e-12), b, c)
    z = lo[2] + t_side * lv[2]
    best = jnp.where(jnp.abs(z) <= h, t_side, _RAY_MISS)
    for zc in (-h, h):
      t_disc = jnp.where(
        jnp.abs(lv[2]) > 1e-12, (zc - lo[2]) / lv[2], _RAY_MISS
      )
      x = lo[0] + t_disc * lv[0]
      y = lo[1] + t_disc * lv[1]
      ok = (t_disc >= 0) & (x * x + y * y <= r * r)
      best = jnp.minimum(best, jnp.where(ok, t_disc, _RAY_MISS))
    return best
  if gtype == g.mjGEOM_BOX:
    # Slab method.
    safe = jnp.where(jnp.abs(lv) > 1e-12, lv, 1e-12)
    t1 = (-size[:3] - lo) / safe
    t2 = (size[:3] - lo) / safe
    tmin = jnp.max(jnp.minimum(t1, t2))
    tmax = jnp.min(jnp.maximum(t1, t2))
    hit = (tmax >= jnp.maximum(tmin, 0.0))
    t = jnp.where(tmin >= 0, tmin, tmax)
    return jnp.where(hit & (t >= 0), t, _RAY_MISS)
  return None  # unsupported (hfield/mesh): caller skips this geom


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
  cfrc = None
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
      val = d.ten_length[objid : objid + 1]
    elif stype == _S.mjSENS_TENDONVEL:
      val = d.ten_velocity[objid : objid + 1]
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
    elif stype in (_S.mjSENS_FORCE, _S.mjSENS_TORQUE):
      if cacc is None:
        cacc = _rne_postconstraint_cacc(tp, m, d)
      if cfrc is None:
        cfrc = _cfrc_int(tp, m, d, cacc)
      body = int(tp.site_bodyid[objid])
      c = d.subtree_com[tp.body_rootid[body]]
      pos, mat = d.site_xpos[objid], d.site_xmat[objid]
      t, f = cfrc[body, :3], cfrc[body, 3:]
      if stype == _S.mjSENS_FORCE:
        val = mat.T @ f
      else:
        val = mat.T @ (t - jnp.cross(pos - c, f))
    elif stype == _S.mjSENS_TOUCH:
      from mjlab_tpu.physics import constraint as _ct

      st = _ct.slot_tables(tp, m.opt.cone)
      body = int(tp.site_bodyid[objid])
      own = ((st.b1 == body) | (st.b2 == body)).astype(np.float64)
      if len(st.condim) == 0 or not own.any():
        val = jnp.zeros(1, dtype=d.qpos.dtype)
      else:
        cf = _ct.contact_forces(tp, m, d)
        active = (d.contact.dist < d.contact.includemargin)
        fn = jnp.maximum(cf[:, 0], 0.0) * active
        local = jnp.einsum(
          "ji,cj->ci", d.site_xmat[objid],
          d.contact.pos - d.site_xpos[objid],
        )
        inside = _inside_site(tp, objid, local)
        val = jnp.sum(
          fn * inside * jnp.asarray(own, dtype=d.qpos.dtype)
        ).reshape(1)
    elif stype == _S.mjSENS_RANGEFINDER:
      pos, mat, body = _obj_frame(tp, d, objtype, objid)
      v = mat[:, 2]
      best = jnp.asarray(_RAY_MISS, dtype=d.qpos.dtype)
      for gid in range(tp.ngeom):
        if int(tp.geom_bodyid[gid]) == body:
          continue  # mj_ray bodyexclude = sensor site's body
        t = _ray_geom(
          int(tp.geom_type[gid]), np.asarray(m.geom_size[gid]),
          d.geom_xpos[gid], d.geom_xmat[gid], pos, v,
        )
        if t is None:
          continue  # hfield/mesh geom: no analytic ray support
        best = jnp.minimum(best, t)
      val = jnp.where(best >= _RAY_MISS, -1.0, best).reshape(1)
    elif stype == _S.mjSENS_TENDONACTFRC:
      us = np.nonzero(
        (tp.actuator_trntype == int(mujoco.mjtTrn.mjTRN_TENDON))
        & (tp.actuator_trnid[:, 0] == objid)
      )[0]
      if len(us) == 0:
        val = jnp.zeros(1, dtype=d.qpos.dtype)
      else:
        # Raw scalar actuator force, NOT gear-scaled (mujoco semantics:
        # gear only enters the transmission moment).
        val = jnp.sum(d.actuator_force[us]).reshape(1)
    else:
      raise NotImplementedError(f"sensor type {stype}")
    sensordata = sensordata.at[adr : adr + dim].set(val.reshape(dim))
  return d.replace(sensordata=sensordata)
