"""Smooth (unconstrained) dynamics: CoM quantities, CRB mass matrix, RNE bias
forces, passive forces, actuation, and the smooth acceleration.

TPU-native replacement for mujoco_warp's smooth-dynamics kernels. The key
TPU-first choices:
  * spatial inertia / motion algebra on packed arrays, batched over bodies;
  * CRB mass matrix assembled as one masked (nv,6)@(6,nv) matmul (MXU);
  * tree accumulations as (nbody,nbody) mask matmuls instead of scatters;
  * dense batched Cholesky for M (nv is small; XLA batches it well).

Spatial vectors are ordered [angular(3); linear(3)] about a per-tree origin
(the root subtree CoM), matching MuJoCo's cdof/cvel conventions so Data fields
are directly comparable to MjData in parity tests.
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


# ---------------------------------------------------------------------------
# Spatial algebra helpers. cinert packing: [Ixx, Iyy, Izz, Ixy, Ixz, Iyz,
# hx, hy, hz, m] — inertia about the tree origin, h = m * (com - origin).
# ---------------------------------------------------------------------------


def _inert_unpack(ci: jax.Array):
  ixx, iyy, izz, ixy, ixz, iyz = (
    ci[..., 0], ci[..., 1], ci[..., 2], ci[..., 3], ci[..., 4], ci[..., 5],
  )
  row0 = jnp.stack([ixx, ixy, ixz], -1)
  row1 = jnp.stack([ixy, iyy, iyz], -1)
  row2 = jnp.stack([ixz, iyz, izz], -1)
  imat = jnp.stack([row0, row1, row2], -2)
  return imat, ci[..., 6:9], ci[..., 9]


def inert_mul(ci: jax.Array, u: jax.Array) -> jax.Array:
  """Spatial inertia × motion vector → force vector [torque; force]."""
  imat, h, mass = _inert_unpack(ci)
  w, v = u[..., :3], u[..., 3:]
  ang = jnp.einsum("...ij,...j->...i", imat, w) + jnp.cross(h, v)
  lin = mass[..., None] * v - jnp.cross(h, w)
  return jnp.concatenate([ang, lin], axis=-1)


def cross_motion(u: jax.Array, v: jax.Array) -> jax.Array:
  """Spatial cross product of motion vectors (Lie bracket), [ang; lin]."""
  wu, vu = u[..., :3], u[..., 3:]
  wv, vv = v[..., :3], v[..., 3:]
  ang = jnp.cross(wu, wv)
  lin = jnp.cross(wu, vv) + jnp.cross(vu, wv)
  return jnp.concatenate([ang, lin], axis=-1)


def cross_force(u: jax.Array, f: jax.Array) -> jax.Array:
  """Motion-vector cross force-vector: u ×* f."""
  w, v = u[..., :3], u[..., 3:]
  t, fl = f[..., :3], f[..., 3:]
  ang = jnp.cross(w, t) + jnp.cross(v, fl)
  lin = jnp.cross(w, fl)
  return jnp.concatenate([ang, lin], axis=-1)


def transform_motion(u: jax.Array, offset: jax.Array) -> jax.Array:
  """Shift a motion vector's reference point by `offset` (new - old origin)."""
  w, v = u[..., :3], u[..., 3:]
  return jnp.concatenate([w, v - jnp.cross(offset, w)], axis=-1)


# ---------------------------------------------------------------------------
# CoM-based quantities.
# ---------------------------------------------------------------------------


def com_pos(tp: Topology, m: Model, d: Data) -> Data:
  """subtree_com, cinert, cdof (mj_comPos equivalent)."""
  dtype = d.qpos.dtype
  mass = m.body_mass
  sub_mask = jnp.asarray(tp.body_subtree_mask, dtype=dtype)
  wsum = sub_mask @ (mass[:, None] * d.xipos)  # (nbody, 3)
  msum = sub_mask @ mass  # (nbody,)
  subtree_com = wsum / jnp.maximum(msum, 1e-12)[:, None]

  # Per-tree origin for body i: subtree com of its root body.
  origin = subtree_com[tp.body_rootid]  # (nbody, 3)

  # cinert: spatial inertia of each body about its tree origin, world-aligned.
  imat_local = jax.vmap(jnp.diag)(m.body_inertia)  # (nbody, 3, 3)
  R = d.ximat
  i_world = R @ imat_local @ jnp.swapaxes(R, -1, -2)
  r = d.xipos - origin  # com offset from origin
  rr = jnp.einsum("...i,...j->...ij", r, r)
  r2 = jnp.sum(r * r, axis=-1)[..., None, None]
  eye = jnp.eye(3, dtype=dtype)
  i_o = i_world + mass[:, None, None] * (r2 * eye - rr)
  h = mass[:, None] * r
  cinert = jnp.concatenate(
    [
      i_o[..., 0, 0:1], i_o[..., 1, 1:2], i_o[..., 2, 2:3],
      i_o[..., 0, 1:2], i_o[..., 0, 2:3], i_o[..., 1, 2:3],
      h, mass[:, None],
    ],
    axis=-1,
  )

  # cdof: motion subspace per dof about the tree origin.
  cdof = [None] * tp.nv
  for j in range(tp.njnt):
    jtype = int(tp.jnt_type[j])
    dadr = int(tp.jnt_dofadr[j])
    bid = int(tp.jnt_bodyid[j])
    o = origin[bid]
    if jtype == _FREE:
      for k in range(3):
        e = jnp.zeros(3, dtype=dtype).at[k].set(1.0)
        cdof[dadr + k] = jnp.concatenate([jnp.zeros(3, dtype=dtype), e])
      # Rotational dofs: world-aligned axes anchored at body frame origin.
      for k in range(3):
        axis = d.xmat[bid][:, k]
        lin = jnp.cross(axis, o - d.xpos[bid])
        cdof[dadr + 3 + k] = jnp.concatenate([axis, lin])
    elif jtype == _BALL:
      for k in range(3):
        axis = d.xmat[bid][:, k]
        lin = jnp.cross(axis, o - d.xanchor[j])
        cdof[dadr + k] = jnp.concatenate([axis, lin])
    elif jtype == _SLIDE:
      cdof[dadr] = jnp.concatenate([jnp.zeros(3, dtype=dtype), d.xaxis[j]])
    elif jtype == _HINGE:
      axis = d.xaxis[j]
      lin = jnp.cross(axis, o - d.xanchor[j])
      cdof[dadr] = jnp.concatenate([axis, lin])
  cdof_a = (
    jnp.stack(cdof) if tp.nv else jnp.zeros((0, 6), dtype=dtype)
  )
  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof_a)


def com_vel(tp: Topology, m: Model, d: Data) -> Data:
  """cvel, cdof_dot (mj_comVel equivalent)."""
  dtype = d.qpos.dtype
  cvel_list = [jnp.zeros(6, dtype=dtype)]
  cdof_dot = [None] * tp.nv
  for i in range(1, tp.nbody):
    pid = int(tp.body_parentid[i])
    cv = cvel_list[pid]
    jadr, jnum = int(tp.body_jntadr[i]), int(tp.body_jntnum[i])
    for kj in range(jnum):
      j = jadr + kj
      jtype = int(tp.jnt_type[j])
      dadr = int(tp.jnt_dofadr[j])
      if jtype == _FREE:
        # Translation dofs: constant subspace, zero derivative.
        for k in range(3):
          cdof_dot[dadr + k] = jnp.zeros(6, dtype=dtype)
        cv = cv + d.cdof[dadr : dadr + 3].T @ d.qvel[dadr : dadr + 3]
        # Rotation dofs: derivative from accumulated velocity.
        for k in range(3):
          cdof_dot[dadr + 3 + k] = cross_motion(cv, d.cdof[dadr + 3 + k])
        cv = cv + d.cdof[dadr + 3 : dadr + 6].T @ d.qvel[dadr + 3 : dadr + 6]
      elif jtype == _BALL:
        for k in range(3):
          cdof_dot[dadr + k] = cross_motion(cv, d.cdof[dadr + k])
        cv = cv + d.cdof[dadr : dadr + 3].T @ d.qvel[dadr : dadr + 3]
      else:
        cdof_dot[dadr] = cross_motion(cv, d.cdof[dadr])
        cv = cv + d.cdof[dadr] * d.qvel[dadr]
    cvel_list.append(cv)
  cvel = jnp.stack(cvel_list)
  cdof_dot_a = (
    jnp.stack(cdof_dot) if tp.nv else jnp.zeros((0, 6), dtype=dtype)
  )
  return d.replace(cvel=cvel, cdof_dot=cdof_dot_a)


# ---------------------------------------------------------------------------
# Mass matrix (CRB) and factorization.
# ---------------------------------------------------------------------------


def crb(tp: Topology, m: Model, d: Data) -> Data:
  """Dense joint-space mass matrix via composite rigid body, one masked matmul."""
  dtype = d.qpos.dtype
  sub_mask = jnp.asarray(tp.body_subtree_mask, dtype=dtype)
  crb_inert = sub_mask @ d.cinert  # (nbody, 10): subtree composite inertias
  f = inert_mul(crb_inert[tp.dof_bodyid], d.cdof)  # (nv, 6)
  mm = f @ d.cdof.T  # (nv, nv); valid where column-dof is ancestor of row-dof
  mask = jnp.asarray(tp.dof_ancestor_mask, dtype=dtype)  # lower-tri pattern
  lower = mm * mask
  qm = lower + lower.T - jnp.diag(jnp.diag(lower))
  qm = qm + jnp.diag(m.dof_armature)
  return d.replace(qM=qm)


def factor_m(tp: Topology, m: Model, d: Data) -> Data:
  return d.replace(qLD=jnp.linalg.cholesky(d.qM))


def solve_m(d: Data, rhs: jax.Array) -> jax.Array:
  """M^{-1} rhs using the cached Cholesky factor."""
  y = jax.scipy.linalg.solve_triangular(d.qLD, rhs, lower=True)
  return jax.scipy.linalg.solve_triangular(d.qLD.T, y, lower=False)


# ---------------------------------------------------------------------------
# Bias forces (RNE with zero acceleration) and flat-tree force projection.
# ---------------------------------------------------------------------------


def rne(tp: Topology, m: Model, d: Data) -> Data:
  """qfrc_bias = C(qpos, qvel): recursive Newton-Euler with qacc = 0."""
  dtype = d.qpos.dtype
  grav = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])
  cacc = [grav] * 1  # world body
  # Top-down: accelerations.
  for i in range(1, tp.nbody):
    pid = int(tp.body_parentid[i])
    dadr, dnum = int(tp.body_dofadr[i]), int(tp.body_dofnum[i])
    ca = cacc[pid]
    if dnum:
      ca = ca + d.cdof_dot[dadr : dadr + dnum].T @ d.qvel[dadr : dadr + dnum]
    cacc.append(ca)
  cacc = jnp.stack(cacc)
  # Body forces.
  cfrc = inert_mul(d.cinert, cacc) + cross_force(d.cvel, inert_mul(d.cinert, d.cvel))
  # Bottom-up accumulation via subtree mask, then project onto dofs.
  sub_mask = jnp.asarray(tp.body_subtree_mask, dtype=dtype)
  cfrc_total = sub_mask @ cfrc  # (nbody, 6)
  qfrc_bias = jnp.sum(d.cdof * cfrc_total[tp.dof_bodyid], axis=-1)
  return d.replace(qfrc_bias=qfrc_bias)


def xfrc_projection(tp: Topology, m: Model, d: Data) -> jax.Array:
  """Project per-body world wrenches (xfrc_applied) into joint space."""
  dtype = d.qpos.dtype
  origin = d.subtree_com[tp.body_rootid]
  force = d.xfrc_applied[:, :3]
  torque = d.xfrc_applied[:, 3:]
  # Spatial force at the tree origin: [torque + (p - o) × f ; f].
  t_o = torque + jnp.cross(d.xipos - origin, force)
  fs = jnp.concatenate([t_o, force], axis=-1)  # (nbody, 6)
  contrib = fs @ d.cdof.T  # (nbody, nv)
  mask = jnp.asarray(tp.body_dof_mask, dtype=dtype)
  return jnp.sum(contrib * mask, axis=0)


# ---------------------------------------------------------------------------
# Passive forces and actuation.
# ---------------------------------------------------------------------------


def passive(tp: Topology, m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  qfrc_spring = jnp.zeros(tp.nv, dtype=dtype)
  for j in range(tp.njnt):
    jtype = int(tp.jnt_type[j])
    if jtype in (_HINGE, _SLIDE):
      qadr, dadr = int(tp.jnt_qposadr[j]), int(tp.jnt_dofadr[j])
      frc = -m.jnt_stiffness[j] * (d.qpos[qadr] - m.qpos_spring[qadr])
      qfrc_spring = qfrc_spring.at[dadr].set(frc)
  qfrc_damper = -m.dof_damping * d.qvel
  return d.replace(
    qfrc_spring=qfrc_spring,
    qfrc_damper=qfrc_damper,
    qfrc_passive=qfrc_spring + qfrc_damper,
  )


def transmission(tp: Topology, m: Model, d: Data) -> tuple[jax.Array, jax.Array]:
  """actuator_length and the (nu, nv) moment matrix (joint transmission)."""
  dtype = d.qpos.dtype
  if tp.nu == 0:
    return jnp.zeros(0, dtype=dtype), jnp.zeros((0, tp.nv), dtype=dtype)
  lengths = []
  moment = jnp.zeros((tp.nu, tp.nv), dtype=dtype)
  for u in range(tp.nu):
    trntype = int(tp.actuator_trntype[u])
    if trntype != mujoco.mjtTrn.mjTRN_JOINT:
      raise NotImplementedError(f"actuator transmission {trntype}")
    j = int(tp.actuator_trnid[u, 0])
    jtype = int(tp.jnt_type[j])
    qadr, dadr = int(tp.jnt_qposadr[j]), int(tp.jnt_dofadr[j])
    gear0 = m.actuator_gear[u, 0]
    if jtype in (_HINGE, _SLIDE):
      lengths.append(gear0 * d.qpos[qadr])
      moment = moment.at[u, dadr].set(gear0)
    else:
      raise NotImplementedError("free/ball joint actuators")
  return jnp.stack(lengths), moment


def fwd_actuation(tp: Topology, m: Model, d: Data) -> Data:
  """Actuator forces: fixed gain + affine bias (PD position actuators etc.)."""
  dtype = d.qpos.dtype
  if tp.nu == 0:
    return d.replace(qfrc_actuator=jnp.zeros(tp.nv, dtype=dtype))
  length, moment = transmission(tp, m, d)
  velocity = moment @ d.qvel

  ctrl = d.ctrl
  limited = tp.actuator_ctrllimited.astype(bool)
  clamped = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1])
  ctrl = jnp.where(jnp.asarray(limited), clamped, ctrl)

  gain = m.actuator_gainprm[:, 0]  # mjGAIN_FIXED
  bias = (
    m.actuator_biasprm[:, 0]
    + m.actuator_biasprm[:, 1] * length
    + m.actuator_biasprm[:, 2] * velocity
  )
  force = gain * ctrl + bias
  flimited = tp.actuator_forcelimited.astype(bool)
  fclamped = jnp.clip(
    force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1]
  )
  force = jnp.where(jnp.asarray(flimited), fclamped, force)

  qfrc_actuator = moment.T @ force
  return d.replace(
    actuator_length=length,
    actuator_velocity=velocity,
    actuator_force=force,
    qfrc_actuator=qfrc_actuator,
  )


def fwd_acceleration(tp: Topology, m: Model, d: Data) -> Data:
  qfrc_smooth = (
    d.qfrc_passive
    - d.qfrc_bias
    + d.qfrc_actuator
    + d.qfrc_applied
    + xfrc_projection(tp, m, d)
  )
  qacc_smooth = solve_m(d, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)
