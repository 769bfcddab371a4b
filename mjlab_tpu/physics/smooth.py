"""Smooth (unconstrained) dynamics: CoM quantities, CRB mass matrix, RNE bias
forces, passive forces, actuation, and the smooth acceleration.

TPU-native replacement for mujoco_warp's smooth-dynamics kernels. TPU-first
choices:
  * tree accumulations are (nbody,nbody)/(nbody,nv) mask matmuls (MXU) or
    level-vectorized passes — traces are O(tree depth), not O(nbody);
  * per-dof quantities (cdof, cdof_dot) are built fully vectorized per joint
    type, no per-joint Python ops in the trace;
  * CRB mass matrix assembled as one masked (nv,6)@(6,nv) matmul;
  * dense batched Cholesky for M (nv is small; XLA batches it well).

Spatial vectors are ordered [angular(3); linear(3)] about a per-tree origin
(the root subtree CoM), matching MuJoCo's cdof/cvel conventions so Data fields
are directly comparable to MjData in parity tests.
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


# ---------------------------------------------------------------------------
# Spatial algebra. cinert packing: [Ixx, Iyy, Izz, Ixy, Ixz, Iyz, hx, hy, hz,
# m] — inertia about the tree origin, h = m * (com - origin). Matches MjData.
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
  """Spatial cross product of motion vectors, [ang; lin]."""
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


# ---------------------------------------------------------------------------
# Static helper tables (host, cached per Topology).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _dof_tables(tp: Topology):
  """Static per-dof tables for vectorized cdof/cdof_dot construction."""
  nv = tp.nv
  dof_jnt = tp.dof_jntid
  jnt_type = tp.jnt_type[dof_jnt]
  # Position of each dof within its joint.
  dof_in_jnt = np.arange(nv) - tp.jnt_dofadr[dof_jnt]
  is_free_trans = (jnt_type == _FREE) & (dof_in_jnt < 3)
  is_free_rot = (jnt_type == _FREE) & (dof_in_jnt >= 3)
  is_ball = jnt_type == _BALL
  is_hinge = jnt_type == _HINGE
  is_slide = jnt_type == _SLIDE
  # Rotation-axis column index in xmat for free-rot/ball dofs.
  axis_col = np.where(is_free_rot, dof_in_jnt - 3, dof_in_jnt)
  # "Preceding dof" mask for cdof_dot partial velocities (mj_comVel order):
  # dof k precedes dof j if same body & earlier joint, or same free joint
  # with k translational and j rotational.
  prec = np.zeros((nv, nv), dtype=bool)
  for j in range(nv):
    for k in range(nv):
      if tp.dof_bodyid[j] != tp.dof_bodyid[k]:
        continue
      if dof_jnt[k] < dof_jnt[j]:
        prec[j, k] = True
      elif dof_jnt[k] == dof_jnt[j] and is_free_rot[j] and is_free_trans[k]:
        prec[j, k] = True
  # Direct dof→body incidence (nbody, nv).
  direct = np.zeros((tp.nbody, nv), dtype=bool)
  direct[tp.dof_bodyid, np.arange(nv)] = True
  return {
    "is_free_trans": is_free_trans,
    "is_free_rot": is_free_rot,
    "is_ball": is_ball,
    "is_hinge": is_hinge,
    "is_slide": is_slide,
    "axis_col": axis_col,
    "prec_mask": prec,
    "direct_mask": direct,
  }


# ---------------------------------------------------------------------------
# CoM-based quantities.
# ---------------------------------------------------------------------------


def com_pos(tp: Topology, m: Model, d: Data) -> Data:
  """subtree_com, cinert, cdof (mj_comPos equivalent), fully vectorized."""
  dtype = d.qpos.dtype
  mass = m.body_mass
  sub_mask = jnp.asarray(tp.body_subtree_mask, dtype=dtype)
  wsum = sub_mask @ (mass[:, None] * d.xipos)
  msum = sub_mask @ mass
  subtree_com = wsum / jnp.maximum(msum, 1e-12)[:, None]
  origin = subtree_com[tp.body_rootid]  # (nbody, 3) per-tree origin

  # cinert.
  imat_local = m.body_inertia[..., None] * jnp.eye(3, dtype=dtype)
  R = d.ximat
  i_world = R @ imat_local @ jnp.swapaxes(R, -1, -2)
  r = d.xipos - origin
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

  # cdof — vectorized over all dofs at once.
  t = _dof_tables(tp)
  dof_body = tp.dof_bodyid
  dof_jnt = tp.dof_jntid
  o = origin[dof_body]  # (nv, 3)
  anchor = d.xanchor[dof_jnt]
  jaxis = d.xaxis[dof_jnt]
  # Rotation axes for free-rot/ball dofs: columns of body xmat.
  xmat_d = d.xmat[dof_body]  # (nv, 3, 3)
  col = jnp.take_along_axis(
    xmat_d, jnp.asarray(t["axis_col"])[:, None, None].repeat(3, 1), axis=2
  )[..., 0]  # (nv, 3)

  zeros3 = jnp.zeros((tp.nv, 3), dtype=dtype)
  eye3 = jnp.eye(3, dtype=dtype)
  trans_axis = jnp.asarray(eye3[t["axis_col"] % 3], dtype=dtype)

  is_ft = jnp.asarray(t["is_free_trans"])[:, None]
  is_fr = jnp.asarray(t["is_free_rot"])[:, None]
  is_ball = jnp.asarray(t["is_ball"])[:, None]
  is_hinge = jnp.asarray(t["is_hinge"])[:, None]
  is_slide = jnp.asarray(t["is_slide"])[:, None]

  # Rotational dofs anchor: joint anchor (hinge/ball), body origin (free rot).
  rot_axis = jnp.where(is_hinge, jaxis, col)
  rot_anchor = jnp.where(is_fr, d.xpos[dof_body], anchor)
  ang = jnp.where(is_ft | is_slide, zeros3, rot_axis)
  lin_rot = jnp.cross(rot_axis, o - rot_anchor)
  lin = jnp.where(is_ft, trans_axis, jnp.where(is_slide, jaxis, lin_rot))
  cdof = jnp.concatenate([ang, lin], axis=-1)
  return d.replace(subtree_com=subtree_com, cinert=cinert, cdof=cdof)


def com_vel(tp: Topology, m: Model, d: Data) -> Data:
  """cvel, cdof_dot (mj_comVel equivalent) via mask matmuls."""
  dtype = d.qpos.dtype
  t = _dof_tables(tp)
  contrib = d.cdof * d.qvel[:, None]  # (nv, 6)
  bd_mask = jnp.asarray(tp.body_dof_mask, dtype=dtype)
  cvel = bd_mask @ contrib  # (nbody, 6)

  # Partial velocity seen by each dof (parent body + preceding dofs).
  parent_vel = cvel[tp.body_parentid[tp.dof_bodyid]]  # (nv, 6)
  prec = jnp.asarray(t["prec_mask"], dtype=dtype)
  pv = parent_vel + prec @ contrib
  cdof_dot = cross_motion(pv, d.cdof)
  cdof_dot = jnp.where(
    jnp.asarray(t["is_free_trans"])[:, None], 0.0, cdof_dot
  )
  return d.replace(cvel=cvel, cdof_dot=cdof_dot)


# ---------------------------------------------------------------------------
# Mass matrix (CRB) and factorization.
# ---------------------------------------------------------------------------


def crb(tp: Topology, m: Model, d: Data) -> Data:
  """Dense joint-space mass matrix via composite rigid body, one matmul."""
  dtype = d.qpos.dtype
  sub_mask = jnp.asarray(tp.body_subtree_mask, dtype=dtype)
  crb_inert = sub_mask @ d.cinert  # (nbody, 10)
  f = inert_mul(crb_inert[tp.dof_bodyid], d.cdof)  # (nv, 6)
  mm = f @ d.cdof.T
  mask = jnp.asarray(tp.dof_ancestor_mask, dtype=dtype)
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
# Bias forces (RNE with zero acceleration).
# ---------------------------------------------------------------------------


def rne(tp: Topology, m: Model, d: Data) -> Data:
  """qfrc_bias = C(qpos, qvel): level-vectorized RNE with qacc = 0."""
  dtype = d.qpos.dtype
  t = _dof_tables(tp)
  grav = jnp.concatenate([jnp.zeros(3, dtype=dtype), -m.opt.gravity])

  # Per-body velocity-product acceleration contribution (one matmul).
  direct = jnp.asarray(t["direct_mask"], dtype=dtype)
  contrib = direct @ (d.cdof_dot * d.qvel[:, None])  # (nbody, 6)

  # Top-down: cacc[i] = cacc[parent] + contrib[i] (level pass).
  cacc = jnp.tile(grav, (tp.nbody, 1))
  for ids in tp.body_levels:
    pid = tp.body_parentid[ids]
    cacc = cacc.at[ids].set(cacc[pid] + contrib[ids])

  cfrc = inert_mul(d.cinert, cacc) + cross_force(d.cvel, inert_mul(d.cinert, d.cvel))
  sub_mask = jnp.asarray(tp.body_subtree_mask, dtype=dtype)
  cfrc_total = sub_mask @ cfrc
  qfrc_bias = jnp.sum(d.cdof * cfrc_total[tp.dof_bodyid], axis=-1)
  return d.replace(qfrc_bias=qfrc_bias)


def xfrc_projection(tp: Topology, m: Model, d: Data) -> jax.Array:
  """Project per-body world wrenches (xfrc_applied) into joint space."""
  dtype = d.qpos.dtype
  origin = d.subtree_com[tp.body_rootid]
  force = d.xfrc_applied[:, :3]
  torque = d.xfrc_applied[:, 3:]
  t_o = torque + jnp.cross(d.xipos - origin, force)
  fs = jnp.concatenate([t_o, force], axis=-1)  # (nbody, 6)
  contrib = fs @ d.cdof.T  # (nbody, nv)
  mask = jnp.asarray(tp.body_dof_mask, dtype=dtype)
  return jnp.sum(contrib * mask, axis=0)


# ---------------------------------------------------------------------------
# Passive forces and actuation.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _spring_tables(tp: Topology):
  ids = np.nonzero(
    np.isin(tp.jnt_type, [_HINGE, _SLIDE])
  )[0]
  return ids, tp.jnt_qposadr[ids], tp.jnt_dofadr[ids]


def passive(tp: Topology, m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  qfrc_spring = jnp.zeros(tp.nv, dtype=dtype)
  ids, qadr, dadr = _spring_tables(tp)
  if len(ids):
    frc = -m.jnt_stiffness[ids] * (d.qpos[qadr] - m.qpos_spring[qadr])
    qfrc_spring = qfrc_spring.at[dadr].set(frc)
  qfrc_damper = -m.dof_damping * d.qvel
  if tp.ntendon:
    # Tendon springs (deadband, mj_passive) and dampers through ten_J.
    L = d.ten_length
    lo, up = m.tendon_lengthspring[:, 0], m.tendon_lengthspring[:, 1]
    disp = jnp.where(L > up, up - L, jnp.where(L < lo, lo - L, jnp.zeros((), dtype)))
    qfrc_spring = qfrc_spring + d.ten_J.T @ (m.tendon_stiffness * disp)
    qfrc_damper = qfrc_damper - d.ten_J.T @ (m.tendon_damping * d.ten_velocity)
  qfrc_passive = qfrc_spring + qfrc_damper

  # Gravity compensation (mj_gravcomp): anti-gravity force
  # gravcomp·mass·(−g) applied at each compensated body's COM. The body
  # set is static (host model value selects it); zero traced cost when no
  # body uses gravcomp.
  gc = np.nonzero(np.asarray(tp.body_gravcomp_host) > 0)[0]
  if len(gc):
    origins = d.subtree_com[tp.body_rootid[tp.dof_bodyid]]  # (nv, 3)
    ang, lin = d.cdof[:, :3], d.cdof[:, 3:]
    f = (
      -(m.body_gravcomp[gc] * m.body_mass[gc])[:, None] * m.opt.gravity[None]
    )  # (G, 3)
    jac = lin[None] + jnp.cross(ang[None], d.xipos[gc][:, None] - origins[None])
    mask = jnp.asarray(tp.body_dof_mask[gc], dtype=dtype)  # (G, nv)
    qfrc_passive = qfrc_passive + jnp.einsum(
      "gvj,gj->v", jac * mask[:, :, None], f
    )

  if tp.has_fluid:
    qfrc_passive = qfrc_passive + _fluid_box(tp, m, d)

  return d.replace(
    qfrc_spring=qfrc_spring,
    qfrc_damper=qfrc_damper,
    qfrc_passive=qfrc_passive,
  )


def _fluid_box(tp: Topology, m: Model, d: Data) -> jax.Array:
  """Inertia-box fluid model (mj_inertiaBoxFluidModel, engine_passive.c):
  per body, an equivalent box from the diagonal inertia gets linear
  viscous drag plus quadratic density drag on the CoM velocity relative
  to the wind, all in the inertial (ximat) frame, applied at xipos."""
  dtype = d.qpos.dtype
  minval = 1e-15
  mass = jnp.maximum(m.body_mass, minval)
  inertia = m.body_inertia  # (nbody, 3) principal, ximat frame
  box = jnp.stack(
    [
      jnp.sqrt(
        jnp.maximum(
          minval, inertia[:, (j + 1) % 3] + inertia[:, (j + 2) % 3] - inertia[:, j]
        )
        / mass
        * 6.0
      )
      for j in range(3)
    ],
    axis=-1,
  )  # (nbody, 3)

  # 6D body velocity at the CoM in the inertial frame, wind-relative.
  origin = d.subtree_com[tp.body_rootid]
  w_world = d.cvel[:, :3]
  v_world = d.cvel[:, 3:] + jnp.cross(w_world, d.xipos - origin)
  R = d.ximat  # body→world
  lw = jnp.einsum("bji,bj->bi", R, w_world)
  lv = jnp.einsum("bji,bj->bi", R, v_world - m.opt.wind[None].astype(dtype))

  # Viscous (Stokes, sphere of mean diameter) torque/force.
  diam = jnp.mean(box, axis=-1)
  visc = m.opt.viscosity
  lt = -jnp.pi * diam[:, None] ** 3 * visc * lw
  lf = -3.0 * jnp.pi * diam[:, None] * visc * lv

  # Quadratic density drag.
  dens = m.opt.density
  area = jnp.stack(
    [box[:, 1] * box[:, 2], box[:, 0] * box[:, 2], box[:, 0] * box[:, 1]], axis=-1
  )
  lf = lf - 0.5 * dens * area * jnp.abs(lv) * lv
  b4 = box**4
  tscale = jnp.stack(
    [
      box[:, 0] * (b4[:, 1] + b4[:, 2]),
      box[:, 1] * (b4[:, 0] + b4[:, 2]),
      box[:, 2] * (b4[:, 0] + b4[:, 1]),
    ],
    axis=-1,
  )
  lt = lt - dens * tscale * jnp.abs(lw) * lw / 64.0

  # Massless/world bodies get no fluid force (mj_fluid skips them).
  alive = (m.body_mass >= minval) & jnp.asarray(np.arange(tp.nbody) > 0)
  lt = jnp.where(alive[:, None], lt, jnp.zeros((), dtype))
  lf = jnp.where(alive[:, None], lf, jnp.zeros((), dtype))

  # Rotate to world and project to joint space (wrench at xipos).
  torque = jnp.einsum("bij,bj->bi", R, lt)
  force = jnp.einsum("bij,bj->bi", R, lf)
  t_o = torque + jnp.cross(d.xipos - origin, force)
  fs = jnp.concatenate([t_o, force], axis=-1)  # (nbody, 6)
  contrib = fs @ d.cdof.T  # (nbody, nv)
  mask = jnp.asarray(tp.body_dof_mask, dtype=dtype)
  return jnp.sum(contrib * mask, axis=0)


def _site_point_jac(tp: Topology, d: Data, site: int) -> jax.Array:
  """(nv, 3) translational Jacobian of site `site` (world frame)."""
  b = int(tp.site_bodyid[site])
  origin = d.subtree_com[tp.body_rootid[b]]
  jac = d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], d.site_xpos[site][None] - origin)
  mask = jnp.asarray(tp.body_dof_mask[b], dtype=d.qpos.dtype)
  return jac * mask[:, None]


def _body_point_jac(tp: Topology, d: Data, body: int, p: jax.Array) -> jax.Array:
  """(nv, 3) translational Jacobian of world point p attached to `body`."""
  origin = d.subtree_com[tp.body_rootid[body]]
  jac = d.cdof[:, 3:] + jnp.cross(d.cdof[:, :3], p[None] - origin)
  mask = jnp.asarray(tp.body_dof_mask[body], dtype=d.qpos.dtype)
  return jac * mask[:, None]


def _tangent_point(p: jax.Array, r, s) -> jax.Array:
  """2D tangent point on the origin circle of radius r from external point
  p, on side s (+1/-1 of the perpendicular)."""
  sq = jnp.maximum(p @ p, r * r + 1e-15)
  perp = jnp.stack([-p[1], p[0]])
  return (r * r / sq) * p + s * (r * jnp.sqrt(sq - r * r) / sq) * perp


def _wrap_circle(p0, p1, r, sidept):
  """2D circle wrap (mju_wrap's core): endpoints p0/p1 outside the origin
  circle of radius r. Returns (wrapped, arc_len, t0, t1). `sidept` (2,) or
  None picks the wrap side; otherwise the side the straight segment passes.
  Validated against mujoco's wrap_xpos/ten_length over randomized configs
  (tests/test_physics_tendon_wrap.py)."""
  dtype = p0.dtype
  dseg = p1 - p0
  tt = jnp.clip(-(p0 @ dseg) / jnp.maximum(dseg @ dseg, 1e-15), 0.0, 1.0)
  closest = p0 + tt * dseg
  intersects = (closest @ closest) < r * r
  cross = lambda a, b: a[0] * b[1] - a[1] * b[0]
  if sidept is None:
    # wrap on the side of the circle the segment passes: the side of the
    # closest point (degenerate only when the segment hits the center).
    s = jnp.where(cross(dseg, closest) >= 0, 1.0, -1.0).astype(dtype)
  else:
    s = jnp.where(cross(dseg, sidept) >= 0, 1.0, -1.0).astype(dtype)
  t0 = _tangent_point(p0, r, -s)
  t1 = _tangent_point(p1, r, s)
  # signed angle from t0 to t1, measured in the wrap direction (-s turn).
  # Wrap iff that arc is positive: without a sidesite s is the passing
  # side, so a clearing segment gives a negative arc (straight); a forced
  # sidesite wraps even without intersection (probed vs mju_wrap). An
  # intersecting segment always wraps — arcs past π come back via +2π.
  ang = jnp.arctan2(cross(t0, t1), t0 @ t1)
  arc_ang = -s * ang
  arc_ang = jnp.where((arc_ang <= 0) & intersects, arc_ang + 2 * jnp.pi, arc_ang)
  arc = r * arc_ang
  both_outside = (p0 @ p0 > r * r) & (p1 @ p1 > r * r)
  wrapped = (arc_ang > 0) & both_outside
  return wrapped, arc, t0, t1


def tendon(tp: Topology, m: Model, d: Data) -> Data:
  """Tendon lengths/Jacobians (mj_tendon): fixed tendons ride their static
  joint-coefficient maps; spatial tendons sum segment lengths — straight
  site-to-site, scaled by pulley divisors, optionally wrapping sphere/
  cylinder geoms (mju_wrap) — with J from direction-projected point
  Jacobians (wrap tangent points are material points of the geom's body:
  the taut-path envelope condition makes that exact to first order)."""
  dtype = d.qpos.dtype
  if tp.ntendon == 0:
    return d
  qmat = jnp.asarray(tp.tendon_qmat, dtype=dtype)
  vmat = jnp.asarray(tp.tendon_vmat, dtype=dtype)
  length = qmat @ d.qpos  # fixed rows; spatial rows are zero here
  J = jnp.broadcast_to(vmat, (tp.ntendon, tp.nv))
  for t in np.nonzero(tp.tendon_kind == 1)[0]:
    L_t = jnp.zeros((), dtype=dtype)
    row = jnp.zeros(tp.nv, dtype=dtype)
    for k in range(tp.tendon_seg_sites.shape[1]):
      sa, sb = int(tp.tendon_seg_sites[t, k, 0]), int(tp.tendon_seg_sites[t, k, 1])
      if sa < 0:
        continue
      scale = float(tp.tendon_seg_scale[t, k])
      g = int(tp.tendon_seg_geom[t, k])
      pa, pb = d.site_xpos[sa], d.site_xpos[sb]
      Ja = _site_point_jac(tp, d, sa)
      Jb = _site_point_jac(tp, d, sb)
      seg = pb - pa
      l_str = jnp.linalg.norm(seg)
      dir_str = seg / jnp.maximum(l_str, 1e-15)
      L_seg = l_str
      row_seg = (Jb - Ja) @ dir_str
      if g >= 0:
        gb = int(tp.geom_bodyid[g])
        R = d.geom_xmat[g]
        gp = d.geom_xpos[g]
        r = m.geom_size[g, 0]
        la = R.T @ (pa - gp)
        lb = R.T @ (pb - gp)
        side = int(tp.tendon_seg_side[t, k])
        ls = R.T @ (d.site_xpos[side] - gp) if side >= 0 else None
        if int(tp.geom_type[g]) == int(mujoco.mjtGeom.mjGEOM_CYLINDER):
          # 2D wrap in the cylinder cross-section; z rides linearly along
          # the 2D path and the arc length picks up the z component.
          w2, arc2, t0_2, t1_2 = _wrap_circle(
            la[:2], lb[:2], r, ls[:2] if ls is not None else None
          )
          a2 = jnp.linalg.norm(t0_2 - la[:2])
          b2 = jnp.linalg.norm(lb[:2] - t1_2)
          tot2 = jnp.maximum(a2 + arc2 + b2, 1e-15)
          z0 = la[2] + (lb[2] - la[2]) * a2 / tot2
          z1 = la[2] + (lb[2] - la[2]) * (a2 + arc2) / tot2
          w0l = jnp.concatenate([t0_2, z0[None]])
          w1l = jnp.concatenate([t1_2, z1[None]])
          wlen = jnp.sqrt(arc2 * arc2 + (z1 - z0) ** 2)
          wrapped = w2
        else:  # sphere: wrap in the plane through both points (+ center)
          n = jnp.cross(la, lb)
          if ls is not None:
            # degenerate la‖lb plane falls back to the sidesite plane
            n = jnp.where(jnp.linalg.norm(n) < 1e-9, jnp.cross(la - lb, ls), n)
          nn = n / jnp.maximum(jnp.linalg.norm(n), 1e-15)
          e0 = la / jnp.maximum(jnp.linalg.norm(la), 1e-15)
          e1 = jnp.cross(nn, e0)
          to2 = lambda v: jnp.stack([v @ e0, v @ e1])
          w2, arc2, t0_2, t1_2 = _wrap_circle(
            to2(la), to2(lb), r, to2(ls) if ls is not None else None
          )
          w0l = t0_2[0] * e0 + t0_2[1] * e1
          w1l = t1_2[0] * e0 + t1_2[1] * e1
          wlen = arc2
          wrapped = w2
        w0 = gp + R @ w0l
        w1 = gp + R @ w1l
        l0 = jnp.linalg.norm(w0 - pa)
        l1 = jnp.linalg.norm(pb - w1)
        dir0 = (w0 - pa) / jnp.maximum(l0, 1e-15)
        dir1 = (pb - w1) / jnp.maximum(l1, 1e-15)
        Jg0 = _body_point_jac(tp, d, gb, w0)
        Jg1 = _body_point_jac(tp, d, gb, w1)
        L_wrap = l0 + wlen + l1
        row_wrap = (Jg0 - Ja) @ dir0 + (Jb - Jg1) @ dir1
        L_seg = jnp.where(wrapped, L_wrap, L_seg)
        row_seg = jnp.where(wrapped, row_wrap, row_seg)
      L_t = L_t + scale * L_seg
      row = row + scale * row_seg
    length = length.at[t].set(L_t)
    J = J.at[t].set(row)
  return d.replace(ten_length=length, ten_J=J, ten_velocity=J @ d.qvel)


def transmission(tp: Topology, m: Model, d: Data) -> tuple[jax.Array, jax.Array]:
  """actuator_length and the (nu, nv) moment matrix.

  Joint and fixed-tendon transmissions share one static-matrix form
  (tp.trn_qmat/trn_vmat, built in io._transmission_matrices); spatial-
  tendon rows substitute the dynamic Data.ten_length/ten_J."""
  dtype = d.qpos.dtype
  if tp.nu == 0:
    return jnp.zeros(0, dtype=dtype), jnp.zeros((0, tp.nv), dtype=dtype)
  gear0 = m.actuator_gear[:, 0]
  qmat = jnp.asarray(tp.trn_qmat, dtype=dtype)
  vmat = jnp.asarray(tp.trn_vmat, dtype=dtype)
  length = gear0 * (qmat @ d.qpos)
  moment = gear0[:, None] * vmat
  for u in np.nonzero(tp.actuator_dyn_tendon >= 0)[0]:
    t = int(tp.actuator_dyn_tendon[u])
    length = length.at[u].set(gear0[u] * d.ten_length[t])
    moment = moment.at[u].set(gear0[u] * d.ten_J[t])
  return length, moment


def fwd_actuation(tp: Topology, m: Model, d: Data) -> Data:
  """Actuator forces: fixed gain + affine bias (PD position actuators etc.).

  Stateful actuators (dyntype integrator/filter/filterexact) drive the gain
  from their activation `act` instead of ctrl and emit `act_dot`
  (mj_fwdActuation semantics); `act` advances in forward.integrate."""
  dtype = d.qpos.dtype
  if tp.nu == 0:
    return d.replace(qfrc_actuator=jnp.zeros(tp.nv, dtype=dtype))
  length, moment = transmission(tp, m, d)
  velocity = moment @ d.qvel

  ctrl = d.ctrl
  limited = jnp.asarray(tp.actuator_ctrllimited.astype(bool))
  clamped = jnp.clip(ctrl, m.actuator_ctrlrange[:, 0], m.actuator_ctrlrange[:, 1])
  ctrl = jnp.where(limited, clamped, ctrl)

  act_dot = d.act_dot
  if tp.na > 0:
    # mjtDyn: 1=integrator, 2=filter, 3=filterexact, 4=muscle
    dyn = tp.actuator_dyntype
    stateful = np.asarray(dyn != 0)
    act_u = d.act[np.where(stateful, tp.actuator_actadr, 0)]
    tau = jnp.maximum(m.actuator_dynprm[:, 0], 1e-15)
    act_dot_u = jnp.where(jnp.asarray(dyn == 1), ctrl, (ctrl - act_u) / tau)
    if (dyn == 4).any():
      from mjlab_tpu.physics import muscle as _muscle

      act_dot_u = jnp.where(
        jnp.asarray(dyn == 4),
        _muscle.muscle_dynamics(ctrl, act_u, m.actuator_dynprm[:, :3]),
        act_dot_u,
      )
    act_dot_u = jnp.where(jnp.asarray(stateful), act_dot_u, jnp.zeros((), dtype))
    # actearly: force uses the NEXT activation (mj_nextActivation).
    h = m.opt.timestep
    nxt_lin = act_u + h * act_dot_u
    nxt_exact = act_u + act_dot_u * tau * -jnp.expm1(-h / tau)
    nxt = jnp.where(jnp.asarray(dyn == 3), nxt_exact, nxt_lin)
    early = jnp.asarray(tp.actuator_actearly.astype(bool))
    act_in = jnp.where(early, nxt, act_u)
    inp = jnp.where(jnp.asarray(stateful), act_in, ctrl)
    act_dot = act_dot_u[tp.act_actuator]
  else:
    inp = ctrl

  gain = m.actuator_gainprm[:, 0]  # mjGAIN_FIXED
  bias = (
    m.actuator_biasprm[:, 0]
    + m.actuator_biasprm[:, 1] * length
    + m.actuator_biasprm[:, 2] * velocity
  )
  gaintype = np.asarray(tp.actuator_gaintype)
  biastype = np.asarray(tp.actuator_biastype)
  if (gaintype == 2).any() or (biastype == 2).any():  # mjGAIN/mjBIAS_MUSCLE
    from mjlab_tpu.physics import muscle as _muscle

    gain = jnp.where(
      jnp.asarray(gaintype == 2),
      _muscle.muscle_gain(
        length, velocity, m.actuator_lengthrange, m.actuator_acc0,
        m.actuator_gainprm[:, :9],
      ),
      gain,
    )
    bias = jnp.where(
      jnp.asarray(biastype == 2),
      _muscle.muscle_bias(
        length, m.actuator_lengthrange, m.actuator_acc0,
        m.actuator_biasprm[:, :9],
      ),
      bias,
    )
  force = gain * inp + bias
  flimited = jnp.asarray(tp.actuator_forcelimited.astype(bool))
  fclamped = jnp.clip(force, m.actuator_forcerange[:, 0], m.actuator_forcerange[:, 1])
  force = jnp.where(flimited, fclamped, force)

  # Project actuator forces onto dofs through the moment matrix.
  qfrc_actuator = moment.T @ force
  return d.replace(
    actuator_length=length,
    actuator_velocity=velocity,
    actuator_force=force,
    act_dot=act_dot,
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
