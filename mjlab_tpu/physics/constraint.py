"""Constraint assembly: Jacobians, impedances, reference accelerations.

Implements MuJoCo's soft-constraint model (equality constraints, dof
friction, joint limits, frictional contacts with pyramidal/elliptic cones)
with fully static row allocation: row meanings are fixed at trace time;
rows whose constraint is not "included" (dist >= margin — MuJoCo drops
them from efc entirely) get D = 0 and are inert in the solver. Assembly is
vectorized over rows (no per-row Python ops in the trace): one batched
point-Jacobian computation covers every contact slot, and facet rows are
built by group (condim) with masked math. Equality rows (tiny, host-
unrolled counts) are the exception: per-constraint residual construction
with a nested-jvp J̇q̇ bias for the weld rotation rows.

Row layout: [equality | dof friction | joint limits | contact groups].
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.core import math as mt
from mjlab_tpu.physics.types import ConeType, Data, Model, Topology

_MINVAL = 1e-15
_MINIMP = 0.0001
_MAXIMP = 0.9999


def _impedance(solimp: jax.Array, pos: jax.Array) -> jax.Array:
  """Constraint impedance d(r) from solimp = (dmin, dmax, width, mid, power)."""
  dmin, dmax, width, mid, power = (
    solimp[..., 0], solimp[..., 1], solimp[..., 2], solimp[..., 3], solimp[..., 4],
  )
  dmin = jnp.clip(dmin, _MINIMP, _MAXIMP)
  dmax = jnp.clip(dmax, _MINIMP, _MAXIMP)
  width = jnp.maximum(width, _MINVAL)
  mid = jnp.clip(mid, _MINIMP, _MAXIMP)
  power = jnp.maximum(power, 1.0)

  x = jnp.clip(jnp.abs(pos) / width, 0.0, 1.0)
  a = 1.0 / jnp.power(mid, power - 1)
  b = 1.0 / jnp.power(1 - mid, power - 1)
  y = jnp.where(x < mid, a * jnp.power(x, power), 1 - b * jnp.power(1 - x, power))
  return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def _kbi(solref: jax.Array, solimp: jax.Array, pos: jax.Array):
  """Stiffness k, damping b, impedance from solver parameters (broadcasts)."""
  imp = _impedance(solimp, pos)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  std = timeconst > 0
  b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k_std = 1.0 / jnp.maximum(
    dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL
  )
  b = jnp.where(std, b_std, -solref[..., 1] / dmax)
  k = jnp.where(std, k_std, -solref[..., 0] / (dmax * dmax))
  return k, b, imp


def _rows_from(J, pos, margin, solref, solimp, diag_approx, qvel, include,
               frictionloss=None):
  """Vectorized row finalization: (D, aref) from the soft-constraint model."""
  k, b, imp = _kbi(solref, solimp, pos - margin)
  vel = J @ qvel
  aref = -b * vel - k * imp * (pos - margin)
  r = jnp.maximum((1 - imp) / imp * diag_approx, _MINVAL)
  D = jnp.where(include, 1.0 / r, 0.0)
  fl = (
    jnp.zeros_like(D)
    if frictionloss is None
    else frictionloss * include.astype(D.dtype)
  )
  return D, aref, fl


# ---------------------------------------------------------------------------
# Static slot tables (host-side, cached per Topology).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SlotTables:
  g1: np.ndarray  # (C,) geom ids
  g2: np.ndarray
  b1: np.ndarray  # (C,) body ids
  b2: np.ndarray
  condim: np.ndarray  # (C,)
  # Row bookkeeping: start row of each slot in the efc arrays and row count.
  slot_row_adr: np.ndarray  # (C,)
  slot_row_num: np.ndarray  # (C,)
  nrow_contact: int


@functools.lru_cache(maxsize=64)
def slot_tables(tp: Topology, cone: int) -> SlotTables:
  g1, g2, b1, b2, condim = [], [], [], [], []
  for p in tp.pairs:
    for _ in range(p.ncon):
      g1.append(p.geom1)
      g2.append(p.geom2)
      b1.append(int(tp.geom_bodyid[p.geom1]))
      b2.append(int(tp.geom_bodyid[p.geom2]))
      condim.append(p.condim)
  # Terrain-group slots follow the static pair slots. The terrain geom varies
  # at runtime but is always welded to world (b1 = 0); the pool's first geom
  # stands in for g1 (only b1/b2/condim feed constraint assembly — contact
  # params are carried in Contact by the collision broadphase).
  for tg in tp.terrain_groups:
    for i, g in enumerate(tg.robot_geoms):
      for _ in range(tg.slots):
        g1.append(int(tg.pool_geoms[0]))
        g2.append(int(g))
        b1.append(0)
        b2.append(int(tp.geom_bodyid[g]))
        condim.append(int(tg.condim[i]))
  condim = np.asarray(condim, dtype=np.int32)
  # Rows are grouped by condim (ascending), preserving slot order per group.
  adr = np.zeros(len(condim), dtype=np.int32)
  num = np.zeros(len(condim), dtype=np.int32)
  row = 0
  for c in sorted(set(condim.tolist())):
    for i in np.nonzero(condim == c)[0]:
      nrows = 1 if c == 1 else (2 * (c - 1) if cone == ConeType.PYRAMIDAL else c)
      adr[i] = row
      num[i] = nrows
      row += nrows
  return SlotTables(
    g1=np.asarray(g1), g2=np.asarray(g2),
    b1=np.asarray(b1), b2=np.asarray(b2),
    condim=condim, slot_row_adr=adr, slot_row_num=num, nrow_contact=row,
  )


def efc_row_types(tp: Topology) -> tuple[int, int, int, int]:
  """(ne, nf, nl, nc): equality, dof-friction, limit, contact row counts —
  in efc layout order."""
  ne = tp.neq_rows
  nf = len(tp.friction_dof_ids)
  nl = len(tp.limited_joint_ids) + len(tp.limited_ball_joint_ids)
  return ne, nf, nl, tp.nefc - ne - nf - nl


def contact_slot_row_adr(tp: Topology, cone: int) -> np.ndarray:
  """Absolute efc row address of each contact slot's first row (static)."""
  ne, nf, nl, _ = efc_row_types(tp)
  st = slot_tables(tp, cone)
  return ne + nf + nl + st.slot_row_adr


def elliptic_cone_slots(tp: Topology) -> tuple[np.ndarray, np.ndarray]:
  """(slot indices, first-row addresses) of condim≥3 contacts under the
  elliptic cone — the slots the solver treats as coupled cone constraints."""
  st = slot_tables(tp, ConeType.ELLIPTIC)
  ne, nf, nl, _ = efc_row_types(tp)
  idx = np.nonzero(st.condim >= 3)[0]
  return idx, ne + nf + nl + st.slot_row_adr[idx]


def contact_forces(tp: Topology, m: Model, d: Data) -> jax.Array:
  """Per-slot contact wrench in the contact frame — (C, 6): force
  [normal, t1, t2] then torque [torsion, roll1, roll2] (zero beyond the
  contact's condim). Equivalent of mj_contactForce for the engine's static
  slots (reference sensors read it via mjSENS_CONTACT's force/torque
  fields, sensor/contact_sensor.py:16-41).

  Pyramidal decoding (the inverse of the facet construction above):
  normal = Σ λ_k, component_i = μ_i (λ_{i+} − λ_{i−}) where components run
  over [t1, t2, torsion, roll1, roll2]. Elliptic rows are the contact-frame
  components directly.
  """
  st = slot_tables(tp, m.opt.cone)
  C = len(st.condim)
  dtype = d.qpos.dtype
  if C == 0:
    return jnp.zeros((0, 6), dtype=dtype)
  adr = contact_slot_row_adr(tp, m.opt.cone)
  out = jnp.zeros((C, 6), dtype=dtype)
  for cd in sorted(set(st.condim.tolist())):
    idx = np.nonzero(st.condim == cd)[0]
    a = adr[idx]
    if cd == 1:
      normal = d.efc_force[a]
      comps = [normal]
    elif m.opt.cone == ConeType.ELLIPTIC:
      rows = d.efc_force[a[:, None] + np.arange(cd)[None]]  # (n, cd)
      comps = [rows[:, i] for i in range(cd)]
    else:
      lam = d.efc_force[a[:, None] + np.arange(2 * (cd - 1))[None]]  # (n, 2(cd-1))
      normal = jnp.sum(lam, axis=-1)
      comps = [normal]
      for f_i in range(1, cd):
        mu = d.contact.friction[idx, f_i - 1]
        comps.append(mu * (lam[:, 2 * (f_i - 1)] - lam[:, 2 * (f_i - 1) + 1]))
    while len(comps) < 6:
      comps.append(jnp.zeros_like(comps[0]))
    out = out.at[idx].set(jnp.stack(comps, -1))
  return out


# ---------------------------------------------------------------------------
# Assembly.
# ---------------------------------------------------------------------------


def make_constraint(tp: Topology, m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  nv = tp.nv
  if tp.nefc == 0:
    return d

  J_parts, D_parts, aref_parts, pos_parts, margin_parts, fl_parts = (
    [], [], [], [], [], []
  )

  # 0) Equality rows (bilateral, always included; they PRECEDE every other
  # row class, matching MuJoCo's efc layout — mjCNSTR_EQUALITY first).
  if tp.neq_rows:
    import mujoco as _mj

    origins_v = d.subtree_com[tp.body_rootid[tp.dof_bodyid]]  # (nv, 3)
    ang_v, lin_v = d.cdof[:, :3], d.cdof[:, 3:]

    def _point_jac(b: int, p):
      """(3, nv) translational point Jacobian of point p on body b."""
      jac = lin_v + jnp.cross(ang_v, p[None] - origins_v)  # (nv, 3)
      mask = jnp.asarray(tp.body_dof_mask[b], dtype=dtype)
      return (jac * mask[:, None]).T

    def _eq_rows_from(J, pos, solref, solimp, diag_approx, jdot_qdot):
      """Equality finalization: ONE impedance from the norm of the whole
      residual vector, shared across the constraint's rows, and a J̇q̇
      bias in aref — both probed against mujoco's efc_D/efc_aref (the
      spatial equality rows are the only efc rows where mujoco subtracts
      the Jacobian-derivative term)."""
      k, b, imp = _kbi(solref, solimp, jnp.linalg.norm(pos))
      vel = J @ d.qvel
      aref = -b * vel - k * imp * pos - jdot_qdot
      r = jnp.maximum((1 - imp) / imp * diag_approx, _MINVAL)
      return 1.0 / r, aref

    def _body_bias(b: int):
      """(6,) [ang, lin] Σ_i q̇_i ċdof_i over b's ancestor dofs — the
      velocity-product (bias) spatial acceleration of body b."""
      mask = jnp.asarray(tp.body_dof_mask[b], dtype=dtype)
      return (d.cdof_dot * (d.qvel * mask)[:, None]).sum(0)

    def _point_jdot_qdot(b: int, p):
      """J̇q̇ of the translational point Jacobian of p on body b."""
      off = p - d.subtree_com[tp.body_rootid[b]]
      v_p = d.cvel[b, 3:] + jnp.cross(d.cvel[b, :3], off)
      bias = _body_bias(b)
      return bias[3:] + jnp.cross(bias[:3], off) + jnp.cross(d.cvel[b, :3], v_p)

    for e in np.nonzero(tp.eq_active0)[0]:
      et = int(tp.eq_type[e])
      is_site = int(tp.eq_objtype[e]) == int(_mj.mjtObj.mjOBJ_SITE)
      if et == int(_mj.mjtEq.mjEQ_CONNECT):
        if is_site:
          # Site semantics: the two site points coincide; eq_data unused.
          s1, s2 = int(tp.eq_obj1id[e]), int(tp.eq_obj2id[e])
          b1, b2 = int(tp.site_bodyid[s1]), int(tp.site_bodyid[s2])
          p1 = d.site_xpos[s1]
          p2 = d.site_xpos[s2]
        else:
          b1, b2 = int(tp.eq_obj1id[e]), int(tp.eq_obj2id[e])
          a1 = m.eq_data[e, 0:3].astype(dtype)
          a2 = m.eq_data[e, 3:6].astype(dtype)
          p1 = d.xpos[b1] + d.xmat[b1] @ a1
          p2 = d.xpos[b2] + d.xmat[b2] @ a2
        J = _point_jac(b1, p1) - _point_jac(b2, p2)  # (3, nv)
        pos = p1 - p2
        jd = _point_jdot_qdot(b1, p1) - _point_jdot_qdot(b2, p2)
        iw = jnp.broadcast_to(
          m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0], (3,)
        )
        nrows = 3
      elif et == int(_mj.mjtEq.mjEQ_JOINT):
        j1, j2 = int(tp.eq_obj1id[e]), int(tp.eq_obj2id[e])
        q1 = d.qpos[int(tp.jnt_qposadr[j1])]
        q1_0 = m.qpos0[int(tp.jnt_qposadr[j1])]
        coef = m.eq_data[e, 0:5].astype(dtype)
        row = np.zeros(tp.nv)
        row[int(tp.jnt_dofadr[j1])] = 1.0
        J = jnp.asarray(row[None], dtype=dtype)
        iw_val = m.dof_invweight0[int(tp.jnt_dofadr[j1])]
        if j2 >= 0:
          q2 = d.qpos[int(tp.jnt_qposadr[j2])]
          dq = q2 - m.qpos0[int(tp.jnt_qposadr[j2])]
          powers = jnp.stack(
            [jnp.ones_like(dq), dq, dq**2, dq**3, dq**4]
          )
          dpowers = jnp.stack(
            [jnp.zeros_like(dq), jnp.ones_like(dq), 2 * dq, 3 * dq**2,
             4 * dq**3]
          )
          poly = coef @ powers
          dpoly = coef @ dpowers
          e2 = jnp.zeros(tp.nv, dtype=dtype).at[int(tp.jnt_dofadr[j2])].set(
            -dpoly
          )
          J = J + e2[None]
          pos = (q1 - q1_0 - poly).reshape(1)
          iw_val = iw_val + m.dof_invweight0[int(tp.jnt_dofadr[j2])]
        else:
          pos = (q1 - q1_0 - coef[0]).reshape(1)
        jd = jnp.zeros(1, dtype=dtype)  # mujoco omits J̇q̇ for joint eqs (probed)
        iw = jnp.broadcast_to(iw_val, (1,))
        nrows = 1
      elif et == int(_mj.mjtEq.mjEQ_TENDON):
        # Tendon coupling: L1 − L1₀ = poly(L2 − L2₀); lengths/Jacobians
        # come from Data.ten_length/ten_J (smooth.tendon), which covers
        # fixed and spatial tendons alike.
        t1, t2 = int(tp.eq_obj1id[e]), int(tp.eq_obj2id[e])
        coef = m.eq_data[e, 0:5].astype(dtype)
        L1 = d.ten_length[t1]
        vm1 = d.ten_J[t1]
        L1_0 = float(tp.tendon_length0[t1])
        iw_val = float(tp.tendon_invweight0[t1])
        if t2 >= 0:
          vm2 = d.ten_J[t2]
          dl = d.ten_length[t2] - float(tp.tendon_length0[t2])
          powers = jnp.stack([jnp.ones_like(dl), dl, dl**2, dl**3, dl**4])
          dpowers = jnp.stack(
            [jnp.zeros_like(dl), jnp.ones_like(dl), 2 * dl, 3 * dl**2,
             4 * dl**3]
          )
          pos = (L1 - L1_0 - coef @ powers).reshape(1)
          J = (vm1 - (coef @ dpowers) * vm2)[None]
          iw_val = iw_val + float(tp.tendon_invweight0[t2])
        else:
          pos = (L1 - L1_0 - coef[0]).reshape(1)
          J = vm1[None]
        jd = jnp.zeros(1, dtype=dtype)
        iw = jnp.broadcast_to(jnp.asarray(iw_val, dtype=dtype), (1,))
        nrows = 1
      elif et == int(_mj.mjtEq.mjEQ_WELD):
        torquescale = m.eq_data[e, 10].astype(dtype)
        if is_site:
          # Site semantics: weld the two site frames (positions coincide,
          # orientations match through the constant site offsets);
          # eq_data[0:10] unused. The rotational closed form below carries
          # over because a site frame has the same world angular velocity
          # as its body — only q_ref/q_fol gain constant right-offsets.
          s1, s2 = int(tp.eq_obj1id[e]), int(tp.eq_obj2id[e])
          b1, b2 = int(tp.site_bodyid[s1]), int(tp.site_bodyid[s2])
          p1 = d.site_xpos[s1]
          p2 = d.site_xpos[s2]
          off1 = mt.quat_normalize(m.site_quat[s1].astype(dtype))
          off2 = mt.quat_normalize(m.site_quat[s2].astype(dtype))
        else:
          b1, b2 = int(tp.eq_obj1id[e]), int(tp.eq_obj2id[e])
          anchor = m.eq_data[e, 0:3].astype(dtype)  # in body2 frame
          relpose = m.eq_data[e, 3:6].astype(dtype)  # body1 pos of body2
          relquat = m.eq_data[e, 6:10].astype(dtype)  # body1 quat of body2
          # Position residual: body2's anchor (in body2 frame) vs the target
          # point fixed in body1 at relpose_pos — mujoco stores the anchor
          # offset already folded into relpose (probed; mj_instantiateEquality
          # weld semantics, MJX eq_weld equivalent).
          p2 = d.xpos[b2] + d.xmat[b2] @ anchor
          p1 = d.xpos[b1] + d.xmat[b1] @ relpose
          off1 = mt.quat_normalize(relquat)
          off2 = None
        Jp = _point_jac(b1, p1) - _point_jac(b2, p2)
        pos_p = p1 - p2
        # Orientation residual: vector part of q_err = conj(q1·off1)·(q2·off2),
        # scaled by torquescale.
        q1q = d.xquat[b1]
        q2q = d.xquat[b2]
        q_ref = mt.quat_mul(q1q, off1)
        q_fol = q2q if off2 is None else mt.quat_mul(q2q, off2)
        q_err = mt.quat_mul(mt.quat_conjugate(q_ref), q_fol)
        pos_r = -torquescale * q_err[1:]  # mujoco sign: body1 − body2
        # Rotational Jacobian: dvec(q_err)/dqvel. With ω_rel the world-frame
        # relative angular velocity (body2 − body1), expressed in the q_ref
        # frame: dq_err/dt = 0.5 · q_err ⊗ [0, ω_local], whose vector part
        # is 0.5·(w·ω + vec×ω) — the G(q_err) map below.
        mask1 = jnp.asarray(tp.body_dof_mask[b1], dtype=dtype)
        mask2 = jnp.asarray(tp.body_dof_mask[b2], dtype=dtype)
        Jw = (ang_v * (mask2 - mask1)[:, None]).T  # (3, nv) world ang vel
        R_ref = mt.quat_to_mat(q_ref)
        Jw_local = R_ref.T @ Jw
        w_, x_, y_, z_ = q_err[0], q_err[1], q_err[2], q_err[3]
        G = 0.5 * jnp.asarray(
          [[w_, z_, -y_], [-z_, w_, x_], [y_, -x_, w_]], dtype=dtype
        )
        Jr = -torquescale * (G @ Jw_local)
        J = jnp.concatenate([Jp, Jr], axis=0)
        pos = jnp.concatenate([pos_p, pos_r])
        # J̇q̇: translational rows via the point-bias identity; rotational
        # rows as the second directional derivative of the quaternion
        # residual along the flow (r̈|q̈=0 = J̇q̇), via nested jvp through
        # FK — exact by construction, only traced for weld models.
        jd_p = _point_jdot_qdot(b1, p1) - _point_jdot_qdot(b2, p2)
        from mjlab_tpu.physics import kinematics as _kin

        def _rot_res(qp, _b1=b1, _b2=b2, _o1=off1, _o2=off2, _ts=torquescale):
          dk = _kin.kinematics(tp, m, d.replace(qpos=qp))
          qr = mt.quat_mul(dk.xquat[_b1], _o1)
          qf = dk.xquat[_b2] if _o2 is None else mt.quat_mul(dk.xquat[_b2], _o2)
          qe = mt.quat_mul(mt.quat_conjugate(qr), qf)
          return -_ts * qe[1:]

        def _qdot(qp):
          return jax.jvp(
            lambda h: _kin.integrate_pos(tp, m, qp, d.qvel, h),
            (jnp.zeros((), dtype=dtype),),
            (jnp.ones((), dtype=dtype),),
          )[1]

        def _rdot(qp, _res=_rot_res):
          return jax.jvp(_res, (qp,), (_qdot(qp),))[1]

        jd_r = jax.jvp(_rdot, (d.qpos,), (_qdot(d.qpos),))[1]
        jd = jnp.concatenate([jd_p, jd_r])
        iw = jnp.concatenate(
          [
            jnp.broadcast_to(
              m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0], (3,)
            ),
            jnp.broadcast_to(
              m.body_invweight0[b1, 1] + m.body_invweight0[b2, 1], (3,)
            ),
          ]
        )
        nrows = 6
      else:  # pragma: no cover — rejected at conversion (io.py)
        raise NotImplementedError(f"equality type {et}")

      zeros = jnp.zeros(nrows, dtype=dtype)
      D, aref = _eq_rows_from(
        J, pos, m.eq_solref[e], m.eq_solimp[e], iw, jd
      )
      J_parts.append(J)
      D_parts.append(D)
      aref_parts.append(aref)
      pos_parts.append(pos)
      margin_parts.append(zeros)
      fl_parts.append(zeros)

  # 1) Dof friction rows.
  fd = tp.friction_dof_ids
  if len(fd):
    J = jnp.asarray(np.eye(nv)[fd], dtype=dtype)
    zeros = jnp.zeros(len(fd), dtype=dtype)
    D, aref, fl = _rows_from(
      J, zeros, zeros, m.dof_solref[fd], m.dof_solimp[fd],
      m.dof_invweight0[fd], d.qvel, include=jnp.ones(len(fd), dtype=bool),
      frictionloss=m.dof_frictionloss[fd],
    )
    J_parts.append(J)
    D_parts.append(D)
    aref_parts.append(aref)
    pos_parts.append(zeros)
    margin_parts.append(zeros)
    fl_parts.append(fl)

  # 2) Joint limit rows (hinge/slide, nearest side).
  lj = tp.limited_joint_ids
  if len(lj):
    qadr = tp.jnt_qposadr[lj]
    dadr = tp.jnt_dofadr[lj]
    q = d.qpos[qadr]
    dist_lo = q - m.jnt_range[lj, 0]
    dist_hi = m.jnt_range[lj, 1] - q
    lower = dist_lo < dist_hi
    dist = jnp.where(lower, dist_lo, dist_hi)
    sign = jnp.where(lower, 1.0, -1.0).astype(dtype)
    J = jnp.asarray(np.eye(nv)[dadr], dtype=dtype) * sign[:, None]
    margin = m.jnt_margin[lj]
    D, aref, fl = _rows_from(
      J, dist, margin, m.jnt_solref[lj], m.jnt_solimp[lj],
      m.dof_invweight0[dadr], d.qvel, include=dist < margin,
    )
    J_parts.append(J)
    D_parts.append(D)
    aref_parts.append(aref)
    pos_parts.append(dist)
    margin_parts.append(margin)
    fl_parts.append(fl)

  # 2b) Ball-joint limit rows: one cone-angle row per limited ball joint —
  # dist = range_max − ‖rotvec(q_ball)‖, J = −axis on the joint's 3 dofs
  # (local frame; ball dof velocity is the local angular velocity). Rows
  # follow the hinge/slide block rather than interleaving by joint id —
  # numerically order-free, only the efc row ORDER differs from mujoco on
  # models mixing limited ball and hinge/slide joints.
  bj = tp.limited_ball_joint_ids
  if len(bj):
    for j in bj:
      qadr = int(tp.jnt_qposadr[j])
      dadr = int(tp.jnt_dofadr[j])
      q = d.qpos[qadr : qadr + 4]
      vec = q[1:]
      sin_half = jnp.linalg.norm(vec)
      angle = 2.0 * jnp.arctan2(sin_half, q[0])
      axis = vec / jnp.maximum(sin_half, _MINVAL)
      dist = (m.jnt_range[j, 1] - angle).reshape(1)
      J = jnp.zeros((1, nv), dtype=dtype).at[0, dadr : dadr + 3].set(-axis)
      margin = m.jnt_margin[j].reshape(1)
      D, aref, fl = _rows_from(
        J, dist, margin, m.jnt_solref[j][None], m.jnt_solimp[j][None],
        m.dof_invweight0[dadr].reshape(1), d.qvel, include=dist < margin,
      )
      J_parts.append(J)
      D_parts.append(D)
      aref_parts.append(aref)
      pos_parts.append(dist)
      margin_parts.append(margin)
      fl_parts.append(fl)

  # 2c) Tendon limit rows (nearest side), after joint limits as in
  # MuJoCo's efc ordering.
  lt = tp.limited_tendon_ids
  if len(lt):
    L = d.ten_length[lt]
    dist_lo = L - m.tendon_range[lt, 0]
    dist_hi = m.tendon_range[lt, 1] - L
    lower = dist_lo < dist_hi
    dist = jnp.where(lower, dist_lo, dist_hi)
    sign = jnp.where(lower, 1.0, -1.0).astype(dtype)
    J = d.ten_J[lt] * sign[:, None]
    margin = m.tendon_margin[lt]
    D, aref, fl = _rows_from(
      J, dist, margin, m.tendon_solref_lim[lt], m.tendon_solimp_lim[lt],
      jnp.asarray(tp.tendon_invweight0[lt], dtype=dtype), d.qvel,
      include=dist < margin,
    )
    J_parts.append(J)
    D_parts.append(D)
    aref_parts.append(aref)
    pos_parts.append(dist)
    margin_parts.append(margin)
    fl_parts.append(fl)

  # 3) Contact rows — fully vectorized over slots.
  st = slot_tables(tp, m.opt.cone)
  if len(st.condim):
    c = d.contact
    # Relative point Jacobian for every slot: (C, 3, nv).
    origins = jnp.asarray(
      d.subtree_com[tp.body_rootid[tp.dof_bodyid]], dtype=dtype
    )  # (nv, 3)
    ang, lin = d.cdof[:, :3], d.cdof[:, 3:]
    jac = lin[None] + jnp.cross(
      ang[None], c.pos[:, None, :] - origins[None]
    )  # (C, nv, 3)
    dmask = jnp.asarray(
      tp.body_dof_mask[st.b2].astype(np.float64)
      - tp.body_dof_mask[st.b1].astype(np.float64),
      dtype=dtype,
    )  # (C, nv)
    jacp = jac * dmask[:, :, None]
    rows_nt = jnp.einsum("cij,cvj->civ", c.frame, jacp)  # (C, 3, nv)
    # Rotational rows (torsional/rolling friction, condim 4/6): contact-frame
    # components of the relative angular Jacobian.
    jacr = ang[None] * dmask[:, :, None]  # (C, nv, 3)
    rows_rot = jnp.einsum("cij,cvj->civ", c.frame, jacr)  # (C, 3, nv)

    def friction_axis_rows(idx, f):
      """Row Jacobian for friction axis f (1..5): tangentials then
      torsion/rolling (MuJoCo axis order; friction[f-1] is its μ)."""
      if f < 3:
        return rows_nt[idx, f]
      return rows_rot[idx, f - 3]

    invweight = m.body_invweight0[st.b1, 0] + m.body_invweight0[st.b2, 0]
    include = c.dist < c.includemargin

    if m.opt.cone == ConeType.ELLIPTIC:
      # Elliptic cone rows: [normal | friction dims] per contact. The normal
      # row uses the soft-constraint model; friction rows share its
      # impedance scaled by impratio·(μ_i/μ_1)² (matches MuJoCo's efc_D —
      # verified empirically via mj_constraintUpdate probing) and have
      # zero reference acceleration.
      for cd in sorted(set(st.condim.tolist())):
        idx = np.nonzero(st.condim == cd)[0]
        n_rows, inc, iw = rows_nt[idx, 0], include[idx], invweight[idx]
        pos_g = c.dist[idx]
        mar_g = c.includemargin[idx]
        D_n, aref_n, _ = _rows_from(
          n_rows, pos_g, mar_g, c.solref[idx], c.solimp[idx], iw, d.qvel, inc
        )
        if cd == 1:
          J_parts.append(n_rows)
          D_parts.append(D_n)
          aref_parts.append(aref_n)
          pos_parts.append(pos_g)
          margin_parts.append(mar_g)
          fl_parts.append(jnp.zeros_like(D_n))
          continue
        mu0 = jnp.maximum(c.friction[idx, 0], _MINVAL)
        # Friction rows: damping-only reference acceleration −b·vel (no
        # stiffness term — matches MuJoCo's efc_aref for elliptic friction
        # rows). The damping comes from solreffriction when the contact's
        # <pair> sets it (probed: efc_KBIP has K=0 and B from
        # solreffriction), else from the normal row's solref.
        sreff = c.solreffriction[idx]
        ref_fric = jnp.where(
          jnp.any(sreff != 0.0, axis=-1, keepdims=True), sreff, c.solref[idx]
        )
        _, b_g, _ = _kbi(ref_fric, c.solimp[idx], pos_g - mar_g)
        Js, Ds, arefs = [n_rows], [D_n], [aref_n]
        for f in range(1, cd):
          J_f = friction_axis_rows(idx, f)
          Js.append(J_f)
          ratio = c.friction[idx, f - 1] / mu0
          Ds.append(D_n * m.opt.impratio * ratio * ratio)
          arefs.append(-b_g * (J_f @ d.qvel))
        # Interleave per contact: rows of one contact are contiguous.
        J = jnp.stack(Js, axis=1).reshape(len(idx) * cd, nv)
        D = jnp.stack(Ds, axis=1).reshape(-1)
        aref = jnp.stack(arefs, axis=1).reshape(-1)
        rep = lambda x: jnp.repeat(x, cd, axis=0)
        J_parts.append(J)
        D_parts.append(D)
        aref_parts.append(aref)
        pos_parts.append(rep(pos_g))
        margin_parts.append(rep(mar_g))
        fl_parts.append(jnp.zeros_like(D))
      return d.replace(
        efc_J=jnp.concatenate(J_parts, axis=0),
        efc_D=jnp.concatenate(D_parts),
        efc_aref=jnp.concatenate(aref_parts),
        efc_pos=jnp.concatenate(pos_parts),
        efc_margin=jnp.concatenate(margin_parts),
        efc_frictionloss=jnp.concatenate(fl_parts),
      )

    for cd in sorted(set(st.condim.tolist())):
      idx = np.nonzero(st.condim == cd)[0]
      n_rows, inc, iw = rows_nt[idx, 0], include[idx], invweight[idx]
      pos_g = c.dist[idx]
      mar_g = c.includemargin[idx]
      ref_g, imp_g = c.solref[idx], c.solimp[idx]
      if cd == 1:
        D, aref, fl = _rows_from(
          n_rows, pos_g, mar_g, ref_g, imp_g, iw, d.qvel, inc
        )
        J_parts.append(n_rows)
        D_parts.append(D)
        aref_parts.append(aref)
        pos_parts.append(pos_g)
        margin_parts.append(mar_g)
        fl_parts.append(fl)
      else:
        nfacet = 2 * (cd - 1)
        # Facets: for each friction axis f: n ± mu_f·J_f (translational
        # tangents for f<3, rotational torsion/rolling rows for f>=3).
        # MuJoCo derives every facet's diagApprox from the SLIDING friction
        # coefficient mu_1 (all condim-6 facets share one efc_D; verified
        # empirically), so dg uses friction[0] regardless of axis.
        mu0 = c.friction[idx, 0]
        dg = 2.0 * mu0 * mu0 * (1.0 + mu0 * mu0) * iw
        Js, diags = [], []
        for f in range(1, cd):
          mu = c.friction[idx, f - 1]
          t_rows = friction_axis_rows(idx, f)
          Js.append(n_rows + mu[:, None] * t_rows)
          Js.append(n_rows - mu[:, None] * t_rows)
          diags.extend([dg, dg])
        J = jnp.stack(Js, axis=1).reshape(len(idx) * nfacet, nv)
        diag = jnp.stack(diags, axis=1).reshape(-1)
        rep = lambda x: jnp.repeat(x, nfacet, axis=0)
        D, aref, fl = _rows_from(
          J, rep(pos_g), rep(mar_g), rep(ref_g), rep(imp_g), diag,
          d.qvel, rep(inc),
        )
        J_parts.append(J)
        D_parts.append(D)
        aref_parts.append(aref)
        pos_parts.append(rep(pos_g))
        margin_parts.append(rep(mar_g))
        fl_parts.append(fl)

  return d.replace(
    efc_J=jnp.concatenate(J_parts, axis=0),
    efc_D=jnp.concatenate(D_parts),
    efc_aref=jnp.concatenate(aref_parts),
    efc_pos=jnp.concatenate(pos_parts),
    efc_margin=jnp.concatenate(margin_parts),
    efc_frictionloss=jnp.concatenate(fl_parts),
  )
