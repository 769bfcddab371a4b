"""Constraint assembly: Jacobians, impedances, reference accelerations.

Implements MuJoCo's soft-constraint model (dof friction, joint limits,
frictional contacts with pyramidal cones) with fully static row allocation:
row i's meaning is fixed at trace time; inactive rows are masked by the
solver's activation rule. Row order: [dof friction | joint limits | contacts],
matching MuJoCo's relative ordering for per-row parity testing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.physics.io import contact_rows
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
  y = jnp.where(
    x < mid, a * jnp.power(x, power), 1 - b * jnp.power(1 - x, power)
  )
  return jnp.clip(dmin + y * (dmax - dmin), _MINIMP, _MAXIMP)


def _kbi(
  solref: jax.Array, solimp: jax.Array, pos: jax.Array, dmax_override=None
) -> tuple[jax.Array, jax.Array, jax.Array]:
  """Stiffness k, damping b, impedance imp from solver parameters."""
  imp = _impedance(solimp, pos)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  std = timeconst > 0  # standard (timeconst, dampratio) parametrization
  b_std = 2.0 / jnp.maximum(dmax * timeconst, _MINVAL)
  k_std = 1.0 / jnp.maximum(
    dmax * dmax * timeconst * timeconst * dampratio * dampratio, _MINVAL
  )
  b = jnp.where(std, b_std, -solref[..., 1] / dmax)
  k = jnp.where(std, k_std, -solref[..., 0] / (dmax * dmax))
  return k, b, imp


def _point_jacobian(
  tp: Topology, d: Data, point: jax.Array, body: int
) -> jax.Array:
  """Translational Jacobian (3, nv) of a world point on `body`."""
  # Velocity at point p from dof j: cdof_lin + cdof_ang × (p - origin_j).
  origins = d.subtree_com[tp.body_rootid[tp.dof_bodyid]]  # (nv, 3)
  ang = d.cdof[:, :3]
  lin = d.cdof[:, 3:]
  jac = lin + jnp.cross(ang, point[None, :] - origins)  # (nv, 3)
  mask = jnp.asarray(tp.body_dof_mask[body], dtype=d.qpos.dtype)  # (nv,)
  return (jac * mask[:, None]).T


def make_constraint(tp: Topology, m: Model, d: Data) -> Data:
  """Build efc rows: J, D, aref, pos, margin, frictionloss."""
  dtype = d.qpos.dtype
  nv = tp.nv
  if tp.nefc == 0:
    return d

  J_rows, D_rows, aref_rows, pos_rows, margin_rows, fl_rows = [], [], [], [], [], []

  def add_row(J, pos, margin, solref, solimp, diag_approx, frictionloss=0.0,
              include=True):
    """include: row participates only when True (MuJoCo drops rows with
    dist >= margin from efc entirely; we zero D instead — static shapes)."""
    k, b, imp = _kbi(solref, solimp, pos - margin)
    vel = J @ d.qvel
    aref = -b * vel - k * imp * (pos - margin)
    r = jnp.maximum((1 - imp) / imp * diag_approx, _MINVAL)
    D = jnp.where(include, 1.0 / r, 0.0)
    J_rows.append(J)
    D_rows.append(D)
    aref_rows.append(aref)
    pos_rows.append(pos)
    margin_rows.append(margin)
    fl_rows.append(jnp.asarray(frictionloss, dtype=dtype) * (include * 1.0))

  # 1) Dof friction rows (Huber cost in the solver).
  for dof in tp.friction_dof_ids:
    dof = int(dof)
    J = jnp.zeros(nv, dtype=dtype).at[dof].set(1.0)
    add_row(
      J,
      pos=jnp.asarray(0.0, dtype=dtype),
      margin=jnp.asarray(0.0, dtype=dtype),
      solref=m.dof_solref[dof],
      solimp=m.dof_solimp[dof],
      diag_approx=m.dof_invweight0[dof],
      frictionloss=m.dof_frictionloss[dof],
    )

  # 2) Joint limit rows (hinge/slide; one row, nearest side).
  for j in tp.limited_joint_ids:
    j = int(j)
    qadr, dadr = int(tp.jnt_qposadr[j]), int(tp.jnt_dofadr[j])
    q = d.qpos[qadr]
    dist_lo = q - m.jnt_range[j, 0]
    dist_hi = m.jnt_range[j, 1] - q
    lower = dist_lo < dist_hi
    dist = jnp.where(lower, dist_lo, dist_hi)
    sign = jnp.where(lower, 1.0, -1.0).astype(dtype)
    J = jnp.zeros(nv, dtype=dtype).at[dadr].set(1.0) * sign
    add_row(
      J,
      pos=dist,
      margin=m.jnt_margin[j],
      solref=m.jnt_solref[j],
      solimp=m.jnt_solimp[j],
      diag_approx=m.dof_invweight0[dadr],
      include=dist < m.jnt_margin[j],
    )

  # 3) Contact rows.
  slot = 0
  for p in tp.pairs:
    b1 = int(tp.geom_bodyid[p.geom1])
    b2 = int(tp.geom_bodyid[p.geom2])
    invweight = m.body_invweight0[b1, 0] + m.body_invweight0[b2, 0]
    for s in range(p.ncon):
      i = slot + s
      con_pos = d.contact.pos[i]
      frame = d.contact.frame[i]  # rows: n, t1, t2
      jacp = _point_jacobian(tp, d, con_pos, b2) - _point_jacobian(
        tp, d, con_pos, b1
      )  # (3, nv)
      jrows = frame @ jacp  # normal/tangent rows
      pos = d.contact.dist[i]
      margin = d.contact.includemargin[i]
      solref = d.contact.solref[i]
      solimp = d.contact.solimp[i]
      include = pos < margin
      if m.opt.cone == ConeType.PYRAMIDAL:
        if p.condim == 1:
          add_row(jrows[0], pos, margin, solref, solimp, invweight,
                  include=include)
        else:
          for fdim in range(1, p.condim):
            mu = d.contact.friction[i, fdim - 1]
            diag = 2.0 * mu * mu * (1.0 + mu * mu) * invweight
            for sgn in (1.0, -1.0):
              J = jrows[0] + sgn * mu * jrows[fdim]
              add_row(J, pos, margin, solref, solimp, diag, include=include)
      else:
        raise NotImplementedError("elliptic cone (planned)")
    slot += p.ncon

  efc_J = jnp.stack(J_rows)
  return d.replace(
    efc_J=efc_J,
    efc_D=jnp.stack(D_rows),
    efc_aref=jnp.stack(aref_rows),
    efc_pos=jnp.stack(pos_rows),
    efc_margin=jnp.stack(margin_rows),
    efc_frictionloss=jnp.stack(fl_rows),
  )


def efc_row_types(tp: Topology) -> tuple[int, int, int]:
  """(n_friction_rows, n_limit_rows, n_contact_rows) — static row partition."""
  nf = len(tp.friction_dof_ids)
  nl = len(tp.limited_joint_ids)
  nc = tp.nefc - nf - nl
  return nf, nl, nc


def contact_efc_address(tp: Topology, cone: int) -> list[int]:
  """Starting efc row of each contact slot (static)."""
  nf, nl, _ = efc_row_types(tp)
  adr = nf + nl
  out = []
  for p in tp.pairs:
    rows = contact_rows(p.condim, cone)
    for _ in range(p.ncon):
      out.append(adr)
      adr += rows
  return out
