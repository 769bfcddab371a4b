"""Collision: static pair table → fixed contact slots (MJX-style).

The pair list is enumerated on host (io._candidate_pairs) with MuJoCo's
filtering rules; at runtime every pair is narrowphase-tested every step and
contacts are "active" when dist < includemargin. This gives fully static
shapes — the TPU analog of mjwarp's nconmax contact pool (reference
sim/sim.py:81-90). Contact parameters (friction/solref/solimp) are combined
in-trace from Model leaves so geom-level domain randomization flows through.

Narrowphase functions are written single-world, branchless (jnp.where), and
re-derived from standard closest-point geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import mujoco

from mjlab_tpu.physics.types import Contact, Data, GeomPair, Model, Topology

_G = mujoco.mjtGeom


def _normal_frame(n: jax.Array) -> jax.Array:
  """Build a right-handed frame (3,3) with rows [n, t1, t2] from unit normal."""
  # Pick the world axis least aligned with n for a stable tangent.
  ref = jnp.where(
    jnp.abs(n[0]) < 0.5,
    jnp.asarray([1.0, 0.0, 0.0], dtype=n.dtype),
    jnp.asarray([0.0, 1.0, 0.0], dtype=n.dtype),
  )
  t1 = jnp.cross(n, ref)
  t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2])


def _sphere_sphere(p1, r1, p2, r2):
  """Returns (dist, pos, normal) for two spheres."""
  delta = p2 - p1
  l = jnp.linalg.norm(delta)
  n = delta / jnp.maximum(l, 1e-12)
  # Degenerate concentric case: arbitrary normal.
  n = jnp.where(l < 1e-9, jnp.asarray([0.0, 0.0, 1.0], dtype=p1.dtype), n)
  dist = l - (r1 + r2)
  pos = p1 + n * (r1 + 0.5 * dist)
  return dist, pos, n


def _closest_segment_point(a, b, p):
  ab = b - a
  t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12)
  return a + jnp.clip(t, 0.0, 1.0) * ab


def _closest_segment_segment(a0, a1, b0, b1):
  """Closest points between two segments (branchless clamped solve)."""
  da = a1 - a0
  db = b1 - b0
  r = a0 - b0
  A = jnp.dot(da, da)
  B = jnp.dot(da, db)
  C = jnp.dot(db, db)
  D = jnp.dot(da, r)
  E = jnp.dot(db, r)
  denom = A * C - B * B
  s = jnp.where(denom > 1e-12, (B * E - C * D) / jnp.maximum(denom, 1e-12), 0.0)
  s = jnp.clip(s, 0.0, 1.0)
  t = (B * s + E) / jnp.maximum(C, 1e-12)
  t = jnp.clip(t, 0.0, 1.0)
  s = jnp.clip((B * t - D) / jnp.maximum(A, 1e-12), 0.0, 1.0)
  return a0 + s * da, b0 + t * db


def _sphere_box(p, r, box_pos, box_mat, box_size):
  """Sphere vs box; handles center-inside-box penetration."""
  local = box_mat.T @ (p - box_pos)
  clamped = jnp.clip(local, -box_size, box_size)
  delta = local - clamped
  outside_d = jnp.linalg.norm(delta)
  inside = outside_d < 1e-9
  # Inside: push to the nearest face.
  face_d = box_size - jnp.abs(local)
  k = jnp.argmin(face_d)
  sign = jnp.sign(local)
  n_in_local = sign * jax.nn.one_hot(k, 3, dtype=p.dtype)
  surf_in = local + n_in_local * face_d[k]
  n_out_local = delta / jnp.maximum(outside_d, 1e-12)
  n_local = jnp.where(inside, n_in_local, n_out_local)
  surface_local = jnp.where(inside, surf_in, clamped)
  dist = jnp.where(inside, -face_d[k], outside_d) - r
  n_world = box_mat @ n_local
  surface_world = box_pos + box_mat @ surface_local
  # Normal points box → sphere; contact pos midway between surfaces.
  pos = surface_world + n_world * 0.5 * dist
  return dist, pos, n_world


# ---------------------------------------------------------------------------
# Pair narrowphase: each returns (dist (k,), pos (k,3), frame (k,3,3)) with the
# normal pointing geom1 → geom2 (MuJoCo convention).
# ---------------------------------------------------------------------------


def _plane_sphere(m, d, p: GeomPair):
  n = d.geom_xmat[p.geom1][:, 2]
  c = d.geom_xpos[p.geom2]
  r = m.geom_size[p.geom2, 0]
  dist = jnp.dot(n, c - d.geom_xpos[p.geom1]) - r
  pos = c - n * (r + 0.5 * dist)
  return dist[None], pos[None], _normal_frame(n)[None]


def _plane_capsule(m, d, p: GeomPair):
  n = d.geom_xmat[p.geom1][:, 2]
  c = d.geom_xpos[p.geom2]
  axis = d.geom_xmat[p.geom2][:, 2]
  r, hl = m.geom_size[p.geom2, 0], m.geom_size[p.geom2, 1]
  frame = _normal_frame(n)
  dists, poss = [], []
  for sgn in (1.0, -1.0):
    e = c + axis * (sgn * hl)
    dist = jnp.dot(n, e - d.geom_xpos[p.geom1]) - r
    poss.append(e - n * (r + 0.5 * dist))
    dists.append(dist)
  return jnp.stack(dists), jnp.stack(poss), jnp.stack([frame, frame])


def _plane_box(m, d, p: GeomPair):
  n = d.geom_xmat[p.geom1][:, 2]
  pp = d.geom_xpos[p.geom1]
  bp, bm = d.geom_xpos[p.geom2], d.geom_xmat[p.geom2]
  size = m.geom_size[p.geom2]
  corners = jnp.asarray(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=bp.dtype,
  ) * size
  world = bp + corners @ bm.T  # (8, 3)
  dist8 = world @ n - jnp.dot(n, pp)
  neg, idx = jax.lax.top_k(-dist8, 4)  # 4 deepest corners
  dist = -neg
  pos = world[idx] - n[None, :] * (0.5 * dist)[:, None]
  frame = jnp.tile(_normal_frame(n)[None], (4, 1, 1))
  return dist, pos, frame


def _plane_cylinder(m, d, p: GeomPair):
  """Approximate: 4 rim points of the two end caps nearest the plane."""
  n = d.geom_xmat[p.geom1][:, 2]
  pp = d.geom_xpos[p.geom1]
  cp, cm = d.geom_xpos[p.geom2], d.geom_xmat[p.geom2]
  r, hl = m.geom_size[p.geom2, 0], m.geom_size[p.geom2, 1]
  axis = cm[:, 2]
  # Radial direction of steepest descent along the plane normal.
  proj = n - axis * jnp.dot(n, axis)
  pnorm = jnp.linalg.norm(proj)
  radial = jnp.where(pnorm > 1e-8, -proj / jnp.maximum(pnorm, 1e-12), cm[:, 0])
  pts = []
  for sgn_ax in (1.0, -1.0):
    for sgn_r in (1.0, -1.0):
      pts.append(cp + axis * (sgn_ax * hl) + radial * (sgn_r * r))
  pts = jnp.stack(pts)
  dist = pts @ n - jnp.dot(n, pp)
  pos = pts - n[None] * (0.5 * dist)[:, None]
  frame = jnp.tile(_normal_frame(n)[None], (4, 1, 1))
  return dist, pos, frame


def _plane_ellipsoid(m, d, p: GeomPair):
  n = d.geom_xmat[p.geom1][:, 2]
  ep, em = d.geom_xpos[p.geom2], d.geom_xmat[p.geom2]
  size = m.geom_size[p.geom2]
  # Support point of ellipsoid in -n direction.
  n_local = em.T @ (-n)
  v = size * size * n_local
  denom = jnp.sqrt(jnp.dot(n_local, v))
  support_local = v / jnp.maximum(denom, 1e-12)
  sp = ep + em @ support_local
  dist = jnp.dot(n, sp - d.geom_xpos[p.geom1])
  pos = sp - n * 0.5 * dist
  return dist[None], pos[None], _normal_frame(n)[None]


def _sphere_sphere_pair(m, d, p: GeomPair):
  dist, pos, n = _sphere_sphere(
    d.geom_xpos[p.geom1], m.geom_size[p.geom1, 0],
    d.geom_xpos[p.geom2], m.geom_size[p.geom2, 0],
  )
  return dist[None], pos[None], _normal_frame(n)[None]


def _sphere_capsule(m, d, p: GeomPair):
  c = d.geom_xpos[p.geom2]
  axis = d.geom_xmat[p.geom2][:, 2]
  hl = m.geom_size[p.geom2, 1]
  seg_pt = _closest_segment_point(c - axis * hl, c + axis * hl, d.geom_xpos[p.geom1])
  dist, pos, n = _sphere_sphere(
    d.geom_xpos[p.geom1], m.geom_size[p.geom1, 0], seg_pt, m.geom_size[p.geom2, 0]
  )
  return dist[None], pos[None], _normal_frame(n)[None]


def _sphere_box_pair(m, d, p: GeomPair):
  dist, pos, n = _sphere_box(
    d.geom_xpos[p.geom1], m.geom_size[p.geom1, 0],
    d.geom_xpos[p.geom2], d.geom_xmat[p.geom2], m.geom_size[p.geom2],
  )
  # _sphere_box normal points box → sphere = geom2 → geom1; flip.
  return dist[None], pos[None], _normal_frame(-n)[None]


def _capsule_capsule(m, d, p: GeomPair):
  c1, a1 = d.geom_xpos[p.geom1], d.geom_xmat[p.geom1][:, 2]
  c2, a2 = d.geom_xpos[p.geom2], d.geom_xmat[p.geom2][:, 2]
  h1, h2 = m.geom_size[p.geom1, 1], m.geom_size[p.geom2, 1]
  pt1, pt2 = _closest_segment_segment(
    c1 - a1 * h1, c1 + a1 * h1, c2 - a2 * h2, c2 + a2 * h2
  )
  dist, pos, n = _sphere_sphere(
    pt1, m.geom_size[p.geom1, 0], pt2, m.geom_size[p.geom2, 0]
  )
  return dist[None], pos[None], _normal_frame(n)[None]


def _capsule_box(m, d, p: GeomPair):
  """Two sphere-box contacts at the capsule's closest segment samples."""
  c, axis = d.geom_xpos[p.geom1], d.geom_xmat[p.geom1][:, 2]
  r, hl = m.geom_size[p.geom1, 0], m.geom_size[p.geom1, 1]
  bp, bm, bs = d.geom_xpos[p.geom2], d.geom_xmat[p.geom2], m.geom_size[p.geom2]
  # Closest point on the capsule axis segment to the box center, plus the
  # nearer endpoint, gives two support samples.
  near = _closest_segment_point(c - axis * hl, c + axis * hl, bp)
  t_end = jnp.where(jnp.dot(near - c, axis) >= 0, 1.0, -1.0)
  samples = [near, c + axis * (t_end * hl)]
  dists, poss, frames = [], [], []
  for s in samples:
    dist, pos, n = _sphere_box(s, r, bp, bm, bs)
    dists.append(dist)
    poss.append(pos)
    frames.append(_normal_frame(-n))
  return jnp.stack(dists), jnp.stack(poss), jnp.stack(frames)


_DISPATCH = {
  (_G.mjGEOM_PLANE, _G.mjGEOM_SPHERE): _plane_sphere,
  (_G.mjGEOM_PLANE, _G.mjGEOM_CAPSULE): _plane_capsule,
  (_G.mjGEOM_PLANE, _G.mjGEOM_BOX): _plane_box,
  (_G.mjGEOM_PLANE, _G.mjGEOM_CYLINDER): _plane_cylinder,
  (_G.mjGEOM_PLANE, _G.mjGEOM_ELLIPSOID): _plane_ellipsoid,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_SPHERE): _sphere_sphere_pair,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_CAPSULE): _sphere_capsule,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_BOX): _sphere_box_pair,
  (_G.mjGEOM_CAPSULE, _G.mjGEOM_CAPSULE): _capsule_capsule,
  (_G.mjGEOM_CAPSULE, _G.mjGEOM_BOX): _capsule_box,
}


def _combine_params(tp: Topology, m: Model, p: GeomPair):
  """Contact parameter mixing (mj_contactParam semantics), in-trace so that
  geom-level domain randomization (e.g. geom_friction) takes effect."""
  g1, g2 = p.geom1, p.geom2
  p1, p2 = int(tp.geom_priority[g1]), int(tp.geom_priority[g2])
  margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
  gap = jnp.maximum(m.geom_gap[g1], m.geom_gap[g2])
  if p1 != p2:
    hi = g1 if p1 > p2 else g2
    fri3 = m.geom_friction[hi]
    solref = m.geom_solref[hi]
    solimp = m.geom_solimp[hi]
  else:
    s1 = jnp.maximum(m.geom_solmix[g1], 1e-12)
    s2 = jnp.maximum(m.geom_solmix[g2], 1e-12)
    w1 = s1 / (s1 + s2)
    w2 = s2 / (s1 + s2)
    fri3 = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
    solref = w1 * m.geom_solref[g1] + w2 * m.geom_solref[g2]
    # Direct (negative) solref: element-wise min (mjx/mujoco behavior).
    direct = (m.geom_solref[g1, 0] <= 0) | (m.geom_solref[g2, 0] <= 0)
    solref = jnp.where(
      direct, jnp.minimum(m.geom_solref[g1], m.geom_solref[g2]), solref
    )
    solimp = w1 * m.geom_solimp[g1] + w2 * m.geom_solimp[g2]
  friction = jnp.stack([fri3[0], fri3[0], fri3[1], fri3[2], fri3[2]])
  return friction, solref, solimp, margin, gap


def collision(tp: Topology, m: Model, d: Data) -> Data:
  """Run narrowphase on every static pair; fill the contact slots."""
  if tp.ncon_max == 0:
    return d
  dists, poss, frames = [], [], []
  fris, refs, imps, margins = [], [], [], []
  for p in tp.pairs:
    fn = _DISPATCH[(p.type1, p.type2)]
    dist, pos, frame = fn(m, d, p)
    friction, solref, solimp, margin, gap = _combine_params(tp, m, p)
    k = p.ncon
    dists.append(dist)
    poss.append(pos)
    frames.append(frame)
    fris.append(jnp.tile(friction[None], (k, 1)))
    refs.append(jnp.tile(solref[None], (k, 1)))
    imps.append(jnp.tile(solimp[None], (k, 1)))
    margins.append(jnp.tile((margin - gap)[None], (k,)))
  contact = Contact(
    dist=jnp.concatenate(dists),
    pos=jnp.concatenate(poss),
    frame=jnp.concatenate(frames),
    includemargin=jnp.concatenate(margins),
    friction=jnp.concatenate(fris),
    solref=jnp.concatenate(refs),
    solimp=jnp.concatenate(imps),
  )
  return d.replace(contact=contact)
