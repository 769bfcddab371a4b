"""Collision: static pair table → fixed contact slots (MJX-style).

The pair list is enumerated on host (io._candidate_pairs) with MuJoCo's
filtering rules and sorted by geometry-type combination; at runtime each
type-group runs ONE vectorized (vmapped) narrowphase over all its pairs and
contacts are "active" when dist < includemargin. Fully static shapes — the
TPU analog of mjwarp's nconmax contact pool (reference sim/sim.py:81-90).
Contact parameters (friction/solref/solimp) are combined in-trace from Model
leaves so geom-level domain randomization flows through.

Narrowphase functions are single-pair, branchless (jnp.where), re-derived
from standard closest-point geometry, and vmapped over the pair axis.
"""

from __future__ import annotations

import itertools
import os

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.physics import convex as _cvx
from mjlab_tpu.physics.types import Contact, Data, Model, TerrainGroup, Topology

_G = mujoco.mjtGeom


def _normal_frame(n: jax.Array) -> jax.Array:
  """Right-handed frame (3,3) with rows [n, t1, t2] from unit normal."""
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
  delta = p2 - p1
  l = jnp.linalg.norm(delta)
  n = delta / jnp.maximum(l, 1e-12)
  n = jnp.where(l < 1e-9, jnp.asarray([0.0, 0.0, 1.0], dtype=p1.dtype), n)
  dist = l - (r1 + r2)
  pos = p1 + n * (r1 + 0.5 * dist)
  return dist, pos, n


def _closest_segment_point(a, b, p):
  ab = b - a
  t = jnp.dot(p - a, ab) / jnp.maximum(jnp.dot(ab, ab), 1e-12)
  return a + jnp.clip(t, 0.0, 1.0) * ab


def _closest_segment_segment(a0, a1, b0, b1):
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
  t = jnp.clip((B * s + E) / jnp.maximum(C, 1e-12), 0.0, 1.0)
  s = jnp.clip((B * t - D) / jnp.maximum(A, 1e-12), 0.0, 1.0)
  return a0 + s * da, b0 + t * db


def _sphere_box_impl(p, r, box_pos, box_mat, box_size):
  local = box_mat.T @ (p - box_pos)
  clamped = jnp.clip(local, -box_size, box_size)
  delta = local - clamped
  outside_d = jnp.linalg.norm(delta)
  inside = outside_d < 1e-9
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
  pos = surface_world + n_world * 0.5 * dist
  return dist, pos, n_world


# ---------------------------------------------------------------------------
# Single-pair narrowphase: (p1, m1, s1, p2, m2, s2) → (dist (k,), pos (k,3),
# frame (k,3,3)); normal points geom1 → geom2 (MuJoCo convention).
# ---------------------------------------------------------------------------


def _plane_sphere(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  dist = jnp.dot(n, p2 - p1) - s2[0]
  pos = p2 - n * (s2[0] + 0.5 * dist)
  return dist[None], pos[None], _normal_frame(n)[None]


def _plane_capsule(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  axis = m2[:, 2]
  r, hl = s2[0], s2[1]
  frame = _normal_frame(n)
  ends = jnp.stack([p2 + axis * hl, p2 - axis * hl])
  dist = ends @ n - jnp.dot(n, p1) - r
  pos = ends - n[None] * (r + 0.5 * dist)[:, None]
  return dist, pos, jnp.stack([frame, frame])


def _plane_box(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  corners = (
    jnp.asarray(
      [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
      dtype=p1.dtype,
    )
    * s2
  )
  world = p2 + corners @ m2.T
  dist8 = world @ n - jnp.dot(n, p1)
  neg, idx = jax.lax.top_k(-dist8, 4)
  dist = -neg
  pos = world[idx] - n[None, :] * (0.5 * dist)[:, None]
  return dist, pos, jnp.tile(_normal_frame(n)[None], (4, 1, 1))


def _plane_cylinder(p1, m1, s1, p2, m2, s2):
  """Approximate: 4 rim points of the end caps nearest the plane."""
  n = m1[:, 2]
  r, hl = s2[0], s2[1]
  axis = m2[:, 2]
  proj = n - axis * jnp.dot(n, axis)
  pnorm = jnp.linalg.norm(proj)
  radial = jnp.where(pnorm > 1e-8, -proj / jnp.maximum(pnorm, 1e-12), m2[:, 0])
  offs = jnp.stack(
    [
      axis * hl + radial * r,
      axis * hl - radial * r,
      -axis * hl + radial * r,
      -axis * hl - radial * r,
    ]
  )
  pts = p2 + offs
  dist = pts @ n - jnp.dot(n, p1)
  pos = pts - n[None] * (0.5 * dist)[:, None]
  return dist, pos, jnp.tile(_normal_frame(n)[None], (4, 1, 1))


def _plane_ellipsoid(p1, m1, s1, p2, m2, s2):
  n = m1[:, 2]
  n_local = m2.T @ (-n)
  v = s2 * s2 * n_local
  denom = jnp.sqrt(jnp.dot(n_local, v))
  sp = p2 + m2 @ (v / jnp.maximum(denom, 1e-12))
  dist = jnp.dot(n, sp - p1)
  pos = sp - n * 0.5 * dist
  return dist[None], pos[None], _normal_frame(n)[None]


def _sphere_sphere_pair(p1, m1, s1, p2, m2, s2):
  dist, pos, n = _sphere_sphere(p1, s1[0], p2, s2[0])
  return dist[None], pos[None], _normal_frame(n)[None]


def _sphere_capsule(p1, m1, s1, p2, m2, s2):
  axis, hl = m2[:, 2], s2[1]
  seg_pt = _closest_segment_point(p2 - axis * hl, p2 + axis * hl, p1)
  dist, pos, n = _sphere_sphere(p1, s1[0], seg_pt, s2[0])
  return dist[None], pos[None], _normal_frame(n)[None]


def _sphere_box(p1, m1, s1, p2, m2, s2):
  dist, pos, n = _sphere_box_impl(p1, s1[0], p2, m2, s2)
  # _sphere_box_impl normal points box → sphere = geom2 → geom1; flip.
  return dist[None], pos[None], _normal_frame(-n)[None]


def _capsule_capsule(p1, m1, s1, p2, m2, s2):
  a1, h1 = m1[:, 2], s1[1]
  a2, h2 = m2[:, 2], s2[1]
  pt1, pt2 = _closest_segment_segment(
    p1 - a1 * h1, p1 + a1 * h1, p2 - a2 * h2, p2 + a2 * h2
  )
  dist, pos, n = _sphere_sphere(pt1, s1[0], pt2, s2[0])
  return dist[None], pos[None], _normal_frame(n)[None]


def _capsule_box(p1, m1, s1, p2, m2, s2):
  axis, r, hl = m1[:, 2], s1[0], s1[1]
  near = _closest_segment_point(p1 - axis * hl, p1 + axis * hl, p2)
  t_end = jnp.where(jnp.dot(near - p1, axis) >= 0, 1.0, -1.0)
  end = p1 + axis * (t_end * hl)
  d0, q0, n0 = _sphere_box_impl(near, r, p2, m2, s2)
  d1, q1, n1 = _sphere_box_impl(end, r, p2, m2, s2)
  return (
    jnp.stack([d0, d1]),
    jnp.stack([q0, q1]),
    jnp.stack([_normal_frame(-n0), _normal_frame(-n1)]),
  )


def _closest_triangle_point(a, b, c, p):
  """Closest point on triangle abc to p (Ericson's method, branchless)."""
  ab = b - a
  ac = c - a
  ap = p - a
  d1 = jnp.dot(ab, ap)
  d2 = jnp.dot(ac, ap)
  bp = p - b
  d3 = jnp.dot(ab, bp)
  d4 = jnp.dot(ac, bp)
  cp = p - c
  d5 = jnp.dot(ab, cp)
  d6 = jnp.dot(ac, cp)
  va = d3 * d6 - d5 * d4
  vb = d5 * d2 - d1 * d6
  vc = d1 * d4 - d3 * d2
  denom = jnp.maximum(va + vb + vc, 1e-12)
  v = vb / denom
  w = vc / denom
  q = a + v * ab + w * ac  # interior case
  # Vertex / edge regions.
  q = jnp.where((vc <= 0) & (d1 >= 0) & (d3 <= 0),
                a + jnp.clip(d1 / jnp.maximum(d1 - d3, 1e-12), 0, 1) * ab, q)
  q = jnp.where((vb <= 0) & (d2 >= 0) & (d6 <= 0),
                a + jnp.clip(d2 / jnp.maximum(d2 - d6, 1e-12), 0, 1) * ac, q)
  t_bc = jnp.clip((d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), 1e-12), 0, 1)
  q = jnp.where((va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0), b + t_bc * (c - b), q)
  q = jnp.where((d1 <= 0) & (d2 <= 0), a, q)
  q = jnp.where((d3 >= 0) & (d4 <= d3), b, q)
  q = jnp.where((d6 >= 0) & (d5 <= d6), c, q)
  return q


def _hfield_cell_triangles(heights, nx, ny, size, center_local):
  """The 8 triangles of the 2×2 cell block around center_local.

  heights: (nx*ny,) normalized raster (column-major over x);
  returns (8, 3, 3) triangle vertices in the hfield frame."""
  rx, ry, elev = size[0], size[1], size[2]
  dx = 2 * rx / (nx - 1)
  dy = 2 * ry / (ny - 1)
  ix = jnp.clip(jnp.floor((center_local[0] + rx) / dx).astype(jnp.int32), 0, nx - 2)
  iy = jnp.clip(jnp.floor((center_local[1] + ry) / dy).astype(jnp.int32), 0, ny - 2)

  def vertex(i, j):
    i = jnp.clip(i, 0, nx - 1)
    j = jnp.clip(j, 0, ny - 1)
    # MuJoCo raster: data[row=j, col=i] with x along columns.
    z = heights[j * nx + i] * elev
    return jnp.stack([-rx + i * dx, -ry + j * dy, z])

  # 2×2 cell block around the containing cell.
  tris = []
  cells = [(ix, iy), (ix - 1, iy), (ix, iy - 1), (ix - 1, iy - 1)]
  for cx, cy in cells:
    cx = jnp.clip(cx, 0, nx - 2)
    cy = jnp.clip(cy, 0, ny - 2)
    v00 = vertex(cx, cy)
    v10 = vertex(cx + 1, cy)
    v01 = vertex(cx, cy + 1)
    v11 = vertex(cx + 1, cy + 1)
    tris.append(jnp.stack([v00, v10, v11]))
    tris.append(jnp.stack([v00, v11, v01]))
  return jnp.stack(tris)  # (8, 3, 3)


def _sphere_hfield_contacts(c_local, r, tris):
  """Deepest-4 sphere-vs-triangle contacts in the hfield frame."""

  def one(tri):
    q = _closest_triangle_point(tri[0], tri[1], tri[2], c_local)
    delta = c_local - q
    dn = jnp.linalg.norm(delta)
    n_tri = jnp.cross(tri[1] - tri[0], tri[2] - tri[0])
    n_tri = n_tri / jnp.maximum(jnp.linalg.norm(n_tri), 1e-12)
    n_tri = jnp.where(n_tri[2] < 0, -n_tri, n_tri)  # up-facing
    hn = jnp.dot(n_tri, delta)
    # Negative (penetrating) distance only counts when the closest point is
    # the in-plane projection of the center — i.e. the center is below THIS
    # triangle's interior. A point below the raster also sits "below the
    # plane" of every neighboring triangle in the cell block, at a large
    # *lateral* closest-point distance; counting those as −|delta| made a
    # 3 mm penetration read as −0.22 m and blew up the solver.
    lateral_sq = jnp.sum((delta - hn * n_tri) ** 2)
    below = (hn < 0) & (lateral_sq < 1e-12 + 1e-9 * dn * dn)
    n = jnp.where(dn > 1e-9, delta / jnp.maximum(dn, 1e-12), n_tri)
    n = jnp.where(below, n_tri, n)
    signed = jnp.where(below, -dn, dn)
    dist = signed - r
    pos = q + n * 0.5 * dist
    return dist, pos, n

  dists, poss, ns = jax.vmap(one)(tris)
  neg, idx = jax.lax.top_k(-dists, 4)
  return -neg, poss[idx], ns[idx]


def _plane_convex(p1, m1, p2, m2, verts):
  """Plane vs convex hull: the 4 deepest hull vertices become contacts
  (MJX-style plane-convex; verts are (V, 3) in the geom frame)."""
  n = m1[:, 2]
  world = p2 + verts @ m2.T
  depth = world @ n - jnp.dot(n, p1)
  neg, idx = jax.lax.top_k(-depth, 4)
  dist = -neg
  pos = world[idx] - n[None, :] * (0.5 * dist)[:, None]
  return dist, pos, jnp.tile(_normal_frame(n)[None], (4, 1, 1))


# ---------------------------------------------------------------------------
# Convex pairs (box-box and everything involving mesh hulls) — see convex.py.
# ---------------------------------------------------------------------------

_CONVEX_KEYS = {
  (_G.mjGEOM_BOX, _G.mjGEOM_BOX),
  (_G.mjGEOM_SPHERE, _G.mjGEOM_MESH),
  (_G.mjGEOM_CAPSULE, _G.mjGEOM_MESH),
  (_G.mjGEOM_BOX, _G.mjGEOM_MESH),
  (_G.mjGEOM_MESH, _G.mjGEOM_MESH),
}


def _convex_side(tp: Topology, m: Model, gids: np.ndarray, gtype: int, dtype):
  """Batched hull data (verts, face_verts, face_normals, edge_dirs, radius)
  for one side of a convex pair group."""
  n = len(gids)
  if gtype == int(_G.mjGEOM_MESH):
    hulls = [tp.geom_hulls[int(g)] for g in gids]
    verts, fv, fn, ed = _cvx.pad_hulls(hulls)
    return (
      jnp.asarray(verts, dtype), fv, jnp.asarray(fn, dtype),
      jnp.asarray(ed, dtype), jnp.zeros(n, dtype),
    )
  if gtype == int(_G.mjGEOM_BOX):
    h = _cvx.BOX_HULL
    verts = jnp.asarray(h.verts, dtype)[None] * m.geom_size[gids][:, None, :]
    bcast = lambda a: np.broadcast_to(a[None], (n,) + a.shape)
    return (
      verts, bcast(h.face_verts),
      jnp.broadcast_to(jnp.asarray(h.face_normals, dtype), (n,) + h.face_normals.shape),
      jnp.broadcast_to(jnp.asarray(h.edge_dirs, dtype), (n,) + h.edge_dirs.shape),
      jnp.zeros(n, dtype),
    )
  if gtype == int(_G.mjGEOM_SPHERE):
    h = _cvx.SPHERE_HULL
    bcast = lambda a: np.broadcast_to(a[None], (n,) + a.shape)
    return (
      jnp.zeros((n, 1, 3), dtype), bcast(h.face_verts),
      jnp.zeros((n, 1, 3), dtype), jnp.zeros((n, 1, 3), dtype),
      m.geom_size[gids, 0],
    )
  if gtype == int(_G.mjGEOM_CAPSULE):
    h = _cvx.CAPSULE_HULL
    hl = m.geom_size[gids, 1]
    verts = jnp.asarray(h.verts, dtype)[None] * hl[:, None, None]
    bcast = lambda a: np.broadcast_to(a[None], (n,) + a.shape)
    return (
      verts, bcast(h.face_verts),
      jnp.zeros((n, 1, 3), dtype),
      jnp.broadcast_to(jnp.asarray(h.edge_dirs, dtype), (n, 1, 3)),
      m.geom_size[gids, 0],
    )
  raise NotImplementedError(f"convex side for geom type {gtype}")


def _convex_flags(t1: int, t2: int, e1: int, e2: int) -> dict:
  """Static convex_convex kwargs per pair-type combination."""
  if t1 == int(_G.mjGEOM_SPHERE):
    return dict(use_edge_axes=False, vertex_axes=True, clip_mode="none")
  if t1 == int(_G.mjGEOM_CAPSULE):
    return dict(use_edge_axes=True, vertex_axes=True, clip_mode="1on2")
  return dict(
    use_edge_axes=e1 * e2 <= _cvx.EDGE_AXIS_BUDGET,
    vertex_axes=False,
    clip_mode="both",
  )


def _convex_group(tp: Topology, m: Model, d: Data, key, g1, g2, ncon: int):
  dtype = d.qpos.dtype
  v1, fv1, fn1, ed1, r1 = _convex_side(tp, m, g1, key[0], dtype)
  v2, fv2, fn2, ed2, r2 = _convex_side(tp, m, g2, key[1], dtype)
  flags = _convex_flags(key[0], key[1], ed1.shape[1], ed2.shape[1])

  def one(p1, m1, v1, fv1, fn1, ed1, r1, p2, m2, v2, fv2, fn2, ed2, r2):
    return _cvx.convex_convex(
      p1, m1, v1, fv1, fn1, ed1, p2, m2, v2, fv2, fn2, ed2,
      r1=r1, r2=r2, ncon=ncon, **flags,
    )

  return jax.vmap(one)(
    d.geom_xpos[g1], d.geom_xmat[g1], v1, fv1, fn1, ed1, r1,
    d.geom_xpos[g2], d.geom_xmat[g2], v2, fv2, fn2, ed2, r2,
  )


_DISPATCH = {
  (_G.mjGEOM_PLANE, _G.mjGEOM_SPHERE): _plane_sphere,
  (_G.mjGEOM_PLANE, _G.mjGEOM_CAPSULE): _plane_capsule,
  (_G.mjGEOM_PLANE, _G.mjGEOM_BOX): _plane_box,
  (_G.mjGEOM_PLANE, _G.mjGEOM_CYLINDER): _plane_cylinder,
  (_G.mjGEOM_PLANE, _G.mjGEOM_ELLIPSOID): _plane_ellipsoid,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_SPHERE): _sphere_sphere_pair,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_CAPSULE): _sphere_capsule,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_BOX): _sphere_box,
  (_G.mjGEOM_CAPSULE, _G.mjGEOM_CAPSULE): _capsule_capsule,
  (_G.mjGEOM_CAPSULE, _G.mjGEOM_BOX): _capsule_box,
}


def _combine_params_vec(
  tp: Topology,
  m: Model,
  g1: np.ndarray,
  g2: np.ndarray,
  pair_id: np.ndarray | None = None,
):
  """Vectorized mj_contactParam over a pair group (static priority masks).

  Rows with `pair_id >= 0` are explicit <pair> elements: their params come
  verbatim from Model.pair_* (mj_collision predefined-pair semantics)
  instead of geom mixing."""
  prio1 = tp.geom_priority[g1]
  prio2 = tp.geom_priority[g2]
  hi = np.where(prio1 >= prio2, g1, g2)  # used only where priorities differ
  differ = jnp.asarray(prio1 != prio2)

  s1 = jnp.maximum(m.geom_solmix[g1], 1e-12)
  s2 = jnp.maximum(m.geom_solmix[g2], 1e-12)
  w1 = (s1 / (s1 + s2))[:, None]
  w2 = (s2 / (s1 + s2))[:, None]
  fri_mix = jnp.maximum(m.geom_friction[g1], m.geom_friction[g2])
  ref_mix = w1 * m.geom_solref[g1] + w2 * m.geom_solref[g2]
  direct = ((m.geom_solref[g1, 0] <= 0) | (m.geom_solref[g2, 0] <= 0))[:, None]
  ref_mix = jnp.where(
    direct, jnp.minimum(m.geom_solref[g1], m.geom_solref[g2]), ref_mix
  )
  imp_mix = w1 * m.geom_solimp[g1] + w2 * m.geom_solimp[g2]

  fri3 = jnp.where(differ[:, None], m.geom_friction[hi], fri_mix)
  solref = jnp.where(differ[:, None], m.geom_solref[hi], ref_mix)
  solimp = jnp.where(differ[:, None], m.geom_solimp[hi], imp_mix)
  margin = jnp.maximum(m.geom_margin[g1], m.geom_margin[g2])
  friction = jnp.stack(
    [fri3[:, 0], fri3[:, 0], fri3[:, 1], fri3[:, 2], fri3[:, 2]], axis=-1
  )
  # MuJoCo >= 3.10 sets includemargin = margin; the legacy `gap` attribute
  # no longer deactivates in-gap contacts (verified empirically against the
  # installed mujoco: identical efc forces with and without gap).
  inclmargin = margin
  solreffriction = jnp.zeros_like(solref)  # zeros → friction rows use solref
  if pair_id is not None and (pair_id >= 0).any():
    sel = pair_id >= 0  # static (host) mask: pair table is topology
    pid = np.where(sel, pair_id, 0)
    friction = jnp.where(sel[:, None], m.pair_friction[pid], friction)
    solref = jnp.where(sel[:, None], m.pair_solref[pid], solref)
    solimp = jnp.where(sel[:, None], m.pair_solimp[pid], solimp)
    inclmargin = jnp.where(sel, m.pair_margin[pid], inclmargin)
    solreffriction = jnp.where(
      sel[:, None], m.pair_solreffriction[pid], solreffriction
    )
  return friction, solref, solimp, inclmargin, solreffriction


def _hfield_group(tp, m, d, key, group, g1, g2):
  """Narrowphase for (HFIELD, SPHERE|CAPSULE|BOX|MESH) pair groups.

  Approximation: contacts against the triangulated 2×2 cell block under the
  object — sphere: under its center; capsule: under each endpoint; box/mesh:
  the hull vertices sampled as point contacts against the surface.
  Behaviorally matches MuJoCo's prism collision for ground-scale rasters.
  Heights stay in Model (terrain DR flows through)."""
  dtype = d.qpos.dtype

  def pair_fn(p1, m1, p2, m2, s2, sverts, heights, nx, ny, hsize):
    if key[1] == _G.mjGEOM_SPHERE:
      c_local = m1.T @ (p2 - p1)
      tris = _hfield_cell_triangles(heights, nx, ny, hsize, c_local)
      dist, pos_l, n_l = _sphere_hfield_contacts(c_local, s2[0], tris)
    elif key[1] == _G.mjGEOM_CAPSULE:
      c_local = m1.T @ (p2 - p1)
      axis_l = m1.T @ m2[:, 2]
      r, hl = s2[0], s2[1]
      outs = []
      for sgn in (1.0, -1.0):
        e = c_local + sgn * hl * axis_l
        tris = _hfield_cell_triangles(heights, nx, ny, hsize, e)
        de, pe, ne = _sphere_hfield_contacts(e, r, tris)
        outs.append((de[:2], pe[:2], ne[:2]))
      dist = jnp.concatenate([o[0] for o in outs])
      pos_l = jnp.concatenate([o[1] for o in outs])
      n_l = jnp.concatenate([o[2] for o in outs])
    else:  # BOX / MESH: hull vertices as point samples against the surface
      Rm = m1.T @ m2
      vl = sverts @ Rm.T + (m1.T @ (p2 - p1))  # (V, 3) hfield frame

      def one_v(v):
        tris = _hfield_cell_triangles(heights, nx, ny, hsize, v)
        dv, pv, nv = _sphere_hfield_contacts(v, jnp.zeros((), dtype), tris)
        return dv[0], pv[0], nv[0]  # deepest per vertex

      dv, pv, nv = jax.vmap(one_v)(vl)
      neg, top = jax.lax.top_k(-dv, 4)
      dist, pos_l, n_l = -neg, pv[top], nv[top]
    pos_w = p1 + pos_l @ m1.T
    n_w = n_l @ m1.T
    frames = jax.vmap(_normal_frame)(n_w)
    return dist, pos_w, frames

  # Sub-group by raster shape (static per trace).
  dists, poss, frames = [], [], []
  by_shape: dict = {}
  for i, p in enumerate(group):
    hid = int(tp.geom_dataid[p.geom1])
    shape = (int(tp.hfield_ncol[hid]), int(tp.hfield_nrow[hid]))
    by_shape.setdefault(shape, []).append(i)
  order = []
  for (nx, ny), idxs in by_shape.items():
    gg1 = g1[idxs]
    gg2 = g2[idxs]
    hids = tp.geom_dataid[gg1]
    adrs = tp.hfield_adr[hids]
    heights = jnp.stack(
      [
        jax.lax.dynamic_slice(m.hfield_data, (int(a),), (nx * ny,))
        for a in adrs
      ]
    )
    hsizes = m.hfield_size[hids]
    if key[1] == _G.mjGEOM_MESH:
      hulls = [tp.geom_hulls[int(g)] for g in gg2]
      sverts = jnp.asarray(_cvx.pad_hulls(hulls)[0], dtype)
    elif key[1] == _G.mjGEOM_BOX:
      sverts = (
        jnp.asarray(_cvx.BOX_HULL.verts, dtype)[None]
        * m.geom_size[gg2][:, None, :]
      )
    else:
      sverts = jnp.zeros((len(idxs), 1, 3), dtype)
    dist, pos, frame = jax.vmap(
      lambda p1, m1, p2, m2, s2, sv, h, hs: pair_fn(
        p1, m1, p2, m2, s2, sv, h, nx, ny, hs
      )
    )(
      d.geom_xpos[gg1], d.geom_xmat[gg1],
      d.geom_xpos[gg2], d.geom_xmat[gg2], m.geom_size[gg2],
      sverts, heights, hsizes,
    )
    dists.append(dist)
    poss.append(pos)
    frames.append(frame)
    order.extend(idxs)
  # Restore original group order.
  dist = jnp.concatenate(dists)[jnp.argsort(jnp.asarray(order))]
  pos = jnp.concatenate(poss)[jnp.argsort(jnp.asarray(order))]
  frame = jnp.concatenate(frames)[jnp.argsort(jnp.asarray(order))]
  return dist.astype(dtype), pos, frame


def _combine_params_terrain(
  tp: Topology, m: Model, tg: TerrainGroup, ids: jax.Array
):
  """mj_contactParam for (static robot geom, runtime-selected terrain geom):
  like _combine_params_vec but the terrain side is gathered by traced ids.
  The priority comparison stays static (pool priority is uniform)."""
  g = tg.robot_geoms  # (R,) static
  R, S = ids.shape
  prio_r = tp.geom_priority[g]  # (R,)
  r_higher = prio_r > tg.pool_priority
  t_higher = prio_r < tg.pool_priority
  fri_r = m.geom_friction[g][:, None]  # (R, 1, 3)
  ref_r = m.geom_solref[g][:, None]
  imp_r = m.geom_solimp[g][:, None]
  # Terrain-side leaves gathered by TRACED ids: numpy model leaves must be
  # lifted to device arrays first (numpy.__getitem__(tracer) raises).
  fri_t = jnp.asarray(m.geom_friction)[ids]  # (R, S, 3)
  ref_t = jnp.asarray(m.geom_solref)[ids]
  imp_t = jnp.asarray(m.geom_solimp)[ids]

  s_r = jnp.maximum(m.geom_solmix[g], 1e-12)[:, None]
  s_t = jnp.maximum(jnp.asarray(m.geom_solmix)[ids], 1e-12)
  w_r = (s_r / (s_r + s_t))[..., None]
  w_t = 1.0 - w_r
  fri_mix = jnp.maximum(fri_r, fri_t)
  ref_mix = w_r * ref_r + w_t * ref_t
  direct = ((ref_r[..., 0] <= 0) | (ref_t[..., 0] <= 0))[..., None]
  ref_mix = jnp.where(direct, jnp.minimum(ref_r, ref_t), ref_mix)
  imp_mix = w_r * imp_r + w_t * imp_t

  pick = lambda hi_r, a_r, a_t, a_mix: jnp.where(
    np.broadcast_to(hi_r[:, None, None], (R, S, 1)),
    jnp.broadcast_to(a_r, a_t.shape),
    jnp.where(
      np.broadcast_to(t_higher[:, None, None], (R, S, 1)), a_t, a_mix
    ),
  )
  fri3 = pick(r_higher, fri_r, fri_t, fri_mix)
  solref = pick(r_higher, ref_r, ref_t, ref_mix)
  solimp = pick(r_higher, imp_r, imp_t, imp_mix)
  margin = jnp.maximum(m.geom_margin[g][:, None], jnp.asarray(m.geom_margin)[ids])
  friction = jnp.stack(
    [fri3[..., 0], fri3[..., 0], fri3[..., 1], fri3[..., 2], fri3[..., 2]],
    axis=-1,
  )
  # includemargin = margin (gap ignored since MuJoCo 3.10; see
  # _combine_params_vec).
  return friction, solref, solimp, margin


def _terrain_group_contacts(tp: Topology, m: Model, d: Data, tg: TerrainGroup):
  """Broadphase (cell hash + top-K) and narrowphase for one terrain group.

  Returns per-slot (dist, pos, frame, friction, solref, solimp,
  includemargin) with R * tg.slots rows in robot-geom order."""
  dtype = d.qpos.dtype
  rg = tg.robot_geoms
  R, K = len(rg), tg.ncand
  p = d.geom_xpos[rg]  # (R, 3)
  lo = np.asarray(tg.grid_lo)
  cells = jnp.asarray(tg.cells)
  ncx, ncy, L = tg.cells.shape
  ix = jnp.clip(
    jnp.floor((p[:, 0] - lo[0]) / tg.cell_size).astype(jnp.int32), 0, ncx - 1
  )
  iy = jnp.clip(
    jnp.floor((p[:, 1] - lo[1]) / tg.cell_size).astype(jnp.int32), 0, ncy - 1
  )
  cand = cells[ix, iy]  # (R, L) global geom ids, -1 padded
  valid = cand >= 0
  cid = jnp.maximum(cand, 0)
  bpos = d.geom_xpos[cid]  # (R, L, 3) — terrain geoms are world-static
  # Model leaves are numpy (inlined literals); traced gather indices need
  # a device array — jnp.asarray is free for jnp leaves and inlines numpy.
  bsize = jnp.asarray(m.geom_size)[cid]
  brad = jnp.linalg.norm(bsize, axis=-1)
  rrad = jnp.asarray(tg.robot_rad, dtype)[:, None]
  key = jnp.sum((p[:, None] - bpos) ** 2, axis=-1) - (brad + rrad) ** 2
  key = jnp.where(valid, key, jnp.inf)
  _, topi = jax.lax.top_k(-key, K)
  ids = jnp.take_along_axis(cid, topi, axis=1)  # (R, K)
  ok = jnp.take_along_axis(valid, topi, axis=1)

  bp = d.geom_xpos[ids]  # (R, K, 3)
  bm = d.geom_xmat[ids]
  bs = jnp.asarray(m.geom_size)[ids]
  rp = d.geom_xpos[rg]
  rm = d.geom_xmat[rg]
  rs = m.geom_size[rg]

  # Slot convention: terrain geom is geom1 (welded to world), robot geom is
  # geom2; frame normals must point terrain → robot.
  t = tg.robot_type
  if t == int(_G.mjGEOM_SPHERE):
    def one(p1, m1, s1, p2, m2, s2):
      # _sphere_box_impl's normal points box→sphere = terrain→robot.
      dist, pos, n = _sphere_box_impl(p1, s1[0], p2, m2, s2)
      return dist[None], pos[None], _normal_frame(n)[None]

    nf = jax.vmap(jax.vmap(one, in_axes=(None, None, None, 0, 0, 0)))
    dist, pos, frame = nf(rp, rm, rs, bp, bm, bs)
  elif t == int(_G.mjGEOM_CAPSULE):
    def one(p1, m1, s1, p2, m2, s2):
      # _capsule_box normals point capsule→box (robot→terrain): flip.
      dist, pos, frame = _capsule_box(p1, m1, s1, p2, m2, s2)
      return dist, pos, jax.vmap(_normal_frame)(-frame[:, 0])

    nf = jax.vmap(jax.vmap(one, in_axes=(None, None, None, 0, 0, 0)))
    dist, pos, frame = nf(rp, rm, rs, bp, bm, bs)
  elif t in (int(_G.mjGEOM_BOX), int(_G.mjGEOM_MESH)):
    if t == int(_G.mjGEOM_BOX):
      h = _cvx.BOX_HULL
      rverts = jnp.asarray(h.verts, dtype)[None] * rs[:, None, :]
      rfv = np.broadcast_to(h.face_verts[None], (R,) + h.face_verts.shape)
      rfn = jnp.broadcast_to(
        jnp.asarray(h.face_normals, dtype)[None], (R,) + h.face_normals.shape
      )
      red = jnp.broadcast_to(
        jnp.asarray(h.edge_dirs, dtype)[None], (R,) + h.edge_dirs.shape
      )
    else:
      hulls = [tp.geom_hulls[int(g)] for g in rg]
      verts, fv, fn, ed = _cvx.pad_hulls(hulls)
      rverts = jnp.asarray(verts, dtype)
      rfv = fv
      rfn = jnp.asarray(fn, dtype)
      red = jnp.asarray(ed, dtype)
    bh = _cvx.BOX_HULL
    flags = _convex_flags(int(_G.mjGEOM_BOX), t, bh.edge_dirs.shape[0],
                          red.shape[1])

    def one(p2, m2, v2, fv2, fn2, ed2, p1, m1, s1):
      # Terrain box is geom1 so the frame normal points terrain→robot.
      v1 = jnp.asarray(bh.verts, dtype) * s1
      return _cvx.convex_convex(
        p1, m1, v1, bh.face_verts, jnp.asarray(bh.face_normals, dtype),
        jnp.asarray(bh.edge_dirs, dtype),
        p2, m2, v2, fv2, fn2, ed2, ncon=4, **flags,
      )

    nf = jax.vmap(
      jax.vmap(one, in_axes=(None, None, None, None, None, None, 0, 0, 0))
    )
    dist, pos, frame = nf(rp, rm, rverts, rfv, rfn, red, bp, bm, bs)
  else:
    raise NotImplementedError(f"terrain narrowphase for geom type {t}")

  # dist/pos/frame: (R, K, k, ...) candidate contacts; mask invalid and keep
  # tg.slots per robot geom — deepest-first with lateral-diversity
  # suppression. Plain depth top-k fails on tile seams: a geom straddling
  # 2–4 coplanar tiles gets near-coincident manifold corners from each
  # tile's clip, the deepest cluster fills every slot, the support polygon
  # collapses to a point, and the body rocks forever (the reference keeps
  # per-pair manifolds via mjwarp so it never merges across tiles).
  k = dist.shape[2]
  nc = K * k
  dist = jnp.where(ok[..., None], dist, 1e10).reshape(R, nc)
  pos = pos.reshape(R, nc, 3)
  frame = frame.reshape(R, nc, 3, 3)
  rho = 0.3 * jnp.asarray(tg.robot_rad, dtype)  # dedupe radius per geom

  def select(dist_row, xy, rho_r):
    taken = jnp.zeros((nc,), bool)
    sels = []
    for _ in range(tg.slots):
      score = jnp.where(taken, jnp.inf, dist_row)
      j = jnp.argmin(score)
      sels.append(j)
      close = jnp.sum((xy - xy[j]) ** 2, axis=-1) < rho_r * rho_r
      taken = taken | close | (jnp.arange(nc) == j)
    return jnp.stack(sels)

  sel = jax.vmap(select)(dist, pos[..., :2], rho)  # (R, slots)

  # Contact parameters for the terrain geoms (per candidate before the
  # gather — the saturation count below needs per-candidate margins).
  friction, solref, solimp, inclm = _combine_params_terrain(tp, m, tg, ids)
  expand = lambda a: jnp.repeat(a, k, axis=1)  # (R, K*k, ...)

  # Slot-saturation telemetry (VERDICT r3 item 9): count ACTIVE candidates
  # (dist < includemargin → would have become constraint rows) that were
  # neither selected nor lateral-diversity-suppressed near a selected
  # contact — i.e. genuine contact points lost to tg.slots capacity. Greedy
  # selection guarantees such a candidate only exists when every slot was
  # consumed first. Trace-time gate (MJLAB_SATURATION_TELEMETRY=0 disables):
  # the O(R*nc*slots) pairwise-distance tensor adds 0.07% of rough-step
  # FLOPs / 0.26% of bytes (tools/ab_saturation_cost.py, XLA cost_analysis,
  # tools/AB_RESULTS_r5.jsonl) — kept on by default per the <=2% rule;
  # flat-terrain tasks never trace this branch.
  if os.environ.get("MJLAB_SATURATION_TELEMETRY", "1") == "1":
    active = dist < expand(inclm[..., None])[..., 0]  # (R, nc)
    sel_xy = jnp.take_along_axis(pos[..., :2], sel[..., None], axis=1)
    d2 = jnp.sum(
      (pos[:, :, None, :2] - sel_xy[:, None, :, :]) ** 2, axis=-1
    )  # (R, nc, slots)
    near_sel = jnp.any(d2 < (rho[:, None, None] ** 2), axis=-1)
    is_sel = jnp.any(
      jnp.arange(nc)[None, :, None] == sel[:, None, :], axis=-1
    )
    dropped = jnp.sum(active & ~near_sel & ~is_sel).astype(jnp.int32)
  else:
    dropped = jnp.zeros((), jnp.int32)

  dist = jnp.take_along_axis(dist, sel, axis=1)
  pos = jnp.take_along_axis(pos, sel[..., None], axis=1)
  frame = jnp.take_along_axis(frame, sel[..., None, None], axis=1)
  gather = lambda a: jnp.take_along_axis(
    expand(a), sel.reshape(R, tg.slots, *([1] * (a.ndim - 2))), axis=1
  )
  friction = gather(friction)
  solref = gather(solref)
  solimp = gather(solimp)
  inclm = gather(inclm[..., None])[..., 0]

  flat = lambda a: a.reshape((R * tg.slots,) + a.shape[2:])
  return (
    flat(dist), flat(pos), flat(frame), flat(friction), flat(solref),
    flat(solimp), flat(inclm), dropped,
  )


def collision(tp: Topology, m: Model, d: Data) -> Data:
  """Run narrowphase: one vmapped call per geometry-type group, then the
  runtime-broadphase terrain groups (slot order matches constraint
  slot_tables: static pairs first, terrain slots after)."""
  if tp.ncon_max == 0:
    # Still set the saturation counter: slim state threading drops it to
    # None between steps and the env's step log sums it unconditionally.
    return d.replace(ncon_dropped=jnp.zeros((), jnp.int32))
  dists, poss, frames = [], [], []
  fris, refs, imps, margins, freffs = [], [], [], [], []
  for key, group in itertools.groupby(tp.pairs, key=lambda p: (p.type1, p.type2)):
    group = list(group)
    g1 = np.asarray([p.geom1 for p in group])
    g2 = np.asarray([p.geom2 for p in group])
    k = group[0].ncon
    if key[0] == _G.mjGEOM_HFIELD:
      dist, pos, frame = _hfield_group(tp, m, d, key, group, g1, g2)
    elif key in _CONVEX_KEYS:
      dist, pos, frame = _convex_group(tp, m, d, key, g1, g2, k)
    elif key == (_G.mjGEOM_PLANE, _G.mjGEOM_MESH):
      # Hull-vertex arrays padded to the group max (repeat first vertex).
      vmax = max(tp.geom_hulls[g].verts.shape[0] for g in g2)
      hulls = np.stack(
        [
          np.concatenate(
            [v, np.broadcast_to(v[:1], (vmax - v.shape[0], 3))], axis=0
          )
          for g in g2
          for v in (tp.geom_hulls[g].verts,)
        ]
      )
      dist, pos, frame = jax.vmap(_plane_convex)(
        d.geom_xpos[g1], d.geom_xmat[g1],
        d.geom_xpos[g2], d.geom_xmat[g2],
        jnp.asarray(hulls, dtype=d.qpos.dtype),
      )
    else:
      fn = _DISPATCH[key]
      dist, pos, frame = jax.vmap(fn)(
        d.geom_xpos[g1], d.geom_xmat[g1], m.geom_size[g1],
        d.geom_xpos[g2], d.geom_xmat[g2], m.geom_size[g2],
      )  # (n, k), (n, k, 3), (n, k, 3, 3)
    friction, solref, solimp, inclmargin, sreff = _combine_params_vec(
      tp, m, g1, g2, pair_id=np.asarray([p.pair_id for p in group])
    )
    n = len(group)
    dists.append(dist.reshape(n * k))
    poss.append(pos.reshape(n * k, 3))
    frames.append(frame.reshape(n * k, 3, 3))
    fris.append(jnp.repeat(friction, k, axis=0))
    refs.append(jnp.repeat(solref, k, axis=0))
    imps.append(jnp.repeat(solimp, k, axis=0))
    margins.append(jnp.repeat(inclmargin, k, axis=0))
    freffs.append(jnp.repeat(sreff, k, axis=0))
  ncon_dropped = jnp.zeros((), jnp.int32)
  for tg in tp.terrain_groups:
    (dist, pos, frame, friction, solref, solimp, inclm,
     dropped) = _terrain_group_contacts(tp, m, d, tg)
    ncon_dropped = ncon_dropped + dropped
    dists.append(dist)
    poss.append(pos)
    frames.append(frame)
    fris.append(friction)
    refs.append(solref)
    imps.append(solimp)
    margins.append(inclm)
    freffs.append(jnp.zeros_like(solref))  # no <pair> into terrain pools
  contact = Contact(
    dist=jnp.concatenate(dists),
    pos=jnp.concatenate(poss),
    frame=jnp.concatenate(frames),
    includemargin=jnp.concatenate(margins),
    friction=jnp.concatenate(fris),
    solref=jnp.concatenate(refs),
    solimp=jnp.concatenate(imps),
    solreffriction=jnp.concatenate(freffs),
  )
  return d.replace(contact=contact, ncon_dropped=ncon_dropped)
