"""Convex narrowphase: SAT over hull face/edge axes + incident-face clipping.

Covers the convex-convex combinations the reference gets from mujoco_warp's
GJK/EPA + multi-contact path (reference sim/sim.py:114-126 pair table):
box-box, box-mesh, mesh-mesh, sphere-mesh, capsule-mesh — where "mesh" is the
precomputed convex hull of the collision mesh, decimated to a bounded vertex
count so the whole narrowphase is fixed-shape and vmappable.

TPU-first design notes:
  * All support evaluations are batched matmuls (axes @ verts.T) — MXU work.
  * Contact manifolds come from branchless fixed-size Sutherland–Hodgman
    clipping (both directions, candidates merged, deepest-k kept after a
    lateral dedupe), not from data-dependent loops.
  * Hull preprocessing (decimation, coplanar-face merge, unique edge
    directions) happens once on host (numpy/scipy); traces see padded
    constant arrays.

Approximations vs exact CCD (MuJoCo's libccd MPR):
  * Separation distance is measured along face/edge-cross (+ vertex axes for
    rounded shapes) only, so some corner-corner distances are slightly
    underestimated (contacts activate a hair early) — conservative and
    shape-faithful for blunt robot links.
  * Edge-cross axes are skipped when |E1|·|E2| exceeds a budget; face axes
    dominate for the near-flat contacts that matter for locomotion.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# Hull preprocessing budgets.
MAX_HULL_VERTS = 32
MAX_FACE_VERTS = 8
EDGE_AXIS_BUDGET = 600  # max |E1|*|E2| before edge-cross axes are dropped


# ---------------------------------------------------------------------------
# Host-side hull preprocessing.
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Hull:
  """Convex hull in the geom frame (host numpy). Faces pad by repeating their
  last vertex; pad entries are no-ops in max/argmax support reductions and
  are skipped by the clipper's degenerate-edge guard."""

  verts: np.ndarray  # (V, 3)
  face_verts: np.ndarray  # (F, MAX_FACE_VERTS) vertex indices into verts
  face_normals: np.ndarray  # (F, 3) outward unit normals
  edge_dirs: np.ndarray  # (E, 3) unique edge directions (unit, sign-canonical)


def _fibonacci_directions(n: int) -> np.ndarray:
  i = np.arange(n, dtype=np.float64)
  phi = np.pi * (3.0 - np.sqrt(5.0))
  z = 1.0 - 2.0 * (i + 0.5) / n
  r = np.sqrt(np.maximum(1.0 - z * z, 0.0))
  th = phi * i
  return np.stack([r * np.cos(th), r * np.sin(th), z], axis=-1)


def build_hull(
  verts: np.ndarray,
  max_verts: int = MAX_HULL_VERTS,
  max_face_verts: int = MAX_FACE_VERTS,
) -> Hull:
  """Decimate + hull + merge coplanar faces + unique edge directions."""
  from scipy.spatial import ConvexHull  # host-only dependency (ships with jax)

  verts = np.asarray(verts, dtype=np.float64)
  if len(verts) > max_verts:
    # Support-direction decimation (the mjwarp "maxhullvert" idea): keep the
    # extreme vertex along a uniform direction set — preserves the overall
    # shape and, importantly, flat load-bearing regions like foot soles.
    dirs = _fibonacci_directions(max_verts)
    verts = verts[np.unique(np.argmax(dirs @ verts.T, axis=1))]
  hull = ConvexHull(verts, qhull_options="QJ")  # joggle degenerate inputs
  vid = hull.vertices
  remap = -np.ones(len(verts), dtype=np.int64)
  remap[vid] = np.arange(len(vid))
  verts = verts[vid]
  tris = remap[hull.simplices]  # (T, 3)
  normals = hull.equations[:, :3]
  normals = normals / np.linalg.norm(normals, axis=-1, keepdims=True)

  # Merge coplanar triangles into polygon faces.
  groups: list[list[int]] = []
  gnorm: list[np.ndarray] = []
  for t in range(len(tris)):
    n = normals[t]
    for gi, g in enumerate(groups):
      if float(np.dot(gnorm[gi], n)) > 1.0 - 1e-6:
        g.append(t)
        break
    else:
      groups.append([t])
      gnorm.append(n)

  face_verts, face_normals = [], []
  for g, n in zip(groups, gnorm):
    vset = np.unique(tris[g].reshape(-1))
    pts = verts[vset]
    c = pts.mean(axis=0)
    # Order CCW around the outward normal.
    t1 = pts[0] - c
    t1 = t1 / max(np.linalg.norm(t1), 1e-12)
    t2 = np.cross(n, t1)
    ang = np.arctan2((pts - c) @ t2, (pts - c) @ t1)
    ring = vset[np.argsort(ang)]
    if len(ring) > max_face_verts:
      # Subsample evenly around the ring (stays convex, slightly inset).
      keep = np.round(np.linspace(0, len(ring), max_face_verts, endpoint=False))
      ring = ring[np.unique(keep.astype(int))]
    pad = np.full(max_face_verts, ring[-1], dtype=np.int64)
    pad[: len(ring)] = ring
    face_verts.append(pad)
    face_normals.append(n)

  # Unique edge directions (sign-canonical) from the face rings.
  dirs: list[np.ndarray] = []
  for fv in face_verts:
    ring = list(dict.fromkeys(fv.tolist()))
    for a, b in zip(ring, ring[1:] + ring[:1]):
      e = verts[b] - verts[a]
      ln = np.linalg.norm(e)
      if ln < 1e-12:
        continue
      e = e / ln
      if e[2] < 0 or (e[2] == 0 and (e[1] < 0 or (e[1] == 0 and e[0] < 0))):
        e = -e
      if not any(float(np.dot(e, d)) > 1.0 - 1e-6 for d in dirs):
        dirs.append(e)
  return Hull(
    verts=np.asarray(verts),
    face_verts=np.asarray(face_verts, dtype=np.int64),
    face_normals=np.asarray(face_normals),
    edge_dirs=np.asarray(dirs) if dirs else np.zeros((1, 3)),
  )


_BOX_CORNERS = np.array(
  [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
  dtype=np.float64,
)
BOX_HULL = build_hull(_BOX_CORNERS)

# Degenerate "hulls" for rounded shapes (sphere: point, capsule: z segment).
# Zero face normals / edge dirs are masked out of the axis set at runtime.
SPHERE_HULL = Hull(
  verts=np.zeros((1, 3)),
  face_verts=np.zeros((1, MAX_FACE_VERTS), dtype=np.int64),
  face_normals=np.zeros((1, 3)),
  edge_dirs=np.zeros((1, 3)),
)
CAPSULE_HULL = Hull(
  verts=np.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0]]),
  face_verts=np.array([[0, 1] + [1] * (MAX_FACE_VERTS - 2)], dtype=np.int64),
  face_normals=np.zeros((1, 3)),
  edge_dirs=np.array([[0.0, 0.0, 1.0]]),
)


def pad_hulls(
  hulls: list[Hull],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
  """Stack a hull group padded to common (V, F, E) by repeating final rows
  (repeats are no-ops under max/argmax support reductions)."""
  Vm = max(h.verts.shape[0] for h in hulls)
  Fm = max(h.face_verts.shape[0] for h in hulls)
  Em = max(h.edge_dirs.shape[0] for h in hulls)

  def padrows(a, n):
    reps = np.broadcast_to(a[-1:], (n - a.shape[0],) + a.shape[1:])
    return np.concatenate([a, reps])

  verts = np.stack([padrows(h.verts, Vm) for h in hulls])
  fv = np.stack([padrows(h.face_verts, Fm) for h in hulls])
  fn = np.stack([padrows(h.face_normals, Fm) for h in hulls])
  ed = np.stack([padrows(h.edge_dirs, Em) for h in hulls])
  return verts, fv, fn, ed


# ---------------------------------------------------------------------------
# Trace-side routine.
# ---------------------------------------------------------------------------


def _prefix_valid(ring: jax.Array) -> jax.Array:
  """Valid mask for a pad-by-repetition ring (pads repeat the last vertex)."""
  n = ring.shape[0]
  idx = jnp.arange(n)
  prev = ring[(idx - 1) % n]
  return (~jnp.all(jnp.abs(ring - prev) < 1e-12, axis=-1)) | (idx == 0)


def _clip_polygon(
  poly: jax.Array, valid: jax.Array, ref_ring: jax.Array, ref_n: jax.Array
) -> tuple[jax.Array, jax.Array]:
  """Clip `poly` (P, 3) against the side planes of `ref_ring` (a convex ring,
  CCW around outward normal `ref_n`). Branchless fixed-size Sutherland–
  Hodgman; each static clip step compacts with a cumsum scatter. Degenerate
  (pad-repeat) ref edges are skipped. Returns (points (P + R, 3), mask)."""
  R = ref_ring.shape[0]
  B = poly.shape[0] + R
  P = jnp.zeros((B, 3), dtype=poly.dtype).at[: poly.shape[0]].set(poly)
  m = jnp.zeros((B,), dtype=bool).at[: poly.shape[0]].set(valid)
  count = jnp.sum(m)
  idx = jnp.arange(B)

  for k in range(R):
    a = ref_ring[k]
    b = ref_ring[(k + 1) % R]
    edge = b - a
    n_side = jnp.cross(ref_n, edge)  # inward for CCW ring
    nn = jnp.linalg.norm(n_side)
    degenerate = nn < 1e-10
    n_side = n_side / jnp.maximum(nn, 1e-12)
    s = (P - a) @ n_side  # >= 0 -> inside
    nxt = P[(idx + 1) % jnp.maximum(count, 1)]
    s_nxt = (nxt - a) @ n_side
    active = m & (idx < count)
    keep = active & (s >= 0)
    crossing = active & ((s >= 0) != (s_nxt >= 0))
    denom = jnp.where(jnp.abs(s - s_nxt) < 1e-12, 1.0, s - s_nxt)
    inter = P + (s / denom)[:, None] * (nxt - P)
    # Emit [keep_i, inter_i] per edge in ring order, compact via cumsum.
    emit = jnp.stack([keep, crossing], axis=1).reshape(-1)  # (2B,)
    pts = jnp.stack([P, inter], axis=1).reshape(-1, 3)  # (2B, 3)
    pos = jnp.cumsum(emit) - 1
    newP = jnp.zeros_like(P).at[jnp.where(emit, pos, B)].set(pts, mode="drop")
    newcount = jnp.sum(emit)
    newm = idx < newcount
    P = jnp.where(degenerate, P, newP)
    m = jnp.where(degenerate, m, newm)
    count = jnp.where(degenerate, count, newcount)
  return P, m


def _normal_frame_rows(n: jax.Array) -> jax.Array:
  ref = jnp.where(
    jnp.abs(n[0]) < 0.5,
    jnp.asarray([1.0, 0.0, 0.0], dtype=n.dtype),
    jnp.asarray([0.0, 1.0, 0.0], dtype=n.dtype),
  )
  t1 = jnp.cross(n, ref)
  t1 = t1 / jnp.maximum(jnp.linalg.norm(t1), 1e-12)
  t2 = jnp.cross(n, t1)
  return jnp.stack([n, t1, t2])


def convex_convex(
  pos1, mat1, verts1, face_verts1, face_normals1, edge_dirs1,
  pos2, mat2, verts2, face_verts2, face_normals2, edge_dirs2,
  r1=0.0, r2=0.0, ncon: int = 4,
  use_edge_axes: bool = True,
  vertex_axes: bool = False,
  clip_mode: str = "both",
):
  """General convex pair narrowphase.

  Hull data is in each geom's frame; verts may be jnp (runtime-scaled boxes)
  or numpy constants. r1/r2 inflate hull 1/2 by a radius (sphere: V=1 +
  radius; capsule: V=2 + radius — scale CAPSULE_HULL verts by half-length).

  clip_mode: "both" clips each hull's incident face against the other's
  reference face and merges candidates (hull-hull); "1on2" clips only
  hull1's supporting ring against hull2's face (rounded hull1 — its ring is
  the point/segment itself); "none" keeps only the deepest-support midpoint
  (sphere vs hull). vertex_axes adds per-vertex axes from hull2's vertices
  toward hull1's closest feature — exact corner normals for rounded shapes.

  Returns (dist (ncon,), pos (ncon, 3), frame (ncon, 3, 3)); the frame
  normal points geom1 → geom2 (MuJoCo convention). Empty slots get
  dist = 1e10.
  """
  dtype = pos1.dtype
  one = jnp.asarray(1.0, dtype)
  # Work in hull1's frame.
  R = mat1.T @ mat2
  t = mat1.T @ (pos2 - pos1)
  v1 = jnp.asarray(verts1, dtype)
  v2 = jnp.asarray(verts2, dtype) @ R.T + t
  n1 = jnp.asarray(face_normals1, dtype)
  n2 = jnp.asarray(face_normals2, dtype) @ R.T
  c1 = jnp.mean(v1, axis=0)
  c2 = jnp.mean(v2, axis=0)

  axes = [n1, -n2]
  if use_edge_axes:
    e1 = jnp.asarray(edge_dirs1, dtype)
    e2 = jnp.asarray(edge_dirs2, dtype) @ R.T
    cx = jnp.cross(e1[:, None, :], e2[None, :, :]).reshape(-1, 3)
    cn = jnp.linalg.norm(cx, axis=-1, keepdims=True)
    cx = jnp.where(cn > 1e-6, cx / jnp.maximum(cn, 1e-12), 0.0)
    sgn = jnp.where((cx @ (c2 - c1)) < 0, -one, one)
    axes.append(cx * sgn[:, None])
  if vertex_axes:
    # From each hull2 vertex toward the closest point of hull1's vert set
    # (hull1 is a point or segment here): exact corner/edge normals.
    if v1.shape[0] == 1:
      w = jnp.broadcast_to(v1[0], v2.shape)
    else:  # segment a–b: clamp projection
      a_, b_ = v1[0], v1[-1]
      ab = b_ - a_
      tt = jnp.clip(
        ((v2 - a_) @ ab) / jnp.maximum(ab @ ab, 1e-12), 0.0, 1.0
      )
      w = a_ + tt[:, None] * ab
    va = v2 - w
    vn = jnp.linalg.norm(va, axis=-1, keepdims=True)
    axes.append(jnp.where(vn > 1e-9, va / jnp.maximum(vn, 1e-12), 0.0))
  A = jnp.concatenate(axes, axis=0)
  ok = jnp.linalg.norm(A, axis=-1) > 0.5
  s1 = A @ v1.T  # (Axes, V1)
  s2 = A @ v2.T
  gaps = jnp.where(ok, jnp.min(s2, axis=-1) - jnp.max(s1, axis=-1), -jnp.inf)
  best = jnp.argmax(gaps)
  a = A[best]  # separating axis, hull1 frame, points 1 → 2
  sep = gaps[best]
  h1 = jnp.max(v1 @ a)  # hull1 support plane height along a
  h2 = jnp.min(v2 @ a)

  # Candidate contact points. Distances are measured PER POINT along the
  # axis to the opposing face plane — assigning each clipped point the
  # global face gap (h2 − h1) makes every manifold corner report the
  # deepest penetration when the faces tilt, which feeds the solver equal
  # normal forces on the rising and sinking sides and sustains rocking.
  cands = []
  if clip_mode in ("both", "1on2"):
    f1 = jnp.argmax(n1 @ a)
    f2 = jnp.argmax(-(n2 @ a))
    n1f, n2f = n1[f1], n2[f2]
    q1 = v1[jnp.asarray(face_verts1)[f1, 0]]
    q2 = v2[jnp.asarray(face_verts2)[f2, 0]]
    ring2 = v2[jnp.asarray(face_verts2)[f2]]
    ring1 = v1[jnp.asarray(face_verts1)[f1]]

    def plane_gap(pts, nf, q0, fallback):
      # Signed gap along ±`a` from each point to plane (nf, q0): the
      # parameter t with pts + t·a on the plane, oriented so separation is
      # positive. n1f·a ≈ +1 / n2f·a ≈ −1 orient the two directions
      # consistently; fall back to the face-height gap if the plane is
      # nearly parallel to the axis (clip direction is meaningless there).
      denom = jnp.dot(nf, a)
      safe = jnp.where(jnp.abs(denom) < 1e-6, jnp.asarray(1.0, dtype), denom)
      t = ((nf @ q0) - pts @ nf) / safe
      return jnp.where(jnp.abs(denom) < 1e-6, fallback, t)

    if clip_mode == "both":
      pts_a, m_a = _clip_polygon(ring2, _prefix_valid(ring2), ring1, n1f)
      # Points on hull2's incident face; gap to hull1's reference plane
      # (n1f·a > 0 → t = (n1f·q1 − n1f·p)/(n1f·a) is negative above the
      # plane; negate to make separation positive — fallback pre-negated).
      cands.append(
        (pts_a, m_a, -plane_gap(pts_a, n1f, q1, h1 - pts_a @ a))
      )
    pts_b, m_b = _clip_polygon(ring1, _prefix_valid(ring1), ring2, n2f)
    # Points on hull1's reference face; gap to hull2's incident plane
    # (n2f·a < 0 → t is already positive for separated points).
    cands.append((pts_b, m_b, plane_gap(pts_b, n2f, q2, h2 - pts_b @ a)))
  # Deepest-support midpoint fallback (edge/corner dominant cases). A point
  # hull (sphere) contacts at its center's lateral position, not at the
  # other hull's (arbitrary, tie-broken) support corner. The fallback is
  # ONLY enabled when clipping produced no valid points: its distance is
  # `sep` — the joint-deepest by construction — so letting it always
  # compete steals a manifold slot from a true support corner (observed as
  # a collapsed support polygon and sustained rocking on tile seams).
  if v1.shape[0] == 1:
    mid = v1[0]
  else:
    mid = 0.5 * (v1[jnp.argmax(v1 @ a)] + v2[jnp.argmin(v2 @ a)])
  if cands:
    have_clip = jnp.zeros((), dtype=bool)
    for _, cm, _ in cands:
      have_clip = have_clip | jnp.any(cm)
    mid_mask = ~have_clip
  else:
    mid_mask = jnp.ones((), dtype=bool)
  cands.append(
    (mid[None], mid_mask[None], jnp.full((1,), sep, dtype=dtype))
  )

  pts = jnp.concatenate([c[0] for c in cands], axis=0)
  mask = jnp.concatenate([c[1] for c in cands])
  dist_all = jnp.concatenate([c[2] for c in cands]) - (r1 + r2)
  dist_all = jnp.where(mask, dist_all, jnp.inf)

  # Deepest candidates with greedy lateral dedupe (the two clip directions
  # produce coincident manifold corners; merge anything within ~2 mm
  # laterally so the kept ncon points span distinct support corners).
  k = min(2 * ncon + 1, pts.shape[0])
  neg, idx = jax.lax.top_k(-dist_all, k)
  cand = pts[idx]
  cdist = -neg
  lateral = cand - (cand @ a)[:, None] * a
  taken = jnp.zeros((k,), dtype=bool)
  sel_pts, sel_dist = [], []
  for _ in range(ncon):
    score = jnp.where(taken, jnp.inf, cdist)
    j = jnp.argmin(score)
    sel_pts.append(cand[j])
    sel_dist.append(jnp.where(jnp.isinf(score[j]), jnp.inf, cdist[j]))
    close = jnp.sum((lateral - lateral[j]) ** 2, axis=-1) < (2e-3) ** 2
    taken = taken | close | (jnp.arange(k) == j)
  sel = jnp.stack(sel_pts)  # (ncon, 3)
  dist = jnp.stack(sel_dist)

  # Contact position: project each point onto the midplane between the two
  # (radius-inflated) support surfaces, keeping its lateral position.
  midplane = 0.5 * (h1 + r1 + h2 - r2)
  pos_local = sel - ((sel @ a) - midplane)[:, None] * a
  bad = ~jnp.isfinite(dist)
  dist = jnp.where(bad, 1e10, dist)
  pos_local = jnp.where(bad[:, None], 0.0, pos_local)

  pos_w = pos1 + pos_local @ mat1.T
  frame = _normal_frame_rows(mat1 @ a)
  return dist, pos_w, jnp.tile(frame[None], (ncon, 1, 1))
