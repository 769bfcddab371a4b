"""Host-side conversion: compiled mujoco.MjModel → (Topology, Model), make_data.

This is the device-upload boundary (the analog of mjwarp.put_model/put_data,
reference sim/sim.py:116-126). The MuJoCo C library remains the model frontend
(MjSpec composition happens in mjlab_tpu.scene); this module snapshots the
compiled model into static structure + jnp parameter leaves.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.physics.types import (
  ConeType,
  Contact,
  Data,
  GeomPair,
  Integrator,
  Model,
  Option,
  TerrainGroup,
  Topology,
)

_G = mujoco.mjtGeom

# Rounded primitives approximated by convex hulls through the SAT
# narrowphase when no analytic path exists (MJX tessellates the same way;
# plane pairs keep their exact analytic handlers below). Tessellation
# density trades manifold quality vs SAT axis count.
_HULL_APPROX_TYPES = (int(_G.mjGEOM_CYLINDER), int(_G.mjGEOM_ELLIPSOID))
_CYLINDER_SECTORS = 16
_ELLIPSOID_DIRS = 42


def _effective_type(t: int) -> int:
  """Collision-dispatch type: cylinders/ellipsoids collide as mesh hulls."""
  return int(_G.mjGEOM_MESH) if int(t) in _HULL_APPROX_TYPES else int(t)


# Contact-slot capacity per supported (type1, type2) pair, type1 <= type2.
_PAIR_NCON: dict[tuple[int, int], int] = {
  (_G.mjGEOM_PLANE, _G.mjGEOM_SPHERE): 1,
  (_G.mjGEOM_PLANE, _G.mjGEOM_CAPSULE): 2,
  (_G.mjGEOM_PLANE, _G.mjGEOM_CYLINDER): 4,
  (_G.mjGEOM_PLANE, _G.mjGEOM_BOX): 4,
  (_G.mjGEOM_PLANE, _G.mjGEOM_ELLIPSOID): 1,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_SPHERE): 1,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_CAPSULE): 1,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_BOX): 1,
  (_G.mjGEOM_SPHERE, _G.mjGEOM_MESH): 1,
  (_G.mjGEOM_CAPSULE, _G.mjGEOM_CAPSULE): 1,
  (_G.mjGEOM_CAPSULE, _G.mjGEOM_BOX): 2,
  (_G.mjGEOM_CAPSULE, _G.mjGEOM_MESH): 2,
  (_G.mjGEOM_BOX, _G.mjGEOM_BOX): 4,
  (_G.mjGEOM_BOX, _G.mjGEOM_MESH): 4,
  (_G.mjGEOM_MESH, _G.mjGEOM_MESH): 4,
  (_G.mjGEOM_HFIELD, _G.mjGEOM_SPHERE): 4,
  (_G.mjGEOM_HFIELD, _G.mjGEOM_CAPSULE): 4,
  (_G.mjGEOM_HFIELD, _G.mjGEOM_BOX): 4,
  (_G.mjGEOM_HFIELD, _G.mjGEOM_MESH): 4,
  (_G.mjGEOM_PLANE, _G.mjGEOM_MESH): 4,
}

# Static world geoms (weldid 0) of these types are pooled into a runtime
# broadphase when their count exceeds the threshold — the TPU answer to box
# terrains, where a full static pair table would explode (thousands of
# terrain boxes x ~30 robot geoms; the reference relies on mjwarp's
# GPU broadphase instead, sim/sim.py:114-126).
TERRAIN_POOL_MIN = 64
TERRAIN_CANDIDATES = 4  # top-K candidate terrain geoms per robot geom
TERRAIN_SLOTS = 6  # contact slots kept per robot geom (6, not 4: a geom on a
# tile seam has up to ~9 equal-depth support corners across the adjacent
# tiles; with only 4 slots the selected set flickers with micro-tilt and the
# body never stops rocking — 6 covers the tie set and settles to rest)
_TERRAIN_CELL_SIZE = 1.0  # broadphase hash cell size (meters)
_TERRAIN_CELL_MARGIN = 0.6  # AABB expansion when binning (> max robot geom radius)


def _hull_vertices(m: mujoco.MjModel, geom_id: int) -> np.ndarray:
  """Convex-hull vertices of a mesh geom, in the geom frame.

  Uses the qhull graph MuJoCo precomputes (mesh_graph layout:
  [numvert, numface, vert_edgeadr, vert_globalid, ...]); falls back to all
  mesh vertices when no graph is stored."""
  mesh_id = int(m.geom_dataid[geom_id])
  vadr, vnum = int(m.mesh_vertadr[mesh_id]), int(m.mesh_vertnum[mesh_id])
  verts = m.mesh_vert[vadr : vadr + vnum]
  gadr = int(m.mesh_graphadr[mesh_id])
  if gadr >= 0:
    graph = m.mesh_graph[gadr:]
    numvert = int(graph[0])
    vert_globalid = graph[2 + numvert : 2 + 2 * numvert]
    verts = verts[vert_globalid]
  return np.asarray(verts, dtype=np.float64)


def _primitive_hull_vertices(t: int, size: np.ndarray) -> np.ndarray:
  """Tessellated hull vertices for a rounded primitive, geom frame.

  Cylinder: two rings of _CYLINDER_SECTORS at z = ±half-length (the convex
  hull of the true surface cross-section); ellipsoid: _ELLIPSOID_DIRS
  Fibonacci directions scaled by the semi-axes. Both under-approximate the
  curved surface by O(r·θ²/2) ≈ 2% of radius at 16 sectors."""
  from mjlab_tpu.physics.convex import _fibonacci_directions

  if t == int(_G.mjGEOM_CYLINDER):
    r, h = float(size[0]), float(size[1])
    th = np.linspace(0, 2 * np.pi, _CYLINDER_SECTORS, endpoint=False)
    ring = np.stack([r * np.cos(th), r * np.sin(th)], axis=-1)
    top = np.concatenate([ring, np.full((len(th), 1), h)], axis=-1)
    bot = np.concatenate([ring, np.full((len(th), 1), -h)], axis=-1)
    return np.concatenate([top, bot], axis=0)
  if t == int(_G.mjGEOM_ELLIPSOID):
    dirs = _fibonacci_directions(_ELLIPSOID_DIRS)
    return dirs * np.asarray(size, dtype=np.float64)
  raise NotImplementedError(f"no hull approximation for geom type {t}")


def _geom_bounding_radius(m: mujoco.MjModel, g: int) -> float:
  """Host bounding-sphere radius of a geom (about its frame origin)."""
  t = int(m.geom_type[g])
  s = m.geom_size[g]
  if t == int(_G.mjGEOM_SPHERE):
    return float(s[0])
  if t == int(_G.mjGEOM_CAPSULE):
    return float(s[0] + s[1])
  if t == int(_G.mjGEOM_CYLINDER):
    return float(np.hypot(s[0], s[1]))
  if t in (int(_G.mjGEOM_BOX), int(_G.mjGEOM_ELLIPSOID)):
    return float(np.linalg.norm(s))
  if t == int(_G.mjGEOM_MESH):
    return float(np.max(np.linalg.norm(_hull_vertices(m, g), axis=-1)))
  return float(np.linalg.norm(s))


def _pair_key(
  m: mujoco.MjModel, ga: int, gb: int
) -> tuple[tuple[int, int] | None, int, int]:
  """Dispatch key + canonical geom order for a candidate pair.

  Exact analytic pairs match on raw geom types first; otherwise rounded
  primitives fall back to their convex-hull (mesh) dispatch type. Returns
  (None, ga, gb) when unsupported either way."""
  t1, t2 = int(m.geom_type[ga]), int(m.geom_type[gb])
  if t1 > t2:
    ga, gb, t1, t2 = gb, ga, t2, t1
  if (t1, t2) in _PAIR_NCON:
    return (t1, t2), ga, gb
  e1, e2 = _effective_type(t1), _effective_type(t2)
  if e1 > e2:
    ga, gb, e1, e2 = gb, ga, e2, e1
  if (e1, e2) in _PAIR_NCON:
    return (e1, e2), ga, gb
  return None, ga, gb


def _combined_condim(m: mujoco.MjModel, ga: int, gb: int) -> int:
  """mj_contactParam condim: higher-priority geom wins, else max."""
  p1, p2 = int(m.geom_priority[ga]), int(m.geom_priority[gb])
  if p1 != p2:
    return int(m.geom_condim[ga if p1 > p2 else gb])
  return max(int(m.geom_condim[ga]), int(m.geom_condim[gb]))


def _geom_world_aabb(m: mujoco.MjModel, g: int) -> tuple[np.ndarray, np.ndarray]:
  """World AABB of a static (worldbody) geom from its model pose."""
  pos = m.geom_pos[g]
  mat = np.zeros(9)
  mujoco.mju_quat2Mat(mat, m.geom_quat[g])
  mat = mat.reshape(3, 3)
  t = int(m.geom_type[g])
  if t == int(_G.mjGEOM_BOX):
    ext = np.abs(mat) @ m.geom_size[g]
  else:
    r = _geom_bounding_radius(m, g)
    ext = np.full(3, r)
  return pos - ext, pos + ext


def _build_terrain_groups(
  m: mujoco.MjModel,
  pool: list[int],
  mobile_by_type: dict[int, list[int]],
) -> list["TerrainGroup"]:
  """Spatial-hash cell lists over the terrain pool + one group per mobile
  geom type."""
  lo = np.full(2, np.inf)
  hi = np.full(2, -np.inf)
  aabbs = []
  for g in pool:
    a, b = _geom_world_aabb(m, g)
    aabbs.append((a, b))
    lo = np.minimum(lo, a[:2])
    hi = np.maximum(hi, b[:2])
  cs = _TERRAIN_CELL_SIZE
  ncx = max(1, int(np.ceil((hi[0] - lo[0]) / cs)))
  ncy = max(1, int(np.ceil((hi[1] - lo[1]) / cs)))
  buckets: list[list[list[int]]] = [[[] for _ in range(ncy)] for _ in range(ncx)]
  for g, (a, b) in zip(pool, aabbs):
    x0 = int(np.clip(np.floor((a[0] - _TERRAIN_CELL_MARGIN - lo[0]) / cs), 0, ncx - 1))
    x1 = int(np.clip(np.floor((b[0] + _TERRAIN_CELL_MARGIN - lo[0]) / cs), 0, ncx - 1))
    y0 = int(np.clip(np.floor((a[1] - _TERRAIN_CELL_MARGIN - lo[1]) / cs), 0, ncy - 1))
    y1 = int(np.clip(np.floor((b[1] + _TERRAIN_CELL_MARGIN - lo[1]) / cs), 0, ncy - 1))
    for ix in range(x0, x1 + 1):
      for iy in range(y0, y1 + 1):
        buckets[ix][iy].append(g)
  L = max(1, max(len(c) for col in buckets for c in col))
  cells = np.full((ncx, ncy, L), -1, dtype=np.int32)
  for ix in range(ncx):
    for iy in range(ncy):
      ids = buckets[ix][iy]
      cells[ix, iy, : len(ids)] = ids

  prio = {int(m.geom_priority[g]) for g in pool}
  if len(prio) != 1:
    raise NotImplementedError("terrain pool geoms must share one priority")
  groups = []
  for rtype in sorted(mobile_by_type):
    geoms = sorted(mobile_by_type[rtype])
    groups.append(
      TerrainGroup(
        robot_type=rtype,
        robot_geoms=np.asarray(geoms, dtype=np.int32),
        robot_rad=np.asarray(
          [_geom_bounding_radius(m, g) for g in geoms]
        ),
        pool_type=int(_G.mjGEOM_BOX),
        pool_geoms=np.asarray(pool, dtype=np.int32),
        pool_priority=int(m.geom_priority[pool[0]]),
        cells=cells,
        grid_lo=lo,
        cell_size=cs,
        ncand=TERRAIN_CANDIDATES,
        slots=TERRAIN_SLOTS,
        condim=np.asarray(
          [_combined_condim(m, g, pool[0]) for g in geoms], dtype=np.int32
        ),
      )
    )
  return groups


def _candidate_pairs(
  m: mujoco.MjModel,
) -> tuple[list[GeomPair], list["TerrainGroup"]]:
  """Enumerate collision pairs with MuJoCo's body-level filtering.

  Mirrors mj_collision filtering semantics: same-body/weld exclusion,
  parent-child filter (unless parent is world), contype/conaffinity
  compatibility, and <exclude> signatures. Static pairs run every step and
  mask by distance (MJX-style); pairs against large static box pools
  (generated terrains) are factored into runtime-broadphase TerrainGroups
  instead (see types.TerrainGroup).
  """
  excluded = set()
  for i in range(m.nexclude):
    sig = int(m.exclude_signature[i])
    excluded.add((sig >> 16, sig & 0xFFFF))
  filterparent = not (m.opt.disableflags & mujoco.mjtDisableBit.mjDSBL_FILTERPARENT)

  def compatible(g1: int, g2: int) -> bool:
    b1, b2 = int(m.geom_bodyid[g1]), int(m.geom_bodyid[g2])
    w1, w2 = int(m.body_weldid[b1]), int(m.body_weldid[b2])
    if w1 == w2:
      return False
    pw1 = int(m.body_weldid[m.body_parentid[w1]])
    pw2 = int(m.body_weldid[m.body_parentid[w2]])
    if filterparent and w1 != 0 and w2 != 0 and (w1 == pw2 or w2 == pw1):
      return False
    if (b1, b2) in excluded or (b2, b1) in excluded:
      return False
    t1, t2 = int(m.geom_contype[g1]), int(m.geom_contype[g2])
    a1, a2 = int(m.geom_conaffinity[g1]), int(m.geom_conaffinity[g2])
    return bool((t1 & a2) or (t2 & a1))

  # Terrain pool: static worldbody boxes, when numerous enough that a static
  # pair table would explode.
  world_boxes = [
    g
    for g in range(m.ngeom)
    if int(m.body_weldid[m.geom_bodyid[g]]) == 0
    and int(m.geom_type[g]) == int(_G.mjGEOM_BOX)
  ]
  pool: set[int] = set()
  mobile_by_type: dict[int, list[int]] = {}
  if len(world_boxes) > TERRAIN_POOL_MIN:
    pool = set(world_boxes)
    # A mobile geom joins a group iff it is collision-compatible with the
    # whole pool (all-or-nothing; mixed compatibility would need per-pair
    # masks inside the broadphase — not needed by any shipped terrain).
    probe = world_boxes[0]
    for g in range(m.ngeom):
      if g in pool or int(m.body_weldid[m.geom_bodyid[g]]) == 0:
        continue
      compat = [compatible(g, p) for p in (probe, world_boxes[-1])]
      if not any(compat):
        continue
      if not all(compat):
        raise NotImplementedError(
          "geom has mixed collision compatibility with the terrain pool"
        )
      t = _effective_type(int(m.geom_type[g]))
      key = tuple(sorted((t, int(_G.mjGEOM_BOX))))
      if key not in _PAIR_NCON:
        raise NotImplementedError(
          f"Unsupported terrain collision for geom type {t}."
        )
      mobile_by_type.setdefault(t, []).append(g)

  # Explicit <pair> elements: mj_collision checks these UNFILTERED (no
  # contype/conaffinity, no excludes, no parent filter) and they take
  # precedence over the dynamic pair for the same two geoms. Contact params
  # come from mjModel.pair_* (see collision._combine_params_vec override).
  pairs: list[GeomPair] = []
  explicit: set[tuple[int, int]] = set()
  for i in range(m.npair):
    ga, gb = int(m.pair_geom1[i]), int(m.pair_geom2[i])
    key, ga, gb = _pair_key(m, ga, gb)
    if key is None:
      raise NotImplementedError(
        f"Unsupported collision pair "
        f"{(int(m.geom_type[ga]), int(m.geom_type[gb]))} in explicit "
        f"<pair> {i}."
      )
    if ga in pool or gb in pool:
      # The terrain broadphase would also emit contacts for this (mobile,
      # pool-geom) combination, double-counting constraint forces; MuJoCo
      # gives predefined pairs precedence over the dynamic pair, so we
      # refuse rather than silently duplicate.
      raise NotImplementedError(
        f"explicit <pair> {i} references a terrain-pool geom; predefined "
        "pairs into the terrain broadphase pool are not supported"
      )
    explicit.add((ga, gb))
    pairs.append(
      GeomPair(
        geom1=ga,
        geom2=gb,
        type1=key[0],
        type2=key[1],
        ncon=_PAIR_NCON[key],
        condim=int(m.pair_dim[i]),
        pair_id=i,
      )
    )

  for g1 in range(m.ngeom):
    for g2 in range(g1 + 1, m.ngeom):
      if (g1, g2) in explicit or (g2, g1) in explicit:
        continue  # predefined pair wins over the dynamic one
      if g1 in pool or g2 in pool:
        continue  # handled by the terrain groups
      if not compatible(g1, g2):
        continue
      key, ga, gb = _pair_key(m, g1, g2)
      if key is None:
        names = [
          mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, g) or str(g)
          for g in (ga, gb)
        ]
        raise NotImplementedError(
          f"Unsupported collision pair "
          f"{(int(m.geom_type[ga]), int(m.geom_type[gb]))} between geoms "
          f"{names}."
        )
      pairs.append(
        GeomPair(
          geom1=ga,
          geom2=gb,
          type1=key[0],
          type2=key[1],
          ncon=_PAIR_NCON[key],
          condim=_combined_condim(m, ga, gb),
        )
      )
  # Sort by type pair so collision dispatch groups are contiguous and the
  # vectorized narrowphase runs once per geometry-type combination.
  pairs.sort(key=lambda p: (p.type1, p.type2))

  groups = (
    _build_terrain_groups(m, sorted(pool), mobile_by_type) if pool else []
  )
  return pairs, groups


def _is_spatial_tendon(m: mujoco.MjModel, t: int) -> bool:
  adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
  return any(
    int(m.wrap_type[w]) != int(mujoco.mjtWrap.mjWRAP_JOINT)
    for w in range(adr, adr + num)
  )


def _spatial_tendon_segments(
  m: mujoco.MjModel, t: int
) -> list[tuple[int, int, float, int, int]]:
  """Static segment list (site_a, site_b, scale, wrap_geom, sidesite) of a
  spatial tendon. Pulleys divide subsequent branches' length contribution
  by their divisor and break the chain (mj_tendon semantics). A sphere/
  cylinder wrap between two sites makes that segment route around the
  geom at runtime (smooth._wrap_circle)."""
  adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
  segs: list[tuple[int, int, float, int, int]] = []
  prev_site = -1
  pending_geom = -1
  pending_side = -1
  scale = 1.0
  for w in range(adr, adr + num):
    wt = int(m.wrap_type[w])
    if wt == int(mujoco.mjtWrap.mjWRAP_SITE):
      s = int(m.wrap_objid[w])
      if prev_site >= 0:
        segs.append((prev_site, s, scale, pending_geom, pending_side))
      prev_site = s
      pending_geom = -1
      pending_side = -1
    elif wt == int(mujoco.mjtWrap.mjWRAP_PULLEY):
      divisor = float(m.wrap_prm[w])
      scale = 1.0 / max(divisor, 1e-15)
      prev_site = -1  # pulley breaks the chain: no segment across it
      pending_geom = -1
      pending_side = -1
    elif wt in (
      int(mujoco.mjtWrap.mjWRAP_SPHERE),
      int(mujoco.mjtWrap.mjWRAP_CYLINDER),
    ):
      if prev_site < 0 or pending_geom >= 0:
        raise NotImplementedError(
          f"spatial tendon {t}: wrap geom must sit between two sites"
        )
      pending_geom = int(m.wrap_objid[w])
      # mujoco stores the sidesite id in wrap_prm (−1 if absent).
      pending_side = int(m.wrap_prm[w])
    else:
      raise NotImplementedError(
        f"spatial tendon {t}: wrap type {wt} is not supported"
      )
  if not segs:
    raise NotImplementedError(f"spatial tendon {t}: needs >= 2 sites")
  return segs


def _transmission_matrices(
  m: mujoco.MjModel,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
  """Static (nu, nq) / (nu, nv) transmission matrices + dynamic map.

  Joint transmission: one-hot rows. Fixed-tendon transmission (e.g. the
  Asimov-toe parallel ankles, asset_zoo asimov_toe.xml tendon section):
  rows carry the per-joint tendon coefficients — tendon length is linear
  in qpos so the moment is constant. Spatial-tendon transmissions keep
  zero static rows and are marked in the returned (nu,) tendon-id map;
  fwd_actuation substitutes Data.ten_J rows at runtime."""
  qmat = np.zeros((m.nu, m.nq))
  vmat = np.zeros((m.nu, m.nv))
  dyn_tendon = np.full(m.nu, -1, dtype=np.int32)
  for u in range(m.nu):
    trntype = int(m.actuator_trntype[u])
    if trntype == int(mujoco.mjtTrn.mjTRN_JOINT):
      j = int(m.actuator_trnid[u, 0])
      if int(m.jnt_type[j]) not in (
        int(mujoco.mjtJoint.mjJNT_HINGE),
        int(mujoco.mjtJoint.mjJNT_SLIDE),
      ):
        raise NotImplementedError("free/ball joint actuators")
      qmat[u, m.jnt_qposadr[j]] = 1.0
      vmat[u, m.jnt_dofadr[j]] = 1.0
    elif trntype == int(mujoco.mjtTrn.mjTRN_TENDON):
      t = int(m.actuator_trnid[u, 0])
      if _is_spatial_tendon(m, t):
        dyn_tendon[u] = t
        continue
      adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
      for w in range(adr, adr + num):
        j = int(m.wrap_objid[w])
        coef = float(m.wrap_prm[w])
        qmat[u, m.jnt_qposadr[j]] += coef
        vmat[u, m.jnt_dofadr[j]] += coef
    else:
      raise NotImplementedError(f"actuator transmission type {trntype}")
  return qmat, vmat, dyn_tendon


def _tendon_matrices(m: mujoco.MjModel) -> tuple[np.ndarray, np.ndarray]:
  """Per-tendon (ntendon, nq/nv) linear maps for FIXED tendons; spatial
  tendons (none in the asset zoo) keep zero rows."""
  qmat = np.zeros((m.ntendon, m.nq))
  vmat = np.zeros((m.ntendon, m.nv))
  for t in range(m.ntendon):
    adr, num = int(m.tendon_adr[t]), int(m.tendon_num[t])
    if any(
      int(m.wrap_type[w]) != int(mujoco.mjtWrap.mjWRAP_JOINT)
      for w in range(adr, adr + num)
    ):
      continue
    for w in range(adr, adr + num):
      j = int(m.wrap_objid[w])
      coef = float(m.wrap_prm[w])
      qmat[t, m.jnt_qposadr[j]] += coef
      vmat[t, m.jnt_dofadr[j]] += coef
  return qmat, vmat


def _dof_ancestor_mask(m: mujoco.MjModel) -> np.ndarray:
  """mask[i, j] = 1 iff dof j is an ancestor of dof i (or j == i)."""
  nv = m.nv
  mask = np.zeros((nv, nv), dtype=bool)
  for i in range(nv):
    j = i
    while j >= 0:
      mask[i, j] = True
      j = int(m.dof_parentid[j])
  return mask


def _body_levels(m: mujoco.MjModel) -> tuple[np.ndarray, ...]:
  """Group non-world bodies by tree depth (level-vectorized tree passes)."""
  depth = np.zeros(m.nbody, dtype=int)
  for i in range(1, m.nbody):
    depth[i] = depth[m.body_parentid[i]] + 1
  return tuple(
    np.nonzero(depth == lv)[0] for lv in range(1, depth.max() + 1 if m.nbody > 1 else 1)
  )


def _body_masks(m: mujoco.MjModel) -> tuple[np.ndarray, np.ndarray]:
  nbody, nv = m.nbody, m.nv
  # subtree_mask[i, j]: body j is in the subtree rooted at body i.
  ancestor = np.zeros((nbody, nbody), dtype=bool)  # ancestor[j, i]: i ancestor of j
  for j in range(nbody):
    i = j
    while True:
      ancestor[j, i] = True
      if i == 0:
        break
      i = int(m.body_parentid[i])
  subtree = ancestor.T
  # body_dof_mask[i, j]: dof j belongs to an ancestor-or-self body of body i.
  body_dof = np.zeros((nbody, nv), dtype=bool)
  for j in range(nv):
    body_dof[:, j] = ancestor[:, m.dof_bodyid[j]]
  return subtree, body_dof


def contact_rows(condim: int, cone: int) -> int:
  """Constraint rows per contact slot."""
  if cone == ConeType.PYRAMIDAL:
    return 1 if condim == 1 else 2 * (condim - 1)
  return condim


def put_model(
  m: mujoco.MjModel,
  dtype=jnp.float32,
  allocate_friction_rows: bool = False,
) -> tuple[Topology, Model]:
  """Convert a compiled MjModel into (Topology, Model).

  Args:
    m: compiled model (solver options read from m.opt).
    dtype: float dtype of the parameter/state arrays.
    allocate_friction_rows: allocate dof-friction constraint rows for every
      dof even if dof_frictionloss is zero in the base model (needed when
      domain randomization may enable frictionloss per env).
  """
  if m.opt.integrator in (
    mujoco.mjtIntegrator.mjINT_IMPLICIT,
    mujoco.mjtIntegrator.mjINT_IMPLICITFAST,
  ):
    integrator = Integrator.IMPLICITFAST
  elif m.opt.integrator == mujoco.mjtIntegrator.mjINT_EULER:
    integrator = Integrator.EULER
  elif m.opt.integrator == mujoco.mjtIntegrator.mjINT_RK4:
    integrator = Integrator.RK4
  else:
    raise NotImplementedError(f"Integrator {m.opt.integrator} not supported.")
  # Guard against silently mis-simulated features: anything the engine
  # does not model must be rejected at conversion, not ignored.
  has_fluid = bool(
    float(m.opt.viscosity) or float(m.opt.density) or np.any(m.opt.wind)
  )
  if has_fluid and np.any(m.geom_fluid[:, 0]):
    # Per-geom ellipsoid fluid interaction; only the body-level
    # inertia-box model (MuJoCo's default) is implemented.
    raise NotImplementedError("fluidshape='ellipsoid' geoms are not supported")
  # Fluid forces under implicitfast: the drag ∂f/∂v enters the integration
  # matrix via jacfwd through the box model (forward._implicit_matrix).
  if int(m.opt.noslip_iterations) > 0:
    raise NotImplementedError("noslip post-solver is not supported")
  for u in range(m.nu):
    if int(m.actuator_gaintype[u]) not in (
      int(mujoco.mjtGain.mjGAIN_FIXED),
      int(mujoco.mjtGain.mjGAIN_MUSCLE),
    ):
      raise NotImplementedError(
        f"actuator {u}: gaintype {int(m.actuator_gaintype[u])} "
        "(FIXED and MUSCLE gains are supported)"
      )
    if int(m.actuator_biastype[u]) not in (
      int(mujoco.mjtBias.mjBIAS_NONE),
      int(mujoco.mjtBias.mjBIAS_AFFINE),
      int(mujoco.mjtBias.mjBIAS_MUSCLE),
    ):
      raise NotImplementedError(
        f"actuator {u}: biastype {int(m.actuator_biastype[u])}"
      )
    if int(m.actuator_dyntype[u]) not in (
      int(mujoco.mjtDyn.mjDYN_NONE),
      int(mujoco.mjtDyn.mjDYN_INTEGRATOR),
      int(mujoco.mjtDyn.mjDYN_FILTER),
      int(mujoco.mjtDyn.mjDYN_FILTEREXACT),
      int(mujoco.mjtDyn.mjDYN_MUSCLE),
    ):
      raise NotImplementedError(
        f"actuator {u}: activation dynamics (dyntype "
        f"{int(m.actuator_dyntype[u])}) are not supported "
        "(integrator/filter/filterexact/muscle only)"
      )
    if int(m.actuator_dyntype[u]) != int(mujoco.mjtDyn.mjDYN_NONE) and (
      int(m.actuator_actnum[u]) != 1
    ):
      raise NotImplementedError(f"actuator {u}: actnum != 1")

  cone = int(m.opt.cone)
  solver = int(m.opt.solver)
  if solver == int(mujoco.mjtSolver.mjSOL_PGS) and cone == int(
    mujoco.mjtCone.mjCONE_ELLIPTIC
  ):
    # PGS is implemented for the pyramidal cone (exact per-row dual
    # projections; solver.py pgs_solve). The elliptic dual needs per-cone
    # QCQP block projections — use newton/cg there (what every shipped
    # task uses).
    raise NotImplementedError(
      "PGS with elliptic cone is not supported; use solver='newton'/'cg' "
      "or cone='pyramidal'."
    )

  pairs_list, groups_list = _candidate_pairs(m)
  pairs = tuple(pairs_list)
  terrain_groups = tuple(groups_list)
  n_terrain_slots = sum(tg.slots * len(tg.robot_geoms) for tg in terrain_groups)
  ncon_max = sum(p.ncon for p in pairs) + n_terrain_slots

  if allocate_friction_rows:
    friction_dofs = np.arange(m.nv)
  else:
    friction_dofs = np.nonzero(m.dof_frictionloss > 0)[0]
  limited_joints = np.nonzero(
    (m.jnt_limited == 1)
    & np.isin(m.jnt_type, [mujoco.mjtJoint.mjJNT_HINGE, mujoco.mjtJoint.mjJNT_SLIDE])
  )[0]
  limited_ball_joints = np.nonzero(
    (m.jnt_limited == 1) & (m.jnt_type == mujoco.mjtJoint.mjJNT_BALL)
  )[0]

  # Equality constraints: connect (3 rows), weld (6), joint (1). Rows are
  # allocated for every compile-time-active equality; tendon/flex/distance
  # equalities are not supported (absent from the reference asset zoo).
  _EQ_ROWS = {
    int(mujoco.mjtEq.mjEQ_CONNECT): 3,
    int(mujoco.mjtEq.mjEQ_WELD): 6,
    int(mujoco.mjtEq.mjEQ_JOINT): 1,
    int(mujoco.mjtEq.mjEQ_TENDON): 1,
  }

  neq_rows = 0
  for e in range(m.neq):
    if not m.eq_active0[e]:
      continue
    et = int(m.eq_type[e])
    if et not in _EQ_ROWS:
      raise NotImplementedError(f"equality constraint type {et} not supported")
    if et in (int(mujoco.mjtEq.mjEQ_CONNECT), int(mujoco.mjtEq.mjEQ_WELD)):
      if int(m.eq_objtype[e]) not in (
        int(mujoco.mjtObj.mjOBJ_BODY),
        int(mujoco.mjtObj.mjOBJ_SITE),
      ):
        raise NotImplementedError("connect/weld objtype must be body or site")
    neq_rows += _EQ_ROWS[et]

  # Tendon topology: kind, spatial segment lists, range-limit rows.
  tendon_kind = np.zeros(m.ntendon, dtype=np.int32)
  seg_lists: list[list[tuple[int, int, float, int, int]]] = []
  for t in range(m.ntendon):
    if _is_spatial_tendon(m, t):
      tendon_kind[t] = 1
      seg_lists.append(_spatial_tendon_segments(m, t))
    else:
      seg_lists.append([])
  max_s = max((len(c) for c in seg_lists), default=0)
  shape = (m.ntendon, max(max_s, 1))
  tendon_seg_sites = np.full(shape + (2,), -1, dtype=np.int32)
  tendon_seg_scale = np.zeros(shape)
  tendon_seg_geom = np.full(shape, -1, dtype=np.int32)
  tendon_seg_side = np.full(shape, -1, dtype=np.int32)
  for t, segs in enumerate(seg_lists):
    for k, (sa, sb, scale, g, side) in enumerate(segs):
      tendon_seg_sites[t, k] = (sa, sb)
      tendon_seg_scale[t, k] = scale
      tendon_seg_geom[t, k] = g
      tendon_seg_side[t, k] = side
  limited_tendons = np.nonzero(m.tendon_limited == 1)[0]

  nefc = (
    neq_rows
    + len(friction_dofs)
    + len(limited_joints)
    + len(limited_ball_joints)
    + len(limited_tendons)
    + sum(p.ncon * contact_rows(p.condim, cone) for p in pairs)
    + sum(
      tg.slots * sum(contact_rows(int(c), cone) for c in tg.condim)
      for tg in terrain_groups
    )
  )

  trn_qmat, trn_vmat, actuator_dyn_tendon = _transmission_matrices(m)
  tendon_qmat, tendon_vmat = _tendon_matrices(m)

  from mjlab_tpu.physics.convex import build_hull

  mesh_geoms = (
    {p.geom2 for p in pairs if p.type2 == int(_G.mjGEOM_MESH)}
    | {p.geom1 for p in pairs if p.type1 == int(_G.mjGEOM_MESH)}
    | {
      int(g)
      for tg in terrain_groups
      if tg.robot_type == int(_G.mjGEOM_MESH)
      for g in tg.robot_geoms
    }
  )
  # Cache hulls by mesh id / primitive signature: entities attached per-env
  # scene share meshes and repeat identical primitive sizes.
  _hull_cache: dict[object, object] = {}
  geom_hulls = {}
  for g in mesh_geoms:
    t = int(m.geom_type[g])
    if t == int(_G.mjGEOM_MESH):
      cache_key: object = int(m.geom_dataid[g])
      if cache_key not in _hull_cache:
        _hull_cache[cache_key] = build_hull(_hull_vertices(m, g))
    else:
      # Rounded primitive routed through the SAT path: tessellated hull
      # (_pair_key fallback; plane pairs stay analytic).
      size = m.geom_size[g]
      cache_key = (t, float(size[0]), float(size[1]), float(size[2]))
      if cache_key not in _hull_cache:
        _hull_cache[cache_key] = build_hull(_primitive_hull_vertices(t, size))
    geom_hulls[g] = _hull_cache[cache_key]

  tp = Topology(
    nq=m.nq,
    nv=m.nv,
    nu=m.nu,
    nbody=m.nbody,
    njnt=m.njnt,
    ngeom=m.ngeom,
    nsite=m.nsite,
    nsensor=m.nsensor,
    nsensordata=m.nsensordata,
    nmocap=m.nmocap,
    body_parentid=m.body_parentid.copy(),
    body_rootid=m.body_rootid.copy(),
    body_weldid=m.body_weldid.copy(),
    body_jntadr=m.body_jntadr.copy(),
    body_jntnum=m.body_jntnum.copy(),
    body_dofadr=m.body_dofadr.copy(),
    body_dofnum=m.body_dofnum.copy(),
    body_geomadr=m.body_geomadr.copy(),
    body_geomnum=m.body_geomnum.copy(),
    body_mocapid=m.body_mocapid.copy(),
    jnt_type=m.jnt_type.copy(),
    jnt_qposadr=m.jnt_qposadr.copy(),
    jnt_dofadr=m.jnt_dofadr.copy(),
    jnt_bodyid=m.jnt_bodyid.copy(),
    jnt_limited=m.jnt_limited.copy(),
    jnt_actfrclimited=m.jnt_actfrclimited.copy(),
    dof_bodyid=m.dof_bodyid.copy(),
    dof_jntid=m.dof_jntid.copy(),
    dof_parentid=m.dof_parentid.copy(),
    geom_type=m.geom_type.copy(),
    geom_bodyid=m.geom_bodyid.copy(),
    geom_condim=m.geom_condim.copy(),
    geom_priority=m.geom_priority.copy(),
    geom_dataid=m.geom_dataid.copy(),
    geom_hulls=geom_hulls,
    body_gravcomp_host=m.body_gravcomp.copy(),
    has_fluid=has_fluid,
    site_bodyid=m.site_bodyid.copy(),
    site_type=m.site_type.copy(),
    site_size=m.site_size.copy(),
    actuator_trntype=m.actuator_trntype.copy(),
    actuator_trnid=m.actuator_trnid.copy(),
    trn_qmat=trn_qmat,
    trn_vmat=trn_vmat,
    ntendon=m.ntendon,
    tendon_qmat=tendon_qmat,
    tendon_vmat=tendon_vmat,
    tendon_length0=m.tendon_length0.copy(),
    tendon_invweight0=m.tendon_invweight0.copy(),
    tendon_kind=tendon_kind,
    tendon_seg_sites=tendon_seg_sites,
    tendon_seg_scale=tendon_seg_scale,
    tendon_seg_geom=tendon_seg_geom,
    tendon_seg_side=tendon_seg_side,
    limited_tendon_ids=limited_tendons,
    actuator_dyn_tendon=actuator_dyn_tendon,
    actuator_gaintype=m.actuator_gaintype.copy(),
    actuator_biastype=m.actuator_biastype.copy(),
    actuator_ctrllimited=m.actuator_ctrllimited.copy(),
    actuator_forcelimited=m.actuator_forcelimited.copy(),
    na=int(m.na),
    actuator_dyntype=m.actuator_dyntype.copy(),
    actuator_actadr=m.actuator_actadr.copy(),
    actuator_actlimited=m.actuator_actlimited.copy(),
    actuator_actearly=m.actuator_actearly.copy(),
    act_actuator=np.array(
      [u for u in range(m.nu) if m.actuator_actadr[u] >= 0], dtype=np.int32
    ),
    sensor_type=m.sensor_type.copy(),
    sensor_datatype=m.sensor_datatype.copy(),
    sensor_objtype=m.sensor_objtype.copy(),
    sensor_objid=m.sensor_objid.copy(),
    sensor_reftype=m.sensor_reftype.copy(),
    sensor_refid=m.sensor_refid.copy(),
    sensor_adr=m.sensor_adr.copy(),
    sensor_dim=m.sensor_dim.copy(),
    body_levels=_body_levels(m),
    dof_ancestor_mask=_dof_ancestor_mask(m),
    body_subtree_mask=_body_masks(m)[0],
    body_dof_mask=_body_masks(m)[1],
    limited_joint_ids=limited_joints,
    limited_ball_joint_ids=limited_ball_joints,
    friction_dof_ids=friction_dofs,
    eq_type=m.eq_type.copy(),
    eq_obj1id=m.eq_obj1id.copy(),
    eq_obj2id=m.eq_obj2id.copy(),
    eq_objtype=m.eq_objtype.copy(),
    eq_active0=m.eq_active0.copy().astype(bool),
    neq_rows=neq_rows,
    pairs=pairs,
    terrain_groups=terrain_groups,
    ncon_max=ncon_max,
    nefc=nefc,
    nhfield=m.nhfield,
    hfield_nrow=m.hfield_nrow.copy(),
    hfield_ncol=m.hfield_ncol.copy(),
    hfield_adr=m.hfield_adr.copy(),
  )

  def arr(x):
    # Model leaves stay NUMPY: physics functions close over / receive them
    # and numpy inputs inline as HLO literals at trace time — zero runtime
    # argument marshaling, and safe on runtimes where captured DEVICE
    # constants trigger a slow mode (docs/PERF_NOTES.md). Leaves selected
    # for domain randomization are promoted to batched device arrays by
    # Simulation.expand_model_fields.
    return np.asarray(x, dtype=dtype)

  opt = Option(
    timestep=arr(m.opt.timestep),
    gravity=arr(m.opt.gravity),
    magnetic=arr(m.opt.magnetic),
    impratio=arr(m.opt.impratio),
    tolerance=arr(m.opt.tolerance),
    ls_tolerance=arr(m.opt.ls_tolerance),
    density=arr(m.opt.density),
    viscosity=arr(m.opt.viscosity),
    wind=arr(m.opt.wind),
    integrator=integrator,
    cone=cone,
    solver=solver,
    iterations=int(m.opt.iterations),
    ls_iterations=int(m.opt.ls_iterations),
  )

  model = Model(
    opt=opt,
    qpos0=arr(m.qpos0),
    qpos_spring=arr(m.qpos_spring),
    body_pos=arr(m.body_pos),
    body_quat=arr(m.body_quat),
    body_ipos=arr(m.body_ipos),
    body_iquat=arr(m.body_iquat),
    body_mass=arr(m.body_mass),
    body_inertia=arr(m.body_inertia),
    body_invweight0=arr(m.body_invweight0),
    body_subtreemass=arr(m.body_subtreemass),
    body_gravcomp=arr(m.body_gravcomp),
    jnt_axis=arr(m.jnt_axis),
    jnt_pos=arr(m.jnt_pos),
    jnt_range=arr(m.jnt_range),
    jnt_stiffness=arr(m.jnt_stiffness),
    jnt_margin=arr(m.jnt_margin),
    jnt_solref=arr(m.jnt_solref),
    jnt_solimp=arr(m.jnt_solimp),
    dof_armature=arr(m.dof_armature),
    dof_damping=arr(m.dof_damping),
    dof_frictionloss=arr(m.dof_frictionloss),
    dof_invweight0=arr(m.dof_invweight0),
    dof_solref=arr(m.dof_solref),
    dof_solimp=arr(m.dof_solimp),
    geom_pos=arr(m.geom_pos),
    geom_quat=arr(m.geom_quat),
    geom_size=arr(m.geom_size),
    geom_friction=arr(m.geom_friction),
    geom_solref=arr(m.geom_solref),
    geom_solimp=arr(m.geom_solimp),
    geom_solmix=arr(m.geom_solmix),
    geom_margin=arr(m.geom_margin),
    pair_friction=arr(m.pair_friction if m.npair else np.zeros((0, 5))),
    pair_solref=arr(m.pair_solref if m.npair else np.zeros((0, 2))),
    pair_solreffriction=arr(
      m.pair_solreffriction if m.npair else np.zeros((0, 2))
    ),
    pair_solimp=arr(m.pair_solimp if m.npair else np.zeros((0, 5))),
    pair_margin=arr(m.pair_margin if m.npair else np.zeros(0)),
    site_pos=arr(m.site_pos),
    site_quat=arr(m.site_quat),
    actuator_gainprm=arr(m.actuator_gainprm),
    actuator_biasprm=arr(m.actuator_biasprm),
    actuator_gear=arr(m.actuator_gear),
    actuator_ctrlrange=arr(m.actuator_ctrlrange),
    actuator_forcerange=arr(m.actuator_forcerange),
    actuator_dynprm=arr(m.actuator_dynprm),
    actuator_actrange=arr(m.actuator_actrange),
    actuator_lengthrange=arr(m.actuator_lengthrange),
    actuator_acc0=arr(m.actuator_acc0),
    hfield_data=arr(m.hfield_data if m.nhfield else np.zeros(0)),
    hfield_size=arr(m.hfield_size if m.nhfield else np.zeros((0, 4))),
    eq_solref=arr(m.eq_solref if m.neq else np.zeros((0, 2))),
    eq_solimp=arr(m.eq_solimp if m.neq else np.zeros((0, 5))),
    eq_data=arr(m.eq_data if m.neq else np.zeros((0, 11))),
    tendon_range=arr(m.tendon_range),
    tendon_margin=arr(m.tendon_margin),
    tendon_stiffness=arr(m.tendon_stiffness),
    tendon_damping=arr(m.tendon_damping),
    tendon_lengthspring=arr(m.tendon_lengthspring),
    tendon_solref_lim=arr(m.tendon_solref_lim),
    tendon_solimp_lim=arr(m.tendon_solimp_lim),
  )
  return tp, model


def make_data(tp: Topology, model: Model, dtype=None) -> Data:
  """Fresh single-world Data at qpos0. Call forward() to populate derived state."""
  if dtype is None:
    dtype = model.qpos0.dtype

  def z(*shape):
    return jnp.zeros(shape, dtype=dtype)

  contact = Contact(
    dist=jnp.full((tp.ncon_max,), 1e10, dtype=dtype),
    pos=z(tp.ncon_max, 3),
    frame=jnp.tile(jnp.eye(3, dtype=dtype), (tp.ncon_max, 1, 1)),
    includemargin=z(tp.ncon_max),
    friction=jnp.tile(
      jnp.asarray([1.0, 1.0, 0.005, 0.0001, 0.0001], dtype=dtype), (tp.ncon_max, 1)
    ),
    solref=jnp.tile(jnp.asarray([0.02, 1.0], dtype=dtype), (tp.ncon_max, 1)),
    solimp=jnp.tile(
      jnp.asarray([0.9, 0.95, 0.001, 0.5, 2.0], dtype=dtype), (tp.ncon_max, 1)
    ),
    solreffriction=z(tp.ncon_max, 2),
  )

  eye3 = jnp.eye(3, dtype=dtype)
  return Data(
    time=z(),
    qpos=jnp.asarray(model.qpos0, dtype=dtype),
    qvel=z(tp.nv),
    act=z(tp.na),
    ctrl=z(tp.nu),
    qfrc_applied=z(tp.nv),
    xfrc_applied=z(tp.nbody, 6),
    mocap_pos=z(tp.nmocap, 3),
    mocap_quat=jnp.tile(
      jnp.asarray([1.0, 0, 0, 0], dtype=dtype), (tp.nmocap, 1)
    ),
    qacc_warmstart=z(tp.nv),
    xanchor=z(tp.njnt, 3),
    xaxis=z(tp.njnt, 3),
    xpos=z(tp.nbody, 3),
    xquat=jnp.tile(jnp.asarray([1.0, 0, 0, 0], dtype=dtype), (tp.nbody, 1)),
    xmat=jnp.tile(eye3, (tp.nbody, 1, 1)),
    xipos=z(tp.nbody, 3),
    ximat=jnp.tile(eye3, (tp.nbody, 1, 1)),
    geom_xpos=z(tp.ngeom, 3),
    geom_xmat=jnp.tile(eye3, (tp.ngeom, 1, 1)),
    site_xpos=z(tp.nsite, 3),
    site_xmat=jnp.tile(eye3, (tp.nsite, 1, 1)),
    ten_length=z(tp.ntendon),
    ten_velocity=z(tp.ntendon),
    ten_J=z(tp.ntendon, tp.nv),
    subtree_com=z(tp.nbody, 3),
    cinert=z(tp.nbody, 10),
    cdof=z(tp.nv, 6),
    cvel=z(tp.nbody, 6),
    cdof_dot=z(tp.nv, 6),
    qM=z(tp.nv, tp.nv),
    qLD=z(tp.nv, tp.nv),
    qfrc_bias=z(tp.nv),
    qfrc_passive=z(tp.nv),
    qfrc_spring=z(tp.nv),
    qfrc_damper=z(tp.nv),
    actuator_length=z(tp.nu),
    actuator_velocity=z(tp.nu),
    actuator_force=z(tp.nu),
    act_dot=z(tp.na),
    qfrc_actuator=z(tp.nv),
    qfrc_smooth=z(tp.nv),
    qacc_smooth=z(tp.nv),
    contact=contact,
    efc_J=z(tp.nefc, tp.nv),
    efc_D=z(tp.nefc),
    efc_aref=z(tp.nefc),
    efc_pos=z(tp.nefc),
    efc_margin=z(tp.nefc),
    efc_frictionloss=z(tp.nefc),
    efc_force=z(tp.nefc),
    qfrc_constraint=z(tp.nv),
    qacc=z(tp.nv),
    sensordata=z(tp.nsensordata),
    subtree_linvel=z(tp.nbody, 3),
    subtree_angmom=z(tp.nbody, 3),
    ncon_dropped=jnp.zeros((), jnp.int32),
  )


def model_fields() -> list[str]:
  """Names of DR-able Model leaves."""
  return [f.name for f in dataclasses.fields(Model) if f.name != "opt"]
