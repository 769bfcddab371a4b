"""Geometry extraction for the browser viewer.

Converts MjModel geoms into triangle-mesh data (vertices/faces/colors) that
any mesh-streaming frontend can consume. Pure numpy — independent of the
`viser` package so it is unit-testable in this environment. Mirrors the
role of the reference's viser_conversions.py (trimesh-based; here meshes
are generated directly to avoid the trimesh dependency).
"""

from __future__ import annotations

from dataclasses import dataclass

import mujoco
import numpy as np


@dataclass
class MeshData:
  vertices: np.ndarray  # (V, 3) float32, geom-local frame
  faces: np.ndarray  # (F, 3) int32
  color: tuple[float, float, float]
  opacity: float


def _uv_sphere(radius: float, rings: int = 12, sectors: int = 24):
  phi = np.linspace(0, np.pi, rings)
  theta = np.linspace(0, 2 * np.pi, sectors, endpoint=False)
  verts = [(0.0, 0.0, radius)]
  for p in phi[1:-1]:
    for t in theta:
      verts.append(
        (radius * np.sin(p) * np.cos(t), radius * np.sin(p) * np.sin(t),
         radius * np.cos(p))
      )
  verts.append((0.0, 0.0, -radius))
  verts = np.asarray(verts, dtype=np.float32)

  faces = []
  # Top cap.
  for s in range(sectors):
    faces.append((0, 1 + s, 1 + (s + 1) % sectors))
  # Body.
  for r in range(rings - 3):
    a = 1 + r * sectors
    b = 1 + (r + 1) * sectors
    for s in range(sectors):
      s2 = (s + 1) % sectors
      faces.append((a + s, b + s, b + s2))
      faces.append((a + s, b + s2, a + s2))
  # Bottom cap.
  last = len(verts) - 1
  base = last - sectors
  for s in range(sectors):
    faces.append((last, base + (s + 1) % sectors, base + s))
  return verts, np.asarray(faces, dtype=np.int32)


def _box(half_extents: np.ndarray):
  hx, hy, hz = [float(v) for v in half_extents]
  verts = np.array(
    [[sx * hx, sy * hy, sz * hz]
     for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    dtype=np.float32,
  )
  # Each quad split into two triangles, outward winding.
  quads = [
    (0, 1, 3, 2),  # -x
    (4, 6, 7, 5),  # +x
    (0, 4, 5, 1),  # -y
    (2, 3, 7, 6),  # +y
    (0, 2, 6, 4),  # -z
    (1, 5, 7, 3),  # +z
  ]
  faces = []
  for a, b, c, d in quads:
    faces.append((a, b, c))
    faces.append((a, c, d))
  return verts, np.asarray(faces, dtype=np.int32)


def _capsule(radius: float, half_length: float, rings: int = 8,
             sectors: int = 16):
  """Capsule along z: cylinder of half-length L capped by hemispheres."""
  verts, faces = _uv_sphere(radius, rings=2 * rings, sectors=sectors)
  out = verts.copy()
  out[:, 2] = np.where(verts[:, 2] > 0, verts[:, 2] + half_length,
                       verts[:, 2] - half_length)
  return out, faces


def _cylinder(radius: float, half_length: float, sectors: int = 24):
  theta = np.linspace(0, 2 * np.pi, sectors, endpoint=False)
  ring = np.stack(
    [radius * np.cos(theta), radius * np.sin(theta)], axis=1
  ).astype(np.float32)
  top = np.hstack([ring, np.full((sectors, 1), half_length, np.float32)])
  bot = np.hstack([ring, np.full((sectors, 1), -half_length, np.float32)])
  verts = np.vstack([top, bot, [[0, 0, half_length]], [[0, 0, -half_length]]])
  tc, bc = 2 * sectors, 2 * sectors + 1
  faces = []
  for s in range(sectors):
    s2 = (s + 1) % sectors
    faces.append((s, sectors + s, sectors + s2))  # wall
    faces.append((s, sectors + s2, s2))
    faces.append((tc, s, s2))  # top cap
    faces.append((bc, sectors + s2, sectors + s))  # bottom cap
  return verts, np.asarray(faces, dtype=np.int32)


def _plane(half_x: float, half_y: float):
  hx = half_x if half_x > 0 else 25.0
  hy = half_y if half_y > 0 else 25.0
  verts = np.array(
    [[-hx, -hy, 0], [hx, -hy, 0], [hx, hy, 0], [-hx, hy, 0]], dtype=np.float32
  )
  faces = np.array([[0, 1, 2], [0, 2, 3]], dtype=np.int32)
  return verts, faces


def _hfield(model: mujoco.MjModel, hid: int):
  nrow, ncol = int(model.hfield_nrow[hid]), int(model.hfield_ncol[hid])
  size = model.hfield_size[hid]  # (radius_x, radius_y, elevation, base)
  adr = int(model.hfield_adr[hid])
  raster = model.hfield_data[adr: adr + nrow * ncol].reshape(nrow, ncol)
  xs = np.linspace(-size[0], size[0], ncol, dtype=np.float32)
  ys = np.linspace(-size[1], size[1], nrow, dtype=np.float32)
  zz = (raster * size[2]).astype(np.float32)
  xx, yy = np.meshgrid(xs, ys)
  verts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
  faces = []
  for r in range(nrow - 1):
    for c in range(ncol - 1):
      a = r * ncol + c
      faces.append((a, a + 1, a + ncol + 1))
      faces.append((a, a + ncol + 1, a + ncol))
  return verts, np.asarray(faces, dtype=np.int32)


def _mesh(model: mujoco.MjModel, mid: int):
  vadr, vnum = int(model.mesh_vertadr[mid]), int(model.mesh_vertnum[mid])
  fadr, fnum = int(model.mesh_faceadr[mid]), int(model.mesh_facenum[mid])
  verts = model.mesh_vert[vadr: vadr + vnum].astype(np.float32)
  faces = model.mesh_face[fadr: fadr + fnum].astype(np.int32)
  return verts, faces


def geom_rgba(model: mujoco.MjModel, geom_id: int) -> np.ndarray:
  """Effective display color: the geom's material color when a material is
  assigned and the geom rgba is the 0.5-gray default, else geom_rgba
  (reference viser_conversions.py resolves the same precedence through
  trimesh visuals)."""
  rgba = np.asarray(model.geom_rgba[geom_id], dtype=np.float64)
  matid = int(model.geom_matid[geom_id])
  if matid >= 0 and np.allclose(rgba, (0.5, 0.5, 0.5, 1.0)):
    return np.asarray(model.mat_rgba[matid], dtype=np.float64)
  return rgba


def geom_to_mesh(model: mujoco.MjModel, geom_id: int) -> MeshData | None:
  """Triangle mesh for one geom in its local frame; None if unsupported."""
  gtype = int(model.geom_type[geom_id])
  size = model.geom_size[geom_id]
  rgba = geom_rgba(model, geom_id)
  mjt = mujoco.mjtGeom
  if gtype == mjt.mjGEOM_SPHERE:
    v, f = _uv_sphere(float(size[0]))
  elif gtype == mjt.mjGEOM_BOX:
    v, f = _box(size)
  elif gtype == mjt.mjGEOM_CAPSULE:
    # geom_size for capsule/cylinder = (radius, half_length, _).
    v, f = _capsule(float(size[0]), float(size[1]))
  elif gtype == mjt.mjGEOM_CYLINDER:
    v, f = _cylinder(float(size[0]), float(size[1]))
  elif gtype == mjt.mjGEOM_ELLIPSOID:
    v, f = _uv_sphere(1.0)
    v = v * np.asarray(size, dtype=np.float32)
  elif gtype == mjt.mjGEOM_PLANE:
    v, f = _plane(float(size[0]), float(size[1]))
  elif gtype == mjt.mjGEOM_HFIELD:
    v, f = _hfield(model, int(model.geom_dataid[geom_id]))
  elif gtype == mjt.mjGEOM_MESH:
    v, f = _mesh(model, int(model.geom_dataid[geom_id]))
  else:
    return None
  return MeshData(
    vertices=v,
    faces=f,
    color=(float(rgba[0]), float(rgba[1]), float(rgba[2])),
    opacity=float(rgba[3]),
  )


def extract_scene_meshes(model: mujoco.MjModel) -> dict[int, MeshData]:
  """All renderable geoms keyed by geom id."""
  out: dict[int, MeshData] = {}
  for gid in range(model.ngeom):
    mesh = geom_to_mesh(model, gid)
    if mesh is not None and mesh.opacity > 0.0:
      out[gid] = mesh
  return out


# -- body-level merging (reference viser_conversions.merge_geoms) ------------


def _quat_to_mat(quat: np.ndarray) -> np.ndarray:
  w, x, y, z = [float(v) for v in quat]
  return np.array(
    [
      [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
      [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
      [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ],
    dtype=np.float32,
  )


def transform_mesh(mesh: MeshData, pos: np.ndarray, quat: np.ndarray) -> MeshData:
  """Mesh with vertices mapped local→parent frame by (pos, quat wxyz)."""
  rot = _quat_to_mat(np.asarray(quat, dtype=np.float64))
  verts = mesh.vertices @ rot.T + np.asarray(pos, dtype=np.float32)
  return MeshData(
    vertices=verts.astype(np.float32),
    faces=mesh.faces,
    color=mesh.color,
    opacity=mesh.opacity,
  )


def merge_meshes(meshes: list[MeshData]) -> MeshData | None:
  """Concatenate meshes into one (vertex-count-weighted average color),
  mirroring the reference's trimesh concatenation (merge_geoms)."""
  meshes = [m for m in meshes if m is not None]
  if not meshes:
    return None
  offsets = np.cumsum([0] + [m.vertices.shape[0] for m in meshes[:-1]])
  verts = np.concatenate([m.vertices for m in meshes], axis=0)
  faces = np.concatenate(
    [m.faces + off for m, off in zip(meshes, offsets)], axis=0
  ).astype(np.int32)
  weights = np.asarray([m.vertices.shape[0] for m in meshes], dtype=np.float64)
  weights /= weights.sum()
  color = tuple(
    float(np.dot(weights, [m.color[k] for m in meshes])) for k in range(3)
  )
  opacity = float(np.dot(weights, [m.opacity for m in meshes]))
  return MeshData(vertices=verts, faces=faces, color=color, opacity=opacity)


def merge_geoms(model: mujoco.MjModel, geom_ids: list[int]) -> MeshData | None:
  """Merged mesh for several geoms of one body, in the body frame
  (reference viser_conversions.py:308 merge_geoms)."""
  parts = []
  for gid in geom_ids:
    mesh = geom_to_mesh(model, gid)
    if mesh is None:
      continue
    parts.append(
      transform_mesh(mesh, model.geom_pos[gid], model.geom_quat[gid])
    )
  return merge_meshes(parts)


def is_fixed_body(model: mujoco.MjModel, body_id: int) -> bool:
  """True if the body is welded to the world (mocap bodies count as mobile) —
  reference viser_conversions.py:403."""
  if int(model.body_mocapid[body_id]) >= 0:
    return False
  return int(model.body_weldid[body_id]) == 0


def is_collision_geom(model: mujoco.MjModel, geom_id: int) -> bool:
  return bool(
    model.geom_contype[geom_id] != 0 or model.geom_conaffinity[geom_id] != 0
  )


def get_body_name(model: mujoco.MjModel, body_id: int) -> str:
  name = mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_BODY, body_id)
  return (name or f"body_{body_id}").replace("/", "_")
