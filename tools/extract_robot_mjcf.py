"""Derive physics-only robot MJCF for the asset zoo.

The reference ships robot models as menagerie-style MJCF with STL visual
meshes (reference asset_zoo/robots/*/xmls/*.xml). The visual geoms are
physics-inert: every body carries an explicit <inertial>, and visual geoms
have contype=0, conaffinity=0, density=0. This tool loads the upstream
robot description, deletes the visual-only geoms and all mesh/material
assets, and re-emits MuJoCo's canonical XML serialization — a standalone,
mesh-free model that is bit-identical in dynamics to the original.

Parity is enforced: we compile both models and require identical mass
matrices, qpos0, and a multi-second mj_step rollout match before writing.

Usage: python tools/extract_robot_mjcf.py
"""

from __future__ import annotations

import sys
from pathlib import Path

import mujoco
import numpy as np

REF = Path("/root/reference/src/mjlab/asset_zoo/robots")
OUT = Path(__file__).resolve().parent.parent / "mjlab_tpu" / "asset_zoo" / "robots"

ROBOTS = {
  "unitree_g1/xmls/g1.xml": "unitree_g1/xmls/g1.xml",
  "unitree_go1/xmls/go1.xml": "unitree_go1/xmls/go1.xml",
  "asimov/xmls/asimov.xml": "asimov/xmls/asimov.xml",
  "asimov/xmls/asimov_toe.xml": "asimov/xmls/asimov_toe.xml",
}


def load_assets(xml_path: Path) -> dict[str, bytes]:
  assets: dict[str, bytes] = {}
  asset_dir = xml_path.parent / "assets"
  if asset_dir.is_dir():
    for f in asset_dir.iterdir():
      data = f.read_bytes()
      assets[f.name] = data
      assets[f"assets/{f.name}"] = data
  return assets


def placeholder_stl() -> bytes:
  """Minimal valid binary STL (one tetrahedron). Visual meshes are massless
  (density=0, explicit body inertials), so content is physics-irrelevant;
  this stands in for meshes absent from the reference checkout."""
  import struct

  tris = [
    ((0, 0, 0), (1, 0, 0), (0, 1, 0)),
    ((0, 0, 0), (1, 0, 0), (0, 0, 1)),
    ((0, 0, 0), (0, 1, 0), (0, 0, 1)),
    ((1, 0, 0), (0, 1, 0), (0, 0, 1)),
  ]
  out = b"\x00" * 80 + struct.pack("<I", len(tris))
  for tri in tris:
    out += struct.pack("<3f", 0, 0, 0)
    for v in tri:
      out += struct.pack("<3f", *v)
    out += struct.pack("<H", 0)
  return out


def load_spec(xml_path: Path) -> mujoco.MjSpec:
  spec = mujoco.MjSpec.from_file(str(xml_path))
  assets = load_assets(xml_path)
  for mesh in spec.meshes:
    fname = mesh.file
    if fname and Path(fname).name not in {Path(k).name for k in assets}:
      assets[fname] = placeholder_stl()
      assets[Path(fname).name] = placeholder_stl()
  spec.assets = assets
  return spec


def strip_visual(spec: mujoco.MjSpec) -> None:
  """Remove physics-inert visual elements in place."""
  for geom in list(spec.geoms):
    visual = (
      geom.contype == 0
      and geom.conaffinity == 0
      and geom.type == mujoco.mjtGeom.mjGEOM_MESH
    )
    if visual:
      spec.delete(geom)
  used_meshes = {g.meshname for g in spec.geoms if g.meshname}
  for mesh in list(spec.meshes):
    if mesh.name not in used_meshes:
      spec.delete(mesh)
  # Materials are kept (tiny rgba-only definitions, may be referenced from
  # default classes); textures and their files go.
  for tex in list(spec.textures):
    spec.delete(tex)
  for mat in spec.materials:
    for role in range(len(mat.textures)):
      mat.textures[role] = ""
  kept_files = {Path(m.file).name for m in spec.meshes if m.file}
  spec.assets = {
    k: v for k, v in spec.assets.items() if Path(k).name in kept_files
  }


def rollout(model: mujoco.MjModel, nsteps: int = 400) -> np.ndarray:
  data = mujoco.MjData(model)
  mujoco.mj_resetData(model, data)
  traj = []
  for i in range(nsteps):
    if model.nu:
      data.ctrl[:] = 0.1 * np.sin(0.01 * i + np.arange(model.nu))
    mujoco.mj_step(model, data)
    traj.append(data.qpos.copy())
  return np.asarray(traj)


def check_parity(full: mujoco.MjModel, lean: mujoco.MjModel) -> None:
  assert full.nq == lean.nq and full.nv == lean.nv and full.nu == lean.nu
  assert full.nbody == lean.nbody
  np.testing.assert_array_equal(full.body_mass, lean.body_mass)
  np.testing.assert_array_equal(full.body_inertia, lean.body_inertia)
  np.testing.assert_array_equal(full.body_ipos, lean.body_ipos)
  np.testing.assert_array_equal(full.qpos0, lean.qpos0)
  tf = rollout(full)
  tl = rollout(lean)
  np.testing.assert_allclose(tf, tl, rtol=0, atol=1e-12)


def main() -> None:
  for src_rel, dst_rel in ROBOTS.items():
    src = REF / src_rel
    dst = OUT / dst_rel
    dst.parent.mkdir(parents=True, exist_ok=True)

    full_model = load_spec(src).compile()
    spec = load_spec(src)
    strip_visual(spec)
    lean_model = spec.compile()
    check_parity(full_model, lean_model)

    xml = spec.to_xml()
    dst.write_text(xml)
    # Collision meshes (if any survive stripping) ship alongside the XML.
    kept = {Path(m.file).name for m in spec.meshes if m.file}
    if kept:
      asset_dst = dst.parent / "assets"
      asset_dst.mkdir(exist_ok=True)
      for name in sorted(kept):
        src_file = src.parent / "assets" / name
        (asset_dst / name).write_bytes(src_file.read_bytes())
    ngeom_removed = full_model.ngeom - lean_model.ngeom
    print(
      f"{src_rel}: wrote {dst} ({len(xml)} bytes, {len(kept)} meshes kept, "
      f"{ngeom_removed} visual geoms removed, parity OK)"
    )


if __name__ == "__main__":
  sys.exit(main())
