"""Viewer geometry-extraction tests (viser-independent data path of the
browser viewer stack)."""

import mujoco
import numpy as np

from mjlab_tpu.viewer.viser_conversions import extract_scene_meshes, geom_to_mesh
from mjlab_tpu.viewer.viser_reward_plotter import RewardSeries

XML = """
<mujoco>
  <asset>
    <hfield name="hf" nrow="4" ncol="5" size="1 1 0.3 0.1"/>
  </asset>
  <worldbody>
    <geom name="floor" type="plane" size="2 2 1"/>
    <geom name="hill" type="hfield" hfield="hf" pos="5 0 0"/>
    <body name="b" pos="0 0 1">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.2"/>
      <geom name="box" type="box" size="0.1 0.2 0.3" pos="0.5 0 0"/>
      <geom name="cap" type="capsule" size="0.05 0.15" pos="1 0 0"/>
      <geom name="cyl" type="cylinder" size="0.05 0.15" pos="1.5 0 0"/>
      <geom name="ell" type="ellipsoid" size="0.1 0.2 0.3" pos="2 0 0"/>
      <geom name="hidden" type="sphere" size="0.1" rgba="1 0 0 0" pos="3 0 0"/>
    </body>
  </worldbody>
</mujoco>
"""


def _model():
  return mujoco.MjSpec.from_string(XML).compile()


def _check_mesh(mesh, expect_max_extent=None):
  v, f = mesh.vertices, mesh.faces
  assert v.ndim == 2 and v.shape[1] == 3
  assert f.ndim == 2 and f.shape[1] == 3
  assert f.min() >= 0 and f.max() < len(v)
  if expect_max_extent is not None:
    # rtol accounts for UV-sphere ring discretization (vertices lie ON the
    # surface, so extents are within a few % below the analytic bound).
    np.testing.assert_allclose(
      np.abs(v).max(axis=0), expect_max_extent, rtol=2e-2
    )
    assert (np.abs(v).max(axis=0) <= np.asarray(expect_max_extent) + 1e-6).all()


def test_primitive_meshes():
  m = _model()
  _check_mesh(geom_to_mesh(m, m.geom("ball").id), [0.2, 0.2, 0.2])
  _check_mesh(geom_to_mesh(m, m.geom("box").id), [0.1, 0.2, 0.3])
  # Capsule: radius 0.05, half-length 0.15 → z extent 0.2.
  _check_mesh(geom_to_mesh(m, m.geom("cap").id), [0.05, 0.05, 0.2])
  _check_mesh(geom_to_mesh(m, m.geom("cyl").id), [0.05, 0.05, 0.15])
  _check_mesh(geom_to_mesh(m, m.geom("ell").id), [0.1, 0.2, 0.3])


def test_plane_and_hfield():
  m = _model()
  plane = geom_to_mesh(m, m.geom("floor").id)
  _check_mesh(plane)
  np.testing.assert_allclose(np.abs(plane.vertices[:, :2]).max(), 2.0)

  hill = geom_to_mesh(m, m.geom("hill").id)
  _check_mesh(hill)
  assert hill.vertices.shape[0] == 4 * 5
  assert hill.faces.shape[0] == 2 * 3 * 4


def test_extract_scene_skips_invisible():
  m = _model()
  meshes = extract_scene_meshes(m)
  hidden_id = m.geom("hidden").id
  assert hidden_id not in meshes
  assert m.geom("ball").id in meshes
  # Color from rgba.
  ball = meshes[m.geom("ball").id]
  assert 0.0 <= ball.color[0] <= 1.0


def test_box_winding_outward():
  """All box face normals must point away from the center (correct winding
  for backface-culled renderers)."""
  m = _model()
  mesh = geom_to_mesh(m, m.geom("box").id)
  v, f = mesh.vertices, mesh.faces
  tri = v[f]  # (F, 3, 3)
  normals = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
  centroids = tri.mean(axis=1)
  assert (np.einsum("ij,ij->i", normals, centroids) > 0).all()


def test_reward_series_rolling():
  rs = RewardSeries(["alive", "slip"], window=5)
  for i in range(7):
    rs.append({"alive": float(i), "slip": -float(i)})
  np.testing.assert_allclose(rs.series("alive"), [2, 3, 4, 5, 6])
  np.testing.assert_allclose(rs.series("slip"), [-2, -3, -4, -5, -6])
  assert rs.x[-1] == 7
