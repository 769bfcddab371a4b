"""Browser-viewer scene management (reference viewer/viser_scene.py).

`ViserMjScene` owns the viser scene graph for one MjModel: one mesh handle
per renderable geom (geometry from viser_conversions), geom-group visibility
toggles, and per-frame pose updates from an MjData. All viser calls are
behind the constructor import so the module itself imports without viser.
"""

from __future__ import annotations

import numpy as np

from mjlab_tpu.viewer.viser_conversions import extract_scene_meshes


def _xmat_to_wxyz(xmat: np.ndarray) -> np.ndarray:
  """Rotation matrix (9,) → unit quaternion (w, x, y, z)."""
  import mujoco

  quat = np.empty(4)
  mujoco.mju_mat2Quat(quat, np.asarray(xmat, dtype=np.float64).reshape(9))
  return quat


class ViserMjScene:
  def __init__(self, server, model, show_world_frame: bool = False) -> None:
    self._server = server
    self._model = model
    self._handles: dict[int, object] = {}
    self._static: set[int] = set()

    meshes = extract_scene_meshes(model)
    for gid, mesh in meshes.items():
      handle = server.scene.add_mesh_simple(
        f"/geoms/geom_{gid}",
        vertices=mesh.vertices,
        faces=mesh.faces,
        color=mesh.color,
        opacity=mesh.opacity if mesh.opacity < 1.0 else None,
      )
      self._handles[gid] = handle
      # Geoms attached to the world body never move.
      if int(model.geom_bodyid[gid]) == 0:
        self._static.add(gid)

    if show_world_frame:
      server.scene.add_frame("/world", axes_length=0.3, axes_radius=0.01)

    self._group_checkboxes = []

  def add_geom_group_gui(self) -> None:
    """Visibility checkboxes per MuJoCo geom group (reference viser_scene
    geom-group GUI)."""
    groups = sorted({int(g) for g in self._model.geom_group})
    with self._server.gui.add_folder("Geom groups"):
      for grp in groups:
        cb = self._server.gui.add_checkbox(f"group {grp}", initial_value=True)
        members = [
          gid for gid in self._handles
          if int(self._model.geom_group[gid]) == grp
        ]

        def _on_update(_, members=members, cb=cb):
          for gid in members:
            self._handles[gid].visible = cb.value

        cb.on_update(_on_update)
        self._group_checkboxes.append(cb)

  def update(self, geom_xpos: np.ndarray, geom_xmat: np.ndarray) -> None:
    """Push world poses for all dynamic geoms; (ngeom, 3) and (ngeom, 9)."""
    with self._server.atomic():
      for gid, handle in self._handles.items():
        if gid in self._static:
          continue
        handle.position = tuple(geom_xpos[gid])
        handle.wxyz = tuple(_xmat_to_wxyz(geom_xmat[gid]))

  def remove(self) -> None:
    for handle in self._handles.values():
      handle.remove()
    self._handles.clear()
