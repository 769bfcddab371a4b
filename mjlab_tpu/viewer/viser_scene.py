"""Browser-viewer scene management (reference viewer/viser_scene.py).

`ViserMjScene` owns the viser scene graph for one MjModel: one mesh handle
per renderable geom (geometry from viser_conversions), geom-group visibility
toggles, contact point/force markers (transforms from viewer/contact_vis —
the same module the native viewer draws from), client camera tracking, and
the DebugVisualizer protocol (arrows, coordinate frames, ghost robot meshes)
fed by command terms. All viser calls are behind the constructor import so
the module itself imports without viser; everything numerical lives in
viser_conversions / contact_vis and is unit-tested without a GUI.
"""

from __future__ import annotations

import numpy as np

from mjlab_tpu.viewer.contact_vis import (
  ContactVisuals,
  mat_to_wxyz,
  rotation_from_z,
)
from mjlab_tpu.viewer.viser_conversions import extract_scene_meshes


def _xmat_to_wxyz(xmat: np.ndarray) -> np.ndarray:
  """Rotation matrix (9,) → unit quaternion (w, x, y, z)."""
  import mujoco

  quat = np.empty(4)
  mujoco.mju_mat2Quat(quat, np.asarray(xmat, dtype=np.float64).reshape(9))
  return quat


def _unit_cylinder(sectors: int = 16):
  """Unit-height, unit-radius z cylinder centered at origin (numpy mesh)."""
  from mjlab_tpu.viewer.viser_conversions import _cylinder

  return _cylinder(1.0, 0.5, sectors=sectors)


def _unit_cone(sectors: int = 12):
  """Unit cone: base radius 1 at z=0, apex at z=1."""
  theta = np.linspace(0, 2 * np.pi, sectors, endpoint=False)
  ring = np.stack(
    [np.cos(theta), np.sin(theta), np.zeros(sectors)], axis=1
  ).astype(np.float32)
  verts = np.vstack([ring, [[0, 0, 1]], [[0, 0, 0]]])
  apex, base = sectors, sectors + 1
  faces = []
  for s in range(sectors):
    s2 = (s + 1) % sectors
    faces.append((s, s2, apex))
    faces.append((base, s2, s))
  return verts, np.asarray(faces, dtype=np.int32)


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
    # Visualization options (driven by create_options_gui or set directly —
    # reference viser_scene.py:92-104).
    self.env_idx = 0
    self.camera_tracking_enabled = False
    self.show_contact_points = False
    self.show_contact_forces = False
    self.debug_visualization_enabled = True
    # Marker handles, created lazily.
    self._contact_point_handle = None
    self._force_shaft_handle = None
    self._force_head_handle = None
    self._arrow_shaft_handle = None
    self._arrow_head_handle = None
    self._ghost_handles: dict[int, object] = {}
    self._ghost_data = None
    self._queued_arrows: list[tuple] = []

  # -- geom groups ----------------------------------------------------------------

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

  def add_options_gui(self, num_envs: int = 1) -> None:
    """Visualization options folder (reference create_options_gui):
    camera tracking, contact points/forces, debug overlays, env index."""
    gui = self._server.gui
    with gui.add_folder("Visualization"):
      track = gui.add_checkbox("Camera tracking", initial_value=False)
      track.on_update(
        lambda _: setattr(self, "camera_tracking_enabled", track.value)
      )
      cpts = gui.add_checkbox("Contact points", initial_value=False)
      cpts.on_update(
        lambda _: setattr(self, "show_contact_points", cpts.value)
      )
      cfrc = gui.add_checkbox("Contact forces", initial_value=False)
      cfrc.on_update(
        lambda _: setattr(self, "show_contact_forces", cfrc.value)
      )
      dbg = gui.add_checkbox("Debug overlays", initial_value=True)
      dbg.on_update(
        lambda _: setattr(self, "debug_visualization_enabled", dbg.value)
      )
      if num_envs > 1:
        env_slider = gui.add_slider(
          "Env index", min=0, max=num_envs - 1, step=1, initial_value=0
        )
        env_slider.on_update(
          lambda _: setattr(self, "env_idx", int(env_slider.value))
        )

  # -- per-frame update -----------------------------------------------------------

  def update(self, geom_xpos: np.ndarray, geom_xmat: np.ndarray) -> None:
    """Push world poses for all dynamic geoms; (ngeom, 3) and (ngeom, 9)."""
    with self._server.atomic():
      for gid, handle in self._handles.items():
        if gid in self._static:
          continue
        handle.position = tuple(geom_xpos[gid])
        handle.wxyz = tuple(_xmat_to_wxyz(geom_xmat[gid]))
      self._flush_arrows()

  def track_camera(self, lookat: np.ndarray) -> None:
    """Point every connected client camera at `lookat` (reference camera
    tracking)."""
    if not self.camera_tracking_enabled:
      return
    for client in self._server.get_clients().values():
      client.camera.look_at = tuple(np.asarray(lookat, dtype=float))

  # -- contact markers -------------------------------------------------------------

  def _batched(self, name: str, mesh_fn, color) -> object:
    verts, faces = mesh_fn()
    return self._server.scene.add_batched_meshes_simple(
      name,
      verts,
      faces,
      batched_wxyzs=np.zeros((0, 4), dtype=np.float32),
      batched_positions=np.zeros((0, 3), dtype=np.float32),
      batched_scales=np.zeros((0, 3), dtype=np.float32),
      batched_colors=np.asarray(color, dtype=np.uint8),
      lod="off",
      cast_shadow=False,
    )

  def update_contacts(self, vis: ContactVisuals) -> None:
    """Show/update contact markers from precomputed transforms
    (reference _update_contact_visualization, viser_scene.py:713-850)."""
    show_p = self.show_contact_points and vis.count > 0
    show_f = self.show_contact_forces and len(vis.force_pos) > 0
    if show_p:
      if self._contact_point_handle is None:
        self._contact_point_handle = self._batched(
          "/contacts/points", _unit_cylinder, (230, 153, 51)
        )
      h = self._contact_point_handle
      h.batched_positions = vis.point_pos.astype(np.float32)
      h.batched_wxyzs = mat_to_wxyz(vis.point_mat).astype(np.float32)
      h.batched_scales = vis.point_size.astype(np.float32)
      h.visible = True
    elif self._contact_point_handle is not None:
      self._contact_point_handle.visible = False

    if show_f:
      if self._force_shaft_handle is None:
        self._force_shaft_handle = self._batched(
          "/contacts/forces/shaft", _unit_cylinder, (255, 0, 0)
        )
        self._force_head_handle = self._batched(
          "/contacts/forces/head", _unit_cone, (255, 0, 0)
        )
      wxyz = mat_to_wxyz(vis.force_mat).astype(np.float32)
      n = len(vis.force_pos)
      w = vis.force_width
      ln = vis.force_len[:, None]
      zdir = np.einsum("nij,j->ni", vis.force_mat, [0.0, 0.0, 1.0])
      sh = self._force_shaft_handle
      sh.batched_positions = (vis.force_pos + 0.5 * ln * zdir).astype(
        np.float32
      )
      sh.batched_wxyzs = wxyz
      sh.batched_scales = np.tile([w, w, 1.0], (n, 1)).astype(
        np.float32
      ) * np.concatenate([np.ones((n, 2)), ln], axis=1).astype(np.float32)
      sh.visible = True
      hd = self._force_head_handle
      hd.batched_positions = (vis.force_pos + ln * zdir).astype(np.float32)
      hd.batched_wxyzs = wxyz
      hd.batched_scales = np.tile([2 * w, 2 * w, 2 * w], (n, 1)).astype(
        np.float32
      )
      hd.visible = True
    elif self._force_shaft_handle is not None:
      self._force_shaft_handle.visible = False
      self._force_head_handle.visible = False

  # -- DebugVisualizer protocol (reference viser_scene.py DebugVisualizer) --------

  def add_arrow(self, from_pos, to_pos, color=(1, 0, 0, 1), width=0.015) -> None:
    self._queued_arrows.append(
      (np.asarray(from_pos, float), np.asarray(to_pos, float), color, width)
    )

  def add_frame(self, position, rotation_matrix, scale=0.1, label="",
                axis_colors=None) -> None:
    axis_colors = axis_colors or ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    pos = np.asarray(position, float)
    mat = np.asarray(rotation_matrix, float)
    for k in range(3):
      self.add_arrow(
        pos, pos + mat[:, k] * scale, color=(*axis_colors[k], 0.9),
        width=scale * 0.12,
      )

  def add_ghost_mesh(self, qpos, model=None) -> None:
    """Semi-transparent robot at `qpos`: per-geom handles posed by host FK."""
    import mujoco

    model = model if model is not None else self._model
    if self._ghost_data is None:
      self._ghost_data = mujoco.MjData(model)
      meshes = extract_scene_meshes(model)
      for gid, mesh in meshes.items():
        if int(model.geom_bodyid[gid]) == 0:
          continue  # static world geoms are not part of the ghost
        self._ghost_handles[gid] = self._server.scene.add_mesh_simple(
          f"/ghost/geom_{gid}",
          vertices=mesh.vertices,
          faces=mesh.faces,
          color=(0.5, 0.7, 0.5),
          opacity=0.4,
        )
    self._ghost_data.qpos[:] = np.asarray(qpos)
    mujoco.mj_forward(model, self._ghost_data)
    for gid, handle in self._ghost_handles.items():
      handle.position = tuple(self._ghost_data.geom_xpos[gid])
      handle.wxyz = tuple(_xmat_to_wxyz(self._ghost_data.geom_xmat[gid]))
      handle.visible = True

  def hide_ghost(self) -> None:
    for handle in self._ghost_handles.values():
      handle.visible = False

  def _flush_arrows(self) -> None:
    """Render queued debug arrows as batched shaft+head meshes."""
    arrows = self._queued_arrows
    self._queued_arrows = []
    if not arrows:
      if self._arrow_shaft_handle is not None:
        self._arrow_shaft_handle.visible = False
        self._arrow_head_handle.visible = False
      return
    if self._arrow_shaft_handle is None:
      self._arrow_shaft_handle = self._batched(
        "/debug/arrows/shaft", _unit_cylinder, (255, 64, 64)
      )
      self._arrow_head_handle = self._batched(
        "/debug/arrows/head", _unit_cone, (255, 64, 64)
      )
    starts = np.stack([a[0] for a in arrows])
    ends = np.stack([a[1] for a in arrows])
    widths = np.asarray([a[3] for a in arrows])
    d = ends - starts
    lens = np.linalg.norm(d, axis=-1)
    dirs = d / np.maximum(lens, 1e-12)[:, None]
    mats = rotation_from_z(dirs)
    wxyz = mat_to_wxyz(mats).astype(np.float32)
    n = len(arrows)
    sh = self._arrow_shaft_handle
    sh.batched_positions = (starts + 0.5 * d).astype(np.float32)
    sh.batched_wxyzs = wxyz
    sh.batched_scales = np.stack(
      [widths, widths, lens], axis=1
    ).astype(np.float32)
    sh.visible = True
    hd = self._arrow_head_handle
    hd.batched_positions = ends.astype(np.float32)
    hd.batched_wxyzs = wxyz
    hd.batched_scales = np.stack(
      [2 * widths, 2 * widths, 2 * widths], axis=1
    ).astype(np.float32)
    hd.visible = True

  def remove(self) -> None:
    for handle in self._handles.values():
      handle.remove()
    self._handles.clear()
    for handle in self._ghost_handles.values():
      handle.remove()
    self._ghost_handles.clear()
