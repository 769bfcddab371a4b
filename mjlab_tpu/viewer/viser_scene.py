"""Browser-viewer scene management (reference viewer/viser_scene.py).

`ViserMjScene` owns the viser scene graph for one MjModel:

- one BATCHED mesh handle per (mobile body, geom group), merged across the
  body's geoms and instanced over every env — all environments render
  simultaneously (reference _create_mesh_handles_by_group);
- fixed world geometry under a `/fixed_bodies` frame that shifts with the
  camera-tracking scene offset, planes as infinite grids
  (reference _add_fixed_geometry);
- the full visualization GUI: FOV, env selection + hide-others, camera
  tracking with view snap, debug-overlay toggle, contact point/force
  markers with color pickers and a size scale
  (reference create_visualization_gui / create_geom_groups_gui);
- cached-state re-render so settings changes repaint immediately without
  new sim data (reference refresh_visualization/_request_update);
- the DebugVisualizer protocol (arrows, frames, ghost robot meshes) fed by
  command terms, all offset by the tracking recentre.

All viser calls go through the `server` handed to the constructor, so the
module imports without viser and the whole class is drivable headlessly by
a fake server (tests/test_viser_scene.py). Everything numerical lives in
viser_conversions / contact_vis.
"""

from __future__ import annotations

import numpy as np

from mjlab_tpu.viewer.contact_vis import (
  ContactVisuals,
  mat_to_wxyz,
  rotation_from_z,
)
from mjlab_tpu.viewer.viser_conversions import (
  extract_scene_meshes,
  get_body_name,
  is_collision_geom,
  is_fixed_body,
  merge_geoms,
)

#: Default per-group visibility (reference viser_scene.py:93-95): visual
#: groups 0-2 on, collision/debug groups 3-5 off.
DEFAULT_GROUPS_VISIBLE = (True, True, True, False, False, False)


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
  def __init__(
    self,
    server,
    model,
    num_envs: int = 1,
    show_world_frame: bool = False,
  ) -> None:
    import mujoco

    self._server = server
    self._model = model
    self.num_envs = int(num_envs)

    # Visualization options (driven by create_visualization_gui or set
    # directly — reference viser_scene.py:89-101).
    self.env_idx = 0
    self.camera_tracking_enabled = False
    self.show_only_selected = False
    self.geom_groups_visible = list(DEFAULT_GROUPS_VISIBLE)
    # Adaptive default: dynamics-extracted assets carry collision geoms only
    # (e.g. group 3). If no mobile geom falls in a default-visible group,
    # enable the lowest populated one so the robot renders out of the box.
    mobile_groups = {
      int(model.geom_group[g])
      for g in range(model.ngeom)
      if not is_fixed_body(model, int(model.geom_bodyid[g]))
    }
    if mobile_groups and not any(
      self.geom_groups_visible[g] for g in mobile_groups if g < 6
    ):
      self.geom_groups_visible[min(g for g in mobile_groups if g < 6)] = True
    self.show_contact_points = False
    self.show_contact_forces = False
    self.contact_point_color = (230, 153, 51)
    self.contact_force_color = (255, 0, 0)
    self.meansize_override: float | None = None
    self.debug_visualization_enabled = True
    self.needs_update = False

    # Cached last-update state so settings changes can repaint immediately
    # (reference refresh_visualization).
    self._last_body_xpos: np.ndarray | None = None
    self._last_body_xquat: np.ndarray | None = None
    self._last_mocap_pos: np.ndarray | None = None
    self._last_mocap_quat: np.ndarray | None = None
    self._last_contacts: ContactVisuals | None = None
    self._scene_offset = np.zeros(3)

    # Camera-tracking target: first mobile body (reference create():174-177).
    self._tracked_body_id = None
    for body_id in range(model.nbody):
      if not is_fixed_body(model, body_id):
        self._tracked_body_id = body_id
        break

    # Fixed world geometry: one frame (moved by the scene offset) holding
    # merged static meshes; planes become infinite grids.
    self._fixed_frame = server.scene.add_frame(
      "/fixed_bodies", show_axes=False
    )
    self._add_fixed_geometry(mujoco)

    # Mobile geometry: one batched handle per (body, group), merged over the
    # body's geoms in that group and instanced over num_envs.
    self._handles: dict[tuple[int, int], object] = {}
    self._create_mesh_handles_by_group(mujoco)

    if show_world_frame:
      server.scene.add_frame("/world", axes_length=0.3, axes_radius=0.01)

    # Marker handles, created lazily.
    self._contact_point_handle = None
    self._force_shaft_handle = None
    self._force_head_handle = None
    self._arrow_shaft_handle = None
    self._arrow_head_handle = None
    self._ghost_handles: dict[int, object] = {}
    self._ghost_data = None
    self._queued_arrows: list[tuple] = []
    self._group_checkboxes: list = []

  # -- scene-graph construction ------------------------------------------------

  def _add_fixed_geometry(self, mujoco) -> None:
    """World-welded bodies: planes as infinite grids, the rest merged into
    one mesh per body under /fixed_bodies (reference viser_scene.py:583)."""
    m = self._model
    by_body: dict[int, list[int]] = {}
    for gid in range(m.ngeom):
      body = int(m.geom_bodyid[gid])
      if is_fixed_body(m, body):
        by_body.setdefault(body, []).append(gid)
    for body_id, gids in by_body.items():
      body_name = get_body_name(m, body_id)
      nonplane = []
      for gid in gids:
        if int(m.geom_type[gid]) == int(mujoco.mjtGeom.mjGEOM_PLANE):
          gname = (
            mujoco.mj_id2name(m, mujoco.mjtObj.mjOBJ_GEOM, gid)
            or f"geom_{gid}"
          ).replace("/", "_")
          self._server.scene.add_grid(
            f"/fixed_bodies/{body_name}/{gname}",
            width=2000.0,
            height=2000.0,
            infinite_grid=True,
            fade_distance=50.0,
            shadow_opacity=0.2,
            position=tuple(m.geom_pos[gid]),
            wxyz=tuple(m.geom_quat[gid]),
          )
        else:
          nonplane.append(gid)
      mesh = merge_geoms(m, nonplane) if nonplane else None
      if mesh is not None:
        self._server.scene.add_mesh_simple(
          f"/fixed_bodies/{body_name}",
          vertices=mesh.vertices,
          faces=mesh.faces,
          color=mesh.color,
          opacity=mesh.opacity if mesh.opacity < 1.0 else None,
          position=tuple(m.body_pos[body_id]),
          wxyz=tuple(m.body_quat[body_id]),
          cast_shadow=False,
        )

  def _create_mesh_handles_by_group(self, mujoco) -> None:
    """Batched handles per (mobile body, geom group): every env is an
    instance of the merged body mesh (reference viser_scene.py:650)."""
    m = self._model
    groups: dict[tuple[int, int], list[int]] = {}
    for gid in range(m.ngeom):
      body = int(m.geom_bodyid[gid])
      if is_fixed_body(m, body):
        continue
      groups.setdefault((body, int(m.geom_group[gid])), []).append(gid)
    ident = np.tile(
      np.asarray([1.0, 0, 0, 0], dtype=np.float32), (self.num_envs, 1)
    )
    zeros = np.zeros((self.num_envs, 3), dtype=np.float32)
    ones = np.ones((self.num_envs, 3), dtype=np.float32)
    for (body_id, group_id), gids in sorted(groups.items()):
      mesh = merge_geoms(m, gids)
      if mesh is None or mesh.opacity <= 0.0:
        continue
      handle = self._server.scene.add_batched_meshes_simple(
        f"/bodies/{get_body_name(m, body_id)}/group{group_id}",
        mesh.vertices,
        mesh.faces,
        batched_wxyzs=ident,
        batched_positions=zeros,
        batched_scales=ones,
        batched_colors=np.asarray(
          [int(255 * c) for c in mesh.color], dtype=np.uint8
        ),
        lod="auto" if mesh.vertices.shape[0] > 2000 else "off",
        visible=(
          group_id < 6 and self.geom_groups_visible[group_id]
        ),
      )
      self._handles[(body_id, group_id)] = handle

  def _is_collision_geom(self, geom_id: int) -> bool:
    return is_collision_geom(self._model, geom_id)

  def _sync_visibilities(self) -> None:
    """Push group visibility flags onto every handle (reference
    _sync_visibilities)."""
    for (_body, group_id), handle in self._handles.items():
      handle.visible = group_id < 6 and self.geom_groups_visible[group_id]
    if self._contact_point_handle is not None and not self.show_contact_points:
      self._contact_point_handle.visible = False
    if not self.show_contact_forces:
      if self._force_shaft_handle is not None:
        self._force_shaft_handle.visible = False
      if self._force_head_handle is not None:
        self._force_head_handle.visible = False

  # -- GUI ---------------------------------------------------------------------

  def create_visualization_gui(
    self,
    camera_distance: float = 3.0,
    camera_azimuth: float = 45.0,
    camera_elevation: float = 30.0,
    show_debug_viz_control: bool = True,
  ) -> None:
    """Standard controls wired to this scene's settings (reference
    create_visualization_gui, viser_scene.py:205)."""
    gui = self._server.gui
    with gui.add_folder("Visualization"):
      fov = gui.add_slider(
        "FOV (°)", min=20, max=150, step=1, initial_value=90,
        hint="Vertical FOV of viewer camera, in degrees.",
      )

      def _set_fov(_) -> None:
        for client in self._server.get_clients().values():
          client.camera.fov = np.radians(fov.value)

      fov.on_update(_set_fov)
      self._server.on_client_connect(
        lambda client: setattr(
          client.camera, "fov", np.radians(fov.value)
        )
      )

    with gui.add_folder("Environment"):
      if self.num_envs > 1:
        env_slider = gui.add_slider(
          "Select", min=0, max=self.num_envs - 1, step=1,
          initial_value=self.env_idx,
          hint=f"Select environment (0-{self.num_envs - 1})",
        )

        def _set_env(_) -> None:
          self.env_idx = int(env_slider.value)
          self._request_update()

        env_slider.on_update(_set_env)
        self._env_slider = env_slider

        only_cb = gui.add_checkbox(
          "Hide others", initial_value=self.show_only_selected,
          hint="Show only the selected environment.",
        )

        def _set_only(_) -> None:
          self.show_only_selected = only_cb.value
          self._request_update()

        only_cb.on_update(_set_only)

      track = gui.add_checkbox(
        "Track camera", initial_value=self.camera_tracking_enabled,
        hint="Keep tracked body centered.",
      )

      def _set_track(_) -> None:
        self.camera_tracking_enabled = track.value
        if self.camera_tracking_enabled:
          # Snap connected clients to the default view of the recentred
          # scene (reference viser_scene.py:278-299).
          az, el = np.deg2rad(camera_azimuth), np.deg2rad(camera_elevation)
          forward = np.array(
            [np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)]
          )
          for client in self._server.get_clients().values():
            client.camera.position = -forward * camera_distance
            client.camera.look_at = np.zeros(3)
        self._request_update()

      track.on_update(_set_track)

      if show_debug_viz_control:
        dbg = gui.add_checkbox(
          "Debug visualization",
          initial_value=self.debug_visualization_enabled,
          hint="Show debug arrows and ghost meshes.",
        )

        def _set_dbg(_) -> None:
          self.debug_visualization_enabled = dbg.value
          if not dbg.value:
            self.clear_debug_all()
          self._request_update()

        dbg.on_update(_set_dbg)

      with gui.add_folder("Contacts"):
        cpts = gui.add_checkbox(
          "Points", initial_value=False,
          hint="Toggle contact point visualization.",
        )
        pt_color = gui.add_rgb(
          "Points Color", initial_value=self.contact_point_color
        )
        cfrc = gui.add_checkbox(
          "Forces", initial_value=False,
          hint="Toggle contact force visualization.",
        )
        f_color = gui.add_rgb(
          "Forces Color", initial_value=self.contact_force_color
        )
        meansize = gui.add_number(
          "Scale",
          step=float(self._model.stat.meansize) * 0.01,
          initial_value=float(self._model.stat.meansize),
        )

        def _set_cpts(_) -> None:
          self.show_contact_points = cpts.value
          self._sync_visibilities()
          self._request_update()

        def _set_pt_color(_) -> None:
          self.contact_point_color = tuple(pt_color.value)
          if self._contact_point_handle is not None:
            self._contact_point_handle.remove()
            self._contact_point_handle = None
          self._request_update()

        def _set_cfrc(_) -> None:
          self.show_contact_forces = cfrc.value
          self._sync_visibilities()
          self._request_update()

        def _set_f_color(_) -> None:
          self.contact_force_color = tuple(f_color.value)
          if self._force_shaft_handle is not None:
            self._force_shaft_handle.remove()
            self._force_shaft_handle = None
          if self._force_head_handle is not None:
            self._force_head_handle.remove()
            self._force_head_handle = None
          self._request_update()

        def _set_meansize(_) -> None:
          self.meansize_override = float(meansize.value)
          self._request_update()

        cpts.on_update(_set_cpts)
        pt_color.on_update(_set_pt_color)
        cfrc.on_update(_set_cfrc)
        f_color.on_update(_set_f_color)
        meansize.on_update(_set_meansize)

  def create_geom_groups_gui(self, tabs=None) -> None:
    """Six per-group visibility checkboxes, optionally inside a tab group
    (reference create_geom_groups_gui, viser_scene.py:379)."""
    gui = self._server.gui

    def _build() -> None:
      for i in range(6):
        cb = gui.add_checkbox(
          f"Group {i}", initial_value=self.geom_groups_visible[i],
          hint=f"Show/hide geoms in group {i}",
        )

        def _on_update(event, group_idx=i, cb=cb) -> None:
          self.geom_groups_visible[group_idx] = cb.value
          self._sync_visibilities()
          self._request_update()

        cb.on_update(_on_update)
        self._group_checkboxes.append(cb)

    if tabs is not None:
      with tabs.add_tab("Geoms"):
        _build()
    else:
      with gui.add_folder("Geom groups"):
        _build()

  # Backwards-compatible name used by earlier scripts.
  def add_geom_group_gui(self) -> None:
    self.create_geom_groups_gui()

  def add_options_gui(self, num_envs: int = 1) -> None:
    self.create_visualization_gui()

  # -- per-frame update --------------------------------------------------------

  def update(
    self,
    body_xpos: np.ndarray,
    body_xquat: np.ndarray,
    mocap_pos: np.ndarray | None = None,
    mocap_quat: np.ndarray | None = None,
    env_idx: int | None = None,
    contacts: ContactVisuals | None = None,
  ) -> None:
    """Push poses for every env from batched data.

    body_xpos: (num_envs, nbody, 3); body_xquat: (num_envs, nbody, 4) wxyz
    (the engine's Data pytree carries xquat natively — no xmat conversion
    needed, unlike the reference's SO3.from_matrix path).
    mocap_pos/quat: (num_envs, nmocap, 3/4) wxyz.
    """
    if env_idx is not None:
      self.env_idx = int(env_idx)
    body_xpos = np.asarray(body_xpos)
    body_xquat = np.asarray(body_xquat)
    if body_xpos.shape[0] != self.num_envs:
      # Single-env source (update_from_mjdata) driving a multi-env scene:
      # tile so the batched handles keep their instance count.
      reps = (self.num_envs, 1, 1)
      body_xpos = np.tile(body_xpos[:1], reps)
      body_xquat = np.tile(body_xquat[:1], reps)
      if mocap_pos is not None:
        mocap_pos = np.tile(np.asarray(mocap_pos)[:1], reps)
        mocap_quat = np.tile(np.asarray(mocap_quat)[:1], reps)
    self._last_body_xpos = body_xpos
    self._last_body_xquat = body_xquat
    self._last_mocap_pos = (
      None if mocap_pos is None else np.asarray(mocap_pos)
    )
    self._last_mocap_quat = (
      None if mocap_quat is None else np.asarray(mocap_quat)
    )
    if contacts is not None:
      self._last_contacts = contacts
    self._render()

  def update_from_mjdata(self, mj_data) -> None:
    """Single-env update from a host MjData (nan_viz scrubbing path —
    reference update_from_mjdata, viser_scene.py:436)."""
    nbody = self._model.nbody
    xquat = np.stack(
      [_xmat_to_wxyz(mj_data.xmat[b]) for b in range(nbody)]
    )
    self.update(
      body_xpos=np.asarray(mj_data.xpos)[None],
      body_xquat=xquat[None],
      mocap_pos=np.asarray(mj_data.mocap_pos)[None],
      mocap_quat=np.asarray(mj_data.mocap_quat)[None],
      env_idx=0,
    )

  def _render(self) -> None:
    xpos, xquat = self._last_body_xpos, self._last_body_xquat
    if xpos is None:
      return
    e = min(self.env_idx, xpos.shape[0] - 1)
    offset = np.zeros(3)
    if self.camera_tracking_enabled and self._tracked_body_id is not None:
      offset = -np.asarray(xpos[e, self._tracked_body_id], dtype=np.float64)
    self._scene_offset = offset

    m = self._model
    with self._server.atomic():
      self._fixed_frame.position = tuple(offset)
      for (body_id, _group), handle in self._handles.items():
        if not getattr(handle, "visible", True):
          continue
        mocap_id = int(m.body_mocapid[body_id])
        if mocap_id >= 0 and self._last_mocap_pos is not None:
          pos = self._last_mocap_pos[:, mocap_id]
          quat = self._last_mocap_quat[:, mocap_id]
        else:
          pos = xpos[:, body_id]
          quat = xquat[:, body_id]
        if self.show_only_selected and self.num_envs > 1:
          pos = np.tile(pos[e][None], (self.num_envs, 1))
          quat = np.tile(quat[e][None], (self.num_envs, 1))
        handle.batched_positions = (pos + offset).astype(np.float32)
        handle.batched_wxyzs = np.asarray(quat, dtype=np.float32)
      if self._last_contacts is not None and (
        self.show_contact_points or self.show_contact_forces
      ):
        self.update_contacts(self._last_contacts)
      else:
        self.update_contacts(ContactVisuals.empty())
      self._flush_arrows()
    self.needs_update = False

  def _request_update(self) -> None:
    """Settings changed: repaint from cache now, and flag viewers that
    throttle their loop (reference _request_update)."""
    self.needs_update = True
    self.refresh_visualization()

  def refresh_visualization(self) -> None:
    if self._last_body_xpos is None:
      return
    self._render()

  def track_camera(self, lookat: np.ndarray) -> None:
    """Point every connected client camera at `lookat`."""
    if not self.camera_tracking_enabled:
      return
    for client in self._server.get_clients().values():
      client.camera.look_at = tuple(np.asarray(lookat, dtype=float))

  # -- contact markers ---------------------------------------------------------

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
    scale = 1.0
    if self.meansize_override is not None:
      base = float(self._model.stat.meansize) or 1.0
      scale = self.meansize_override / base
    off = self._scene_offset
    show_p = self.show_contact_points and vis.count > 0
    show_f = self.show_contact_forces and len(vis.force_pos) > 0
    if show_p:
      if self._contact_point_handle is None:
        self._contact_point_handle = self._batched(
          "/contacts/points", _unit_cylinder, self.contact_point_color
        )
      h = self._contact_point_handle
      h.batched_positions = (vis.point_pos + off).astype(np.float32)
      h.batched_wxyzs = mat_to_wxyz(vis.point_mat).astype(np.float32)
      h.batched_scales = (vis.point_size * scale).astype(np.float32)
      h.visible = True
    elif self._contact_point_handle is not None:
      self._contact_point_handle.visible = False

    if show_f:
      if self._force_shaft_handle is None:
        self._force_shaft_handle = self._batched(
          "/contacts/forces/shaft", _unit_cylinder, self.contact_force_color
        )
        self._force_head_handle = self._batched(
          "/contacts/forces/head", _unit_cone, self.contact_force_color
        )
      wxyz = mat_to_wxyz(vis.force_mat).astype(np.float32)
      n = len(vis.force_pos)
      w = vis.force_width * scale
      ln = vis.force_len[:, None]
      zdir = np.einsum("nij,j->ni", vis.force_mat, [0.0, 0.0, 1.0])
      sh = self._force_shaft_handle
      sh.batched_positions = (vis.force_pos + off + 0.5 * ln * zdir).astype(
        np.float32
      )
      sh.batched_wxyzs = wxyz
      sh.batched_scales = np.tile([w, w, 1.0], (n, 1)).astype(
        np.float32
      ) * np.concatenate([np.ones((n, 2)), ln], axis=1).astype(np.float32)
      sh.visible = True
      hd = self._force_head_handle
      hd.batched_positions = (vis.force_pos + off + ln * zdir).astype(
        np.float32
      )
      hd.batched_wxyzs = wxyz
      hd.batched_scales = np.tile([2 * w, 2 * w, 2 * w], (n, 1)).astype(
        np.float32
      )
      hd.visible = True
    elif self._force_shaft_handle is not None:
      self._force_shaft_handle.visible = False
      self._force_head_handle.visible = False

  # -- browser-side perturbation (beyond the reference: its viser stack has
  # no interaction path — sync_viewer_to_env is a pass; ours mirrors the
  # native viewer's ctrl-drag through a click-to-attach drag gizmo) --------

  def enable_perturbation(
    self, stiffness_scale: float = 20.0, pick_radius: float = 0.25
  ) -> None:
    """Click near a mobile body to attach a transform gizmo; while the
    gizmo is dragged, `pop_perturbation()` yields a spring force pulling
    the body toward it. Click empty space to release."""
    self._perturb_body: int | None = None
    self._perturb_gizmo = None
    self._perturb_stiffness = stiffness_scale
    self._pick_radius = pick_radius

    handler = self._server.scene.on_pointer_event(event_type="click")
    handler(self._on_perturb_click)

  def _on_perturb_click(self, event) -> None:
    if self._last_body_xpos is None:
      return
    o = np.asarray(event.ray_origin, dtype=np.float64)
    d = np.asarray(event.ray_direction, dtype=np.float64)
    d = d / max(np.linalg.norm(d), 1e-12)
    e = min(self.env_idx, self._last_body_xpos.shape[0] - 1)
    best, best_dist = None, self._pick_radius
    for body_id in range(1, self._model.nbody):
      if is_fixed_body(self._model, body_id):
        continue
      p = self._last_body_xpos[e, body_id] + self._scene_offset
      t = float(np.dot(p - o, d))
      if t <= 0:
        continue
      miss = float(np.linalg.norm(p - (o + t * d)))
      if miss < best_dist:
        best, best_dist = body_id, miss
    if best is None:
      self.clear_perturbation()
      return
    self._perturb_body = best
    pos = self._last_body_xpos[e, best] + self._scene_offset
    if self._perturb_gizmo is None:
      self._perturb_gizmo = self._server.scene.add_transform_controls(
        "/perturb/gizmo", scale=0.35, disable_rotations=True,
        position=tuple(pos),
      )
    else:
      self._perturb_gizmo.position = tuple(pos)
      self._perturb_gizmo.visible = True

  def clear_perturbation(self) -> None:
    self._perturb_body = None
    if self._perturb_gizmo is not None:
      self._perturb_gizmo.visible = False

  def pop_perturbation(self) -> tuple[int, np.ndarray] | None:
    """(body_id, world-frame force) of the active drag, or None.

    Spring toward the gizmo, scaled by subtree mass so the pull feels
    uniform across bodies (native viewer parity)."""
    if getattr(self, "_perturb_body", None) is None or self._perturb_gizmo is None:
      return None
    if self._last_body_xpos is None:
      return None
    e = min(self.env_idx, self._last_body_xpos.shape[0] - 1)
    body = self._perturb_body
    pos = self._last_body_xpos[e, body] + self._scene_offset
    target = np.asarray(self._perturb_gizmo.position, dtype=np.float64)
    mass = float(self._model.body_subtreemass[body])
    force = self._perturb_stiffness * mass * (target - pos)
    return body, force

  # -- DebugVisualizer protocol (reference viser_scene.py DebugVisualizer) -----

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
        if is_fixed_body(model, int(model.geom_bodyid[gid])):
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
    off = self._scene_offset
    for gid, handle in self._ghost_handles.items():
      handle.position = tuple(self._ghost_data.geom_xpos[gid] + off)
      handle.wxyz = tuple(_xmat_to_wxyz(self._ghost_data.geom_xmat[gid]))
      handle.visible = True

  def hide_ghost(self) -> None:
    for handle in self._ghost_handles.values():
      handle.visible = False

  def clear(self) -> None:
    """Drop queued (not yet rendered) debug arrows — call before re-queueing
    a frame's annotations (reference clear, viser_scene.py:1059)."""
    self._queued_arrows = []

  def clear_debug_all(self) -> None:
    """Hide every debug annotation: arrows and ghosts (reference
    clear_debug_all, viser_scene.py:1067)."""
    self._queued_arrows = []
    if self._arrow_shaft_handle is not None:
      self._arrow_shaft_handle.visible = False
      self._arrow_head_handle.visible = False
    self.hide_ghost()

  def _flush_arrows(self) -> None:
    """Render queued debug arrows as batched shaft+head meshes."""
    arrows = self._queued_arrows
    self._queued_arrows = []
    if not arrows or not self.debug_visualization_enabled:
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
    off = self._scene_offset
    starts = np.stack([a[0] for a in arrows]) + off
    ends = np.stack([a[1] for a in arrows]) + off
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
