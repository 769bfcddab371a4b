"""Debug-visualization protocol implemented by viewer backends and fed by
command terms (reference viewer/debug_visualizer.py:15, consumed via
command_manager.debug_vis_callback)."""

from __future__ import annotations

from typing import Protocol, runtime_checkable

import numpy as np


@runtime_checkable
class DebugVisualizer(Protocol):
  env_idx: int

  def add_arrow(
    self,
    from_pos,
    to_pos,
    color: tuple[float, float, float, float] = (1, 0, 0, 1),
    width: float = 0.015,
  ) -> None: ...

  def add_frame(
    self,
    position,
    rotation_matrix,
    scale: float = 0.1,
    label: str = "",
    axis_colors=None,
  ) -> None: ...

  def add_ghost_mesh(self, qpos, model=None) -> None: ...


class MjvDebugVisualizer:
  """Draws debug geoms into an mjvScene (used by the native viewer).

  When constructed with a model, `add_ghost_mesh` renders a full
  semi-transparent robot at an arbitrary qpos via mjv_addGeoms (reference
  mujoco_native_visualizer.py:77-110); without one it is a no-op."""

  def __init__(self, scene, env_idx: int = 0, mj_model=None) -> None:
    import mujoco

    self._mj = mujoco
    self.scene = scene
    self.env_idx = env_idx
    self._mj_model = mj_model
    self._ghost_data = None
    if mj_model is not None:
      self._ghost_data = mujoco.MjData(mj_model)
      self._ghost_opt = mujoco.MjvOption()
      self._ghost_opt.flags[mujoco.mjtVisFlag.mjVIS_TRANSPARENT] = True
      self._ghost_pert = mujoco.MjvPerturb()

  def _add_geom(self, gtype, size, pos, mat, rgba) -> None:
    scn = self.scene
    if scn.ngeom >= scn.maxgeom:
      return
    geom = scn.geoms[scn.ngeom]
    self._mj.mjv_initGeom(
      geom, gtype, np.asarray(size, dtype=np.float64),
      np.asarray(pos, dtype=np.float64),
      np.asarray(mat, dtype=np.float64).reshape(9),
      np.asarray(rgba, dtype=np.float32),
    )
    scn.ngeom += 1

  def add_arrow(self, from_pos, to_pos, color=(1, 0, 0, 1), width=0.015) -> None:
    scn = self.scene
    if scn.ngeom >= scn.maxgeom:
      return
    geom = scn.geoms[scn.ngeom]
    self._mj.mjv_initGeom(
      geom, self._mj.mjtGeom.mjGEOM_ARROW, np.zeros(3), np.zeros(3),
      np.eye(3).reshape(9), np.asarray(color, dtype=np.float32),
    )
    self._mj.mjv_connector(
      geom, self._mj.mjtGeom.mjGEOM_ARROW, width,
      np.asarray(from_pos, dtype=np.float64),
      np.asarray(to_pos, dtype=np.float64),
    )
    scn.ngeom += 1

  def add_frame(self, position, rotation_matrix, scale=0.1, label="",
                axis_colors=None) -> None:
    axis_colors = axis_colors or ((1, 0, 0), (0, 1, 0), (0, 0, 1))
    pos = np.asarray(position)
    mat = np.asarray(rotation_matrix)
    for k in range(3):
      self.add_arrow(
        pos, pos + mat[:, k] * scale, color=(*axis_colors[k], 0.9),
        width=scale * 0.12,
      )

  def add_ghost_mesh(self, qpos, model=None) -> None:
    model = model if model is not None else self._mj_model
    if model is None or self._ghost_data is None:
      return
    self._ghost_data.qpos[:] = np.asarray(qpos)
    self._mj.mj_forward(model, self._ghost_data)
    self._mj.mjv_addGeoms(
      model, self._ghost_data, self._ghost_opt, self._ghost_pert,
      self._mj.mjtCatBit.mjCAT_DYNAMIC.value, self.scene,
    )
