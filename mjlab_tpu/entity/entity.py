"""Entity: a physical object composed into the scene.

Host-side mirror of the reference Entity (entity/entity.py:86): wraps an
MjSpec, applies spec editors, writes the init-state keyframe, and computes
global index maps after compilation. The device-side state access lives in
EntityData (entity/data.py), which binds to the batched physics Data pytree —
reads are pure functions, writes return an updated Data (threaded through the
env's functional step).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable, Sequence

import mujoco
import numpy as np

from mjlab_tpu.core.strings import resolve_expr, resolve_matching_names
from mjlab_tpu.utils import spec_config as spec_cfg

_QPOS_WIDTH = {0: 7, 1: 4, 2: 1, 3: 1}  # free, ball, slide, hinge
_DOF_WIDTH = {0: 6, 1: 3, 2: 1, 3: 1}


@dataclass(frozen=True)
class EntityIndexing:
  """Maps entity elements to global indices/addresses (all numpy, static)."""

  body_ids: np.ndarray
  geom_ids: np.ndarray
  site_ids: np.ndarray
  ctrl_ids: np.ndarray
  joint_ids: np.ndarray
  mocap_id: int | None
  joint_q_adr: np.ndarray
  joint_v_adr: np.ndarray
  free_joint_q_adr: np.ndarray
  free_joint_v_adr: np.ndarray

  @property
  def root_body_id(self) -> int:
    return int(self.body_ids[0])


@dataclass
class EntityArticulationInfoCfg:
  actuators: tuple[spec_cfg.ActuatorCfg, ...] = field(default_factory=tuple)
  soft_joint_pos_limit_factor: float = 1.0


@dataclass
class EntityCfg:
  @dataclass
  class InitialStateCfg:
    pos: tuple[float, float, float] = (0.0, 0.0, 0.0)
    rot: tuple[float, float, float, float] = (1.0, 0.0, 0.0, 0.0)
    lin_vel: tuple[float, float, float] = (0.0, 0.0, 0.0)
    ang_vel: tuple[float, float, float] = (0.0, 0.0, 0.0)
    joint_pos: dict[str, float] = field(default_factory=lambda: {".*": 0.0})
    joint_vel: dict[str, float] = field(default_factory=lambda: {".*": 0.0})

  init_state: InitialStateCfg = field(default_factory=InitialStateCfg)
  spec_fn: Callable[[], mujoco.MjSpec] = field(
    default_factory=lambda: (lambda: mujoco.MjSpec())
  )
  articulation: EntityArticulationInfoCfg | None = None

  lights: tuple[spec_cfg.LightCfg, ...] = field(default_factory=tuple)
  cameras: tuple[spec_cfg.CameraCfg, ...] = field(default_factory=tuple)
  textures: tuple[spec_cfg.TextureCfg, ...] = field(default_factory=tuple)
  materials: tuple[spec_cfg.MaterialCfg, ...] = field(default_factory=tuple)
  collisions: tuple[spec_cfg.CollisionCfg, ...] = field(default_factory=tuple)

  debug_vis: bool = False


# Re-export nested class at module level for reference-parity imports.
EntityCfg.InitialStateCfg = EntityCfg.InitialStateCfg


class Entity:
  """A physical object: fixed/floating × articulated/actuated.

  See the reference's entity type matrix (entity/entity.py:92-114)."""

  def __init__(self, cfg: EntityCfg) -> None:
    self.cfg = cfg
    self._spec = cfg.spec_fn()

    all_joints = self._spec.joints
    self._free_joint = None
    self._non_free_joints = tuple(all_joints)
    if all_joints and all_joints[0].type == mujoco.mjtJoint.mjJNT_FREE:
      self._free_joint = all_joints[0]
      self._non_free_joints = tuple(all_joints[1:])

    self._apply_spec_editors()
    self._add_initial_state_keyframe()
    self._data = None
    self.indexing: EntityIndexing | None = None

  def _apply_spec_editors(self) -> None:
    for cfg_list in (
      self.cfg.lights,
      self.cfg.cameras,
      self.cfg.textures,
      self.cfg.materials,
      self.cfg.collisions,
    ):
      for c in cfg_list:
        c.edit_spec(self._spec)
    if self.cfg.articulation:
      spec_cfg.ActuatorSetCfg(self.cfg.articulation.actuators).edit_spec(self._spec)

  def _add_initial_state_keyframe(self) -> None:
    qpos_components = []
    if self._free_joint is not None:
      qpos_components.extend([self.cfg.init_state.pos, self.cfg.init_state.rot])
    joint_pos = None
    if self._non_free_joints:
      joint_pos = resolve_expr(self.cfg.init_state.joint_pos, self.joint_names)
      qpos_components.append(joint_pos)
    key_qpos = np.hstack(qpos_components) if qpos_components else np.array([])
    key = self._spec.add_key(name="init_state", qpos=key_qpos)
    if self.is_actuated and joint_pos is not None:
      name_to_pos = dict(zip(self.joint_names, joint_pos))
      key.ctrl = np.array(
        [name_to_pos.get(a.name, 0.0) for a in self._spec.actuators]
      )
    if self.is_fixed_base:
      self.root_body.pos[:] = self.cfg.init_state.pos
      self.root_body.quat[:] = self.cfg.init_state.rot

  # -- attributes -------------------------------------------------------------

  @property
  def is_fixed_base(self) -> bool:
    return self._free_joint is None

  @property
  def is_articulated(self) -> bool:
    return len(self._non_free_joints) > 0

  @property
  def is_actuated(self) -> bool:
    return self.num_actuators > 0

  @property
  def is_mocap(self) -> bool:
    return bool(self.root_body.mocap) if self.is_fixed_base else False

  @property
  def spec(self) -> mujoco.MjSpec:
    return self._spec

  @property
  def data(self):
    assert self._data is not None, "Entity not initialized."
    return self._data

  @property
  def joint_names(self) -> tuple[str, ...]:
    return tuple(j.name.split("/")[-1] for j in self._non_free_joints)

  @property
  def tendon_names(self) -> tuple[str, ...]:
    return tuple(t.name.split("/")[-1] for t in self._spec.tendons)

  @property
  def body_names(self) -> tuple[str, ...]:
    return tuple(b.name.split("/")[-1] for b in self.spec.bodies[1:])

  @property
  def geom_names(self) -> tuple[str, ...]:
    return tuple(g.name.split("/")[-1] for g in self.spec.geoms)

  @property
  def site_names(self) -> tuple[str, ...]:
    return tuple(s.name.split("/")[-1] for s in self.spec.sites)

  @property
  def actuator_names(self) -> tuple[str, ...]:
    return tuple(a.name.split("/")[-1] for a in self.spec.actuators)

  @property
  def num_joints(self) -> int:
    return len(self.joint_names)

  @property
  def num_bodies(self) -> int:
    return len(self.body_names)

  @property
  def num_geoms(self) -> int:
    return len(self.geom_names)

  @property
  def num_sites(self) -> int:
    return len(self.site_names)

  @property
  def num_actuators(self) -> int:
    return len(self.actuator_names)

  @property
  def root_body(self) -> mujoco.MjsBody:
    return self.spec.bodies[1]

  # -- regex find -------------------------------------------------------------

  def find_bodies(self, name_keys, preserve_order=False):
    return resolve_matching_names(name_keys, self.body_names, preserve_order)

  def find_joints(self, name_keys, joint_subset=None, preserve_order=False):
    subset = self.joint_names if joint_subset is None else joint_subset
    return resolve_matching_names(name_keys, subset, preserve_order)

  def find_tendons(self, name_keys, tendon_subset=None, preserve_order=False):
    subset = self.tendon_names if tendon_subset is None else tendon_subset
    return resolve_matching_names(name_keys, subset, preserve_order)

  def find_actuators(self, name_keys, actuator_subset=None, preserve_order=False):
    subset = self.actuator_names if actuator_subset is None else actuator_subset
    return resolve_matching_names(name_keys, subset, preserve_order)

  def find_geoms(self, name_keys, geom_subset=None, preserve_order=False):
    subset = self.geom_names if geom_subset is None else geom_subset
    return resolve_matching_names(name_keys, subset, preserve_order)

  def find_sites(self, name_keys, site_subset=None, preserve_order=False):
    subset = self.site_names if site_subset is None else site_subset
    return resolve_matching_names(name_keys, subset, preserve_order)

  def compile(self) -> mujoco.MjModel:
    return self.spec.compile()

  def write_xml(self, xml_path: Path) -> None:
    with open(xml_path, "w") as f:
      f.write(self.spec.to_xml())

  # -- initialization (post scene-compile) ------------------------------------

  def initialize(self, mj_model: mujoco.MjModel, ctx) -> None:
    """Bind to the compiled scene. `ctx` is the env's state context (holds
    the batched physics Data plus Topology/Model; see envs.context)."""
    from mjlab_tpu.entity.data import EntityData

    self.indexing = self._compute_indexing(mj_model)
    self._data = EntityData(self, ctx)

  def update(self, dt: float) -> None:
    del dt

  def reset(self, env_mask=None) -> None:
    self._data.clear_state(env_mask)

  def write_data_to_sim(self) -> None:
    pass

  # Write-through API (reference entity/entity.py:434-595) — delegates to
  # EntityData; env_mask is a boolean (B,) mask (in-jit safe) or None=all.

  def write_root_state_to_sim(self, root_state, env_mask=None):
    self._data.write_root_state(root_state, env_mask)

  def write_root_link_pose_to_sim(self, root_pose, env_mask=None):
    self._data.write_root_pose(root_pose, env_mask)

  def write_root_link_velocity_to_sim(self, root_velocity, env_mask=None):
    self._data.write_root_velocity(root_velocity, env_mask)

  def write_joint_state_to_sim(self, position, velocity, joint_ids=None,
                               env_mask=None):
    self._data.write_joint_state(position, velocity, joint_ids, env_mask)

  def write_joint_position_to_sim(self, position, joint_ids=None, env_mask=None):
    self._data.write_joint_position(position, joint_ids, env_mask)

  def write_joint_velocity_to_sim(self, velocity, joint_ids=None, env_mask=None):
    self._data.write_joint_velocity(velocity, joint_ids, env_mask)

  def write_joint_position_target_to_sim(self, position_target, joint_ids=None,
                                         env_mask=None):
    self._data.write_ctrl(position_target, joint_ids, env_mask)

  def write_external_wrench_to_sim(self, forces, torques, env_mask=None,
                                   body_ids=None):
    self._data.write_external_wrench(forces, torques, body_ids, env_mask)

  def write_ctrl_to_sim(self, ctrl, ctrl_ids=None, env_mask=None):
    self._data.write_ctrl(ctrl, ctrl_ids, env_mask)

  def write_mocap_pose_to_sim(self, mocap_pose, env_mask=None):
    self._data.write_mocap_pose(mocap_pose, env_mask)

  def clear_state(self, env_mask=None) -> None:
    self._data.clear_state(env_mask)

  # -- indexing ---------------------------------------------------------------

  def _compute_indexing(self, model: mujoco.MjModel) -> EntityIndexing:
    body_ids = np.asarray([b.id for b in self.spec.bodies[1:]], dtype=int)
    geom_ids = np.asarray([g.id for g in self.spec.geoms], dtype=int)
    site_ids = np.asarray([s.id for s in self.spec.sites], dtype=int)
    joint_ids = np.asarray([j.id for j in self._non_free_joints], dtype=int)
    if self.is_actuated:
      ctrl_ids = np.asarray([a.id for a in self.spec.actuators], dtype=int)
    else:
      ctrl_ids = np.zeros(0, dtype=int)

    joint_q_adr, joint_v_adr = [], []
    free_joint_q_adr, free_joint_v_adr = [], []
    for joint in self.spec.joints:
      jid = joint.id
      jnt_type = int(model.jnt_type[jid])
      vadr, qadr = int(model.jnt_dofadr[jid]), int(model.jnt_qposadr[jid])
      if jnt_type == int(mujoco.mjtJoint.mjJNT_FREE):
        free_joint_v_adr.extend(range(vadr, vadr + 6))
        free_joint_q_adr.extend(range(qadr, qadr + 7))
      else:
        joint_v_adr.extend(range(vadr, vadr + _DOF_WIDTH[jnt_type]))
        joint_q_adr.extend(range(qadr, qadr + _QPOS_WIDTH[jnt_type]))

    mocap_id = None
    if self.is_fixed_base and self.is_mocap:
      mocap_id = int(model.body_mocapid[self.root_body.id])

    return EntityIndexing(
      body_ids=body_ids,
      geom_ids=geom_ids,
      site_ids=site_ids,
      ctrl_ids=ctrl_ids,
      joint_ids=joint_ids,
      mocap_id=mocap_id,
      joint_q_adr=np.asarray(joint_q_adr, dtype=int),
      joint_v_adr=np.asarray(joint_v_adr, dtype=int),
      free_joint_q_adr=np.asarray(free_joint_q_adr, dtype=int),
      free_joint_v_adr=np.asarray(free_joint_v_adr, dtype=int),
    )
