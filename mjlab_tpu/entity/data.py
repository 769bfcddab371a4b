"""EntityData: per-entity batched state accessor.

Mirrors the reference EntityData property surface (entity/data.py:35) but is
a *view* over the env's functional state context: reads are pure functions of
the current batched physics Data; writes produce an updated Data pytree that
replaces the context's state (the reference mutates zero-copy Warp views
instead — same semantics, functional form). Within one jitted step, repeated
property reads are deduplicated by XLA CSE.

`env_mask` replaces the reference's `env_ids` gathers: a boolean (B,) mask
selecting which envs a write affects — the in-jit-safe formulation of the
reference's `nonzero` index writes.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.core import math as mt

if TYPE_CHECKING:
  from mjlab_tpu.entity.entity import Entity


def compute_velocity_from_cvel(pos, subtree_com, cvel):
  """Convert com-based cvel to world-frame [lin, ang] velocity at `pos`."""
  lin_c = cvel[..., 3:6]
  ang_c = cvel[..., 0:3]
  offset = subtree_com - pos
  lin_w = lin_c - jnp.cross(ang_c, offset)
  return jnp.concatenate([lin_w, ang_c], axis=-1)


def _bt(arr, shape):
  """Contiguous broadcast (0-stride host views upset buffer transfer)."""
  return np.ascontiguousarray(np.broadcast_to(arr, shape))


def _merge(old, new, mask):
  if mask is None:
    return new
  m = mask.reshape(mask.shape + (1,) * (old.ndim - 1))
  return jnp.where(m, new, old)


class EntityData:
  POS_DIM = 3
  QUAT_DIM = 4
  ROOT_POSE_DIM = 7
  ROOT_VEL_DIM = 6
  ROOT_STATE_DIM = 13

  def __init__(self, entity: "Entity", ctx) -> None:
    self._e = entity
    self._ctx = ctx
    self.indexing = entity.indexing
    idx = self.indexing
    B = ctx.num_envs
    dtype = ctx.dtype

    # IMPORTANT: every constant here stays a HOST numpy array (broadcast row,
    # shape (1, ·)). Eagerly-created jnp arrays captured as jit constants
    # trigger a severe sticky slow path on the axon TPU runtime (see
    # docs/PERF_NOTES.md); numpy constants lower to inline HLO literals.
    np_dtype = np.dtype(dtype)

    cfg = entity.cfg.init_state
    root_state = list(cfg.pos) + list(cfg.rot)
    if not entity.is_fixed_base:
      root_state += list(cfg.lin_vel) + list(cfg.ang_vel)
    self.default_root_state = _bt(
      np.asarray(root_state, dtype=np_dtype), (B, len(root_state))
    )

    from mjlab_tpu.core.strings import resolve_expr

    if entity.is_articulated:
      jp = resolve_expr(cfg.joint_pos, entity.joint_names)
      jv = resolve_expr(cfg.joint_vel, entity.joint_names)
      nj = len(jp)
      self.default_joint_pos = _bt(
        np.asarray(jp, dtype=np_dtype), (B, nj)
      )
      self.default_joint_vel = _bt(
        np.asarray(jv, dtype=np_dtype), (B, nj)
      )
      if entity.is_actuated:
        # Read from the HOST mj_model: pulling device model leaves here would
        # be a device→host transfer, which permanently degrades the axon
        # runtime (docs/PERF_NOTES.md).
        mjm = ctx.sim.mj_model
        gain = np.asarray(mjm.actuator_gainprm)[idx.ctrl_ids, 0]
        damp = -np.asarray(mjm.actuator_biasprm)[idx.ctrl_ids, 2]
        self.default_joint_stiffness = _bt(
          gain.astype(np_dtype), (B, len(idx.ctrl_ids))
        )
        self.default_joint_damping = _bt(
          damp.astype(np_dtype), (B, len(idx.ctrl_ids))
        )
      else:
        self.default_joint_stiffness = np.zeros((B, 0), dtype=np_dtype)
        self.default_joint_damping = np.zeros((B, 0), dtype=np_dtype)
      limits = np.asarray(ctx.sim.mj_model.jnt_range)[idx.joint_ids]  # (nj, 2)
      self.default_joint_pos_limits = _bt(
        limits[None].astype(np_dtype), (B, nj, 2)
      )
      self.joint_pos_limits = self.default_joint_pos_limits
      mean = (limits[:, 0] + limits[:, 1]) / 2
      rng = limits[:, 1] - limits[:, 0]
      factor = (
        entity.cfg.articulation.soft_joint_pos_limit_factor
        if entity.cfg.articulation
        else 1.0
      )
      soft = np.stack(
        [mean - 0.5 * rng * factor, mean + 0.5 * rng * factor], axis=-1
      )
      self.soft_joint_pos_limits = _bt(
        soft[None].astype(np_dtype), (B, nj, 2)
      )
    else:
      z = np.zeros((B, 0), dtype=np_dtype)
      self.default_joint_pos = z
      self.default_joint_vel = z
      self.default_joint_stiffness = z
      self.default_joint_damping = z
      self.default_joint_pos_limits = np.zeros((B, 0, 2), dtype=np_dtype)
      self.joint_pos_limits = self.default_joint_pos_limits
      self.soft_joint_pos_limits = self.default_joint_pos_limits

    self.gravity_vec_w = _bt(
      np.asarray([0.0, 0.0, -1.0], dtype=np_dtype), (B, 3)
    )
    self.forward_vec_b = _bt(
      np.asarray([1.0, 0.0, 0.0], dtype=np_dtype), (B, 3)
    )
    self.is_fixed_base = entity.is_fixed_base
    self.is_articulated = entity.is_articulated
    self.is_actuated = entity.is_actuated

  @property
  def data(self):
    return self._ctx.data

  # -- writes -----------------------------------------------------------------

  def write_root_state(self, root_state, env_mask=None):
    if self.is_fixed_base:
      raise ValueError("Cannot write root state for fixed-base entity.")
    self.write_root_pose(root_state[:, :7], env_mask)
    self.write_root_velocity(root_state[:, 7:], env_mask)

  def write_root_pose(self, pose, env_mask=None):
    if self.is_fixed_base:
      raise ValueError("Cannot write root pose for fixed-base entity.")
    d = self.data
    qadr = self.indexing.free_joint_q_adr
    new = d.qpos.at[:, qadr].set(_merge(d.qpos[:, qadr], pose, env_mask))
    self._ctx.data = d.replace(qpos=new)

  def write_root_velocity(self, velocity, env_mask=None):
    if self.is_fixed_base:
      raise ValueError("Cannot write root velocity for fixed-base entity.")
    d = self.data
    qadr = self.indexing.free_joint_q_adr
    vadr = self.indexing.free_joint_v_adr
    quat_w = d.qpos[:, qadr[3:7]]
    # MuJoCo free-joint qvel: linear world-frame, angular body-frame.
    ang_b = mt.quat_apply_inverse(quat_w, velocity[:, 3:])
    vel_qvel = jnp.concatenate([velocity[:, :3], ang_b], axis=-1)
    new = d.qvel.at[:, vadr].set(_merge(d.qvel[:, vadr], vel_qvel, env_mask))
    self._ctx.data = d.replace(qvel=new)

  def write_joint_state(self, position, velocity, joint_ids=None, env_mask=None):
    self.write_joint_position(position, joint_ids, env_mask)
    self.write_joint_velocity(velocity, joint_ids, env_mask)

  def write_joint_position(self, position, joint_ids=None, env_mask=None):
    d = self.data
    q = self.indexing.joint_q_adr
    q = q if joint_ids is None else q[joint_ids]
    new = d.qpos.at[:, q].set(_merge(d.qpos[:, q], position, env_mask))
    self._ctx.data = d.replace(qpos=new)

  def write_joint_velocity(self, velocity, joint_ids=None, env_mask=None):
    d = self.data
    v = self.indexing.joint_v_adr
    v = v if joint_ids is None else v[joint_ids]
    new = d.qvel.at[:, v].set(_merge(d.qvel[:, v], velocity, env_mask))
    self._ctx.data = d.replace(qvel=new)

  def write_external_wrench(self, force, torque, body_ids=None, env_mask=None):
    d = self.data
    ids = self.indexing.body_ids if body_ids is None else (
      self.indexing.body_ids[body_ids]
      if not isinstance(body_ids, slice)
      else self.indexing.body_ids[body_ids]
    )
    xfrc = d.xfrc_applied
    if force is not None:
      xfrc = xfrc.at[:, ids, 0:3].set(_merge(xfrc[:, ids, 0:3], force, env_mask))
    if torque is not None:
      xfrc = xfrc.at[:, ids, 3:6].set(_merge(xfrc[:, ids, 3:6], torque, env_mask))
    self._ctx.data = d.replace(xfrc_applied=xfrc)

  def write_ctrl(self, ctrl, ctrl_ids=None, env_mask=None):
    if not self.is_actuated:
      raise ValueError("Cannot write control for non-actuated entity.")
    d = self.data
    ids = self.indexing.ctrl_ids
    ids = ids if ctrl_ids is None else ids[ctrl_ids]
    new = d.ctrl.at[:, ids].set(_merge(d.ctrl[:, ids], ctrl, env_mask))
    self._ctx.data = d.replace(ctrl=new)

  def write_mocap_pose(self, pose, env_mask=None):
    if self.indexing.mocap_id is None:
      raise ValueError("Cannot write mocap pose for non-mocap entity.")
    d = self.data
    mid = self.indexing.mocap_id
    mp = d.mocap_pos.at[:, mid].set(_merge(d.mocap_pos[:, mid], pose[:, :3], env_mask))
    mq = d.mocap_quat.at[:, mid].set(
      _merge(d.mocap_quat[:, mid], pose[:, 3:7], env_mask)
    )
    self._ctx.data = d.replace(mocap_pos=mp, mocap_quat=mq)

  def clear_state(self, env_mask=None):
    d = self.data
    idx = self.indexing
    if len(idx.free_joint_v_adr):
      v = idx.free_joint_v_adr
      d = d.replace(
        qfrc_applied=d.qfrc_applied.at[:, v].set(
          _merge(d.qfrc_applied[:, v], jnp.zeros_like(d.qfrc_applied[:, v]), env_mask)
        )
      )
    xz = jnp.zeros_like(d.xfrc_applied[:, idx.body_ids])
    d = d.replace(
      xfrc_applied=d.xfrc_applied.at[:, idx.body_ids].set(
        _merge(d.xfrc_applied[:, idx.body_ids], xz, env_mask)
      )
    )
    if self.is_actuated:
      cz = jnp.zeros_like(d.ctrl[:, idx.ctrl_ids])
      d = d.replace(
        ctrl=d.ctrl.at[:, idx.ctrl_ids].set(
          _merge(d.ctrl[:, idx.ctrl_ids], cz, env_mask)
        )
      )
    self._ctx.data = d

  # -- root reads ---------------------------------------------------------------

  @property
  def root_link_pose_w(self):
    rid = self.indexing.root_body_id
    return jnp.concatenate([self.data.xpos[:, rid], self.data.xquat[:, rid]], -1)

  @property
  def root_link_vel_w(self):
    rid = self.indexing.root_body_id
    return compute_velocity_from_cvel(
      self.data.xpos[:, rid], self.data.subtree_com[:, rid], self.data.cvel[:, rid]
    )

  @property
  def root_com_pose_w(self):
    rid = self.indexing.root_body_id
    quat = mt.quat_mul(
      self.data.xquat[:, rid], self._ctx.unbatched_model.body_iquat[rid][None]
    )
    return jnp.concatenate([self.data.xipos[:, rid], quat], -1)

  @property
  def root_com_vel_w(self):
    rid = self.indexing.root_body_id
    return compute_velocity_from_cvel(
      self.data.xipos[:, rid], self.data.subtree_com[:, rid], self.data.cvel[:, rid]
    )

  # -- body reads ---------------------------------------------------------------

  @property
  def body_link_pose_w(self):
    ids = self.indexing.body_ids
    return jnp.concatenate([self.data.xpos[:, ids], self.data.xquat[:, ids]], -1)

  @property
  def body_link_vel_w(self):
    ids = self.indexing.body_ids
    rid = self.indexing.root_body_id
    return compute_velocity_from_cvel(
      self.data.xpos[:, ids],
      self.data.subtree_com[:, rid][:, None],
      self.data.cvel[:, ids],
    )

  @property
  def body_com_pose_w(self):
    ids = self.indexing.body_ids
    quat = mt.quat_mul(
      self.data.xquat[:, ids], self._ctx.unbatched_model.body_iquat[ids][None]
    )
    return jnp.concatenate([self.data.xipos[:, ids], quat], -1)

  @property
  def body_com_vel_w(self):
    ids = self.indexing.body_ids
    rid = self.indexing.root_body_id
    return compute_velocity_from_cvel(
      self.data.xipos[:, ids],
      self.data.subtree_com[:, rid][:, None],
      self.data.cvel[:, ids],
    )

  @property
  def body_external_wrench(self):
    return self.data.xfrc_applied[:, self.indexing.body_ids]

  # -- geom / site reads ----------------------------------------------------------

  @property
  def geom_pose_w(self):
    ids = self.indexing.geom_ids
    quat = mt.mat_to_quat(self.data.geom_xmat[:, ids])
    return jnp.concatenate([self.data.geom_xpos[:, ids], quat], -1)

  @property
  def geom_vel_w(self):
    ids = self.indexing.geom_ids
    rid = self.indexing.root_body_id
    body_ids = self._ctx.tp.geom_bodyid[ids]
    return compute_velocity_from_cvel(
      self.data.geom_xpos[:, ids],
      self.data.subtree_com[:, rid][:, None],
      self.data.cvel[:, body_ids],
    )

  @property
  def site_pose_w(self):
    ids = self.indexing.site_ids
    quat = mt.mat_to_quat(self.data.site_xmat[:, ids])
    return jnp.concatenate([self.data.site_xpos[:, ids], quat], -1)

  @property
  def site_vel_w(self):
    ids = self.indexing.site_ids
    rid = self.indexing.root_body_id
    body_ids = self._ctx.tp.site_bodyid[ids]
    return compute_velocity_from_cvel(
      self.data.site_xpos[:, ids],
      self.data.subtree_com[:, rid][:, None],
      self.data.cvel[:, body_ids],
    )

  # -- joint reads ----------------------------------------------------------------

  @property
  def joint_pos(self):
    return self.data.qpos[:, self.indexing.joint_q_adr]

  @property
  def joint_vel(self):
    return self.data.qvel[:, self.indexing.joint_v_adr]

  @property
  def joint_acc(self):
    return self.data.qacc[:, self.indexing.joint_v_adr]

  @property
  def actuator_force(self):
    return self.data.actuator_force[:, self.indexing.ctrl_ids]

  @property
  def ctrl(self):
    return self.data.ctrl[:, self.indexing.ctrl_ids]

  # -- component accessors (reference naming) ---------------------------------------

  @property
  def root_link_pos_w(self):
    return self.root_link_pose_w[:, 0:3]

  @property
  def root_link_quat_w(self):
    return self.root_link_pose_w[:, 3:7]

  @property
  def root_link_lin_vel_w(self):
    return self.root_link_vel_w[:, 0:3]

  @property
  def root_link_ang_vel_w(self):
    return self.root_link_vel_w[:, 3:6]

  @property
  def root_com_pos_w(self):
    return self.root_com_pose_w[:, 0:3]

  @property
  def root_com_quat_w(self):
    return self.root_com_pose_w[:, 3:7]

  @property
  def root_com_lin_vel_w(self):
    return self.root_com_vel_w[:, 0:3]

  @property
  def root_com_ang_vel_w(self):
    return self.root_com_vel_w[:, 3:6]

  @property
  def body_link_pos_w(self):
    return self.body_link_pose_w[..., 0:3]

  @property
  def body_link_quat_w(self):
    return self.body_link_pose_w[..., 3:7]

  @property
  def body_link_lin_vel_w(self):
    return self.body_link_vel_w[..., 0:3]

  @property
  def body_link_ang_vel_w(self):
    return self.body_link_vel_w[..., 3:6]

  @property
  def body_com_pos_w(self):
    return self.body_com_pose_w[..., 0:3]

  @property
  def body_com_quat_w(self):
    return self.body_com_pose_w[..., 3:7]

  @property
  def body_com_lin_vel_w(self):
    return self.body_com_vel_w[..., 0:3]

  @property
  def body_com_ang_vel_w(self):
    return self.body_com_vel_w[..., 3:6]

  @property
  def body_external_force(self):
    return self.body_external_wrench[..., 0:3]

  @property
  def body_external_torque(self):
    return self.body_external_wrench[..., 3:6]

  @property
  def geom_pos_w(self):
    return self.geom_pose_w[..., 0:3]

  @property
  def geom_quat_w(self):
    return self.geom_pose_w[..., 3:7]

  @property
  def site_pos_w(self):
    return self.site_pose_w[..., 0:3]

  @property
  def site_quat_w(self):
    return self.site_pose_w[..., 3:7]

  @property
  def site_lin_vel_w(self):
    return self.site_vel_w[..., 0:3]

  @property
  def site_ang_vel_w(self):
    return self.site_vel_w[..., 3:6]

  # -- derived frames -----------------------------------------------------------

  @property
  def projected_gravity_b(self):
    return mt.quat_apply_inverse(self.root_link_quat_w, self.gravity_vec_w)

  @property
  def heading_w(self):
    fwd_w = mt.quat_apply(self.root_link_quat_w, self.forward_vec_b)
    return jnp.arctan2(fwd_w[:, 1], fwd_w[:, 0])

  @property
  def root_link_lin_vel_b(self):
    return mt.quat_apply_inverse(self.root_link_quat_w, self.root_link_lin_vel_w)

  @property
  def root_link_ang_vel_b(self):
    return mt.quat_apply_inverse(self.root_link_quat_w, self.root_link_ang_vel_w)

  @property
  def root_com_lin_vel_b(self):
    return mt.quat_apply_inverse(self.root_link_quat_w, self.root_com_lin_vel_w)

  @property
  def root_com_ang_vel_b(self):
    return mt.quat_apply_inverse(self.root_link_quat_w, self.root_com_ang_vel_w)
