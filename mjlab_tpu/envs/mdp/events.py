"""Stock event terms (reference envs/mdp/events.py).

All event terms take `env_mask` (boolean (B,)) instead of env_ids — masked
writes are the in-jit formulation of the reference's index writes. Samples
are drawn for ALL envs every call and merged by mask, so per-env randomness
is identical regardless of which envs fire.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Literal, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.core import math as mt
from mjlab_tpu.managers.scene_entity_config import SceneEntityCfg

_DEFAULT = SceneEntityCfg("robot")
_POSE_KEYS = ["x", "y", "z", "roll", "pitch", "yaw"]


def _uniform6(env, ranges_dict, shape):
  lo = jnp.asarray(
    [ranges_dict.get(k, (0.0, 0.0))[0] for k in _POSE_KEYS], dtype=env.dtype
  )
  hi = jnp.asarray(
    [ranges_dict.get(k, (0.0, 0.0))[1] for k in _POSE_KEYS], dtype=env.dtype
  )
  u = jax.random.uniform(env.next_key(), shape + (6,), dtype=env.dtype)
  return lo + u * (hi - lo)


def reset_scene_to_default(env, env_mask) -> None:
  for entity in env.scene.entities.values():
    root_state = jnp.asarray(entity.data.default_root_state)
    if not entity.is_fixed_base:
      root_state = root_state.at[:, 0:3].add(env.scene.env_origins)
      entity.write_root_state_to_sim(root_state, env_mask=env_mask)
    if entity.is_articulated:
      entity.write_joint_state_to_sim(
        entity.data.default_joint_pos,
        entity.data.default_joint_vel,
        env_mask=env_mask,
      )


def reset_root_state_uniform(
  env,
  env_mask,
  pose_range: dict[str, tuple[float, float]],
  velocity_range: dict[str, tuple[float, float]] | None = None,
  asset_cfg: SceneEntityCfg = _DEFAULT,
) -> None:
  asset = env.scene[asset_cfg.name]
  B = env.num_envs
  pose_samples = _uniform6(env, pose_range, (B,))
  root_states = asset.data.default_root_state

  positions = root_states[:, 0:3] + pose_samples[:, 0:3] + env.scene.env_origins
  delta = mt.quat_from_euler_xyz(
    pose_samples[:, 3], pose_samples[:, 4], pose_samples[:, 5]
  )
  orientations = mt.quat_mul(root_states[:, 3:7], delta)

  if asset.is_fixed_base:
    if not asset.is_mocap:
      raise ValueError(
        f"Cannot reset root state for fixed-base non-mocap entity '{asset_cfg.name}'."
      )
    asset.write_mocap_pose_to_sim(
      jnp.concatenate([positions, orientations], axis=-1), env_mask=env_mask
    )
    return

  vel_samples = _uniform6(env, velocity_range or {}, (B,))
  velocities = root_states[:, 7:13] + vel_samples

  asset.write_root_link_pose_to_sim(
    jnp.concatenate([positions, orientations], axis=-1), env_mask=env_mask
  )
  asset.write_root_link_velocity_to_sim(velocities, env_mask=env_mask)


def reset_joints_by_offset(
  env,
  env_mask,
  position_range: tuple[float, float],
  velocity_range: tuple[float, float],
  asset_cfg: SceneEntityCfg = _DEFAULT,
) -> None:
  asset = env.scene[asset_cfg.name]
  jp = asset.data.default_joint_pos[:, asset_cfg.joint_ids]
  jv = asset.data.default_joint_vel[:, asset_cfg.joint_ids]
  jp = jp + mt.sample_uniform(
    env.next_key(), *position_range, jp.shape, dtype=env.dtype
  )
  limits = asset.data.soft_joint_pos_limits[:, asset_cfg.joint_ids]
  jp = jnp.clip(jp, limits[..., 0], limits[..., 1])
  jv = jv + mt.sample_uniform(
    env.next_key(), *velocity_range, jv.shape, dtype=env.dtype
  )
  asset.write_joint_state_to_sim(
    jp, jv, joint_ids=asset_cfg.joint_ids
    if not isinstance(asset_cfg.joint_ids, slice) else None,
    env_mask=env_mask,
  )


def push_by_setting_velocity(
  env,
  env_mask,
  velocity_range: dict[str, tuple[float, float]],
  asset_cfg: SceneEntityCfg = _DEFAULT,
) -> None:
  asset = env.scene[asset_cfg.name]
  vel_w = asset.data.root_link_vel_w
  vel_w = vel_w + _uniform6(env, velocity_range, (env.num_envs,))
  asset.write_root_link_velocity_to_sim(vel_w, env_mask=env_mask)


def apply_external_force_torque(
  env,
  env_mask,
  force_range: tuple[float, float],
  torque_range: tuple[float, float],
  asset_cfg: SceneEntityCfg = _DEFAULT,
) -> None:
  asset = env.scene[asset_cfg.name]
  num_bodies = (
    len(asset_cfg.body_ids)
    if not isinstance(asset_cfg.body_ids, slice)
    else asset.num_bodies
  )
  size = (env.num_envs, num_bodies, 3)
  forces = mt.sample_uniform(env.next_key(), *force_range, size, dtype=env.dtype)
  torques = mt.sample_uniform(env.next_key(), *torque_range, size, dtype=env.dtype)
  body_ids = None if isinstance(asset_cfg.body_ids, slice) else asset_cfg.body_ids
  asset.write_external_wrench_to_sim(
    forces, torques, env_mask=env_mask, body_ids=body_ids
  )


# ---------------------------------------------------------------------------
# Unified domain randomization (reference events.py:228-459).
# ---------------------------------------------------------------------------


@dataclass
class FieldSpec:
  entity_type: Literal["dof", "joint", "body", "geom", "site", "actuator"]
  use_address: bool = False
  default_axes: list[int] | None = None
  valid_axes: list[int] | None = None


FIELD_SPECS = {
  "dof_armature": FieldSpec("dof", use_address=True),
  "dof_frictionloss": FieldSpec("dof", use_address=True),
  "dof_damping": FieldSpec("dof", use_address=True),
  "jnt_range": FieldSpec("joint"),
  "jnt_stiffness": FieldSpec("joint"),
  "body_mass": FieldSpec("body"),
  "body_ipos": FieldSpec("body", default_axes=[0, 1, 2]),
  "body_iquat": FieldSpec("body", default_axes=[0, 1, 2, 3]),
  "body_inertia": FieldSpec("body"),
  "body_pos": FieldSpec("body", default_axes=[0, 1, 2]),
  "body_quat": FieldSpec("body", default_axes=[0, 1, 2, 3]),
  "geom_friction": FieldSpec("geom", default_axes=[0], valid_axes=[0, 1, 2]),
  "geom_pos": FieldSpec("geom", default_axes=[0, 1, 2]),
  "geom_quat": FieldSpec("geom", default_axes=[0, 1, 2, 3]),
  "site_pos": FieldSpec("site", default_axes=[0, 1, 2]),
  "site_quat": FieldSpec("site", default_axes=[0, 1, 2, 3]),
  "qpos0": FieldSpec("joint", use_address=True),
  # Actuator gains (PD stiffness/damping randomization) — engine-native
  # extension beyond the reference whitelist.
  "actuator_gainprm": FieldSpec("actuator", default_axes=[0]),
  "actuator_biasprm": FieldSpec("actuator", default_axes=[1, 2]),
}


def _entity_indices(indexing, asset_cfg: SceneEntityCfg, spec: FieldSpec):
  if spec.entity_type == "dof":
    ids = asset_cfg.joint_ids
    base = indexing.joint_v_adr
    return base if isinstance(ids, slice) else base[ids]
  if spec.entity_type == "joint":
    if spec.use_address:  # qpos0
      ids = asset_cfg.joint_ids
      base = indexing.joint_q_adr
      return base if isinstance(ids, slice) else base[ids]
    ids = asset_cfg.joint_ids
    return indexing.joint_ids if isinstance(ids, slice) else indexing.joint_ids[ids]
  if spec.entity_type == "body":
    ids = asset_cfg.body_ids
    return indexing.body_ids if isinstance(ids, slice) else indexing.body_ids[ids]
  if spec.entity_type == "geom":
    ids = asset_cfg.geom_ids
    return indexing.geom_ids if isinstance(ids, slice) else indexing.geom_ids[ids]
  if spec.entity_type == "site":
    ids = asset_cfg.site_ids
    return indexing.site_ids if isinstance(ids, slice) else indexing.site_ids[ids]
  if spec.entity_type == "actuator":
    ids = asset_cfg.actuator_ids
    return indexing.ctrl_ids if isinstance(ids, slice) else indexing.ctrl_ids[ids]
  raise ValueError(spec.entity_type)


def randomize_field(
  env,
  env_mask,
  field: str,
  ranges: Union[Tuple[float, float], Dict[int, Tuple[float, float]]],
  distribution: Literal["uniform", "log_uniform", "gaussian"] = "uniform",
  operation: Literal["add", "scale", "abs"] = "abs",
  asset_cfg: SceneEntityCfg | None = None,
  axes: list[int] | None = None,
) -> None:
  """Randomize a model field per env (the model leaf must be env-batched —
  the env expands DR fields before tracing; reference sim expand +
  randomization.py)."""
  if field not in FIELD_SPECS:
    raise ValueError(f"Unknown field '{field}'. Supported: {list(FIELD_SPECS)}")
  spec = FIELD_SPECS[field]
  asset_cfg = asset_cfg or _DEFAULT
  asset = env.scene[asset_cfg.name]

  model_field = getattr(env.model, field)
  if model_field.ndim == 0 or model_field.shape[0] != env.num_envs:
    raise RuntimeError(
      f"Model field '{field}' is not env-batched; mark the event with "
      f"domain_randomization=True so the env expands it."
    )

  ent_idx = np.asarray(_entity_indices(asset.indexing, asset_cfg, spec))
  sub = model_field[:, ent_idx]  # (B, n) or (B, n, k)

  if sub.ndim == 2:
    target_axes = [None]
  else:
    if axes is not None:
      target_axes = list(axes)
    elif isinstance(ranges, dict):
      target_axes = sorted(ranges.keys())
    elif spec.default_axes is not None:
      target_axes = list(spec.default_axes)
    else:
      target_axes = list(range(sub.shape[-1]))

  def sample(lo, hi, shape):
    key = env.next_key()
    if distribution == "uniform":
      return mt.sample_uniform(key, lo, hi, shape, dtype=env.dtype)
    if distribution == "log_uniform":
      return mt.sample_log_uniform(key, lo, hi, shape, dtype=env.dtype)
    if distribution == "gaussian":
      return mt.sample_gaussian(key, lo, hi, shape, dtype=env.dtype)
    raise ValueError(distribution)

  def combine(old, rand):
    if operation == "add":
      return old + rand
    if operation == "scale":
      return old * rand
    if operation == "abs":
      return rand
    raise ValueError(operation)

  new_sub = sub
  for ax in target_axes:
    if isinstance(ranges, dict):
      lo, hi = ranges[ax if ax is not None else 0]
    else:
      lo, hi = ranges
    shape = sub.shape[:2]
    rand = sample(lo, hi, shape)
    if ax is None:
      new_sub = combine(new_sub, rand)
    else:
      new_sub = new_sub.at[..., ax].set(combine(new_sub[..., ax], rand))

  mask = env_mask.reshape((-1,) + (1,) * (sub.ndim - 1))
  merged = jnp.where(mask, new_sub, sub)
  env.model = env.model.replace(
    **{field: model_field.at[:, ent_idx].set(merged)}
  )
