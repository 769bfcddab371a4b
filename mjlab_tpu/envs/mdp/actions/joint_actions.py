"""Joint-space action terms (reference envs/mdp/actions/joint_actions.py).

JointPositionAction: action → scale·action + offset → PD position targets
(ctrl). Scale may be a per-actuator regex dict (e.g. G1's per-joint
0.25·effort/stiffness table, reference g1_constants.py:286-297).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.core.strings import resolve_matching_names_values
from mjlab_tpu.managers.action_manager import ActionTerm
from mjlab_tpu.managers.manager_term_config import ActionTermCfg


@dataclass
class JointActionCfg(ActionTermCfg):
  actuator_names: tuple[str, ...] = (".*",)
  scale: float | dict[str, float] = 1.0
  offset: float | dict[str, float] = 0.0
  preserve_order: bool = False


@dataclass
class JointPositionActionCfg(JointActionCfg):
  use_default_offset: bool = True

  def __post_init__(self):
    self.class_type = JointPositionAction


class JointAction(ActionTerm):
  cfg: JointActionCfg

  def __init__(self, cfg: JointActionCfg, env):
    super().__init__(cfg, env)
    asset = self._asset
    self._actuator_ids, self._actuator_names = asset.find_actuators(
      cfg.actuator_names, preserve_order=cfg.preserve_order
    )
    self._actuator_ids = np.asarray(self._actuator_ids)
    n = len(self._actuator_ids)

    def resolve(value, default):
      if isinstance(value, dict):
        _, _, vals = resolve_matching_names_values(value, self._actuator_names)
        return np.asarray(vals, dtype=np.dtype(env.dtype))
      return np.full((n,), float(value), dtype=np.dtype(env.dtype))

    self._scale = resolve(cfg.scale, 1.0)
    self._offset = resolve(cfg.offset, 0.0)

  @property
  def action_dim(self) -> int:
    return len(self._actuator_ids)

  def init_state(self) -> dict:
    B = self.num_envs
    z = jnp.zeros((B, self.action_dim), dtype=self._env.dtype)
    return {"raw": z, "processed": z}

  def process_actions(self, actions: jax.Array) -> None:
    processed = actions * self._scale + self._offset
    if self.cfg.clip is not None:
      lo, hi = self.cfg.clip
      processed = jnp.clip(processed, lo, hi)
    self.state = {"raw": actions, "processed": processed}

  @property
  def raw_actions(self):
    return self.state["raw"]

  @property
  def processed_actions(self):
    return self.state["processed"]

  def apply_actions(self) -> None:
    raise NotImplementedError

  def reset(self, env_mask=None) -> None:
    st = self.state
    if env_mask is None:
      self.state = {k: jnp.zeros_like(v) for k, v in st.items()}
    else:
      m = env_mask[:, None]
      self.state = {k: jnp.where(m, 0.0, v) for k, v in st.items()}


class JointPositionAction(JointAction):
  cfg: JointPositionActionCfg

  def __init__(self, cfg: JointPositionActionCfg, env):
    super().__init__(cfg, env)
    if cfg.use_default_offset:
      # Actuators are named after their joints (ActuatorSetCfg), so the
      # default joint positions indexed by actuator order give the offsets.
      asset = self._asset
      joint_idx = [asset.joint_names.index(n) for n in self._actuator_names]
      self._offset = asset.data.default_joint_pos[0, joint_idx]

  def apply_actions(self) -> None:
    self._asset.write_joint_position_target_to_sim(
      self.state["processed"], joint_ids=self._actuator_ids
    )
