"""Parallel-ankle pitch/roll → A/B tendon action term (fork-specific).

Functional port of the reference AnklePrToTendonAction
(envs/mdp/actions/ankle_ab_action.py:17-127): the Asimov-toe robot's
ankles are driven by two tendon position actuators per foot; policy
actions are [left_pitch, left_roll, right_pitch, right_roll] and the
linearized geometry maps them to tendon length targets
(reference ankle_ab_action.py:114-122):

  left_A  = -L·θL - d·φL    left_B  = -L·θL + d·φL
  right_A = +L·θR - d·φR    right_B = +L·θR + d·φR

(the right pitch sign flips: mirrored joint axis in the XML).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.core.strings import resolve_matching_names_values
from mjlab_tpu.managers.action_manager import ActionTerm
from mjlab_tpu.managers.manager_term_config import ActionTermCfg


class AnklePrToTendonAction(ActionTerm):
  cfg: "AnklePrToTendonActionCfg"

  def __init__(self, cfg: "AnklePrToTendonActionCfg", env):
    super().__init__(cfg, env)
    asset = self._asset
    joint_names = [
      cfg.left_pitch_joint,
      cfg.left_roll_joint,
      cfg.right_pitch_joint,
      cfg.right_roll_joint,
    ]
    joint_ids, _ = asset.find_joints(joint_names, preserve_order=True)
    self._joint_ids = np.asarray(joint_ids)
    actuator_ids, _ = asset.find_actuators(
      [cfg.left_tendon_A, cfg.left_tendon_B, cfg.right_tendon_A,
       cfg.right_tendon_B],
      preserve_order=True,
    )
    self._actuator_ids = np.asarray(actuator_ids)

    def resolve(value, default):
      if isinstance(value, dict):
        idx, _, vals = resolve_matching_names_values(
          value, joint_names, preserve_order=True
        )
        out = np.full((4,), default, dtype=float)
        out[idx] = vals
        return out.astype(np.dtype(env.dtype))
      return np.full((4,), float(value), dtype=np.dtype(env.dtype))

    self._scale = resolve(cfg.scale, 1.0)
    self._offset = resolve(cfg.offset, 0.0)
    if cfg.use_default_offset:
      self._offset = asset.data.default_joint_pos[0, self._joint_ids]

  @property
  def action_dim(self) -> int:
    return 4

  def init_state(self) -> dict:
    z = jnp.zeros((self.num_envs, 4), dtype=self._env.dtype)
    return {"raw": z, "processed": z}

  @property
  def raw_actions(self):
    return self.state["raw"]

  @property
  def processed_actions(self):
    return self.state["processed"]

  def process_actions(self, actions: jax.Array) -> None:
    processed = actions * self._scale + self._offset
    if self.cfg.clip is not None:
      lo, hi = self.cfg.clip
      processed = jnp.clip(processed, lo, hi)
    self.state = {"raw": actions, "processed": processed}

  def apply_actions(self) -> None:
    pr = self.state["processed"]
    theta_l, phi_l, theta_r, phi_r = pr[:, 0], pr[:, 1], pr[:, 2], pr[:, 3]
    L, d = float(self.cfg.L), float(self.cfg.d)
    targets = jnp.stack(
      [
        -L * theta_l - d * phi_l,
        -L * theta_l + d * phi_l,
        +L * theta_r - d * phi_r,
        +L * theta_r + d * phi_r,
      ],
      axis=1,
    )
    self._asset.write_ctrl_to_sim(targets, ctrl_ids=self._actuator_ids)

  def reset(self, env_mask=None) -> None:
    st = self.state
    if env_mask is None:
      self.state = {k: jnp.zeros_like(v) for k, v in st.items()}
    else:
      m = env_mask[:, None]
      self.state = {k: jnp.where(m, 0.0, v) for k, v in st.items()}


@dataclass
class AnklePrToTendonActionCfg(ActionTermCfg):
  """Config; inputs [left_pitch, left_roll, right_pitch, right_roll] →
  tendon targets [left_A, left_B, right_A, right_B]."""

  left_pitch_joint: str = "left_ankle_pitch_joint"
  left_roll_joint: str = "left_ankle_roll_joint"
  right_pitch_joint: str = "right_ankle_pitch_joint"
  right_roll_joint: str = "right_ankle_roll_joint"

  left_tendon_A: str = "left_ankle_A"
  left_tendon_B: str = "left_ankle_B"
  right_tendon_A: str = "right_ankle_A"
  right_tendon_B: str = "right_ankle_B"

  scale: float | dict[str, float] = 1.0
  offset: float | dict[str, float] = 0.0
  use_default_offset: bool = False

  L: float = 1.0
  d: float = 1.0

  def __post_init__(self):
    self.class_type = AnklePrToTendonAction
