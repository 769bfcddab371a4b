"""Uniform velocity command with heading control and standing envs.

Functional port of the reference UniformVelocityCommand
(tasks/velocity/mdp/velocity_command.py:23-101): per-env (vx, vy, wz)
commands resampled on a clock; a fraction of envs track a heading target
(wz derived by a P-controller on heading error); a fraction stand still.
All per-env branching is masked (jnp.where), and the sampling ranges live
in the term's state pytree so curriculum terms can stage them in-jit.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

from mjlab_tpu.core import math as mt
from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.manager_term_config import CommandTermCfg

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv


class UniformVelocityCommand(CommandTerm):
  cfg: "UniformVelocityCommandCfg"

  def __init__(self, cfg: "UniformVelocityCommandCfg", env: "ManagerBasedRlEnv"):
    super().__init__(cfg, env)
    if cfg.heading_command and cfg.ranges.heading is None:
      raise ValueError("heading_command=True but ranges.heading is None.")
    if cfg.ranges.heading and not cfg.heading_command:
      raise ValueError("ranges.heading is set but heading_command=False.")
    self.robot = env.scene[cfg.asset_name]

  @property
  def command(self) -> jax.Array:
    return self.state["vel_command_b"]

  def _init_term_state(self) -> dict:
    B, dt = self.num_envs, self._env.dtype
    r = self.cfg.ranges
    return {
      "vel_command_b": jnp.zeros((B, 3), dtype=dt),
      "heading_target": jnp.zeros(B, dtype=dt),
      "is_heading_env": jnp.zeros(B, dtype=bool),
      "is_standing_env": jnp.zeros(B, dtype=bool),
      # Ranges as state so commands_vel curriculum can stage them in-trace.
      "ranges": {
        "lin_vel_x": jnp.asarray(r.lin_vel_x, dtype=dt),
        "lin_vel_y": jnp.asarray(r.lin_vel_y, dtype=dt),
        "ang_vel_z": jnp.asarray(r.ang_vel_z, dtype=dt),
      },
    }

  def _init_metrics(self) -> dict:
    B, dt = self.num_envs, self._env.dtype
    return {
      "error_vel_xy": jnp.zeros(B, dtype=dt),
      "error_vel_yaw": jnp.zeros(B, dtype=dt),
    }

  def _uniform(self, key, lo_hi) -> jax.Array:
    lo, hi = lo_hi[0], lo_hi[1]
    u = jax.random.uniform(key, (self.num_envs,), dtype=self._env.dtype)
    return lo + (hi - lo) * u

  def _resample_command(self, env_mask: jax.Array) -> None:
    st = self.state
    ranges = st["ranges"]
    keys = jax.random.split(self._env.next_key(), 6)
    cmd = jnp.stack(
      [
        self._uniform(keys[0], ranges["lin_vel_x"]),
        self._uniform(keys[1], ranges["lin_vel_y"]),
        self._uniform(keys[2], ranges["ang_vel_z"]),
      ],
      axis=-1,
    )
    st["vel_command_b"] = jnp.where(env_mask[:, None], cmd, st["vel_command_b"])

    if self.cfg.heading_command:
      assert self.cfg.ranges.heading is not None
      heading = self._uniform(
        keys[3], jnp.asarray(self.cfg.ranges.heading, dtype=self._env.dtype)
      )
      st["heading_target"] = jnp.where(env_mask, heading, st["heading_target"])
      is_heading = (
        jax.random.uniform(keys[4], (self.num_envs,), dtype=self._env.dtype)
        <= self.cfg.rel_heading_envs
      )
      st["is_heading_env"] = jnp.where(env_mask, is_heading, st["is_heading_env"])

    is_standing = (
      jax.random.uniform(keys[5], (self.num_envs,), dtype=self._env.dtype)
      <= self.cfg.rel_standing_envs
    )
    st["is_standing_env"] = jnp.where(env_mask, is_standing, st["is_standing_env"])

    if self.cfg.init_velocity_prob > 0.0:
      # Kick-start resampled envs with the commanded velocity (reference
      # velocity_command.py:77-92).
      inject = env_mask & (
        jax.random.uniform(self._env.next_key(), (self.num_envs,),
                           dtype=self._env.dtype)
        < self.cfg.init_velocity_prob
      )
      data = self.robot.data
      lin_vel_b = data.root_link_lin_vel_b
      lin_vel_b = lin_vel_b.at[:, :2].set(st["vel_command_b"][:, :2])
      lin_vel_w = mt.quat_apply(data.root_link_quat_w, lin_vel_b)
      ang_vel_b = data.root_link_ang_vel_b
      ang_vel_b = ang_vel_b.at[:, 2].set(st["vel_command_b"][:, 2])
      root_state = jnp.concatenate(
        [data.root_link_pos_w, data.root_link_quat_w, lin_vel_w, ang_vel_b],
        axis=-1,
      )
      self.robot.write_root_state(root_state, env_mask=inject)

  def _update_command(self) -> None:
    st = self.state
    if self.cfg.heading_command:
      heading_error = mt.wrap_to_pi(st["heading_target"] - self.robot.data.heading_w)
      wz = jnp.clip(
        self.cfg.heading_control_stiffness * heading_error,
        self.cfg.ranges.ang_vel_z[0],
        self.cfg.ranges.ang_vel_z[1],
      )
      cmd_z = jnp.where(st["is_heading_env"], wz, st["vel_command_b"][:, 2])
      st["vel_command_b"] = st["vel_command_b"].at[:, 2].set(cmd_z)
    st["vel_command_b"] = jnp.where(
      st["is_standing_env"][:, None], 0.0, st["vel_command_b"]
    )

  def _update_metrics(self) -> None:
    st = self.state
    max_command_step = self.cfg.resampling_time_range[1] / self._env.step_dt
    data = self.robot.data
    st["metrics"]["error_vel_xy"] = st["metrics"]["error_vel_xy"] + (
      jnp.linalg.norm(
        st["vel_command_b"][:, :2] - data.root_link_lin_vel_b[:, :2], axis=-1
      )
      / max_command_step
    )
    st["metrics"]["error_vel_yaw"] = st["metrics"]["error_vel_yaw"] + (
      jnp.abs(st["vel_command_b"][:, 2] - data.root_link_ang_vel_b[:, 2])
      / max_command_step
    )

  # Viewer hook (reference velocity_command.py:105-175); host-side.
  def debug_vis(self, visualizer) -> None:
    import numpy as np

    batch = visualizer.env_idx
    if batch >= self.num_envs:
      return
    cmd = np.asarray(self.command)[batch]
    data = self.robot.data
    pos = np.asarray(data.root_link_pos_w)[batch]
    mat = np.asarray(mt.quat_to_mat(data.root_link_quat_w))[batch]
    lin_b = np.asarray(data.root_link_lin_vel_b)[batch]
    ang_b = np.asarray(data.root_link_ang_vel_b)[batch]
    if np.linalg.norm(pos) < 1e-6:
      return
    scale, z = self.cfg.viz.scale, self.cfg.viz.z_offset
    base = pos + mat @ (np.array([0, 0, z]) * scale)

    def to_w(v):
      return pos + mat @ ((np.array([0, 0, z]) + v) * scale)

    visualizer.add_arrow(base, to_w([cmd[0], cmd[1], 0]), color=(0.2, 0.2, 0.6, 0.6),
                         width=0.015)
    visualizer.add_arrow(base, to_w([0, 0, cmd[2]]), color=(0.2, 0.6, 0.2, 0.6),
                         width=0.015)
    visualizer.add_arrow(base, to_w([lin_b[0], lin_b[1], 0]),
                         color=(0.0, 0.6, 1.0, 0.7), width=0.015)
    visualizer.add_arrow(base, to_w([0, 0, ang_b[2]]), color=(0.0, 1.0, 0.4, 0.7),
                         width=0.015)


@dataclass(kw_only=True)
class UniformVelocityCommandCfg(CommandTermCfg):
  asset_name: str = "robot"
  heading_command: bool = False
  heading_control_stiffness: float = 1.0
  rel_standing_envs: float = 0.0
  rel_heading_envs: float = 1.0
  init_velocity_prob: float = 0.0
  class_type: type = UniformVelocityCommand

  @dataclass
  class Ranges:
    lin_vel_x: tuple[float, float]
    lin_vel_y: tuple[float, float]
    ang_vel_z: tuple[float, float]
    heading: tuple[float, float] | None = None

  ranges: Ranges = None  # type: ignore[assignment]

  @dataclass
  class VizCfg:
    z_offset: float = 0.2
    scale: float = 0.5

  viz: VizCfg = field(default_factory=VizCfg)

  def __post_init__(self):
    if self.heading_command and self.ranges.heading is None:
      raise ValueError(
        "heading_command=True requires ranges.heading to be set."
      )
