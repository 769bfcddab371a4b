"""Motion-imitation command (BeyondMimic-style reference-motion tracking).

Functional port of the reference MotionCommand
(tasks/tracking/mdp/commands.py:71-478): per-env motion clocks indexing an
npz mocap dataset, anchor-relative retargeting of desired body poses,
reference-state initialization (RSI) with pose/velocity/joint perturbation,
and adaptive failure-bin sampling (EMA'd per-bin failure counts convolved
with a decaying kernel).

All data-dependent control flow becomes masked/traced: bincount →
scatter-add, multinomial → jax.random.categorical, the mid-episode
"motion finished" resample → masked resample inside _update_command.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Literal

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.core import math as mt
from mjlab_tpu.managers.command_manager import CommandTerm
from mjlab_tpu.managers.manager_term_config import CommandTermCfg

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv


class MotionLoader:
  """Loads a motion npz onto device (reference commands.py:32-68).

  Arrays: joint_pos/joint_vel (T, nj), body_{pos,quat,lin_vel,ang_vel}_w
  (T, nbody, ·) — body arrays pre-gathered to the tracked body subset."""

  def __init__(self, motion_file: str, body_indexes: np.ndarray, dtype) -> None:
    data = np.load(motion_file)
    # Host numpy (NOT eager jnp): motion arrays are closure-captured by the
    # jitted step, and eager jnp constants trigger the axon slow path
    # (docs/PERF_NOTES.md). Use-sites wrap with jnp.asarray in-trace.
    npd = np.dtype(dtype)
    self.joint_pos = np.asarray(data["joint_pos"], dtype=npd)
    self.joint_vel = np.asarray(data["joint_vel"], dtype=npd)
    self.body_pos_w = np.asarray(data["body_pos_w"][:, body_indexes], dtype=npd)
    self.body_quat_w = np.asarray(data["body_quat_w"][:, body_indexes], dtype=npd)
    self.body_lin_vel_w = np.asarray(
      data["body_lin_vel_w"][:, body_indexes], dtype=npd
    )
    self.body_ang_vel_w = np.asarray(
      data["body_ang_vel_w"][:, body_indexes], dtype=npd
    )
    self.time_step_total = int(self.joint_pos.shape[0])


class MotionCommand(CommandTerm):
  cfg: "MotionCommandCfg"

  def __init__(self, cfg: "MotionCommandCfg", env: "ManagerBasedRlEnv"):
    super().__init__(cfg, env)
    if not cfg.motion_file:
      raise ValueError(
        "MotionCommandCfg.motion_file is empty — pass a local motion npz "
        "via `train/play <Task> --motion-file <path.npz>` (produce one with "
        "scripts/csv_to_npz.py, or tasks.tracking.motions."
        "make_standing_motion for a synthetic test motion)."
      )
    self.robot = env.scene[cfg.asset_name]
    self.robot_anchor_body_index = self.robot.body_names.index(cfg.anchor_body_name)
    self.motion_anchor_body_index = cfg.body_names.index(cfg.anchor_body_name)
    body_ids, _ = self.robot.find_bodies(cfg.body_names, preserve_order=True)
    self.body_indexes = np.asarray(body_ids)

    self.motion = MotionLoader(cfg.motion_file, self.body_indexes, env.dtype)
    self.bin_count = int(self.motion.time_step_total // (1 / env.step_dt)) + 1
    kernel = np.array(
      [cfg.adaptive_lambda**i for i in range(cfg.adaptive_kernel_size)]
    )
    self.kernel = np.asarray(kernel / kernel.sum(), dtype=np.dtype(env.dtype))

  # -- state ------------------------------------------------------------------

  def _init_term_state(self) -> dict:
    B, dt = self.num_envs, self._env.dtype
    nb = len(self.cfg.body_names)
    quat0 = jnp.zeros((B, nb, 4), dtype=dt).at[..., 0].set(1.0)
    return {
      "time_steps": jnp.zeros(B, dtype=jnp.int32),
      "body_pos_relative_w": jnp.zeros((B, nb, 3), dtype=dt),
      "body_quat_relative_w": quat0,
      "bin_failed_count": jnp.zeros(self.bin_count, dtype=dt),
      "current_bin_failed": jnp.zeros(self.bin_count, dtype=dt),
    }

  def _init_metrics(self) -> dict:
    B, dt = self.num_envs, self._env.dtype
    names = (
      "error_anchor_pos", "error_anchor_rot", "error_anchor_lin_vel",
      "error_anchor_ang_vel", "error_body_pos", "error_body_rot",
      "error_body_lin_vel", "error_body_ang_vel", "error_joint_pos",
      "error_joint_vel", "sampling_entropy", "sampling_top1_prob",
      "sampling_top1_bin",
    )
    return {n: jnp.zeros(B, dtype=dt) for n in names}

  # -- motion-indexed getters ---------------------------------------------------

  @property
  def time_steps(self):
    return self.state["time_steps"]

  @property
  def command(self) -> jax.Array:
    return jnp.concatenate([self.joint_pos, self.joint_vel], axis=1)

  @property
  def joint_pos(self):
    return jnp.asarray(self.motion.joint_pos)[self.time_steps]

  @property
  def joint_vel(self):
    return jnp.asarray(self.motion.joint_vel)[self.time_steps]

  @property
  def body_pos_w(self):
    return (
      jnp.asarray(self.motion.body_pos_w)[self.time_steps]
      + self._env.scene.env_origins[:, None, :]
    )

  @property
  def body_quat_w(self):
    return jnp.asarray(self.motion.body_quat_w)[self.time_steps]

  @property
  def body_lin_vel_w(self):
    return jnp.asarray(self.motion.body_lin_vel_w)[self.time_steps]

  @property
  def body_ang_vel_w(self):
    return jnp.asarray(self.motion.body_ang_vel_w)[self.time_steps]

  @property
  def anchor_pos_w(self):
    return (
      jnp.asarray(self.motion.body_pos_w)[self.time_steps, self.motion_anchor_body_index]
      + self._env.scene.env_origins
    )

  @property
  def anchor_quat_w(self):
    return jnp.asarray(self.motion.body_quat_w)[self.time_steps, self.motion_anchor_body_index]

  @property
  def anchor_lin_vel_w(self):
    return jnp.asarray(self.motion.body_lin_vel_w)[self.time_steps, self.motion_anchor_body_index]

  @property
  def anchor_ang_vel_w(self):
    return jnp.asarray(self.motion.body_ang_vel_w)[self.time_steps, self.motion_anchor_body_index]

  @property
  def body_pos_relative_w(self):
    return self.state["body_pos_relative_w"]

  @property
  def body_quat_relative_w(self):
    return self.state["body_quat_relative_w"]

  # -- robot-side getters ---------------------------------------------------------

  @property
  def robot_joint_pos(self):
    return self.robot.data.joint_pos

  @property
  def robot_joint_vel(self):
    return self.robot.data.joint_vel

  @property
  def robot_body_pos_w(self):
    return self.robot.data.body_link_pos_w[:, self.body_indexes]

  @property
  def robot_body_quat_w(self):
    return self.robot.data.body_link_quat_w[:, self.body_indexes]

  @property
  def robot_body_lin_vel_w(self):
    return self.robot.data.body_link_lin_vel_w[:, self.body_indexes]

  @property
  def robot_body_ang_vel_w(self):
    return self.robot.data.body_link_ang_vel_w[:, self.body_indexes]

  @property
  def robot_anchor_pos_w(self):
    return self.robot.data.body_link_pos_w[:, self.robot_anchor_body_index]

  @property
  def robot_anchor_quat_w(self):
    return self.robot.data.body_link_quat_w[:, self.robot_anchor_body_index]

  @property
  def robot_anchor_lin_vel_w(self):
    return self.robot.data.body_link_lin_vel_w[:, self.robot_anchor_body_index]

  @property
  def robot_anchor_ang_vel_w(self):
    return self.robot.data.body_link_ang_vel_w[:, self.robot_anchor_body_index]

  # -- lifecycle hooks ---------------------------------------------------------

  def _update_metrics(self) -> None:
    m = self.state["metrics"]
    m["error_anchor_pos"] = jnp.linalg.norm(
      self.anchor_pos_w - self.robot_anchor_pos_w, axis=-1
    )
    m["error_anchor_rot"] = mt.quat_error_magnitude(
      self.anchor_quat_w, self.robot_anchor_quat_w
    )
    m["error_anchor_lin_vel"] = jnp.linalg.norm(
      self.anchor_lin_vel_w - self.robot_anchor_lin_vel_w, axis=-1
    )
    m["error_anchor_ang_vel"] = jnp.linalg.norm(
      self.anchor_ang_vel_w - self.robot_anchor_ang_vel_w, axis=-1
    )
    m["error_body_pos"] = jnp.linalg.norm(
      self.body_pos_relative_w - self.robot_body_pos_w, axis=-1
    ).mean(axis=-1)
    m["error_body_rot"] = mt.quat_error_magnitude(
      self.body_quat_relative_w, self.robot_body_quat_w
    ).mean(axis=-1)
    m["error_body_lin_vel"] = jnp.linalg.norm(
      self.body_lin_vel_w - self.robot_body_lin_vel_w, axis=-1
    ).mean(axis=-1)
    m["error_body_ang_vel"] = jnp.linalg.norm(
      self.body_ang_vel_w - self.robot_body_ang_vel_w, axis=-1
    ).mean(axis=-1)
    m["error_joint_pos"] = jnp.linalg.norm(
      self.joint_pos - self.robot_joint_pos, axis=-1
    )
    m["error_joint_vel"] = jnp.linalg.norm(
      self.joint_vel - self.robot_joint_vel, axis=-1
    )

  def _sample_time_steps(self, env_mask: jax.Array) -> jax.Array:
    """New per-env motion phases for masked envs (mode-dependent)."""
    st = self.state
    m = st["metrics"]
    total = self.motion.time_step_total
    if self.cfg.sampling_mode == "start":
      return jnp.zeros(self.num_envs, dtype=jnp.int32)
    if self.cfg.sampling_mode == "uniform":
      m["sampling_entropy"] = jnp.ones_like(m["sampling_entropy"])
      m["sampling_top1_prob"] = jnp.full_like(
        m["sampling_top1_prob"], 1.0 / self.bin_count
      )
      m["sampling_top1_bin"] = jnp.full_like(m["sampling_top1_bin"], 0.5)
      return jax.random.randint(
        self._env.next_key(), (self.num_envs,), 0, total
      ).astype(jnp.int32)

    # Adaptive: record failure bins (only when something failed, matching
    # reference commands.py:259-267's overwrite-on-failure semantics).
    failed = self._env.termination_manager.terminated & env_mask
    bin_idx = jnp.clip(
      (st["time_steps"] * self.bin_count) // max(total, 1), 0, self.bin_count - 1
    )
    new_counts = jnp.zeros(self.bin_count, dtype=self._env.dtype).at[bin_idx].add(
      failed.astype(self._env.dtype)
    )
    st["current_bin_failed"] = jnp.where(
      jnp.any(failed), new_counts, st["current_bin_failed"]
    )

    probs = st["bin_failed_count"] + self.cfg.adaptive_uniform_ratio / float(
      self.bin_count
    )
    # Non-causal decaying kernel with replicate ("edge") padding.
    k = self.cfg.adaptive_kernel_size
    if k > 1:
      padded = jnp.concatenate(
        [probs, jnp.full((k - 1,), probs[-1], dtype=probs.dtype)]
      )
      windows = jnp.stack([padded[i : i + self.bin_count] for i in range(k)])
      probs = jnp.einsum("k,kb->b", self.kernel, windows)
    probs = probs / probs.sum()

    keys = jax.random.split(self._env.next_key(), 2)
    sampled_bins = jax.random.categorical(
      keys[0], jnp.log(probs + 1e-12), shape=(self.num_envs,)
    )
    frac = jax.random.uniform(keys[1], (self.num_envs,), dtype=self._env.dtype)
    new_steps = (
      (sampled_bins.astype(self._env.dtype) + frac) / self.bin_count * (total - 1)
    ).astype(jnp.int32)

    entropy = -jnp.sum(probs * jnp.log(probs + 1e-12)) / math.log(self.bin_count)
    m["sampling_entropy"] = jnp.full_like(m["sampling_entropy"], entropy)
    m["sampling_top1_prob"] = jnp.full_like(m["sampling_top1_prob"], probs.max())
    m["sampling_top1_bin"] = jnp.full_like(
      m["sampling_top1_bin"], jnp.argmax(probs).astype(self._env.dtype) / self.bin_count
    )
    return new_steps

  def _sample_range_dict(self, key, ranges: dict) -> jax.Array:
    lohi = np.array(
      [ranges.get(k, (0.0, 0.0)) for k in ("x", "y", "z", "roll", "pitch", "yaw")]
    )
    u = jax.random.uniform(key, (self.num_envs, 6), dtype=self._env.dtype)
    lo = jnp.asarray(lohi[:, 0], dtype=self._env.dtype)
    hi = jnp.asarray(lohi[:, 1], dtype=self._env.dtype)
    return lo + (hi - lo) * u

  def _resample_command(self, env_mask: jax.Array) -> None:
    st = self.state
    new_steps = self._sample_time_steps(env_mask)
    st["time_steps"] = jnp.where(env_mask, new_steps, st["time_steps"])

    # Reference-state initialization with perturbations
    # (reference commands.py:318-375).
    keys = jax.random.split(self._env.next_key(), 3)
    root_pos = self.body_pos_w[:, 0]
    root_ori = self.body_quat_w[:, 0]
    root_lin_vel = self.body_lin_vel_w[:, 0]
    root_ang_vel = self.body_ang_vel_w[:, 0]

    pose_rand = self._sample_range_dict(keys[0], self.cfg.pose_range)
    root_pos = root_pos + pose_rand[:, 0:3]
    ori_delta = mt.quat_from_euler_xyz(
      pose_rand[:, 3], pose_rand[:, 4], pose_rand[:, 5]
    )
    root_ori = mt.quat_mul(ori_delta, root_ori)

    vel_rand = self._sample_range_dict(keys[1], self.cfg.velocity_range)
    root_lin_vel = root_lin_vel + vel_rand[:, :3]
    root_ang_vel = root_ang_vel + vel_rand[:, 3:]

    lo, hi = self.cfg.joint_position_range
    joint_pos = self.joint_pos + jax.random.uniform(
      keys[2], self.joint_pos.shape, dtype=self._env.dtype, minval=lo, maxval=hi
    )
    soft = self.robot.data.soft_joint_pos_limits
    joint_pos = jnp.clip(joint_pos, soft[..., 0], soft[..., 1])
    self.robot.write_joint_state_to_sim(joint_pos, self.joint_vel, env_mask=env_mask)

    root_state = jnp.concatenate(
      [root_pos, root_ori, root_lin_vel, root_ang_vel], axis=-1
    )
    self.robot.write_root_state_to_sim(root_state, env_mask=env_mask)
    self.robot.clear_state(env_mask=env_mask)

  def _update_command(self) -> None:
    st = self.state
    st["time_steps"] = st["time_steps"] + 1
    finished = st["time_steps"] >= self.motion.time_step_total
    self._resample_command(finished)

    # Anchor-relative retargeting (reference commands.py:383-405): desired
    # body targets expressed at the robot's current anchor xy + yaw, the
    # motion's anchor z.
    nb = len(self.cfg.body_names)
    anchor_pos = self.anchor_pos_w
    anchor_quat = self.anchor_quat_w
    r_anchor_pos = self.robot_anchor_pos_w
    r_anchor_quat = self.robot_anchor_quat_w

    delta_pos = r_anchor_pos.at[:, 2].set(anchor_pos[:, 2])
    delta_ori = mt.yaw_quat(mt.quat_mul(r_anchor_quat, mt.quat_inv(anchor_quat)))
    delta_pos = jnp.broadcast_to(delta_pos[:, None, :], (self.num_envs, nb, 3))
    delta_ori = jnp.broadcast_to(delta_ori[:, None, :], (self.num_envs, nb, 4))

    st["body_quat_relative_w"] = mt.quat_mul(delta_ori, self.body_quat_w)
    st["body_pos_relative_w"] = delta_pos + mt.quat_apply(
      delta_ori, self.body_pos_w - anchor_pos[:, None, :]
    )

    if self.cfg.sampling_mode == "adaptive":
      a = self.cfg.adaptive_alpha
      st["bin_failed_count"] = (
        a * st["current_bin_failed"] + (1 - a) * st["bin_failed_count"]
      )
      st["current_bin_failed"] = jnp.zeros_like(st["current_bin_failed"])

  # Viewer hook (reference commands.py:414-478): ghost mode renders the full
  # robot at the motion's target pose (anchor root + motion joint positions)
  # via the visualizer's ghost-mesh path; frames mode draws desired/current
  # body triads.
  def debug_vis(self, visualizer) -> None:
    if self.cfg.viz.mode == "ghost" and hasattr(visualizer, "add_ghost_mesh"):
      i = visualizer.env_idx
      idxg = self.robot.indexing
      # Scatter the target pose into a full scene qpos (the ghost model is
      # the scene's MjModel, which may carry more than this entity).
      qpos = np.asarray(self._env.state.data.qpos[i]).copy()
      qpos[idxg.free_joint_q_adr] = np.concatenate(
        [np.asarray(self.anchor_pos_w)[i], np.asarray(self.anchor_quat_w)[i]]
      )
      qpos[idxg.joint_q_adr] = np.asarray(self.joint_pos)[i]
      visualizer.add_ghost_mesh(qpos)
      return
    desired_pos = np.asarray(self.body_pos_w)[visualizer.env_idx]
    desired_rotm = np.asarray(mt.quat_to_mat(self.body_quat_w))[visualizer.env_idx]
    current_pos = np.asarray(self.robot_body_pos_w)[visualizer.env_idx]
    current_rotm = np.asarray(mt.quat_to_mat(self.robot_body_quat_w))[
      visualizer.env_idx
    ]
    for i, body_name in enumerate(self.cfg.body_names):
      visualizer.add_frame(
        position=desired_pos[i], rotation_matrix=desired_rotm[i], scale=0.08,
        label=f"desired_{body_name}",
      )
      visualizer.add_frame(
        position=current_pos[i], rotation_matrix=current_rotm[i], scale=0.12,
        label=f"current_{body_name}",
      )


@dataclass(kw_only=True)
class MotionCommandCfg(CommandTermCfg):
  motion_file: str = ""
  anchor_body_name: str = ""
  body_names: tuple[str, ...] = ()
  asset_name: str = "robot"
  class_type: type = MotionCommand
  pose_range: dict[str, tuple[float, float]] = field(default_factory=dict)
  velocity_range: dict[str, tuple[float, float]] = field(default_factory=dict)
  joint_position_range: tuple[float, float] = (-0.52, 0.52)
  adaptive_kernel_size: int = 1
  adaptive_lambda: float = 0.8
  adaptive_uniform_ratio: float = 0.1
  adaptive_alpha: float = 0.001
  sampling_mode: Literal["adaptive", "uniform", "start"] = "adaptive"

  @dataclass
  class VizCfg:
    mode: Literal["ghost", "frames"] = "ghost"
    ghost_color: tuple[float, float, float, float] = (0.5, 0.7, 0.5, 0.5)

  viz: VizCfg = field(default_factory=VizCfg)
