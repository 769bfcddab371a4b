"""Manager-based RL environment — the jitted MDP step.

The reference hot loop (envs/manager_based_rl_env.py:111-152) becomes ONE
pure function `(state, action, model) → (state', obs, rew, terminated,
truncated, log)` with in-step masked auto-reset (the reference's
`reset_env_ids = nonzero()` GPU→CPU sync point disappears). Ordering is
preserved exactly: decimated physics → terminations → rewards → masked reset
(+ forward refresh) → command update → interval events → observations.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field as dc_field

import gymnasium as gym
import jax
import jax.numpy as jnp

from mjlab_tpu.envs.manager_based_env import (
  EnvState,
  ManagerBasedEnv,
  ManagerBasedEnvCfg,
)
from mjlab_tpu.managers.command_manager import CommandManager, NullCommandManager
from mjlab_tpu.managers.curriculum_manager import (
  CurriculumManager,
  NullCurriculumManager,
)
from mjlab_tpu.managers.manager_term_config import (
  CommandTermCfg,
  CurriculumTermCfg,
  RewardTermCfg,
  TerminationTermCfg,
)
from mjlab_tpu.managers.reward_manager import RewardManager
from mjlab_tpu.managers.termination_manager import TerminationManager


@dataclass(kw_only=True)
class ManagerBasedRlEnvCfg(ManagerBasedEnvCfg):
  episode_length_s: float
  rewards: dict[str, RewardTermCfg] = dc_field(default_factory=dict)
  terminations: dict[str, TerminationTermCfg] = dc_field(default_factory=dict)
  commands: dict[str, CommandTermCfg] | None = None
  curriculum: dict[str, CurriculumTermCfg] | None = None
  is_finite_horizon: bool = False


class ManagerBasedRlEnv(ManagerBasedEnv, gym.Env):
  is_vector_env = True
  metadata = {"render_modes": [None, "rgb_array"], "render_fps": 50}
  cfg: ManagerBasedRlEnvCfg

  def __init__(self, cfg: ManagerBasedRlEnvCfg, device=None, render_mode=None,
               **kwargs):
    self._episode_length = jnp.zeros(cfg.scene.num_envs, dtype=jnp.int32)
    self._common_step_counter = jnp.zeros((), dtype=jnp.int32)
    self.render_mode = render_mode
    super().__init__(cfg=cfg, device=device)

    self._configure_gym_env_spaces()
    self.state: EnvState = self._pack_state()
    self._compile_step()

  def _configure_gym_env_spaces(self) -> None:
    """Gym spaces from manager dims (reference manager_based_rl_env.py:178-208)."""
    import numpy as np

    obs_space = {}
    for group, dim in self.observation_manager.group_obs_dim.items():
      obs_space[group] = gym.spaces.Box(
        low=-np.inf, high=np.inf, shape=tuple(dim)
      )
    self.single_observation_space = gym.spaces.Dict(obs_space)
    act_dim = self.action_manager.total_action_dim
    self.single_action_space = gym.spaces.Box(
      low=-np.inf, high=np.inf, shape=(act_dim,)
    )
    self.observation_space = gym.vector.utils.batch_space(
      self.single_observation_space, self.num_envs
    )
    self.action_space = gym.vector.utils.batch_space(
      self.single_action_space, self.num_envs
    )

  # -- properties ---------------------------------------------------------------

  @property
  def max_episode_length_s(self) -> float:
    return self.cfg.episode_length_s

  @property
  def max_episode_length(self) -> int:
    return math.ceil(self.max_episode_length_s / self.step_dt)

  # -- managers ----------------------------------------------------------------

  def load_managers(self) -> None:
    if self.cfg.commands is not None:
      self.command_manager = CommandManager(self.cfg.commands, self)
    else:
      self.command_manager = NullCommandManager()
    super().load_managers()
    self.termination_manager = TerminationManager(self.cfg.terminations, self)
    self.reward_manager = RewardManager(self.cfg.rewards, self)
    if self.cfg.curriculum is not None:
      self.curriculum_manager = CurriculumManager(self.cfg.curriculum, self)
    else:
      self.curriculum_manager = NullCurriculumManager()

  # -- pure step ----------------------------------------------------------------

  def _step_impl(self, state: EnvState, action: jax.Array):
    self._begin(state)

    self.action_manager.process_action(action)

    for _ in range(self.cfg.decimation):
      self.action_manager.apply_action()
      self.scene.write_data_to_sim()
      self._data = self._step_physics(self.model, self._data)
      self.scene.update(dt=self.physics_dt)

    self._episode_length = self._episode_length + 1
    self._common_step_counter = self._common_step_counter + 1

    reset_buf = self.termination_manager.compute()
    terminated = self.termination_manager.terminated
    time_outs = self.termination_manager.time_outs

    reward_buf = self.reward_manager.compute(dt=self.step_dt)

    # Masked in-step auto-reset (reference resets after reward computation,
    # manager_based_rl_env.py:126-137 — ordering preserved).
    log = self._reset_masked(reset_buf)
    self._data = jax.lax.cond(
      jnp.any(reset_buf),
      lambda d: self._forward_physics(self.model, d),
      lambda d: d,
      self._data,
    )

    self.command_manager.compute(dt=self.step_dt)

    if "interval" in self.event_manager.available_modes:
      self.event_manager.apply(mode="interval", dt=self.step_dt)

    obs_buf = self.observation_manager.compute(update_history=True)

    log.update(self.step_log)
    log["reset_count"] = jnp.sum(reset_buf.astype(jnp.int32))
    # Terrain contact-pool saturation telemetry (physics/collision.py
    # select): active contacts dropped by slot capacity on the last physics
    # substep, summed over envs. Nonzero here means the task cfg's terrain
    # slot count is too small and contacts are being silently lost.
    log["Metrics/physics/terrain_slots_dropped"] = jnp.sum(
      self._data.ncon_dropped
    ).astype(jnp.float32)
    new_state = self._pack_state()
    return new_state, (obs_buf, reward_buf, terminated, time_outs, log)

  def _reset_masked(self, mask: jax.Array) -> dict:
    """Reset masked envs in-trace (reference _reset_idx ordering,
    manager_based_rl_env.py:210-245)."""
    self.curriculum_manager.compute(env_mask=mask)
    if self.sim.tp.na:
      # Activation state resets with the env (mj_resetData zeros act).
      self._data = self._data.replace(
        act=jnp.where(mask[:, None], jnp.zeros((), self.dtype), self._data.act)
      )
    self.scene.reset(mask)
    if "reset" in self.event_manager.available_modes:
      self.event_manager.apply(
        mode="reset", env_mask=mask,
        global_env_step_count=self._common_step_counter,
      )
    log: dict = {}
    log.update(self.observation_manager.reset(mask))
    log.update(self.action_manager.reset(mask))
    # Mean episode length of resetting envs (×dt on host).
    log["Episode_Length"] = jnp.sum(
      jnp.where(mask, self._episode_length, 0)
    ).astype(self.dtype)
    log.update(self.reward_manager.reset(mask))
    log.update(self.curriculum_manager.reset(mask))
    log.update(self.command_manager.reset(mask))
    log.update(self.event_manager.reset(mask))
    log.update(self.termination_manager.reset(mask))
    self._episode_length = jnp.where(mask, 0, self._episode_length)
    return log

  def _reset_impl(self, state: EnvState):
    self._begin(state)
    # Populate derived kinematics first: reset-time readers (curriculum
    # terms, RSI metrics) see the end-of-episode state, and the threaded
    # state carries no derived leaves (slim threading; manager_based_env).
    self._data = self._forward_physics(self.model, self._data)
    mask = jnp.ones(self.num_envs, dtype=bool)
    self._reset_masked(mask)
    self._data = self._forward_physics(self.model, self._data)
    self.command_manager.compute(dt=self.step_dt)
    obs_buf = self.observation_manager.compute(update_history=True)
    return self._pack_state(), obs_buf

  def _compile_step(self) -> None:
    self._jit_step = jax.jit(
      lambda s, a: self._step_impl(s, a), donate_argnums=(0,)
    )
    self._jit_reset = jax.jit(lambda s: self._reset_impl(s))

  def build_packed_step(self):
    """High-rate stepping API: the env state and step outputs cross the
    jit boundary as a handful of flat buffers instead of ~200 leaves
    (utils/packing.py; per-leaf marshaling dominates small-program
    dispatch on relay-backed runtimes — docs/PERF_NOTES.md).

    Returns (jit_step_packed, pack_state, unpack_state, unpack_outputs):
      packed = pack_state(env.state)
      packed, out = jit_step_packed(packed, action)   # hot loop
      obs, rew, terminated, time_outs, log = unpack_outputs(out)
      env.state = unpack_state(packed)                # when host needs it
    Math-identical to `step` (tests/test_packed_step.py)."""
    from mjlab_tpu.utils.packing import build_packer

    big = 256 * self.num_envs
    pack_s, unpack_s = build_packer(self.state, big_threshold=big)
    act = jax.ShapeDtypeStruct(
      (self.num_envs, self.action_manager.total_action_dim), self.dtype
    )
    out_tmpl = jax.eval_shape(self._step_impl, self.state, act)[1]
    pack_o, unpack_o = build_packer(out_tmpl, big_threshold=big)

    def stepped(packed, action):
      state, out = self._step_impl(unpack_s(packed), action)
      return pack_s(state), pack_o(out)

    return (
      jax.jit(stepped, donate_argnums=(0,)),
      jax.jit(pack_s),
      jax.jit(unpack_s),
      unpack_o,
    )

  # -- host API -------------------------------------------------------------------

  def step(self, action: jax.Array):
    self.state, (obs, rew, terminated, time_outs, log) = self._jit_step(
      self.state, action
    )
    # Re-bind the host-side context to the concrete output state so manager
    # reads (get_command, sensor data, debug_vis) see real arrays, not the
    # tracers left over from the jit trace.
    self._begin(self.state)
    self.extras = {"log": log, "time_outs": time_outs}
    return obs, rew, terminated, time_outs, self.extras

  def reset(self, seed: int | None = None, options=None):
    if seed is not None:
      self.state = self.state.replace(rng=jax.random.key(seed))
    self.state, obs = self._jit_reset(self.state)
    self._begin(self.state)
    self.extras = {}
    return obs, self.extras

  def render(self):
    """rgb_array frame of env 0 via the offscreen renderer (reference
    manager_based_rl_env.py:154-169; requires a GL backend, e.g.
    MUJOCO_GL=egl headless). Returns None for render_mode=None."""
    if self.render_mode != "rgb_array":
      return None
    if not hasattr(self, "_offscreen_renderer"):
      from mjlab_tpu.viewer.offscreen_renderer import OffscreenRenderer

      self._offscreen_renderer = OffscreenRenderer(self)
    return self._offscreen_renderer.render(env_idx=0)

  def close(self) -> None:
    if hasattr(self, "_offscreen_renderer"):
      self._offscreen_renderer.close()
      del self._offscreen_renderer
