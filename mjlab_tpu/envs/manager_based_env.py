"""Manager-based environment: functional core.

The reference env (envs/manager_based_env.py:28-201) mutates GPU buffers via
manager objects; here the SAME orchestration runs inside one traced function:
the env object acts as the state context while tracing (its attributes hold
traced values), and `EnvState` is the explicit pytree threaded through the
jitted step. The reference's CUDA-graph capture points (graph (re)creation
after startup events, manager_based_env.py:118-130) correspond to trace time.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from mjlab_tpu import physics
from mjlab_tpu.managers.action_manager import ActionManager
from mjlab_tpu.managers.event_manager import EventManager
from mjlab_tpu.managers.manager_term_config import (
  ActionTermCfg,
  EventTermCfg,
  ObservationGroupCfg,
)
from mjlab_tpu.scene import Scene, SceneCfg
from mjlab_tpu.managers.observation_manager import ObservationManager
from mjlab_tpu.sim import Simulation, SimulationCfg


@struct.dataclass
class EnvState:
  """Explicit env-state pytree (the analog of all reference GPU buffers)."""

  data: physics.Data  # batched (B, ...)
  model: Any  # physics.Model (leaves may be per-env batched for DR)
  rng: jax.Array
  episode_length: jax.Array  # (B,) int32
  common_step_counter: jax.Array  # () int32
  ms: dict  # manager namespaces (nested dicts of arrays)


@dataclass(kw_only=True)
class ManagerBasedEnvCfg:
  decimation: int
  scene: SceneCfg
  observations: dict[str, ObservationGroupCfg]
  actions: dict[str, ActionTermCfg]
  events: dict[str, EventTermCfg] = field(default_factory=dict)
  sim: SimulationCfg = field(default_factory=SimulationCfg)
  seed: int | None = None
  viewer: Any = None


class ManagerBasedEnv:
  cfg: ManagerBasedEnvCfg

  def __init__(self, cfg: ManagerBasedEnvCfg, device=None):
    self.cfg = cfg
    self.device = device
    self._sim_step_counter = 0
    self.step_log: dict = {}

    self.scene = Scene(cfg.scene)
    self.sim = Simulation(
      cfg.scene.num_envs, cfg.sim, self.scene.compile(), device
    )
    self.tp = self.sim.tp
    self.dtype = self.sim.model.qpos0.dtype

    # Seed & initial state (eager).
    seed = cfg.seed if cfg.seed is not None else 42
    self._rng = jax.random.key(seed)
    self._model = self.sim.model
    self._data = self.sim.make_data()
    self._ms: dict[str, dict] = {}
    self._fwd = None  # built after startup events (DR may batch model leaves)

    # Populate derived quantities once so managers can shape-infer.
    self._refresh_forward()

    self.scene.initialize(self.sim.mj_model, self)
    self._ms["scene"] = self.scene.init_state()

    self.load_managers()

    # Domain-randomized model leaves gain a per-env axis before tracing (the
    # reference expands fields then re-captures its CUDA graph,
    # manager_based_env.py:118-130).
    dr_fields = tuple(self.event_manager.domain_randomization_fields)
    if dr_fields:
      self.sim.expand_model_fields(dr_fields)
      self._model = self.sim.model
      self._build_physics_fns()
    if "startup" in self.event_manager.available_modes:
      self.event_manager.apply(mode="startup")
      self._refresh_forward()

  # -- context protocol (used by managers, terms, entities, sensors) ----------

  @property
  def num_envs(self) -> int:
    return self.cfg.scene.num_envs

  @property
  def physics_dt(self) -> float:
    return float(self.cfg.sim.mujoco.timestep)

  @property
  def step_dt(self) -> float:
    return float(self.cfg.sim.mujoco.timestep * self.cfg.decimation)

  @property
  def data(self) -> physics.Data:
    return self._data

  @data.setter
  def data(self, value: physics.Data) -> None:
    self._data = value

  @property
  def model(self):
    return self._model

  @model.setter
  def model(self, value) -> None:
    self._model = value

  @property
  def unbatched_model(self):
    return self.sim.unbatched_model

  def ns(self, name: str) -> dict:
    return self._ms.setdefault(name, {})

  def next_key(self) -> jax.Array:
    self._rng, key = jax.random.split(self._rng)
    return key

  def contact_forces(self) -> jax.Array:
    """(B, C, 3) contact-frame forces for all slots."""
    return self._contact_forces_fn(self.model, self._data)

  # -- managers ----------------------------------------------------------------

  def load_managers(self) -> None:
    self.event_manager = EventManager(self.cfg.events, self)
    self.action_manager = ActionManager(self.cfg.actions, self)
    self.observation_manager = ObservationManager(self.cfg.observations, self)

  # -- physics helpers -----------------------------------------------------------

  def _build_physics_fns(self) -> None:
    axes = self.sim.model_axes
    tp = self.tp
    self._step_physics = jax.vmap(
      lambda m_, d_: physics.step(tp, m_, d_), in_axes=(axes, 0)
    )
    self._forward_physics = jax.vmap(
      lambda m_, d_: physics.forward(tp, m_, d_), in_axes=(axes, 0)
    )
    from mjlab_tpu.physics.constraint import contact_forces

    self._contact_forces_fn = jax.vmap(
      lambda m_, d_: contact_forces(tp, m_, d_), in_axes=(axes, 0)
    )

  def _refresh_forward(self) -> None:
    self._build_physics_fns()
    self._data = self._forward_physics(self.model, self._data)

  # -- state pack/unpack ------------------------------------------------------------

  def _pack_state(self) -> EnvState:
    return EnvState(
      data=self._data,
      model=self._model,
      rng=self._rng,
      episode_length=self._episode_length,
      common_step_counter=self._common_step_counter,
      ms=self._ms,
    )

  def _begin(self, state: EnvState) -> None:
    # Per-step metric sink: terms write env.step_log["Metrics/..."] = scalar
    # (the functional analog of the reference's env.extras["log"] writes from
    # inside reward terms, e.g. tasks/velocity/mdp/rewards.py:143).
    self.step_log: dict = {}
    self._data = state.data
    self._model = state.model
    self._rng = state.rng
    self._episode_length = state.episode_length
    self._common_step_counter = state.common_step_counter
    self._ms = jax.tree_util.tree_map(lambda x: x, state.ms)  # shallow-ish copy

  # Convenience accessors used by MDP terms (reference API naming).
  @property
  def episode_length_buf(self):
    return self._episode_length

  @property
  def common_step_counter(self):
    return self._common_step_counter

  def close(self) -> None:
    pass
