"""Manager-based environment: functional core.

The reference env (envs/manager_based_env.py:28-201) mutates GPU buffers via
manager objects; here the SAME orchestration runs inside one traced function:
the env object acts as the state context while tracing (its attributes hold
traced values), and `EnvState` is the explicit pytree threaded through the
jitted step. The reference's CUDA-graph capture points (graph (re)creation
after startup events, manager_based_env.py:118-130) correspond to trace time.
"""

from __future__ import annotations

import dataclasses
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
  """Explicit env-state pytree (the analog of all reference GPU buffers).

  SLIM by construction: `data` carries only the true physics state (qpos,
  qvel, ctrl, applied forces, warmstart, mocap, time, qacc) — derived
  quantities (kinematics, mass matrix, contacts, efc rows, sensordata) are
  None and recomputed inside the step; `model` is a dict holding ONLY the
  domain-randomized leaves (static model parameters inline into the traced
  program as numpy literals). This keeps the step program's argument/result
  count small — on relay-style runtimes per-leaf marshaling dominates the
  step wall clock (docs/PERF_NOTES.md: 162-leaf state = 0.55 ms/step vs
  0.14 ms for the same compute with one output)."""

  data: physics.Data  # batched (B, ...); derived leaves None
  model: dict  # DR-batched model leaves only ({} when no runtime DR)
  rng: jax.Array
  episode_length: jax.Array  # (B,) int32
  common_step_counter: jax.Array  # () int32
  ms: dict  # manager namespaces (nested dicts of arrays)


# Data leaves threaded through the jitted step: the true physics state
# (everything else is write-before-read inside forward() and stays out of
# the pytree), PLUS contact/qM/efc_J. Those three are derived, but dropping
# them from the program outputs makes XLA's TPU codegen emit a kernel that
# faults at 4096 envs (bisected empirically; fine at 1024, fine with any of
# them threaded) — and keeping them measured FASTER than the fully slim
# variant anyway (0.32 vs n/a ms/step; docs/PERF_NOTES.md). They also keep
# contacts/mass-matrix readable from host code after a step.
_DATA_STATE_FIELDS = (
  "time", "qpos", "qvel", "act", "ctrl", "qfrc_applied", "xfrc_applied",
  "mocap_pos", "mocap_quat", "qacc_warmstart", "qacc", "sensordata",
  "contact", "qM", "efc_J",
)


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
    self._init_slim_spec()
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
    """(B, C, 6) contact-frame wrenches (force + torque) for all slots."""
    self.ensure_derived()
    return self._contact_forces_fn(self.model, self._data)

  def ensure_derived(self) -> None:
    """Populate derived Data leaves (FK poses, contacts, efc) for host-side
    readers — viewers, debug visualizers, entity kinematics — which run
    OUTSIDE the jitted step where the threaded state is slim (derived
    leaves None). One jitted forward; no-op when already full."""
    if self._data.xpos is not None:
      return
    self._data = self._forward_physics(self.model, self._data)

  # -- managers ----------------------------------------------------------------

  def load_managers(self) -> None:
    self.event_manager = EventManager(self.cfg.events, self)
    self.action_manager = ActionManager(self.cfg.actions, self)
    self.observation_manager = ObservationManager(self.cfg.observations, self)

  # -- physics helpers -----------------------------------------------------------

  def _build_physics_fns(self) -> None:
    """Physics closures: the static model part (numpy leaves) is closed
    over and inlines as literals; only DR-batched leaves are arguments."""
    tp = self.tp
    dyn = tuple(sorted(self.sim.batched_fields))
    np_model = (
      self.sim.model.replace(**{f: None for f in dyn}) if dyn else self.sim.model
    )
    from mjlab_tpu.physics.constraint import contact_forces

    def make(fn):
      def one(dyn_leaves, d_):
        m_ = np_model.replace(**dyn_leaves) if dyn_leaves else np_model
        return fn(tp, m_, d_)

      # jit the vmap: called OUTSIDE a jit trace (build-time forward in
      # _refresh_forward, reset-time ensure_derived), an un-jitted vmap
      # executes op-by-op — hundreds of single-op programs, each a separate
      # compile+dispatch over the TPU relay (~300 s of env build wall time,
      # round-5 stack-dump diagnosis). Inside an enclosing jit the nested
      # jit is inlined, so the hot step path is unchanged.
      return jax.jit(jax.vmap(one, in_axes=({f: 0 for f in dyn}, 0)))

    self._dyn_model_fields = dyn
    self._step_physics_fn = make(physics.step)
    self._forward_physics_fn = make(physics.forward)
    self._contact_forces_raw = make(contact_forces)

  def _dyn_model(self) -> dict:
    return {f: getattr(self._model, f) for f in self._dyn_model_fields}

  def _step_physics(self, _model_unused, d):
    return self._step_physics_fn(self._dyn_model(), d)

  def _forward_physics(self, _model_unused, d):
    return self._forward_physics_fn(self._dyn_model(), d)

  def _contact_forces_fn(self, _model_unused, d):
    return self._contact_forces_raw(self._dyn_model(), d)

  def _refresh_forward(self) -> None:
    self._build_physics_fns()
    self._data = self._forward_physics(self.model, self._data)

  # -- slim state pack/unpack --------------------------------------------------

  def _init_slim_spec(self) -> None:
    """Shape/dtype spec for Data leaves dropped from the threaded state."""
    full = self._data
    self._derived_fields = tuple(
      f.name
      for f in dataclasses.fields(physics.Data)
      if f.name not in _DATA_STATE_FIELDS
    )
    self._derived_spec = {
      f: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), getattr(full, f)
      )
      for f in self._derived_fields
    }

  def _slim_data(self, data: physics.Data) -> physics.Data:
    return data.replace(**{f: None for f in self._derived_fields})

  def _unslim_data(self, data: physics.Data) -> physics.Data:
    if not self._derived_fields:
      return data
    if getattr(data, self._derived_fields[0]) is not None:
      return data  # already full (eager init path)
    zeros = {
      f: jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), self._derived_spec[f]
      )
      for f in self._derived_fields
    }
    return data.replace(**zeros)

  # -- state pack/unpack ------------------------------------------------------------

  def _pack_state(self) -> EnvState:
    return EnvState(
      data=self._slim_data(self._data),
      model={f: getattr(self._model, f) for f in self._dyn_model_fields},
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
    # Derived Data leaves stay None until the first physics call writes
    # them (write-before-read throughout forward()); no zero buffers are
    # materialized for them.
    self._data = state.data
    self._model = (
      self.sim.model.replace(**state.model) if state.model else self.sim.model
    )
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
