"""Simulation facade: owns the compiled MjModel (host) and the batched JAX
physics state (device).

TPU-native counterpart of the reference's `Simulation` (sim/sim.py:97-199):
  * mjwarp.put_model/put_data → physics.put_model + vmapped make_data
  * CUDA graph capture/replay → one jitted, donated step function
  * WarpBridge zero-copy views → there is no bridge: managers read Data
    pytree fields directly (single array ecosystem)
  * expand_model_fields → Model leaves gain a leading env axis (see
    `expand_fields`), vmap in_axes handle the rest.

The facade is intentionally thin: the env layer composes physics.step into
its own jitted MDP step; Simulation provides the pieces (model, data0, step
functions) rather than owning a mutable data buffer.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Literal

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu import physics
from mjlab_tpu.physics.types import ConeType, Integrator

_CONE_MAP = {
  "pyramidal": mujoco.mjtCone.mjCONE_PYRAMIDAL,
  "elliptic": mujoco.mjtCone.mjCONE_ELLIPTIC,
}
_INTEGRATOR_MAP = {
  "euler": mujoco.mjtIntegrator.mjINT_EULER,
  "implicitfast": mujoco.mjtIntegrator.mjINT_IMPLICITFAST,
}


@dataclass
class MujocoCfg:
  """MuJoCo solver/integrator options (mirrors reference sim/sim.py:41-76)."""

  timestep: float = 0.002
  integrator: Literal["euler", "implicitfast"] = "implicitfast"
  impratio: float = 1.0
  cone: Literal["pyramidal", "elliptic"] = "pyramidal"
  # `jacobian` kept for config-surface parity; this engine always uses
  # dense Jacobians. Solver: newton (default), cg (M-preconditioned
  # Polak-Ribière), or pgs (projected Gauss-Seidel on the dual —
  # pyramidal cone only; elliptic+pgs is rejected at model conversion).
  jacobian: Literal["auto", "dense", "sparse"] = "auto"
  solver: Literal["newton", "cg", "pgs"] = "newton"
  iterations: int = 100
  tolerance: float = 1e-8
  ls_iterations: int = 50
  ls_tolerance: float = 0.01
  gravity: tuple[float, float, float] = (0, 0, -9.81)

  def apply(self, model: mujoco.MjModel) -> None:
    model.opt.cone = _CONE_MAP[self.cone]
    model.opt.integrator = _INTEGRATOR_MAP[self.integrator]
    model.opt.solver = {
      "pgs": mujoco.mjtSolver.mjSOL_PGS,
      "cg": mujoco.mjtSolver.mjSOL_CG,
      "newton": mujoco.mjtSolver.mjSOL_NEWTON,
    }[self.solver]
    model.opt.timestep = self.timestep
    model.opt.impratio = self.impratio
    model.opt.gravity[:] = self.gravity
    model.opt.iterations = self.iterations
    model.opt.tolerance = self.tolerance
    model.opt.ls_iterations = self.ls_iterations
    model.opt.ls_tolerance = self.ls_tolerance


@dataclass(kw_only=True)
class SimulationCfg:
  """Simulation configuration (reference sim/sim.py:79-94).

  nconmax/njmax are accepted for config parity but the static pair table
  already bounds contacts exactly, so they are only validated against it.
  """

  nconmax: int | None = None
  njmax: int | None = None
  ls_parallel: bool = True
  contact_sensor_maxmatch: int = 64
  dtype: str = "float32"
  mujoco: MujocoCfg = field(default_factory=MujocoCfg)


class Simulation:
  """Batched TPU physics simulation.

  Holds: host MjModel/MjData (for viewers & debugging), device (Topology,
  Model), and jitted batched step/forward closures.
  """

  def __init__(
    self,
    num_envs: int,
    cfg: SimulationCfg,
    model: mujoco.MjModel,
    device: jax.Device | None = None,
  ):
    self.cfg = cfg
    self.num_envs = num_envs
    self.device = device

    self._mj_model = model
    cfg.mujoco.apply(self._mj_model)
    self._mj_data = mujoco.MjData(model)
    mujoco.mj_forward(self._mj_model, self._mj_data)

    dtype = jnp.float64 if cfg.dtype == "float64" else jnp.float32
    self.tp, self.model = physics.put_model(self._mj_model, dtype=dtype)
    self._batched_fields: set[str] = set()

  # -- properties -----------------------------------------------------------

  @property
  def mj_model(self) -> mujoco.MjModel:
    return self._mj_model

  @property
  def mj_data(self) -> mujoco.MjData:
    return self._mj_data

  @property
  def model_axes(self):
    return self.model.axes(self._batched_fields)

  @property
  def batched_fields(self) -> set[str]:
    """Model leaves carrying a per-env axis (domain randomization)."""
    return set(self._batched_fields)

  # -- model expansion (domain randomization) --------------------------------

  def expand_model_fields(self, fields: tuple[str, ...]) -> None:
    """Give the named Model leaves a leading env axis (reference
    sim/sim.py:177-184 / randomization.py). Idempotent per field."""
    updates = {}
    for f in fields:
      if not hasattr(self.model, f):
        raise ValueError(f"Field not found in model: {f}")
      if f in self._batched_fields:
        continue
      leaf = getattr(self.model, f)
      updates[f] = jnp.broadcast_to(leaf, (self.num_envs,) + leaf.shape)
    if updates:
      self.model = self.model.replace(**updates)
      self._batched_fields |= set(fields)

  # -- state ----------------------------------------------------------------

  def make_data(self) -> physics.Data:
    """Fresh batched Data at qpos0 (leading axis num_envs)."""
    unbatched_model = self.unbatched_model
    d = physics.make_data(self.tp, unbatched_model)
    return jax.tree_util.tree_map(
      lambda x: jnp.broadcast_to(x, (self.num_envs,) + x.shape), d
    )

  @property
  def unbatched_model(self):
    """Model with DR axes stripped (env 0) — for single-world utilities."""
    if not self._batched_fields:
      return self.model
    updates = {f: getattr(self.model, f)[0] for f in self._batched_fields}
    return self.model.replace(**updates)

  # -- batched physics closures ----------------------------------------------

  def step_fn(self):
    """Batched (model, data) → data physics substep (vmapped, not jitted —
    the env layer jits the full MDP step around it)."""
    return jax.vmap(
      lambda m_, d_: physics.step(self.tp, m_, d_),
      in_axes=(self.model_axes, 0),
    )

  def forward_fn(self):
    return jax.vmap(
      lambda m_, d_: physics.forward(self.tp, m_, d_),
      in_axes=(self.model_axes, 0),
    )
