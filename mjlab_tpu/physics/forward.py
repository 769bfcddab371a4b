"""Forward dynamics pipeline and integrators.

`forward` mirrors mj_forward's stage order; `step` = forward + integrate.
The whole pipeline is a pure function (Topology closed over, Model/Data
traced) — one jitted, buffer-donated call per physics substep replaces the
reference's CUDA graph replay (reference sim/sim.py:186-199).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.physics import collision as coll
from mjlab_tpu.physics import constraint, kinematics, sensors, smooth, solver
from mjlab_tpu.physics.types import Data, Integrator, Model, Topology


def fwd_position(tp: Topology, m: Model, d: Data) -> Data:
  d = kinematics.kinematics(tp, m, d)
  d = smooth.com_pos(tp, m, d)
  d = smooth.tendon(tp, m, d)
  d = smooth.crb(tp, m, d)
  d = smooth.factor_m(tp, m, d)
  d = coll.collision(tp, m, d)
  # com_vel precedes constraint assembly: equality-row aref needs the
  # velocity-product terms (cvel/cdof_dot) for its J̇q̇ bias — mirrors
  # mujoco computing efc_aref after mj_comVel (mj_fwdVelocity).
  d = smooth.com_vel(tp, m, d)
  d = constraint.make_constraint(tp, m, d)
  d = sensors.sensor_pos(tp, m, d)
  return d


def fwd_velocity(tp: Topology, m: Model, d: Data) -> Data:
  d = smooth.rne(tp, m, d)
  d = smooth.passive(tp, m, d)
  d = sensors.sensor_vel(tp, m, d)
  return d


def forward(tp: Topology, m: Model, d: Data) -> Data:
  d = fwd_position(tp, m, d)
  d = fwd_velocity(tp, m, d)
  d = smooth.fwd_actuation(tp, m, d)
  d = smooth.fwd_acceleration(tp, m, d)
  d = solver.solve(tp, m, d)
  d = sensors.sensor_acc(tp, m, d)
  return d


def _implicit_matrix(tp: Topology, m: Model, d: Data) -> jax.Array:
  """M − h·∂f/∂v for the integrator implicit solve.

  Euler (eulerdamp): adds h·diag(dof_damping).
  Implicitfast: additionally makes the actuator velocity-gain implicit
  (affine bias b2 → h·Σ_u gear_u² · (−b2_u) on the dof diagonal).
  """
  h = m.opt.timestep
  diag = h * m.dof_damping
  if m.opt.integrator == Integrator.IMPLICITFAST and tp.nu > 0:
    _, moment = smooth.transmission(tp, m, d)
    dfdv = -m.actuator_biasprm[:, 2]  # −b2 = kd ≥ 0 for PD actuators
    diag = diag + h * jnp.sum(dfdv[:, None] * moment * moment, axis=0)
  mat = d.qM + jnp.diag(diag)
  if m.opt.integrator == Integrator.IMPLICITFAST and tp.ntendon > 0:
    # Tendon damping velocity derivative −JᵀcJ (mjd_passive_vel), masked
    # to the mass matrix's tree sparsity: MuJoCo's qDeriv shares M's
    # sparsity pattern, so cross terms between dofs in disjoint subtrees
    # are dropped (probed: dense JᵀcJ deviates at 1e-5/step on a tendon
    # spanning sibling bodies; masked matches to 1e-12).
    anc = np.asarray(tp.dof_ancestor_mask)
    sparsity = jnp.asarray(anc | anc.T, dtype=d.qpos.dtype)
    mat = mat + h * sparsity * ((d.ten_J.T * m.tendon_damping) @ d.ten_J)
  if m.opt.integrator == Integrator.IMPLICITFAST and tp.has_fluid:
    # Fluid-drag velocity derivative ∂qfrc_fluid/∂qvel (mjd_passive_vel's
    # fluid term), obtained by forward-mode AD through com_vel ∘ fluid —
    # exact for the inertia-box model incl. the |v|·v quadratic drag —
    # and masked to M's tree sparsity like the tendon term above.
    def _qfrc_fluid(qvel):
      dd = smooth.com_vel(tp, m, d.replace(qvel=qvel))
      return smooth._fluid_box(tp, m, dd)

    Dfl = jax.jacfwd(_qfrc_fluid)(d.qvel)  # (nv, nv)
    anc = np.asarray(tp.dof_ancestor_mask)
    sparsity = jnp.asarray(anc | anc.T, dtype=d.qpos.dtype)
    mat = mat - h * sparsity * Dfl
  return mat


def _advance_act(tp: Topology, m: Model, d: Data) -> jax.Array:
  """mj_advance activation update: explicit Euler for integrator/filter,
  exact exponential for filterexact, then actrange clamping."""
  src = tp.act_actuator
  dyn = tp.actuator_dyntype[src]
  h = m.opt.timestep
  tau = jnp.maximum(m.actuator_dynprm[src, 0], 1e-15)
  lin = d.act + h * d.act_dot
  # act_dot = (ctrl - act)/tau  ⇒  act + act_dot·tau·(1−e^{−h/τ}) is the
  # exact solution of the first-order filter over one step.
  exact = d.act + d.act_dot * tau * -jnp.expm1(-h / tau)
  act = jnp.where(jnp.asarray(dyn == 3), exact, lin)
  limited = np.asarray(tp.actuator_actlimited[src].astype(bool))
  clamped = jnp.clip(
    act, m.actuator_actrange[src, 0], m.actuator_actrange[src, 1]
  )
  return jnp.where(jnp.asarray(limited), clamped, act)


def integrate(tp: Topology, m: Model, d: Data) -> Data:
  """Semi-implicit Euler / implicitfast position-velocity update."""
  h = m.opt.timestep
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  mat = _implicit_matrix(tp, m, d)
  L = jnp.linalg.cholesky(mat)
  y = jax.scipy.linalg.solve_triangular(L, qfrc, lower=True)
  qacc_int = jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
  qvel = d.qvel + h * qacc_int
  qpos = kinematics.integrate_pos(tp, m, d.qpos, qvel, h)
  act = _advance_act(tp, m, d) if tp.na > 0 else d.act
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def _rk4(tp: Topology, m: Model, d: Data) -> Data:
  """Classic 4th-order Runge-Kutta over (qpos, qvel, act) — mj_RungeKutta
  (mujoco engine_forward.c): stage states from the Butcher tableau, one full
  forward per stage, quaternion-aware position integration from the saved
  initial qpos. No eulerdamp/implicit damping — qacc is used directly."""
  h = m.opt.timestep
  A = ((0.5, 0.0, 0.0), (0.0, 0.5, 0.0), (0.0, 0.0, 1.0))
  B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)
  qpos0, qvel0, act0 = d.qpos, d.qvel, d.act
  # F[j] = (qpos-derivative, qvel-derivative, act-derivative) at stage j:
  # d(qpos)/dt = qvel of the stage state, d(qvel)/dt = qacc there.
  F = [(d.qvel, d.qacc, d.act_dot)]
  for i in range(3):
    dvel = sum(A[i][j] * F[j][0] for j in range(i + 1) if A[i][j])
    dacc = sum(A[i][j] * F[j][1] for j in range(i + 1) if A[i][j])
    qpos = kinematics.integrate_pos(tp, m, qpos0, dvel, h)
    qvel = qvel0 + h * dacc
    if tp.na > 0:
      dact = sum(A[i][j] * F[j][2] for j in range(i + 1) if A[i][j])
      d = d.replace(qpos=qpos, qvel=qvel, act=act0 + h * dact)
    else:
      d = d.replace(qpos=qpos, qvel=qvel)
    d = forward(tp, m, d)
    F.append((d.qvel, d.qacc, d.act_dot))
  dvel = sum(B[j] * F[j][0] for j in range(4))
  dacc = sum(B[j] * F[j][1] for j in range(4))
  qpos = kinematics.integrate_pos(tp, m, qpos0, dvel, h)
  qvel = qvel0 + h * dacc
  if tp.na > 0:
    src = tp.act_actuator
    act = act0 + h * sum(B[j] * F[j][2] for j in range(4))
    limited = np.asarray(tp.actuator_actlimited[src].astype(bool))
    clamped = jnp.clip(
      act, m.actuator_actrange[src, 0], m.actuator_actrange[src, 1]
    )
    act = jnp.where(jnp.asarray(limited), clamped, act)
  else:
    act = act0
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + h)


def step(tp: Topology, m: Model, d: Data) -> Data:
  d = forward(tp, m, d)
  if m.opt.integrator == Integrator.RK4:
    return _rk4(tp, m, d)
  return integrate(tp, m, d)
