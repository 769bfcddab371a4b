"""Constraint solver: Newton method on MuJoCo's primal soft-constraint problem.

Minimizes over qacc x:
  Φ(x) = 0.5 (x − a0)ᵀ M (x − a0) + Σ_i cost_i(J_i x − aref_i)
with a0 = qacc_smooth;  per-row costs:
  * one-sided quadratic (limits, pyramidal contact facets): 0.5 D r² iff r < 0
  * Huber (dof friction rows): quadratic inside |Dr| ≤ fl, linear outside.

TPU-first shape: dense (nefc, nv) Jacobian, Hessian M + Jᵀ diag(D·active) J as
one batched matmul, batched Cholesky solve, exact 1-D Newton linesearch on the
piecewise-quadratic line restriction — everything lockstep across envs with a
fixed iteration count (the reference's ls_parallel/iterations knobs map to
static loop bounds here; reference sim/sim.py:91,117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mjlab_tpu.physics import smooth
from mjlab_tpu.physics.constraint import efc_row_types
from mjlab_tpu.physics.types import Data, Model, Topology


def _row_masks(tp: Topology, dtype):
  nf, nl, nc = efc_row_types(tp)
  is_friction = jnp.asarray([1.0] * nf + [0.0] * (nl + nc), dtype=dtype)
  return is_friction


def solve(tp: Topology, m: Model, d: Data) -> Data:
  """Compute qacc, efc_force, qfrc_constraint."""
  dtype = d.qpos.dtype
  if tp.nefc == 0:
    return d.replace(
      qacc=d.qacc_smooth,
      qfrc_constraint=jnp.zeros(tp.nv, dtype=dtype),
      qacc_warmstart=d.qacc_smooth,
    )

  J = d.efc_J
  D = d.efc_D
  aref = d.efc_aref
  fl = d.efc_frictionloss
  is_fric = _row_masks(tp, dtype)
  a0 = d.qacc_smooth

  def residual(x):
    return J @ x - aref

  def row_cost(r):
    quad = 0.5 * D * r * r
    # Huber for friction rows: linear outside |D r| <= fl.
    lin_thresh = fl / jnp.maximum(D, 1e-30)
    outside = jnp.abs(r) > lin_thresh
    huber = jnp.where(
      outside, fl * jnp.abs(r) - 0.5 * fl * lin_thresh, quad
    )
    one_sided = jnp.where(r < 0, quad, 0.0)
    return jnp.where(is_fric > 0, huber, one_sided)

  def total_cost(x):
    dx = x - a0
    return 0.5 * dx @ (d.qM @ dx) + jnp.sum(row_cost(residual(x)))

  # Warmstart selection (mj compares smooth vs warmstart cost).
  x = jnp.where(
    total_cost(d.qacc_warmstart) < total_cost(a0), d.qacc_warmstart, a0
  )

  def row_force(r):
    """−∂cost/∂r per row (the constraint force in row space)."""
    quad_f = -D * r
    huber_f = jnp.clip(quad_f, -fl, fl)
    one_sided_f = jnp.where(r < 0, quad_f, 0.0)
    return jnp.where(is_fric > 0, huber_f, one_sided_f)

  def row_hess(r):
    """∂²cost/∂r² per row (activation weight for the Gauss-Newton Hessian)."""
    lin_thresh = fl / jnp.maximum(D, 1e-30)
    huber_h = jnp.where(jnp.abs(r) <= lin_thresh, D, 0.0)
    one_sided_h = jnp.where(r < 0, D, 0.0)
    return jnp.where(is_fric > 0, huber_h, one_sided_h)

  eye = jnp.eye(tp.nv, dtype=dtype)

  def newton_iter(_, x):
    r = residual(x)
    force = row_force(r)
    grad = d.qM @ (x - a0) - J.T @ force
    w = row_hess(r)
    H = d.qM + (J.T * w[None, :]) @ J
    # Small regularization guards rank-deficient active sets in f32.
    L = jnp.linalg.cholesky(H + 1e-10 * eye)
    y = jax.scipy.linalg.solve_triangular(L, grad, lower=True)
    p = -jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

    # Exact linesearch along p: 1-D Newton on φ'(α).
    jv = J @ p
    mp = d.qM @ p
    p_m_dx = p @ (d.qM @ (x - a0))
    p_m_p = p @ mp

    def ls_iter(_, alpha):
      ra = r + alpha * jv
      dphi = p_m_dx + alpha * p_m_p - jnp.sum(row_force(ra) * jv)
      ddphi = p_m_p + jnp.sum(row_hess(ra) * jv * jv)
      return alpha - dphi / jnp.maximum(ddphi, 1e-30)

    alpha = jax.lax.fori_loop(
      0, m.opt.ls_iterations, ls_iter, jnp.asarray(1.0, dtype=dtype)
    )
    # Reject non-improving steps (keeps lockstep envs safe post-convergence).
    x_new = x + alpha * p
    return jnp.where(total_cost(x_new) < total_cost(x), x_new, x)

  x = jax.lax.fori_loop(0, m.opt.iterations, newton_iter, x)

  r = residual(x)
  efc_force = row_force(r)
  qfrc_constraint = J.T @ efc_force
  return d.replace(
    qacc=x,
    efc_force=efc_force,
    qfrc_constraint=qfrc_constraint,
    qacc_warmstart=x,
  )


def noslip_placeholder():
  """Reserved: noslip post-solver (not used by the reference tasks)."""
