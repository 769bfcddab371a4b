"""Constraint solver: Newton method on MuJoCo's primal soft-constraint problem.

Minimizes over qacc x:
  Φ(x) = 0.5 (x − a0)ᵀ M (x − a0) + Σ_i cost_i(J_i x − aref_i)
with a0 = qacc_smooth;  per-row costs:
  * one-sided quadratic (limits, pyramidal contact facets): 0.5 D r² iff r < 0
  * Huber (dof friction rows): quadratic inside |Dr| ≤ fl, linear outside
  * elliptic cone (condim≥3 contacts under cone="elliptic"): the squared
    distance to the negated friction cone in the D-whitened metric —
    zones top (no force) / middle (projection onto the cone surface) /
    bottom (full quadratic), matching MuJoCo's mj_constraintUpdate
    (validated empirically; see tests/test_physics_elliptic.py).

TPU-first shape: dense (nefc, nv) Jacobian, Hessian M + Jᵀ diag(D·active) J
plus per-cone Jᵀ B J blocks as batched matmuls, batched Cholesky solve,
exact 1-D Newton linesearch on the smooth line restriction — everything
lockstep across envs with a fixed iteration count (the reference's
ls_parallel/iterations knobs map to static loop bounds here; reference
sim/sim.py:91,117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.physics import smooth
from mjlab_tpu.physics.constraint import (
  efc_row_types,
  elliptic_cone_slots,
  slot_tables,
)
from mjlab_tpu.physics.types import ConeType, Data, Model, Topology

_EPS = 1e-15


def _row_masks(tp: Topology, dtype):
  """(is_eq, is_friction) row-class masks over the efc layout
  [equality | dof friction | limits | contacts]."""
  ne, nf, nl, nc = efc_row_types(tp)
  is_eq = jnp.asarray([1.0] * ne + [0.0] * (nf + nl + nc), dtype=dtype)
  is_friction = jnp.asarray(
    [0.0] * ne + [1.0] * nf + [0.0] * (nl + nc), dtype=dtype
  )
  return is_eq, is_friction


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
  is_eq, is_fric = _row_masks(tp, dtype)
  a0 = d.qacc_smooth

  # Elliptic cone bookkeeping (static). `reg` masks rows handled by the
  # regular per-row cost; cone rows are handled per slot, grouped by condim
  # (each group has a fixed row count cd and k = cd−1 friction dims: 2
  # tangential, +1 torsional at condim 4, +2 rolling at condim 6 — the
  # whitened cone stays CIRCULAR in k dims because the assembly sets
  # D_i = Dn·impratio·(μ_i/μ_1)², so anisotropic friction folds into the
  # whitening s_i = √(D_i/Dn) and a single μ = μ_1·√(Dn/D_1) remains).
  if m.opt.cone == ConeType.ELLIPTIC:
    cone_slot_idx, cone_adr = elliptic_cone_slots(tp)
  else:
    cone_slot_idx = np.zeros(0, dtype=int)
    cone_adr = np.zeros(0, dtype=int)
  S = len(cone_slot_idx)
  reg_np = np.ones(tp.nefc)
  cone_groups = []
  if S:
    st = slot_tables(tp, m.opt.cone)
    for k, a in enumerate(cone_adr):
      reg_np[a : a + st.slot_row_num[cone_slot_idx[k]]] = 0.0
    for cd in sorted(set(st.condim[cone_slot_idx].tolist())):
      sel = st.condim[cone_slot_idx] == cd
      slots_g = cone_slot_idx[sel]
      rows = cone_adr[sel][:, None] + np.arange(cd)[None]  # (Sg, cd)
      mu0 = d.contact.friction[slots_g, 0]
      Dn = D[rows[:, 0]]
      Df = D[rows[:, 1:]]  # (Sg, cd−1)
      active = Dn > 0
      safe_Dn = jnp.maximum(Dn, _EPS)
      s = jnp.sqrt(jnp.maximum(Df, _EPS) / safe_Dn[:, None])  # (Sg, k)
      mu = mu0 * jnp.sqrt(safe_Dn / jnp.maximum(Df[:, 0], _EPS))
      cone_groups.append(
        dict(
          rows=rows, Dn=Dn, Df=Df, active=active, s=s, mu=mu,
          one_mu2=1.0 + mu * mu, J=J[rows],
        )
      )
  reg = jnp.asarray(reg_np, dtype=dtype)

  def _cone_zones(g, u):
    """u: (Sg, cd) cone-row residuals → zone classification."""
    N = u[:, 0]
    ut_w = u[:, 1:] * g["s"]  # whitened friction residuals
    T = jnp.sqrt(jnp.sum(ut_w * ut_w, axis=-1) + _EPS)
    top = g["mu"] * T <= N
    bottom = T <= -g["mu"] * N
    a = (g["mu"] * T - N) / g["one_mu2"]
    return N, ut_w, T, top, bottom, a

  def cone_cost(r):
    total = jnp.asarray(0.0, dtype=dtype)
    for g in cone_groups:
      u = r[g["rows"]]
      N, ut_w, T, top, bottom, a = _cone_zones(g, u)
      c_bot = 0.5 * (
        g["Dn"] * N * N + jnp.sum(g["Df"] * u[:, 1:] ** 2, axis=-1)
      )
      c_mid = 0.5 * g["Dn"] * a * a * g["one_mu2"]
      c = jnp.where(top, 0.0, jnp.where(bottom, c_bot, c_mid))
      total = total + jnp.sum(jnp.where(g["active"], c, 0.0))
    return total

  def cone_force_group(g, u):
    """Per-row cone forces (Sg, cd) in row space."""
    N, ut_w, T, top, bottom, a = _cone_zones(g, u)
    f_bot = -jnp.concatenate(
      [(g["Dn"] * u[:, 0])[:, None], g["Df"] * u[:, 1:]], axis=-1
    )
    fn_mid = g["Dn"] * a
    # Friction rows: −μ f_n in the whitened direction, mapped back per row:
    # f_i = f̃_i s_i with f̃ = −μ fn ut_w/T.
    ft_mid = -g["mu"][:, None] * fn_mid[:, None] * ut_w / T[:, None]
    ft_mid = ft_mid * g["s"]
    f_mid = jnp.concatenate([fn_mid[:, None], ft_mid], axis=-1)
    f = jnp.where(top[:, None], 0.0, jnp.where(bottom[:, None], f_bot, f_mid))
    return jnp.where(g["active"][:, None], f, 0.0)

  def cone_hess_group(g, u):
    """Per-slot (Sg, cd, cd) cost Hessians B (row space, exact)."""
    N, ut_w, T, top, bottom, a = _cone_zones(g, u)
    s, mu, one_mu2, Dn = g["s"], g["mu"], g["one_mu2"], g["Dn"]
    # grad a: [−1, μ s_i² u_i / T] / (1+μ²)   (u_i unwhitened; s²u = s·ut_w)
    g_t = mu[:, None] * s * ut_w / T[:, None] / one_mu2[:, None]
    gr = jnp.concatenate([(-1.0 / one_mu2)[:, None], g_t], axis=-1)
    gg = gr[:, :, None] * gr[:, None, :]
    # ∇²a: friction k×k block μ/(1+μ²)·(S²/T − (S²u)(S²u)ᵀ/T³).
    s2u = s * ut_w  # = S² u_t (whitened once more)
    t_outer = s2u[:, :, None] * s2u[:, None, :] / (T ** 3)[:, None, None]
    t_diag = jax.vmap(jnp.diag)(s * s) / T[:, None, None]
    hess_a_t = (mu / one_mu2)[:, None, None] * (t_diag - t_outer)
    hess_a = jnp.zeros_like(gg).at[:, 1:, 1:].set(hess_a_t)
    B_mid = (Dn * one_mu2)[:, None, None] * (gg + a[:, None, None] * hess_a)
    B_bot = jax.vmap(jnp.diag)(
      jnp.concatenate([Dn[:, None], g["Df"]], axis=-1)
    )
    B = jnp.where(
      top[:, None, None], 0.0, jnp.where(bottom[:, None, None], B_bot, B_mid)
    )
    return jnp.where(g["active"][:, None, None], B, 0.0)

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
    # Equality rows are bilateral: quadratic on both sides.
    base = jnp.where(is_eq > 0, quad, one_sided)
    return jnp.where(is_fric > 0, huber, base) * reg

  def total_cost(x):
    dx = x - a0
    c = 0.5 * dx @ (d.qM @ dx) + jnp.sum(row_cost(residual(x)))
    if S:
      c = c + cone_cost(residual(x))
    return c

  # Warmstart selection (mj compares smooth vs warmstart cost).
  x = jnp.where(
    total_cost(d.qacc_warmstart) < total_cost(a0), d.qacc_warmstart, a0
  )

  def row_force(r):
    """−∂cost/∂r per row (the constraint force in row space)."""
    quad_f = -D * r
    huber_f = jnp.clip(quad_f, -fl, fl)
    one_sided_f = jnp.where(r < 0, quad_f, 0.0)
    base_f = jnp.where(is_eq > 0, quad_f, one_sided_f)
    f = jnp.where(is_fric > 0, huber_f, base_f) * reg
    for g in cone_groups:
      f = f.at[g["rows"].reshape(-1)].set(
        cone_force_group(g, r[g["rows"]]).reshape(-1)
      )
    return f

  def row_hess(r):
    """∂²cost/∂r² per row (regular rows only; cone rows use B blocks)."""
    lin_thresh = fl / jnp.maximum(D, 1e-30)
    huber_h = jnp.where(jnp.abs(r) <= lin_thresh, D, 0.0)
    one_sided_h = jnp.where(r < 0, D, 0.0)
    base_h = jnp.where(is_eq > 0, D, one_sided_h)
    return jnp.where(is_fric > 0, huber_h, base_h) * reg

  eye = jnp.eye(tp.nv, dtype=dtype)

  def newton_iter(_, x):
    r = residual(x)
    force = row_force(r)
    grad = d.qM @ (x - a0) - J.T @ force
    w = row_hess(r)
    H = d.qM + (J.T * w[None, :]) @ J
    for g in cone_groups:
      B = cone_hess_group(g, r[g["rows"]])
      H = H + jnp.einsum("siv,sij,sjw->vw", g["J"], B, g["J"])
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
      for g in cone_groups:
        B = cone_hess_group(g, ra[g["rows"]])
        jvc = jv[g["rows"]]  # (Sg, cd)
        ddphi = ddphi + jnp.einsum("si,sij,sj->", jvc, B, jvc)
      return alpha - dphi / jnp.maximum(ddphi, 1e-30)

    alpha = jax.lax.fori_loop(
      0, m.opt.ls_iterations, ls_iter, jnp.asarray(1.0, dtype=dtype)
    )
    if S:
      # Safeguard (elliptic only): the 1-D Newton can diverge on the cone
      # landscape; evaluate a small candidate set and keep the best
      # improving step. Pyramidal's line restriction is piecewise quadratic
      # and the plain Newton linesearch is already exact there — keep the
      # hot path free of the extra cost evaluations.
      best_cost, best_alpha = total_cost(x), jnp.asarray(0.0, dtype=dtype)
      for cand in (alpha, jnp.asarray(1.0, dtype=dtype), 0.5, 0.25, 0.1, 0.01):
        ca = jnp.asarray(cand, dtype=dtype)
        c = total_cost(x + ca * p)
        better = c < best_cost
        best_cost = jnp.where(better, c, best_cost)
        best_alpha = jnp.where(better, ca, best_alpha)
      return x + best_alpha * p
    # Reject non-improving steps (keeps lockstep envs safe post-convergence).
    x_new = x + alpha * p
    return jnp.where(total_cost(x_new) < total_cost(x), x_new, x)

  def linesearch(x, r, p):
    """Exact 1-D Newton linesearch along p from x (shared Newton/CG)."""
    jv = J @ p
    mp = d.qM @ p
    p_m_dx = p @ (d.qM @ (x - a0))
    p_m_p = p @ mp

    def ls_iter(_, alpha):
      ra = r + alpha * jv
      dphi = p_m_dx + alpha * p_m_p - jnp.sum(row_force(ra) * jv)
      ddphi = p_m_p + jnp.sum(row_hess(ra) * jv * jv)
      for g in cone_groups:
        B = cone_hess_group(g, ra[g["rows"]])
        jvc = jv[g["rows"]]  # (Sg, cd)
        ddphi = ddphi + jnp.einsum("si,sij,sj->", jvc, B, jvc)
      return alpha - dphi / jnp.maximum(ddphi, 1e-30)

    return jax.lax.fori_loop(
      0, m.opt.ls_iterations, ls_iter, jnp.asarray(1.0, dtype=dtype)
    )

  def cg_solve(x0):
    """Nonlinear CG (Polak-Ribière+, M-preconditioned) on the same cost —
    MuJoCo's mjSOL_CG (reference exposes it via sim/sim.py:21-38). No
    per-iteration Hessian/Cholesky: the search direction comes from
    gradients preconditioned by the (constant) mass matrix."""
    Lm = jnp.linalg.cholesky(d.qM + 1e-12 * eye)

    def msolve(v):
      y = jax.scipy.linalg.solve_triangular(Lm, v, lower=True)
      return jax.scipy.linalg.solve_triangular(Lm.T, y, lower=False)

    def grad_at(x):
      return d.qM @ (x - a0) - J.T @ row_force(residual(x))

    g0 = grad_at(x0)
    mg0 = msolve(g0)

    def cg_iter(_, carry):
      x, g_prev, mg_prev, p = carry
      r = residual(x)
      alpha = linesearch(x, r, p)
      x_new = x + alpha * p
      # Reject non-improving steps and restart along steepest descent.
      improve = total_cost(x_new) < total_cost(x)
      x_new = jnp.where(improve, x_new, x)
      g = grad_at(x_new)
      mg = msolve(g)
      beta = jnp.maximum(
        (g @ (mg - mg_prev)) / jnp.maximum(g_prev @ mg_prev, _EPS), 0.0
      )
      p_new = -mg + jnp.where(improve, beta, 0.0) * p
      return x_new, g, mg, p_new

    out = jax.lax.fori_loop(
      0, m.opt.iterations, cg_iter, (x0, g0, mg0, -mg0)
    )
    return out[0]

  def pgs_solve():
    """Projected Gauss-Seidel on the DUAL soft-constraint QP — MuJoCo's
    mjSOL_PGS (pyramidal cone; elliptic+PGS is rejected at conversion,
    io.py). The dual is strictly convex (regularizer R = 1/D > 0), so its
    optimum is unique and matches MuJoCo's at convergence regardless of
    sweep details:  min_f 0.5 fᵀ(A+R)f + fᵀb  with A = J M⁻¹ Jᵀ,
    b = J qacc_smooth − aref, per-row feasible sets: friction rows
    [−fl, fl] (Huber conjugate), limit & pyramidal-facet rows [0, ∞).
    Sequential sweeps ride a fori_loop over rows — dual coordinate descent
    is inherently ordered; this path exists for config-surface parity, the
    lockstep-batched production solvers are Newton/CG above."""
    MinvJt = smooth.solve_m(d, J.T)  # (nv, nefc); triangular solves take 2-D rhs
    A = J @ MinvJt
    active = D > 0
    R = jnp.where(active, 1.0 / jnp.maximum(D, _EPS), 0.0)
    b = J @ a0 - aref
    lo = jnp.where(is_fric > 0, -fl, 0.0)
    hi = jnp.where(is_fric > 0, fl, jnp.inf)
    lo = jnp.where(is_eq > 0, -jnp.inf, lo)  # equality rows: unbounded dual
    hi = jnp.where(is_eq > 0, jnp.inf, hi)
    lo = jnp.where(active, lo, 0.0)
    hi = jnp.where(active, hi, 0.0)
    diag = jnp.diagonal(A) + R

    def row_update(i, f):
      g = A[i] @ f + R[i] * f[i] + b[i]
      fi = f[i] - g / jnp.maximum(diag[i], _EPS)
      return f.at[i].set(jnp.clip(fi, lo[i], hi[i]))

    def sweep(_, f):
      return jax.lax.fori_loop(0, tp.nefc, row_update, f)

    f = jax.lax.fori_loop(
      0, m.opt.iterations, sweep, jnp.zeros(tp.nefc, dtype=dtype)
    )
    return a0 + MinvJt @ f, f

  if m.opt.solver == 0:  # mjSOL_PGS
    x, f_pgs = pgs_solve()
    qfrc = J.T @ f_pgs
    return d.replace(
      qacc=x,
      efc_force=f_pgs,
      qfrc_constraint=qfrc,
      qacc_warmstart=x,
    )
  if m.opt.solver == 1:  # mjSOL_CG
    x = cg_solve(x)
  else:
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
