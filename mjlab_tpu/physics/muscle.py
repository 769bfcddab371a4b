"""MuJoCo muscle model (mju_muscleGain / mju_muscleBias / mju_muscleDynamics).

Vectorized JAX port of MuJoCo's Hill-type muscle: active force-length-
velocity surface (gain), passive force-length curve (bias), and smoothed
first-order activation dynamics. Formulas validated pointwise against the
C implementations exposed through the mujoco python bindings
(tests/test_physics_muscle.py grid check at 1e-12).

prm layout (actuator_gainprm/biasprm[:9], mjcf <muscle> attributes):
  0 range0, 1 range1 — operating length range in L0 units
  2 force  — peak active force (< 0: derive from scale/acc0)
  3 scale  — force scaling when force < 0
  4 lmin, 5 lmax — active FL curve support
  6 vmax   — shortening velocity at which FV reaches 0 (L0/s)
  7 fpmax  — passive force at lmax, in force units
  8 fvmax  — eccentric force plateau
dynprm: 0 tau_act, 1 tau_deact, 2 smoothing_width.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MINVAL = 1e-15


def _bump(L, A, mid, B):
  """MuJoCo's piecewise-quadratic unit bump over [A, B] peaking at mid."""
  left = 0.5 * (A + mid)
  right = 0.5 * (mid + B)

  x_l = (L - A) / jnp.maximum(left - A, _MINVAL)
  x_ml = (mid - L) / jnp.maximum(mid - left, _MINVAL)
  x_mr = (L - mid) / jnp.maximum(right - mid, _MINVAL)
  x_r = (B - L) / jnp.maximum(B - right, _MINVAL)

  out = jnp.where(
    L < left,
    0.5 * x_l * x_l,
    jnp.where(
      L < mid,
      1.0 - 0.5 * x_ml * x_ml,
      jnp.where(L < right, 1.0 - 0.5 * x_mr * x_mr, 0.5 * x_r * x_r),
    ),
  )
  return jnp.where((L <= A) | (L >= B), 0.0, out)


def _norm_length(length, lengthrange, prm):
  r0, r1 = prm[..., 0], prm[..., 1]
  L0 = (lengthrange[..., 1] - lengthrange[..., 0]) / jnp.maximum(
    r1 - r0, _MINVAL
  )
  L = r0 + (length - lengthrange[..., 0]) / jnp.maximum(L0, _MINVAL)
  return L, L0


def _scaled_force(prm, acc0):
  force = prm[..., 2]
  return jnp.where(
    force < 0, prm[..., 3] / jnp.maximum(acc0, _MINVAL), force
  )


def muscle_gain(length, velocity, lengthrange, acc0, prm):
  """Active FLV force (negative = pulling). mju_muscleGain, vectorized."""
  lmin, lmax = prm[..., 4], prm[..., 5]
  vmax, fvmax = prm[..., 6], prm[..., 8]
  L, L0 = _norm_length(length, lengthrange, prm)
  V = velocity / jnp.maximum(L0 * vmax, _MINVAL)
  force = _scaled_force(prm, acc0)

  FL = _bump(L, lmin, 1.0, lmax)
  y = fvmax - 1.0
  FV = jnp.where(
    V <= -1.0,
    0.0,
    jnp.where(
      V <= 0.0,
      (V + 1.0) * (V + 1.0),
      jnp.where(
        V <= y, fvmax - (y - V) * (y - V) / jnp.maximum(y, _MINVAL), fvmax
      ),
    ),
  )
  return -force * FL * FV


def muscle_bias(length, lengthrange, acc0, prm):
  """Passive force-length force (negative = pulling). mju_muscleBias."""
  lmax, fpmax = prm[..., 5], prm[..., 7]
  L, _ = _norm_length(length, lengthrange, prm)
  force = _scaled_force(prm, acc0)
  b = 0.5 * (1.0 + lmax)
  x_mid = (L - 1.0) / jnp.maximum(b - 1.0, _MINVAL)
  x_hi = (L - b) / jnp.maximum(b - 1.0, _MINVAL)
  return jnp.where(
    L <= 1.0,
    0.0,
    jnp.where(
      L <= b,
      -force * fpmax * 0.5 * x_mid * x_mid,
      -force * fpmax * (0.5 + x_hi),
    ),
  )


def _sigmoid(x):
  """Quintic smoothstep on [0, 1] (mju_sigmoid)."""
  xc = jnp.clip(x, 0.0, 1.0)
  s = xc * xc * xc * (3.0 * xc * (2.0 * xc - 5.0) + 10.0)
  return jnp.where(x <= 0.0, 0.0, jnp.where(x >= 1.0, 1.0, s))


def muscle_dynamics(ctrl, act, dynprm):
  """act_dot of the smoothed activation dynamics. mju_muscleDynamics."""
  tau_act = dynprm[..., 0]
  tau_deact = dynprm[..., 1]
  width = dynprm[..., 2]
  ctrlclamp = jnp.clip(ctrl, 0.0, 1.0)
  actclamp = jnp.clip(act, 0.0, 1.0)
  dctrl = ctrlclamp - act
  t_act = tau_act * (0.5 + 1.5 * actclamp)
  t_deact = tau_deact / (0.5 + 1.5 * actclamp)
  hard = jnp.where(dctrl > 0.0, t_act, t_deact)
  # Smoothed switch: quintic smoothstep over dctrl ∈ [−width/2, +width/2]
  # (probed against mju_muscleDynamics: s = sigmoid(dctrl/width + 1/2)).
  smooth = t_deact + (t_act - t_deact) * _sigmoid(
    dctrl / jnp.maximum(width, _MINVAL) + 0.5
  )
  tau = jnp.where(width < _MINVAL, hard, smooth)
  return dctrl / jnp.maximum(tau, _MINVAL)
