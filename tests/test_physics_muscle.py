"""Muscle actuator parity vs CPU MuJoCo (physics/muscle.py).

mju_muscleGain / mju_muscleBias / mju_muscleDynamics formula checks over a
random parameter grid against the C implementations, then full trajectory
parity of muscle-actuated models (joint muscle and spatial-tendon muscle)
through the engine's forward/step pipeline."""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics
from mjlab_tpu.physics import muscle


def test_muscle_function_grid_parity():
  """Pointwise parity of the three muscle primitives over 2000 random
  parameter draws (incl. force<0 scale derivation and both smoothing
  modes)."""
  rng = np.random.default_rng(0)
  N = 2000
  lr = np.sort(rng.uniform(0.1, 1.0, (N, 2)), axis=1)
  prm = np.stack(
    [
      rng.uniform(0.4, 0.9, N), rng.uniform(1.0, 1.3, N),
      np.where(rng.random(N) < 0.5, -1.0, rng.uniform(10, 500, N)),
      rng.uniform(50, 400, N),
      rng.uniform(0.2, 0.9, N), rng.uniform(1.05, 2.0, N),
      rng.uniform(0.5, 5.0, N), rng.uniform(0.5, 2.0, N),
      rng.uniform(1.05, 2.0, N),
    ],
    axis=1,
  )
  acc0 = rng.uniform(10, 300, N)
  ln = rng.uniform(0.0, 1.2, N)
  vel = rng.uniform(-3, 3, N)
  dynprm = np.stack(
    [
      rng.uniform(0.005, 0.05, N), rng.uniform(0.01, 0.1, N),
      np.where(rng.random(N) < 0.5, 0.0, rng.uniform(0.01, 0.5, N)),
    ],
    axis=1,
  )
  ctrl = rng.uniform(-0.3, 1.3, N)
  act = rng.uniform(-0.3, 1.3, N)

  g_ref = np.array(
    [mujoco.mju_muscleGain(ln[i], vel[i], lr[i], acc0[i], prm[i]) for i in range(N)]
  )
  b_ref = np.array(
    [mujoco.mju_muscleBias(ln[i], lr[i], acc0[i], prm[i]) for i in range(N)]
  )
  d_ref = np.array(
    [mujoco.mju_muscleDynamics(ctrl[i], act[i], dynprm[i]) for i in range(N)]
  )
  g = np.asarray(
    muscle.muscle_gain(
      jnp.asarray(ln), jnp.asarray(vel), jnp.asarray(lr),
      jnp.asarray(acc0), jnp.asarray(prm),
    )
  )
  b = np.asarray(
    muscle.muscle_bias(
      jnp.asarray(ln), jnp.asarray(lr), jnp.asarray(acc0), jnp.asarray(prm)
    )
  )
  d = np.asarray(
    muscle.muscle_dynamics(
      jnp.asarray(ctrl), jnp.asarray(act), jnp.asarray(dynprm)
    )
  )
  np.testing.assert_allclose(g, g_ref, rtol=1e-10, atol=1e-10)
  np.testing.assert_allclose(b, b_ref, rtol=1e-10, atol=1e-10)
  np.testing.assert_allclose(d, d_ref, rtol=1e-10, atol=1e-10)


_JOINT_MUSCLE_XML = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j" type="hinge" axis="0 1 0" range="-0.2 1.5"
             limited="true" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"
            contype="0" conaffinity="0"/>
    </body>
  </worldbody>
  <actuator><muscle name="m" joint="j"/></actuator>
</mujoco>"""

_TENDON_MUSCLE_XML = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <site name="s0" pos="0 0 1.1"/>
    <body pos="0 0 1">
      <joint name="j" type="hinge" axis="0 1 0" range="-1.0 1.0"
             limited="true" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"
            contype="0" conaffinity="0"/>
      <site name="s1" pos="0.3 0 0"/>
    </body>
  </worldbody>
  <tendon><spatial name="t" limited="true" range="0 0.6">
    <site site="s0"/><site site="s1"/>
  </spatial></tendon>
  <actuator><muscle name="m" tendon="t"/></actuator>
</mujoco>"""


@pytest.mark.parametrize(
  "xml,ctrl_seq",
  [
    (_JOINT_MUSCLE_XML, (0.9, 0.2, 1.0)),
    (_TENDON_MUSCLE_XML, (0.8, 0.0, 0.5)),
  ],
  ids=["joint_muscle", "tendon_muscle"],
)
def test_muscle_trajectory_parity(xml, ctrl_seq):
  """Full muscle pipeline (activation dynamics + FLV gain + passive bias,
  actearly-free path) matches mj_step over 300 steps with a piecewise
  control signal."""
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert mjm.actuator_gaintype[0] == mujoco.mjtGain.mjGAIN_MUSCLE
  mjd = mujoco.MjData(mjm)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  for phase, ctrl in enumerate(ctrl_seq):
    mjd.ctrl[:] = ctrl
    d = d.replace(ctrl=jnp.full_like(d.ctrl, ctrl))
    for _ in range(100):
      mujoco.mj_step(mjm, mjd)
      d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-9)
  np.testing.assert_allclose(
    np.asarray(d.actuator_force), mjd.actuator_force, atol=1e-7
  )
