"""Elliptic friction-cone parity vs the MuJoCo C reference.

Covers the constraint assembly (impratio-scaled friction impedances, zero
friction aref) and the solver's cone cost/force/Hessian (zone projection),
on contact-rich trajectories at f64.
"""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import forward, io, step as phys_step

SLIDE_XML = """
<mujoco model="slide">
  <option timestep="0.002" cone="elliptic" impratio="{imp}"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" friction="0.6 0.01 0.002"/>
    <body name="puck" pos="0 0 0.0999">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" density="800"
            friction="0.6 0.01 0.002"/>
    </body>
  </worldbody>
</mujoco>
"""

BIPED_XML = """
<mujoco model="kicker">
  <option timestep="0.002" cone="elliptic" impratio="{imp}"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1"/>
    <body name="base" pos="0 0 0.45">
      <freejoint/>
      <geom name="torso" type="sphere" size="0.1" density="900"/>
      <body name="leg" pos="0 0 -0.1">
        <joint name="hip" type="hinge" axis="0 1 0" range="-1.2 1.2"/>
        <geom name="shin" type="capsule" fromto="0 0 0 0 0 -0.3" size="0.04"/>
        <body name="foot" pos="0 0 -0.3">
          <joint name="ankle" type="hinge" axis="0 1 0" range="-1.0 1.0"/>
          <geom name="sole" type="capsule" fromto="-0.05 0 0 0.12 0 0"
                size="0.03" friction="0.9 0.005 0.0001"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <position name="hip" joint="hip" kp="60" ctrlrange="-1.2 1.2"/>
    <position name="ankle" joint="ankle" kp="30" ctrlrange="-1 1"/>
  </actuator>
</mujoco>
"""


def _run_parity(xml, steps, qvel0=None, ctrl_fn=None, tol=1e-6):
  mj_model = mujoco.MjModel.from_xml_string(xml)
  mj_model.opt.iterations = 50
  mj_model.opt.ls_iterations = 50
  # Disable early termination so both engines compare converged optima.
  mj_model.opt.tolerance = 0.0
  mj_model.opt.ls_tolerance = 0.0
  mj_data = mujoco.MjData(mj_model)
  if qvel0 is not None:
    mj_data.qvel[: len(qvel0)] = qvel0

  tp, model = io.put_model(mj_model, dtype=jnp.float64)
  d = io.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(mj_data.qpos.copy()), qvel=jnp.asarray(mj_data.qvel.copy())
  )
  step_fn = jax.jit(lambda dd: phys_step(tp, model, dd))

  for i in range(steps):
    if ctrl_fn is not None:
      ctrl = ctrl_fn(i)
      mj_data.ctrl[:] = ctrl
      d = d.replace(ctrl=jnp.asarray(ctrl))
    mujoco.mj_step(mj_model, mj_data)
    d = step_fn(d)
    np.testing.assert_allclose(
      np.asarray(d.qpos), mj_data.qpos, atol=tol,
      err_msg=f"qpos diverged at step {i}",
    )
    np.testing.assert_allclose(
      np.asarray(d.qvel), mj_data.qvel, atol=10 * tol,
      err_msg=f"qvel diverged at step {i}",
    )
  return mj_model, mj_data, tp, model, d


@pytest.mark.parametrize("imp", [1.0, 3.0])
def test_sliding_puck_parity(imp):
  """Puck shoved sideways: slides through the middle zone, then sticks."""
  _run_parity(
    SLIDE_XML.format(imp=imp), steps=150, qvel0=[1.5, 0.4, 0.0, 0.0, 0.0, 2.0]
  )


def test_settled_normal_force_elliptic():
  mj_model, mj_data, tp, model, d = _run_parity(
    SLIDE_XML.format(imp=1.0), steps=250, qvel0=[0.3, 0.0, 0, 0, 0, 0]
  )
  from mjlab_tpu.physics.constraint import contact_forces

  f = np.asarray(jax.jit(lambda dd: contact_forces(tp, model, dd))(d))
  mass = float(mj_model.body("puck").mass[0])
  total_normal = f[:, 0].sum()
  np.testing.assert_allclose(total_normal, mass * 9.81, rtol=0.01)


@pytest.mark.parametrize("imp", [1.0, 5.0])
def test_actuated_kicker_parity(imp):
  """Articulated robot scuffing its foot: exercises middle-zone friction
  with actuation and joint limits under the elliptic cone."""

  def ctrl(i):
    t = i * 0.002
    return np.array([0.8 * np.sin(4 * t), -0.5 * np.cos(4 * t)])

  _run_parity(BIPED_XML.format(imp=imp), steps=120, ctrl_fn=ctrl, tol=5e-6)
