"""Spatial tendon (site-chain) parity vs the MuJoCo C reference.

Covers mj_tendon's dynamic length/Jacobian, tendon springs/dampers in
mj_passive, tendon range-limit efc rows, tendon-transmission actuators,
tendon sensors, and spatial-tendon equality coupling. The reference gets
all of this from mujoco_warp's tendon support (ref sim conversion surface).
"""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics

# A cart on a slide and a pendulum, coupled by a 3-site spatial tendon
# routed over a fixed world site — lengths and directions change with
# the configuration, exercising the full dynamic Jacobian.
_XML = """
<mujoco>
  <option timestep="0.002" integrator="{integrator}"/>
  <worldbody>
    <site name="anchor" pos="0 0 1.5"/>
    <body name="cart" pos="0 0 1">
      <joint name="slide" type="slide" axis="1 0 0" damping="0.3"/>
      <geom type="box" size="0.08 0.06 0.04" mass="1.2"
            contype="0" conaffinity="0"/>
      <site name="s_cart" pos="0.05 0 0.04"/>
    </body>
    <body name="arm" pos="0.6 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" density="700"
            contype="0" conaffinity="0"/>
      <site name="s_arm" pos="0.3 0 0"/>
    </body>
  </worldbody>
  <tendon>
    <spatial name="cable" stiffness="{stiffness}" damping="{damping}"
             springlength="{springlength}" {limits}>
      <site site="s_cart"/><site site="anchor"/><site site="s_arm"/>
    </spatial>
  </tendon>
  {actuator}
</mujoco>
"""


def _make(integrator="Euler", stiffness=0.0, damping=0.0, springlength="0",
          limits="", actuator=""):
  xml = _XML.format(
    integrator=integrator, stiffness=stiffness, damping=damping,
    springlength=springlength, limits=limits, actuator=actuator,
  )
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  d = physics.make_data(tp, model)
  return mjm, mjd, tp, model, d


def test_tendon_length_and_jacobian_parity():
  mjm, mjd, tp, model, d = _make()
  rng = np.random.default_rng(3)
  qpos = 0.4 * rng.standard_normal(mjm.nq)
  qvel = 0.5 * rng.standard_normal(mjm.nv)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel
  mujoco.mj_forward(mjm, mjd)

  fwd = jax.jit(functools.partial(physics.forward, tp))
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
  d = fwd(model, d)
  np.testing.assert_allclose(np.asarray(d.ten_length), mjd.ten_length, atol=1e-12)
  np.testing.assert_allclose(
    np.asarray(d.ten_J), mjd.ten_J.reshape(mjm.ntendon, mjm.nv), atol=1e-12
  )
  np.testing.assert_allclose(
    np.asarray(d.ten_velocity), mjd.ten_velocity, atol=1e-12
  )


@pytest.mark.parametrize("integrator", ["Euler", "implicitfast"])
def test_tendon_spring_damper_trajectory(integrator):
  mjm, mjd, tp, model, d = _make(
    integrator=integrator, stiffness=60.0, damping=2.5, springlength="1.2"
  )
  mjd.qvel[:] = [0.8, -1.2]
  mujoco.mj_forward(mjm, mjd)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  dd = jax.jit(functools.partial(physics.forward, tp))(model, d)
  np.testing.assert_allclose(
    np.asarray(dd.qfrc_passive), mjd.qfrc_passive, atol=1e-10
  )

  step = jax.jit(functools.partial(physics.step, tp))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)


def test_tendon_limit_rows():
  mjm, mjd, tp, model, d = _make(limits='limited="true" range="0.5 2.1"')
  assert len(tp.limited_tendon_ids) == 1
  mjd.qvel[:] = [1.5, -2.0]
  step = jax.jit(functools.partial(physics.step, tp))
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  for _ in range(250):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-7)
  # The limit actually engages: length stays within range (+margin slack).
  assert float(d.ten_length[0]) < 2.1 + 1e-3


def test_tendon_actuator_and_sensors():
  act = """
  <actuator><motor tendon="cable" gear="3"/></actuator>
  <sensor><tendonpos tendon="cable"/><tendonvel tendon="cable"/></sensor>
  """
  # ctrl pulls the cable; trajectories + sensors must track mujoco.
  xml = _XML.format(
    integrator="Euler", stiffness=0.0, damping=0.5, springlength="0",
    limits="", actuator="",
  ).replace("</mujoco>", act + "</mujoco>")
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert int(tp.actuator_dyn_tendon[0]) == 0
  d = physics.make_data(tp, model)
  step = jax.jit(functools.partial(physics.step, tp))
  for k in range(150):
    ctrl = np.array([np.sin(0.05 * k)])
    mjd.ctrl[:] = ctrl
    mujoco.mj_step(mjm, mjd)
    d = d.replace(ctrl=jnp.asarray(ctrl))
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(
    np.asarray(d.actuator_force), mjd.actuator_force, atol=1e-8
  )
  np.testing.assert_allclose(np.asarray(d.sensordata), mjd.sensordata, atol=1e-9)


def test_spatial_tendon_equality():
  eq = """
  <tendon>
    <fixed name="joints"><joint joint="slide" coef="1.0"/></fixed>
  </tendon>
  <equality><tendon tendon1="cable" tendon2="joints"
    polycoef="0.0 0.5 0 0 0"/></equality>
  """
  xml = _XML.format(
    integrator="Euler", stiffness=0.0, damping=0.2, springlength="0",
    limits="", actuator="",
  ).replace("</mujoco>", eq + "</mujoco>")
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert tp.neq_rows == 1
  d = physics.make_data(tp, model)
  mjd.qvel[:] = [0.6, -0.8]
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(functools.partial(physics.step, tp))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-7)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-6)
