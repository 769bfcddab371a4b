"""Stage-by-stage smooth-dynamics parity vs the MuJoCo C reference (f64)."""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics

PENDULUM_XML = """
<mujoco>
  <option gravity="0 0 -9.81" timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1" stiffness="2.0"
             armature="0.01" ref="0.2" springref="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04" density="800"
            contype="0" conaffinity="0"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 0 1" damping="0.05" armature="0.02"/>
        <geom type="capsule" fromto="0 0 0 0.3 0.1 0" size="0.03"
              contype="0" conaffinity="0"/>
        <body pos="0.3 0.1 0">
          <joint name="j3" type="slide" axis="1 0 0" damping="0.2" stiffness="5"/>
          <geom type="box" size="0.05 0.04 0.03" contype="0" conaffinity="0"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

FREEBODY_XML = """
<mujoco>
  <option gravity="0 0 -9.81" timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.1 0.2 0.3" density="500" contype="0" conaffinity="0"/>
      <geom type="sphere" pos="0.1 0.1 0.1" size="0.05" contype="0" conaffinity="0"/>
    </body>
  </worldbody>
</mujoco>
"""

HUMANOIDISH_XML = """
<mujoco>
  <option gravity="0 0 -9.81" timestep="0.002"/>
  <worldbody>
    <body name="torso" pos="0 0 1">
      <freejoint/>
      <geom type="capsule" fromto="0 0 -0.2 0 0 0.2" size="0.08" contype="0" conaffinity="0"/>
      <site name="imu" pos="0.02 0.01 0.05"/>
      <body pos="0.1 0 -0.2" quat="0.92 0.38 0 0">
        <joint type="hinge" axis="0 1 0" damping="0.5" armature="0.03"/>
        <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.05" contype="0" conaffinity="0"/>
        <body pos="0 0 -0.3">
          <joint type="hinge" axis="1 0 0" damping="0.2" armature="0.01"/>
          <geom type="sphere" size="0.06" contype="0" conaffinity="0"/>
        </body>
      </body>
      <body pos="-0.1 0 -0.2">
        <joint type="hinge" axis="0 1 0" damping="0.5" armature="0.03"/>
        <geom type="capsule" fromto="0 0 0 0 0 -0.35" size="0.05" contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <sensor>
    <gyro site="imu"/>
    <velocimeter site="imu"/>
    <accelerometer site="imu"/>
    <subtreeangmom body="torso"/>
  </sensor>
</mujoco>
"""


def _random_state(mjm, rng):
  qpos = mjm.qpos0 + 0.3 * rng.standard_normal(mjm.nq)
  # Normalize quaternions for free/ball joints.
  for j in range(mjm.njnt):
    if mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
      adr = mjm.jnt_qposadr[j] + 3
      qpos[adr : adr + 4] /= np.linalg.norm(qpos[adr : adr + 4])
    elif mjm.jnt_type[j] == mujoco.mjtJoint.mjJNT_BALL:
      adr = mjm.jnt_qposadr[j]
      qpos[adr : adr + 4] /= np.linalg.norm(qpos[adr : adr + 4])
  qvel = 0.5 * rng.standard_normal(mjm.nv)
  return qpos, qvel


def _forward_pair(xml, rng, qfrc_applied=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  qpos, qvel = _random_state(mjm, rng)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel
  if qfrc_applied is not None:
    mjd.qfrc_applied[:] = qfrc_applied
  mujoco.mj_forward(mjm, mjd)

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
  if qfrc_applied is not None:
    d = d.replace(qfrc_applied=jnp.asarray(qfrc_applied))
  d = physics.forward(tp, model, d)
  return mjm, mjd, tp, model, d


@pytest.mark.parametrize("xml", [PENDULUM_XML, FREEBODY_XML, HUMANOIDISH_XML])
def test_smooth_forward_parity(xml):
  rng = np.random.default_rng(42)
  mjm, mjd, tp, model, d = _forward_pair(xml, rng)

  np.testing.assert_allclose(np.asarray(d.xpos), mjd.xpos, atol=1e-12)
  # Quaternion sign can differ.
  qd = np.abs(np.sum(np.asarray(d.xquat) * mjd.xquat, axis=-1))
  np.testing.assert_allclose(qd, 1.0, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.xipos), mjd.xipos, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.geom_xpos), mjd.geom_xpos, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.subtree_com), mjd.subtree_com, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.cinert), mjd.cinert, atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.cdof), mjd.cdof, atol=1e-12)
  np.testing.assert_allclose(np.asarray(d.cvel), mjd.cvel, atol=1e-10)

  qM = np.zeros((mjm.nv, mjm.nv))
  mujoco.mj_fullM(mjm, mjd, qM)
  np.testing.assert_allclose(np.asarray(d.qM), qM, atol=1e-10)

  np.testing.assert_allclose(np.asarray(d.qfrc_bias), mjd.qfrc_bias, atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-8)


def test_applied_forces_parity():
  rng = np.random.default_rng(3)
  mjm = mujoco.MjModel.from_xml_string(HUMANOIDISH_XML)
  qfrc = rng.standard_normal(mjm.nv)
  mjm2, mjd, tp, model, d = _forward_pair(HUMANOIDISH_XML, rng, qfrc_applied=qfrc)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-8)


def test_xfrc_applied_parity():
  rng = np.random.default_rng(4)
  mjm = mujoco.MjModel.from_xml_string(HUMANOIDISH_XML)
  mjd = mujoco.MjData(mjm)
  qpos, qvel = _random_state(mjm, rng)
  xfrc = rng.standard_normal((mjm.nbody, 6))
  xfrc[0] = 0
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel
  mjd.xfrc_applied[:] = xfrc
  mujoco.mj_forward(mjm, mjd)

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  d = physics.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel), xfrc_applied=jnp.asarray(xfrc)
  )
  d = physics.forward(tp, model, d)
  np.testing.assert_allclose(np.asarray(d.qacc), mjd.qacc, atol=1e-8)


def test_sensors_parity():
  rng = np.random.default_rng(5)
  mjm, mjd, tp, model, d = _forward_pair(HUMANOIDISH_XML, rng)
  np.testing.assert_allclose(
    np.asarray(d.sensordata), mjd.sensordata, atol=1e-8
  )


@pytest.mark.parametrize("integrator", ["Euler", "implicitfast"])
def test_step_trajectory_parity(integrator):
  xml = HUMANOIDISH_XML.replace(
    '<option gravity="0 0 -9.81" timestep="0.002"/>',
    f'<option gravity="0 0 -9.81" timestep="0.002" integrator="{integrator}"/>',
  )
  rng = np.random.default_rng(7)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  qpos, qvel = _random_state(mjm, rng)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))

  for _ in range(20):
    mujoco.mj_step(mjm, mjd)
    d = physics.step(tp, model, d)

  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)


# --- RK4 integrator (r3: closes a conversion rejection) ---------------------


@pytest.mark.parametrize(
  "scene",
  ["pendulum", "freefall_contact", "actuated_filter"],
)
def test_rk4_trajectory_parity(scene):
  """integrator="RK4" matches mj_step (mj_RungeKutta) on smooth, contact,
  and activation-dynamics scenes."""
  xmls = {
    "pendulum": """
<mujoco><option timestep="0.004" integrator="RK4"/>
  <worldbody>
    <body pos="0 0 1"><joint name="j" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04"
            contype="0" conaffinity="0"/>
      <body pos="0.4 0 0"><joint type="hinge" axis="1 0 0" damping="0.02"/>
        <geom type="capsule" fromto="0 0 0 0 0.25 0" size="0.03"
              contype="0" conaffinity="0"/></body>
    </body>
  </worldbody></mujoco>""",
    "freefall_contact": """
<mujoco><option timestep="0.002" integrator="RK4"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body pos="0.01 0.02 0.3"><freejoint/>
      <geom type="sphere" size="0.1" friction="0.7"/></body>
  </worldbody></mujoco>""",
    "actuated_filter": """
<mujoco><option timestep="0.004" integrator="RK4"/>
  <worldbody>
    <body pos="0 0 1"><joint name="j" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"
            contype="0" conaffinity="0"/></body>
  </worldbody>
  <actuator>
    <general joint="j" dyntype="filter" dynprm="0.05" gainprm="2.0"
             biasprm="0 0 0"/>
  </actuator></mujoco>""",
  }
  mjm = mujoco.MjModel.from_xml_string(xmls[scene])
  assert mjm.opt.integrator == mujoco.mjtIntegrator.mjINT_RK4
  mjd = mujoco.MjData(mjm)
  if scene == "pendulum":
    mjd.qvel[:] = [1.5, -0.8]
  elif scene == "actuated_filter":
    mjd.ctrl[:] = 0.7

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy())
  )
  if scene == "actuated_filter":
    d = d.replace(ctrl=jnp.asarray(mjd.ctrl.copy()))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)
  if mjm.na:
    np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-9)
