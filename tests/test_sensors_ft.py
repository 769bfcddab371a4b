"""Parity tests vs the MuJoCo C reference for the force/torque/touch/
rangefinder/tendonactuatorfrc sensors (physics/sensors.py; reference
builtin-sensor catalog sensor/builtin_sensor.py:15-101).

Same-state evaluation: both engines run forward() on an identical
hand-set (qpos, qvel, ctrl) with active floor contacts, so the parity
covers the cfrc_int backward pass (contact wrenches included), the
touch zone test, and the analytic raycasts."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import forward, io

XML = """
<mujoco model="ft_rig">
  <option timestep="0.002" cone="pyramidal"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1"/>
    <body name="base" pos="0 0 0.0995">
      <freejoint/>
      <geom name="box" type="box" size="0.1 0.1 0.1" density="500"/>
      <site name="touch_site" type="box" size="0.12 0.12 0.12"/>
      <site name="rf_down" pos="0.3 0 0" zaxis="0 0 -1"/>
      <site name="rf_up" pos="0.3 0 0" zaxis="0 0 1"/>
      <site name="rf_away" pos="0 0.3 0" zaxis="0 1 0"/>
      <body name="arm" pos="0 0 0.15">
        <joint name="shoulder" type="hinge" axis="0 1 0"/>
        <geom name="arm_geom" type="capsule" fromto="0 0 0 0.3 0 0"
              size="0.03" density="800"/>
        <site name="ft_arm" pos="0.05 0 0"/>
        <body name="hand" pos="0.3 0 0">
          <joint name="wrist" type="hinge" axis="0 1 0"/>
          <geom name="hand_geom" type="sphere" size="0.04" density="700"/>
        </body>
      </body>
    </body>
    <body name="ball" pos="0.3 0 0.6">
      <freejoint/>
      <geom name="ball_geom" type="sphere" size="0.07" density="300"/>
    </body>
  </worldbody>
  <contact>
    <pair geom1="floor" geom2="box"/>
  </contact>
  <tendon>
    <fixed name="couple">
      <joint joint="shoulder" coef="0.7"/>
      <joint joint="wrist" coef="-0.4"/>
    </fixed>
  </tendon>
  <actuator>
    <motor name="ten_act" tendon="couple" gear="1.5" ctrlrange="-5 5"/>
  </actuator>
  <sensor>
    <force name="f_arm" site="ft_arm"/>
    <torque name="t_arm" site="ft_arm"/>
    <touch name="touch" site="touch_site"/>
    <rangefinder name="rf_hit" site="rf_down"/>
    <rangefinder name="rf_ball" site="rf_up"/>
    <rangefinder name="rf_miss" site="rf_away"/>
    <tendonactuatorfrc name="taf" tendon="couple"/>
  </sensor>
</mujoco>
"""


@pytest.fixture(scope="module")
def rollout():
  mj_model = mujoco.MjModel.from_xml_string(XML)
  mj_data = mujoco.MjData(mj_model)
  # Box settled on the floor (0.5 mm penetration → active contacts), arm
  # raised and swinging, ball hanging above the downward rangefinder.
  mj_data.qpos[:] = [
    0.0, 0.0, 0.0995, 1.0, 0.0, 0.0, 0.0,  # base free joint
    0.4, -0.2,                              # shoulder, wrist
    0.3, 0.0, 0.6, 1.0, 0.0, 0.0, 0.0,      # ball free joint
  ]
  mj_data.qvel[:] = [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.8, -0.5,
                     0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
  mj_data.ctrl[0] = 2.0
  mujoco.mj_forward(mj_model, mj_data)

  tp, model = io.put_model(mj_model, dtype=jnp.float64)
  d = io.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(mj_data.qpos.copy()),
    qvel=jnp.asarray(mj_data.qvel.copy()),
    ctrl=jnp.asarray(mj_data.ctrl.copy()),
  )
  d = jax.jit(lambda dd: forward(tp, model, dd))(d)
  return mj_model, mj_data, np.asarray(d.sensordata)


def _sl(mj_model, name):
  sid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_SENSOR, name)
  return slice(int(mj_model.sensor_adr[sid]),
               int(mj_model.sensor_adr[sid]) + int(mj_model.sensor_dim[sid]))


@pytest.mark.parametrize(
  "name,tol",
  [
    ("f_arm", 1e-5),
    ("t_arm", 1e-5),
    ("touch", 1e-4),
    ("rf_hit", 1e-9),
    ("rf_ball", 1e-9),
    ("rf_miss", 1e-9),
    ("taf", 1e-9),
  ],
)
def test_sensor_parity(rollout, name, tol):
  mj_model, mj_data, ours = rollout
  sl = _sl(mj_model, name)
  np.testing.assert_allclose(
    ours[sl], mj_data.sensordata[sl], rtol=tol, atol=tol,
    err_msg=f"sensor {name} diverged from MuJoCo",
  )


def test_values_are_meaningful(rollout):
  """Guard against vacuous parity (both engines agreeing on zero)."""
  mj_model, mj_data, ours = rollout
  # Arm + hand hang off the ft site: interaction force should carry their
  # weight (≈ (m_arm + m_hand) * g ≈ nonzero).
  assert np.linalg.norm(ours[_sl(mj_model, "f_arm")]) > 1.0
  # Box rests on the floor inside the touch zone: normal force ≈ total
  # supported weight.
  assert ours[_sl(mj_model, "touch")][0] > 10.0
  # Downward rangefinder sees the floor at ~0.0995 m.
  assert 0.0 < ours[_sl(mj_model, "rf_hit")][0] < 0.2
  # Upward one sees something overhead (hanging ball or arm) at a positive
  # distance; the sideways one sees nothing → −1.
  assert ours[_sl(mj_model, "rf_ball")][0] > 0.0
  assert ours[_sl(mj_model, "rf_miss")][0] == -1.0
  # Tendon actuator force = raw scalar actuator force (ctrl for a motor).
  np.testing.assert_allclose(ours[_sl(mj_model, "taf")][0], 2.0, rtol=1e-6)
