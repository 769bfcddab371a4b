"""Mocap-body parity vs CPU MuJoCo: kinematics override from
mocap_pos/quat (physics/kinematics.py) driving a weld-constrained body —
the standard mocap-target manipulation pattern."""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu import physics

XML = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom type="plane" size="5 5 0.1"/>
    <body name="target" mocap="true" pos="0.5 0 0.6">
      <geom type="box" size="0.05 0.05 0.05" contype="0" conaffinity="0"/>
    </body>
    <body name="ball" pos="0 0 0.5"><freejoint/><geom type="sphere" size="0.1"/></body>
  </worldbody>
  <equality><weld body1="target" body2="ball" torquescale="0.5"/></equality>
</mujoco>
"""


def test_mocap_weld_tracking_parity():
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)

  for t in range(200):
    mp = np.array([0.5 + 0.001 * t, 0.0, 0.6])
    mjd.mocap_pos[0] = mp
    mujoco.mj_step(mjm, mjd)
    d = d.replace(mocap_pos=jnp.asarray(mp)[None])
    d = step(model, d)

  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)
  # The welded ball actually followed the moving target.
  assert float(d.qpos[0]) > 0.1


def test_mocap_quat_rotates_frame():
  mjm = mujoco.MjModel.from_xml_string(XML)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  d = physics.make_data(tp, model)
  quat = jnp.asarray([[np.cos(0.4), 0.0, 0.0, np.sin(0.4)]])
  d = d.replace(mocap_quat=quat)
  d = jax.jit(lambda dd: physics.forward(tp, model, dd))(d)
  mocap_body = int(np.nonzero(tp.body_mocapid >= 0)[0][0])
  np.testing.assert_allclose(
    np.asarray(d.xquat[mocap_body]), np.asarray(quat[0]), atol=1e-12
  )
