"""Ball-joint limit parity vs CPU MuJoCo: cone-angle limit rows
(physics/constraint.py block 2b) — efc row values and trajectory match."""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu import physics

XML = """
<mujoco><option timestep="0.002" jacobian="dense"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="b" type="ball" range="0 40" damping="0.02"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" density="800"
            contype="0" conaffinity="0"/>
      <body pos="0.3 0 0">
        <joint name="h" type="hinge" axis="0 1 0" range="-50 50"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.025" density="800"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_ball_limit_row_parity():
  """efc row (pos/J/D/aref) matches mujoco when the ball exceeds its cone."""
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(1)
  axis = rng.normal(size=3)
  axis /= np.linalg.norm(axis)
  half = 0.45  # 0.9 rad rotation > 40 deg limit
  mjd.qpos[:4] = np.concatenate([[np.cos(half)], np.sin(half) * axis])
  mjd.qpos[4] = 0.2
  mjd.qvel[:] = rng.uniform(-1, 1, 4)
  mujoco.mj_forward(mjm, mjd)

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert len(tp.limited_ball_joint_ids) == 1
  d = physics.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy())
  )
  d = jax.jit(lambda dd: physics.forward(tp, model, dd))(d)

  # The hinge (within its limit) is dropped from mujoco's efc entirely;
  # our static layout keeps it as an inert row (D = 0) at index 0, with
  # the ball row following at index 1.
  assert mjd.nefc == 1
  assert float(np.asarray(d.efc_D)[0]) == 0.0  # inactive hinge row
  j = 1  # ball row in our [hinge | ball] limit block
  np.testing.assert_allclose(
    np.asarray(d.efc_pos)[j], mjd.efc_pos[0], atol=1e-10, err_msg="pos")
  np.testing.assert_allclose(
    np.asarray(d.efc_J)[j], mjd.efc_J.reshape(-1, mjm.nv)[0], atol=1e-10,
    err_msg="J")
  np.testing.assert_allclose(
    np.asarray(d.efc_D)[j], mjd.efc_D[0], rtol=1e-9, err_msg="D")
  np.testing.assert_allclose(
    np.asarray(d.efc_aref)[j], mjd.efc_aref[0], rtol=1e-8, err_msg="aref")


def test_ball_limit_trajectory_parity():
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = [2.0, -1.5, 1.0, 3.0]  # swings hard into both limits

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy())
  )
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-7)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-6)
  # The limit actually engaged at some point: ball angle near the cone.
  w = np.asarray(d.qpos)[0]
  vec = np.asarray(d.qpos)[1:4]
  angle = 2 * np.arctan2(np.linalg.norm(vec), w)
  assert angle < np.deg2rad(40) + 0.05
