"""Torsional/rolling friction (condim 4/6, both cone types) parity vs the
MuJoCo C reference: a spinning, rolling ball must decelerate through the
rotational friction rows exactly like mj_step."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics import io, step as phys_step

XML = """
<mujoco model="spinner">
  <option timestep="0.002" cone="pyramidal"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" friction="0.6 0.08 0.01"/>
    <body name="b" pos="0 0 0.0999">
      <freejoint/>
      <geom name="ball" type="sphere" size="0.1" density="700"
            friction="0.6 0.08 0.01" condim="{cd}"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.mark.parametrize("cd", [4, 6])
def test_spinning_ball_parity(cd):
  mj_model = mujoco.MjModel.from_xml_string(XML.format(cd=cd))
  mj_model.opt.iterations = 50
  mj_model.opt.ls_iterations = 50
  mj_model.opt.tolerance = 0.0
  mj_model.opt.ls_tolerance = 0.0
  mj_data = mujoco.MjData(mj_model)
  # Spin about z (torsion) + roll about x + slide.
  mj_data.qvel[:] = [0.8, 0.0, 0.0, 3.0, 0.0, 6.0]

  tp, model = io.put_model(mj_model, dtype=jnp.float64)
  d = io.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(mj_data.qpos.copy()), qvel=jnp.asarray(mj_data.qvel.copy())
  )
  step_fn = jax.jit(lambda dd: phys_step(tp, model, dd))
  for i in range(120):
    mujoco.mj_step(mj_model, mj_data)
    d = step_fn(d)
    np.testing.assert_allclose(
      np.asarray(d.qpos), mj_data.qpos, atol=1e-6,
      err_msg=f"qpos diverged at step {i} (condim {cd})",
    )
    np.testing.assert_allclose(
      np.asarray(d.qvel), mj_data.qvel, atol=1e-5,
      err_msg=f"qvel diverged at step {i} (condim {cd})",
    )
  # Torsional friction actually acted: spin decayed.
  assert abs(mj_data.qvel[5]) < 6.0 - 0.5
