"""Gravity-compensation parity vs CPU MuJoCo (body_gravcomp passive
force, physics/smooth.py passive)."""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu import physics

XML = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1" gravcomp="1.0">
      <joint name="a" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.03" density="900"
            contype="0" conaffinity="0"/>
      <body pos="0.4 0 0" gravcomp="0.5">
        <joint name="b" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.025" density="900"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_gravcomp_trajectory_parity():
  mjm = mujoco.MjModel.from_xml_string(XML)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:] = [0.7, -1.1]

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy()))
  for _ in range(300):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)


def test_full_gravcomp_hovers():
  """A fully-compensated free body under gravity stays put."""
  xml = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1" gravcomp="1.0"><freejoint/>
      <geom type="sphere" size="0.1" density="500"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  for _ in range(200):
    d = step(model, d)
  np.testing.assert_allclose(float(d.qpos[2]), 1.0, atol=1e-9)
  assert float(jnp.linalg.norm(d.qvel)) < 1e-9
