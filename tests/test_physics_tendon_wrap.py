"""Tendon geom-wrapping (sphere/cylinder, mju_wrap) parity vs MuJoCo.

smooth._wrap_circle routes spatial-tendon segments around wrap geoms:
side selection from the passing side or a forced sidesite, arcs past π,
cylinder z-distribution along the 2D path, straight fallback. Lengths
and Jacobians are compared against mjd.ten_length/ten_J on randomized
configurations, plus force-level trajectory parity.
"""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics

_BASE = """
<mujoco>
  <option timestep="0.002" integrator="{integrator}"/>
  <worldbody>
    <site name="s0" pos="-0.5 0 1.2"/>
    <body name="wrapbody" pos="0 0 1">
      <joint name="wj" type="hinge" axis="0 0 1"/>
      <geom name="wrapgeom" type="{gtype}" size="{size}" contype="0" conaffinity="0"/>
      <site name="side" pos="{sidepos}"/>
      <geom type="sphere" size="0.02" pos="0.3 0 0" contype="0" conaffinity="0"
            mass="0.5"/>
    </body>
    <body name="arm" pos="0.6 0 1">
      <joint name="hinge" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" density="700"
            contype="0" conaffinity="0"/>
      <site name="s1" pos="0.3 0 0"/>
    </body>
  </worldbody>
  <tendon><spatial name="cable" stiffness="{stiffness}" damping="{damping}"
      springlength="0">
    <site site="s0"/><geom geom="wrapgeom" {side}/><site site="s1"/>
  </spatial></tendon>
  {extra}
</mujoco>
"""


def _build(gtype="sphere", size="0.15", sidepos="0 0.4 0", side="",
           integrator="Euler", stiffness=0.0, damping=0.0, extra=""):
  xml = _BASE.format(
    gtype=gtype, size=size, sidepos=sidepos, side=side,
    integrator=integrator, stiffness=stiffness, damping=damping, extra=extra,
  )
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  return mjm, mjd, tp, model


_CASES = {
  "sphere": dict(gtype="sphere", size="0.15"),
  "cylinder": dict(gtype="cylinder", size="0.15 0.3", sidepos="0 0.4 0.1"),
  "sphere_side_pos": dict(gtype="sphere", size="0.15", side='sidesite="side"'),
  "sphere_side_neg": dict(
    gtype="sphere", size="0.15", sidepos="0 -0.4 0", side='sidesite="side"'
  ),
  "cylinder_side": dict(
    gtype="cylinder", size="0.15 0.3", sidepos="0 -0.4 -0.1",
    side='sidesite="side"',
  ),
}


@pytest.mark.parametrize("case", sorted(_CASES))
def test_wrap_length_jacobian_parity(case):
  mjm, mjd, tp, model = _build(**_CASES[case])
  fwd = jax.jit(functools.partial(physics.forward, tp))
  rng = np.random.default_rng(1)
  n_wrapped = 0
  for _ in range(25):
    q = rng.uniform(-2.8, 2.8, mjm.nq)
    mjd.qpos[:] = q
    mujoco.mj_forward(mjm, mjd)
    d = physics.make_data(tp, model)
    d = fwd(model, d.replace(qpos=jnp.asarray(q)))
    np.testing.assert_allclose(
      float(d.ten_length[0]), float(mjd.ten_length[0]), atol=1e-12
    )
    np.testing.assert_allclose(
      np.asarray(d.ten_J[0]), mjd.ten_J.reshape(1, mjm.nv)[0], atol=1e-12
    )
    if mjd.ten_wrapnum[0] > 2:
      n_wrapped += 1
  assert n_wrapped >= 5, "wrap branch under-exercised"


@pytest.mark.parametrize("integrator", ["Euler", "implicitfast"])
def test_wrap_spring_trajectory(integrator):
  mjm, mjd, tp, model = _build(
    gtype="cylinder", size="0.15 0.3", integrator=integrator,
    stiffness=40.0, damping=1.0,
  )
  mjd.qvel[:] = [1.0, -1.5]
  d = physics.make_data(tp, model)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(functools.partial(physics.step, tp))
  for _ in range(200):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  assert int(mjd.ten_wrapnum[0]) > 2  # the tendon is actually wrapping
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)


def test_wrap_actuator_trajectory():
  extra = '<actuator><motor tendon="cable" gear="2"/></actuator>'
  mjm, mjd, tp, model = _build(
    gtype="sphere", size="0.15", damping=0.3, extra=extra
  )
  d = physics.make_data(tp, model)
  step = jax.jit(functools.partial(physics.step, tp))
  for k in range(150):
    ctrl = np.array([np.cos(0.04 * k)])
    mjd.ctrl[:] = ctrl
    mujoco.mj_step(mjm, mjd)
    d = d.replace(ctrl=jnp.asarray(ctrl))
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(
    np.asarray(d.actuator_force), mjd.actuator_force, atol=1e-8
  )


def test_pulley_branches():
  """Pulley divisor scales branch length/Jacobian (mj_tendon semantics)."""
  xml = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <site name="a0" pos="0 0 1.5"/>
    <site name="a1" pos="0.4 0 1.5"/>
    <body pos="0 0 1">
      <joint name="h" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" density="700"
            contype="0" conaffinity="0"/>
      <site name="b0" pos="0.1 0 0"/>
      <site name="b1" pos="0.3 0 0"/>
    </body>
  </worldbody>
  <tendon><spatial name="t" stiffness="30" springlength="0.8">
    <pulley divisor="2"/><site site="a0"/><site site="b0"/>
    <pulley divisor="2"/><site site="a1"/><site site="b1"/>
  </spatial></tendon>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  d = physics.make_data(tp, model)
  mjd.qvel[:] = [0.8]
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  step = jax.jit(functools.partial(physics.step, tp))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(
    float(d.ten_length[0]), float(mjd.ten_length[0]), atol=1e-10
  )
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
