"""Equality-constraint parity vs CPU MuJoCo: connect (closed kinematic
loops), polynomial joint coupling, and weld — trajectory match under the
Newton solver (physics/constraint.py equality rows; mjwarp exposes the
same constraint classes through the reference's model frontend)."""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics

SCENES = {
  "connect_fourbar": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1"><joint name="ja" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.03" density="800"
            contype="0" conaffinity="0"/></body>
    <body name="b" pos="0.8 0 1"><joint name="jb" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 -0.4 0 0" size="0.03" density="800"
            contype="0" conaffinity="0"/></body>
  </worldbody>
  <equality><connect body1="a" body2="b" anchor="0.4 0 0"/></equality>
</mujoco>""",
    [0.8, -0.5],
    200,
    1e-7,
  ),
  "joint_coupling": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1"><joint name="ja" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.03"/>
      <body name="b" pos="0.4 0 0"><joint name="jb" type="hinge" axis="0 1 0"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/></body>
    </body>
  </worldbody>
  <equality><joint joint1="jb" joint2="ja" polycoef="0.1 0.5 -0.2 0.05 0"/></equality>
</mujoco>""",
    [1.2, -0.4],
    200,
    1e-7,
  ),
  "weld_pair": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1"><freejoint/><geom type="box" size="0.1 0.1 0.1" density="600"/></body>
    <body name="b" pos="0.5 0 1"><freejoint/><geom type="box" size="0.08 0.08 0.08" density="600"/></body>
  </worldbody>
  <equality><weld body1="a" body2="b" torquescale="0.7"/></equality>
</mujoco>""",
    [0.3, -0.2, 0.4, 0.5, -0.6, 0.2, -0.1, 0.3, 0.1, -0.4, 0.2, 0.6],
    150,
    1e-6,
  ),
  "tendon_coupling": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1"><joint name="a" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" contype="0" conaffinity="0"/>
      <body pos="0.3 0 0"><joint name="b" type="hinge" axis="0 1 0"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.03" contype="0" conaffinity="0"/></body>
    </body>
  </worldbody>
  <tendon>
    <fixed name="t1"><joint joint="a" coef="0.6"/><joint joint="b" coef="0.3"/></fixed>
    <fixed name="t2"><joint joint="b" coef="1.0"/></fixed>
  </tendon>
  <equality><tendon tendon1="t1" tendon2="t2" polycoef="0.05 0.4 -0.1 0 0"/></equality>
</mujoco>""",
    [1.0, -0.6],
    200,
    1e-7,
  ),
  "connect_sites": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1"><joint name="ja" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.03" density="800"
            contype="0" conaffinity="0"/>
      <site name="s1" pos="0.4 0 0.05"/></body>
    <body name="b" pos="0.8 0 1"><joint name="jb" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 -0.4 0 0" size="0.03" density="800"
            contype="0" conaffinity="0"/>
      <site name="s2" pos="-0.4 0 -0.02"/></body>
  </worldbody>
  <equality><connect site1="s1" site2="s2"/></equality>
</mujoco>""",
    [0.8, -0.5],
    200,
    1e-7,
  ),
  "weld_sites": (
    # Sites coincide at t=0 (body-b placement compensates the offsets) so
    # the weld starts satisfied — unlike body welds, site welds get no
    # compile-time relpose folding, and a violently-violated stiff weld is
    # a regime where even MuJoCo's own Newton is iteration-dependent
    # (probed: both solvers sit ~20× above the exact QP optimum there).
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body name="a" pos="0 0 1"><freejoint/>
      <geom type="box" size="0.1 0.1 0.1" density="600"/>
      <site name="s1" pos="0.12 0 0.03" quat="0.92 0.2 0.33 0"/></body>
    <body name="b" pos="0.21 -0.02 1.03"><freejoint/>
      <geom type="box" size="0.08 0.08 0.08" density="600"/>
      <site name="s2" pos="-0.09 0.02 0" quat="0.92 0.2 0.33 0"/></body>
  </worldbody>
  <equality><weld site1="s1" site2="s2" torquescale="0.6"/></equality>
</mujoco>""",
    [0.3, -0.2, 0.4, 0.5, -0.6, 0.2, -0.1, 0.3, 0.1, -0.4, 0.2, 0.6],
    150,
    1e-6,
  ),
  "connect_with_contact": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body name="a" pos="0 0 0.3"><freejoint/><geom type="sphere" size="0.1" density="500"/></body>
    <body name="b" pos="0.3 0 0.3"><freejoint/><geom type="sphere" size="0.08" density="500"/></body>
  </worldbody>
  <equality><connect body1="a" body2="b" anchor="0.15 0 0"/></equality>
</mujoco>""",
    [0.2, 0, -0.5, 0.1, -0.2, 0.3, 0, 0, -0.5, 0, 0, 0],
    150,
    1e-5,
  ),
}


@pytest.mark.parametrize("name", sorted(SCENES))
def test_equality_trajectory_parity(name):
  xml, qvel, nsteps, tol = SCENES[name]
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[: len(qvel)] = qvel

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert tp.neq_rows > 0
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy()))

  for _ in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)

  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=tol)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=tol * 10)


def test_equality_holds_loop_closed():
  """Behavioral check: the four-bar connect keeps the anchors coincident."""
  xml, qvel, _, _ = SCENES["connect_fourbar"]
  mjm = mujoco.MjModel.from_xml_string(xml)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qvel=jnp.asarray(np.array(qvel)))
  for _ in range(400):
    d = step(model, d)
  p1 = d.xpos[1] + d.xmat[1] @ jnp.asarray([0.4, 0, 0.0], dtype=jnp.float64)
  p2 = d.xpos[2] + d.xmat[2] @ jnp.asarray([-0.4, 0, 0.0], dtype=jnp.float64)
  assert float(jnp.linalg.norm(p1 - p2)) < 5e-3


def test_geom_wrap_tendon_supported():
  """Spatial tendons with geom wrap surfaces convert and match MuJoCo's
  ten_length at qpos0 (full trajectory parity: test_physics_tendon_wrap.py)."""
  xml = """
<mujoco>
  <worldbody>
    <body name="a" pos="0 0 1"><joint name="ja" type="hinge" axis="0 1 0"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.03"/>
      <site name="s1" pos="0.4 0 0"/>
      <geom name="wrap" type="sphere" size="0.1" pos="0.2 0 0.2"
            contype="0" conaffinity="0"/>
    </body>
    <site name="s0" pos="0 0 1.3"/>
  </worldbody>
  <tendon><spatial name="t">
    <site site="s0"/><geom geom="wrap"/><site site="s1"/>
  </spatial></tendon>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  d = jax.jit(functools.partial(physics.forward, tp))(
    model, physics.make_data(tp, model)
  )
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  np.testing.assert_allclose(
    np.asarray(d.ten_length), mjd.ten_length, rtol=0, atol=1e-10
  )


def test_unsupported_model_features_rejected():
  """Conversion must refuse features the engine does not model (silent
  mis-simulation guard, io.put_model)."""
  cases = {
    "noslip": '<mujoco><option noslip_iterations="3"/><worldbody>'
              '<body pos="0 0 1"><freejoint/><geom type="sphere" size="0.1"/>'
              '</body></worldbody></mujoco>',
    "user_dyn": '<mujoco><worldbody><body pos="0 0 1">'
                '<joint name="j" type="hinge"/>'
                '<geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03"/>'
                '</body></worldbody><actuator>'
                '<general joint="j" dyntype="user"/>'
                '</actuator></mujoco>',
  }
  for name, xml in cases.items():
    mjm = mujoco.MjModel.from_xml_string(xml)
    with pytest.raises(NotImplementedError):
      physics.put_model(mjm, dtype=jnp.float64)
