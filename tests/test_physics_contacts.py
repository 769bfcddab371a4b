"""Contact/constraint parity vs CPU MuJoCo: trajectory match on primitive
scenes (sphere/capsule/box on plane, stacking, joint limits)."""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics

SCENES = {
  "sphere": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1" friction="0.8"/>
    <body pos="0.01 0.02 0.093"><freejoint/>
      <geom type="sphere" size="0.1" friction="0.8 0.01 0.002"/></body>
  </worldbody></mujoco>""",
    [0.1, -0.2, -0.5, 0.3, 0.1, -0.2],
    50,
    1e-9,
  ),
  "capsule": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.08" euler="0 3 0"><freejoint/>
      <geom type="capsule" fromto="-0.15 0 0 0.15 0 0" size="0.05" friction="0.9 0.01 0.001"/></body>
  </worldbody></mujoco>""",
    [0.2, 0.1, -0.3, 0.5, -0.2, 0.1],
    100,
    1e-4,
  ),
  "box": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.1" euler="2 1 0"><freejoint/>
      <geom type="box" size="0.1 0.08 0.06"/></body>
  </worldbody></mujoco>""",
    [0.1, 0, -0.4, 0.2, 0.3, -0.1],
    100,
    1e-9,
  ),
  "stack": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.1"><freejoint/><geom type="sphere" size="0.1"/></body>
    <body pos="0.05 0 0.32"><freejoint/><geom type="capsule" fromto="-0.1 0 0 0.1 0 0" size="0.05"/></body>
  </worldbody></mujoco>""",
    [0, 0, 0, 0, 0, 0, 0, 0, -0.5, 0, 0, 0],
    150,
    1e-8,
  ),
  "jnt_limit": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="hinge" axis="0 1 0" range="-0.5 0.5" damping="0.05"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04" contype="0" conaffinity="0"/>
    </body>
  </worldbody></mujoco>""",
    [2.0],
    200,
    1e-8,
  ),
  "frictionloss": (
    """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="hinge" axis="0 1 0" frictionloss="0.4" damping="0.01"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04" contype="0" conaffinity="0"/>
    </body>
  </worldbody></mujoco>""",
    [1.5],
    200,
    1e-6,
  ),
}


@pytest.mark.parametrize("name", list(SCENES))
def test_contact_trajectory_parity(name):
  xml, qvel, nsteps, tol = SCENES[name]
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[: len(qvel)] = qvel

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy()))

  for _ in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)

  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=tol)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=tol * 10)


def test_cg_solver_trajectory_parity():
  """solver="CG": the M-preconditioned Polak-Ribière path converges to the
  same trajectory as CPU MuJoCo's CG on a settling box (reference exposes
  the solver choice via sim/sim.py:21-38)."""
  xml = """
<mujoco><option timestep="0.002" solver="CG" iterations="50" ls_iterations="25"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.1" euler="2 1 0"><freejoint/>
      <geom type="box" size="0.1 0.08 0.06"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert mjm.opt.solver == mujoco.mjtSolver.mjSOL_CG
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:6] = [0.1, 0, -0.4, 0.2, 0.3, -0.1]

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert model.opt.solver == 1
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy()))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  # First-order methods accumulate solver-path differences; both must land
  # on the same settled pose.
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=2e-3)
  assert float(jnp.linalg.norm(d.qvel)) < 0.05


def test_pgs_solver_trajectory_parity():
  """solver="PGS": the dual projected Gauss-Seidel path. The dual QP is
  strictly convex (R = 1/D > 0) so both engines converge to the same unique
  force vector; at high iteration counts the trajectories match tightly.
  Scene mixes pyramidal contacts, a joint limit, and dof friction loss —
  every dual projection type."""
  xml = """
<mujoco><option timestep="0.002" solver="PGS" iterations="100"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0 0 0.1" euler="2 1 0"><freejoint/>
      <geom type="box" size="0.1 0.08 0.06" friction="0.7 0.01 0.001"/>
      <body pos="0.1 0 0.1">
        <joint name="arm" type="hinge" axis="0 1 0" range="-0.5 0.5"
               frictionloss="0.2" damping="0.01"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size="0.03"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  assert mjm.opt.solver == mujoco.mjtSolver.mjSOL_PGS
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:6] = [0.1, 0, -0.4, 0.2, 0.3, -0.1]
  mjd.qvel[6] = 1.0

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert model.opt.solver == 0
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy()))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=2e-3)
  assert float(jnp.linalg.norm(d.qvel - jnp.asarray(mjd.qvel))) < 0.05


def test_pgs_elliptic_rejected():
  xml = """
<mujoco><option solver="PGS" cone="elliptic"/>
  <worldbody>
    <geom type="plane" size="1 1 0.1"/>
    <body pos="0 0 0.2"><freejoint/><geom type="sphere" size="0.1"/></body>
  </worldbody></mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError, match="PGS"):
    physics.put_model(mjm, dtype=jnp.float64)
