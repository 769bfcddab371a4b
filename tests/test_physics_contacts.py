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


# --- explicit <pair> semantics (mj_collision predefined pairs) ------------
#
# Reference behavior: predefined <pair> elements collide UNFILTERED, take
# precedence over the dynamic pair for the same geoms, and their contact
# params come verbatim from mjModel.pair_* (friction/solref/solimp/margin/
# gap) with condim from pair_dim — not from geom mixing.

PAIR_ONLY_XML = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1" contype="0"
          conaffinity="0" friction="0.3" solref="0.05 0.8"/>
    <body pos="0.01 0.02 0.093"><freejoint/>
      <geom name="ball" type="sphere" size="0.1" contype="0" conaffinity="0"
            friction="0.3 0.001 0.0001"/></body>
  </worldbody>
  <contact>
    <pair geom1="floor" geom2="ball"
          friction="1.3 1.1 0.007 0.0003 0.0002"
          solref="0.01 1.2" solimp="0.85 0.97 0.002 0.4 2"
          margin="0.002" gap="0.0005" condim="6"/>
  </contact>
</mujoco>"""


def test_pair_params_verbatim():
  """Active contact carries mjModel.pair_* verbatim (ADVICE r2 high: the
  pair_id override must actually be reached from collision())."""
  mjm = mujoco.MjModel.from_xml_string(PAIR_ONLY_XML)
  assert mjm.npair == 1
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  d = jax.jit(functools.partial(physics.forward, tp))(
    model, physics.make_data(tp, model)
  )
  c = d.contact
  i = int(jnp.argmin(c.dist))  # the (single) penetrating slot
  np.testing.assert_allclose(
    np.asarray(c.friction[i]), mjm.pair_friction[0], atol=0
  )
  np.testing.assert_allclose(
    np.asarray(c.solref[i]), mjm.pair_solref[0], atol=0
  )
  np.testing.assert_allclose(
    np.asarray(c.solimp[i]), mjm.pair_solimp[0], atol=0
  )
  # includemargin = pair_margin (gap is ignored since MuJoCo 3.10).
  np.testing.assert_allclose(
    float(c.includemargin[i]), mjm.pair_margin[0], atol=0
  )
  # condim comes from pair_dim, not the geoms' default 3.
  (pair,) = [p for p in tp.pairs if p.pair_id == 0]
  assert pair.condim == int(mjm.pair_dim[0]) == 6
  # And MuJoCo's own collision agrees on every field.
  mjd = mujoco.MjData(mjm)
  mujoco.mj_forward(mjm, mjd)
  assert mjd.ncon == 1
  np.testing.assert_allclose(np.asarray(c.friction[i]), mjd.contact.friction[0])
  np.testing.assert_allclose(np.asarray(c.solref[i]), mjd.contact.solref[0])
  np.testing.assert_allclose(np.asarray(c.solimp[i]), mjd.contact.solimp[0])
  np.testing.assert_allclose(
    float(c.includemargin[i]), mjd.contact.includemargin[0]
  )
  assert int(mjd.contact.dim[0]) == 6


def test_pair_only_trajectory_parity():
  """contype/conaffinity are zero, so ONLY the unfiltered <pair> collides;
  a rolling-friction condim-6 trajectory discriminates pair params from
  geom-mixed ones."""
  mjm = mujoco.MjModel.from_xml_string(PAIR_ONLY_XML)
  mjd = mujoco.MjData(mjm)
  mjd.qvel[:6] = [0.4, -0.2, -0.3, 0.5, 0.2, -0.1]
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy()))
  for _ in range(100):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)


def test_pair_precedence_over_dynamic():
  """When the same two geoms are ALSO collision-compatible dynamically, the
  predefined pair wins (one topology pair, pair params). A frictionless
  condim-1 pair over friction-0.8 geoms discriminates: the ball must keep
  sliding."""
  xml = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1" friction="0.8"/>
    <body pos="0 0 0.095"><freejoint/>
      <geom name="ball" type="sphere" size="0.1" friction="0.8"/></body>
  </worldbody>
  <contact><pair geom1="floor" geom2="ball" condim="1"
                 friction="0 0 0 0 0"/></contact>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  # Exactly one topology pair for (floor, ball) — no dynamic duplicate.
  assert len([p for p in tp.pairs if {p.geom1, p.geom2} == {0, 1}]) == 1
  mjd = mujoco.MjData(mjm)
  mjd.qvel[0] = 1.0
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
  for _ in range(150):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  # Frictionless: still sliding at ~1 m/s after 0.3 s.
  assert float(d.qvel[0]) > 0.95


def test_pair_into_terrain_pool_rejected():
  """An explicit <pair> whose geom is in the terrain broadphase pool would
  be double-counted by the terrain group (ADVICE r2 medium) — conversion
  must refuse."""
  n = 9  # 9x9 = 81 world boxes > TERRAIN_POOL_MIN (64)
  boxes = "\n".join(
    f'<geom name="t{i}_{j}" type="box" size="0.5 0.5 0.05" '
    f'pos="{i - n / 2} {j - n / 2} 0"/>'
    for i in range(n)
    for j in range(n)
  )
  xml = f"""
<mujoco><worldbody>
    {boxes}
    <body pos="0 0 0.3"><freejoint/>
      <geom name="ball" type="sphere" size="0.1"/></body>
  </worldbody>
  <contact><pair geom1="t0_0" geom2="ball" friction="2 2 0.01 0 0"/></contact>
</mujoco>"""
  mjm = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError, match="terrain-pool"):
    physics.put_model(mjm, dtype=jnp.float64)


def test_pair_solreffriction_elliptic():
  """<pair solreffriction>: elliptic friction rows take their damping from
  solreffriction (K=0, B from its timeconst — or direct −b when negative);
  pyramidal facets ignore it. Trajectory parity on a sliding ball."""
  base = """
<mujoco><option timestep="0.002" cone="{cone}"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1" contype="0"
          conaffinity="0"/>
    <body pos="0 0 0.095"><freejoint/>
      <geom name="ball" type="sphere" size="0.1" contype="0"
            conaffinity="0"/></body>
  </worldbody>
  <contact><pair geom1="floor" geom2="ball" condim="3"
                 friction="0.8 0.8 0.005 0 0" solref="0.02 1"
                 solreffriction="0.05 0.4"/></contact>
</mujoco>"""
  for cone in ("elliptic", "pyramidal"):
    mjm = mujoco.MjModel.from_xml_string(base.format(cone=cone))
    mjd = mujoco.MjData(mjm)
    mjd.qvel[0] = 0.6
    tp, model = physics.put_model(mjm, dtype=jnp.float64)
    step = jax.jit(functools.partial(physics.step, tp))
    d = physics.make_data(tp, model)
    d = d.replace(qvel=jnp.asarray(mjd.qvel.copy()))
    for _ in range(150):
      mujoco.mj_step(mjm, mjd)
      d = step(model, d)
    np.testing.assert_allclose(
      np.asarray(d.qpos), mjd.qpos, atol=1e-8, err_msg=cone
    )
    np.testing.assert_allclose(
      np.asarray(d.qvel), mjd.qvel, atol=1e-7, err_msg=cone
    )
