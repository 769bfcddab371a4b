"""Convex-narrowphase error budget (VERDICT r2 item 7).

The SAT+clip narrowphase (physics/convex.py) approximates MuJoCo's
libccd/GJK manifolds; these stress tests pin down the accepted behavioral
deviation so future solver/collision changes have a quantitative gate:

- box-stack stability: a 3-box tower must stand for 1000 steps with rest
  heights within BUDGET_STACK_Z of both the analytic value and mj_step;
- inclined-plane friction: static friction must hold exactly where MuJoCo
  holds (no creep > BUDGET_STICK_SLIDE), and kinetic sliding distance must
  match mj_step within BUDGET_SLIDE_FRAC;
- long-horizon rough-terrain settle (slow): a G1 dropped on the box-terrain
  broadphase pool stays finite and comes to rest over 1000 steps.

The budgets are documented in ARCHITECTURE.md (collision section).
"""

import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics

BUDGET_STACK_Z = 8e-3  # m: rest-height deviation (analytic and vs mj_step)
BUDGET_STICK_SLIDE = 5e-3  # m: creep allowed where static friction holds
BUDGET_SLIDE_FRAC = 0.15  # relative sliding-distance error vs mj_step


def _run_pair(xml: str, nsteps: int, qvel=None):
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  if qvel is not None:
    mjd.qvel[: len(qvel)] = qvel
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  step = jax.jit(functools.partial(physics.step, tp))
  d = physics.make_data(tp, model)
  d = d.replace(
    qpos=jnp.asarray(mjd.qpos.copy()), qvel=jnp.asarray(mjd.qvel.copy())
  )
  for _ in range(nsteps):
    mujoco.mj_step(mjm, mjd)
    d = step(model, d)
  return mjm, mjd, d


def test_box_stack_stays_standing():
  """Three stacked boxes, slightly offset, 1000 steps: the tower must not
  topple and each box's rest height must be within BUDGET_STACK_Z of the
  analytic stack height AND of CPU MuJoCo's."""
  xml = """
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="floor" type="plane" size="10 10 0.1"/>
    <body pos="0.00 0.00 0.051"><freejoint/><geom type="box" size="0.06 0.06 0.05"/></body>
    <body pos="0.01 -0.01 0.155"><freejoint/><geom type="box" size="0.05 0.05 0.05"/></body>
    <body pos="-0.01 0.01 0.257"><freejoint/><geom type="box" size="0.04 0.04 0.05"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, d = _run_pair(xml, 1000)
  analytic = [0.05, 0.15, 0.25]
  for i, z_rest in enumerate(analytic):
    z = float(d.qpos[7 * i + 2])
    assert abs(z - z_rest) < BUDGET_STACK_Z, (i, z)
    assert abs(z - float(mjd.qpos[7 * i + 2])) < BUDGET_STACK_Z, (i, z)
    # Upright (no topple): quaternion w close to 1.
    assert abs(float(d.qpos[7 * i + 3])) > 0.99, i
  assert float(jnp.linalg.norm(d.qvel)) < 0.05


@pytest.mark.parametrize(
  "mu,should_stick",
  [(0.8, True), (0.2, False)],
  ids=["static_holds", "kinetic_slides"],
)
def test_inclined_plane_friction(mu, should_stick):
  """Box on a 20° incline (tan 20° = 0.364): friction 0.8 must hold it in
  place (creep < BUDGET_STICK_SLIDE over 1 s); friction 0.2 must slide the
  same distance as mj_step within BUDGET_SLIDE_FRAC."""
  xml = f"""
<mujoco><option timestep="0.002"/>
  <worldbody>
    <geom name="ramp" type="plane" size="10 10 0.1" euler="0 20 0"
          friction="{mu}"/>
    <body pos="0 0 0.0532" euler="0 20 0"><freejoint/>
      <geom type="box" size="0.05 0.05 0.05" friction="{mu}"/></body>
  </worldbody></mujoco>"""
  mjm, mjd, d = _run_pair(xml, 500)
  start = np.array([0.0, 0.0, 0.0532])
  ours = np.asarray(d.qpos[:3]) - start
  mj = np.asarray(mjd.qpos[:3]) - start
  if should_stick:
    assert np.linalg.norm(ours) < BUDGET_STICK_SLIDE, ours
    assert np.linalg.norm(mj) < BUDGET_STICK_SLIDE, mj
  else:
    # Both slid a macroscopic distance, and by comparable amounts.
    d_ours, d_mj = np.linalg.norm(ours), np.linalg.norm(mj)
    assert d_mj > 0.3, d_mj
    assert abs(d_ours - d_mj) / d_mj < BUDGET_SLIDE_FRAC, (d_ours, d_mj)


@pytest.mark.slow
def test_g1_rough_terrain_long_settle():
  """1000 physics steps of a G1 dropped (no actuation) onto the rough
  box-terrain broadphase pool: state stays finite, robot comes to rest on
  the terrain (not below it), and contact slots do not blow up."""
  import mjlab_tpu.tasks as tasks
  from mjlab_tpu.envs import ManagerBasedRlEnv

  cfg = tasks.load_cfg_from_registry(
    "Mjlab-Velocity-Rough-Unitree-G1", "env_cfg_entry_point"
  )
  cfg.scene.num_envs = 2
  env = ManagerBasedRlEnv(cfg)
  env.reset(seed=0)
  state = env.state
  # Drive through the env step with zero actions (decimation included).
  zeros = jnp.zeros(
    (2, env.action_manager.total_action_dim), dtype=env.dtype
  )
  for _ in range(250):  # 250 env steps x decimation 4 = 1000 physics steps
    state, _ = env._jit_step(state, zeros)
  qpos = np.asarray(state.data.qpos)
  assert np.isfinite(qpos).all()
  # Root z above the terrain floor for every env (terrain boxes sit below
  # ~1 m; a fallen-through robot would be far negative).
  assert (qpos[:, 2] > -0.5).all(), qpos[:, 2]
  vel = np.asarray(state.data.qvel)
  assert (np.abs(vel) < 20.0).all()
