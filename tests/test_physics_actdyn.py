"""Actuator activation dynamics (dyntype integrator/filter/filterexact)
parity vs the MuJoCo C reference.

Covers mj_fwdActuation's act-driven force input + act_dot, and
mj_advance's activation integration (explicit Euler vs exact filter),
including actrange clamping and actearly (reference relies on
mujoco_warp's implementation of the same semantics; ref sim/sim.py).
"""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics

_XML = """
<mujoco>
  <option gravity="0 0 -9.81" timestep="0.002" integrator="{integrator}"/>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j1" type="hinge" axis="0 1 0" damping="0.1" armature="0.01"/>
      <geom type="capsule" fromto="0 0 0 0.4 0 0" size="0.04" density="800"
            contype="0" conaffinity="0"/>
      <body pos="0.4 0 0">
        <joint name="j2" type="hinge" axis="0 0 1" damping="0.05" armature="0.02"/>
        <geom type="capsule" fromto="0 0 0 0.3 0.1 0" size="0.03"
              contype="0" conaffinity="0"/>
      </body>
    </body>
  </worldbody>
  <actuator>
    {actuators}
  </actuator>
</mujoco>
"""

_ACT_SETS = {
  "integrator": """
    <general joint="j1" dyntype="integrator" gainprm="3.0" dynprm="1 0 0"/>
    <general joint="j2" gainprm="2.0"/>
  """,
  "filter": """
    <general joint="j1" dyntype="filter" gainprm="4.0" dynprm="0.05 0 0"/>
    <general joint="j2" dyntype="filter" gainprm="1.5" dynprm="0.2 0 0"
             actrange="-0.3 0.3" actlimited="true"/>
  """,
  "filterexact": """
    <general joint="j1" dyntype="filterexact" gainprm="4.0" dynprm="0.05 0 0"/>
    <general joint="j2" dyntype="filterexact" gainprm="1.5" dynprm="0.01 0 0"
             actrange="-0.5 0.5" actlimited="true"/>
  """,
  "mixed_early": """
    <general joint="j1" dyntype="filter" gainprm="4.0" dynprm="0.05 0 0"
             actearly="true"/>
    <general joint="j2" dyntype="integrator" gainprm="1.0" dynprm="1 0 0"
             actrange="-0.4 0.4" actlimited="true" actearly="true"/>
  """,
}


@pytest.mark.parametrize("integrator", ["Euler", "implicitfast"])
@pytest.mark.parametrize("actuators", sorted(_ACT_SETS))
def test_actdyn_trajectory_parity(integrator, actuators):
  xml = _XML.format(integrator=integrator, actuators=_ACT_SETS[actuators])
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(11)
  qpos = mjm.qpos0 + 0.2 * rng.standard_normal(mjm.nq)
  qvel = 0.3 * rng.standard_normal(mjm.nv)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert tp.na == mjm.na
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))

  for k in range(100):
    ctrl = np.sin(0.07 * k + np.arange(mjm.nu))
    mjd.ctrl[:] = ctrl
    mujoco.mj_step(mjm, mjd)
    d = d.replace(ctrl=jnp.asarray(ctrl))
    d = physics.step(tp, model, d)

  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.act_dot), mjd.act_dot, atol=1e-9)
  np.testing.assert_allclose(
    np.asarray(d.actuator_force), mjd.actuator_force, atol=1e-9
  )
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)


@pytest.mark.slow  # 30s: muscle parity pinned by test_physics_muscle
def test_muscle_dyntype_accepted_and_steps():
  """Muscle dyntype is a supported activation dynamics path (was rejected
  before physics/muscle.py landed; deep parity lives in
  test_physics_muscle.py). Short trajectory parity vs mj_step here to pin
  the actdyn integration point specifically."""
  xml = """
  <mujoco>
    <option timestep="0.002"/>
    <worldbody>
      <body pos="0 0 1"><joint name="j" type="hinge" axis="0 1 0" damping="0.1"
              range="-1.2 1.2" limited="true"/>
        <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.04" density="900"
              contype="0" conaffinity="0"/></body>
    </worldbody>
    <actuator><muscle joint="j" timeconst="0.01 0.04"/></actuator>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert tp.na == 1
  d = physics.make_data(tp, model)
  for k in range(50):
    ctrl = np.array([0.5 + 0.5 * np.sin(0.1 * k)])
    mjd.ctrl[:] = ctrl
    mujoco.mj_step(mjm, mjd)
    d = d.replace(ctrl=jnp.asarray(ctrl))
    d = physics.step(tp, model, d)
  np.testing.assert_allclose(np.asarray(d.act), mjd.act, atol=1e-10)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-9)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-8)


# ---------------------------------------------------------------------------
# Full manager-env stack with stateful (filter) actuators: activation state
# must thread through the jitted step and zero on masked auto-reset.
# ---------------------------------------------------------------------------

_HOPPER_FILTER_XML = """
<mujoco model="hopper">
  <worldbody>
    <body name="base" pos="0 0 0.6">
      <freejoint/>
      <geom name="base_collision" type="sphere" size="0.12" density="800"/>
      <body name="leg" pos="0 0 -0.12">
        <joint name="hip" type="hinge" axis="0 1 0" range="-1.2 1.2"/>
        <geom name="leg_collision" type="capsule" fromto="0 0 0 0 0 -0.35" size="0.04"/>
        <body name="foot" pos="0 0 -0.35">
          <joint name="knee" type="hinge" axis="0 1 0" range="-1.5 1.5"/>
          <geom name="foot_collision" type="capsule" fromto="0 0 0 0.12 0 0" size="0.035"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <general name="hip" joint="hip" dyntype="filter" dynprm="0.05 0 0"
             gainprm="40" biasprm="0 -40 -2"/>
    <general name="knee" joint="knee" dyntype="filter" dynprm="0.05 0 0"
             gainprm="40" biasprm="0 -40 -2"/>
  </actuator>
</mujoco>
"""


def _make_filter_env(num_envs=2):
  import mujoco

  from mjlab_tpu.entity import EntityArticulationInfoCfg, EntityCfg
  from mjlab_tpu.envs import ManagerBasedRlEnv, ManagerBasedRlEnvCfg
  from mjlab_tpu.envs import mdp
  from mjlab_tpu.envs.mdp.actions import JointPositionActionCfg
  from mjlab_tpu.managers import (
    ObservationGroupCfg,
    ObservationTermCfg,
    RewardTermCfg,
    TerminationTermCfg,
  )
  from mjlab_tpu.scene import SceneCfg
  from mjlab_tpu.sim import MujocoCfg, SimulationCfg
  from mjlab_tpu.terrains import TerrainImporterCfg
  from mjlab_tpu.utils.spec_config import CollisionCfg

  robot = EntityCfg(
    init_state=EntityCfg.InitialStateCfg(
      pos=(0, 0, 0.6), joint_pos={"hip": 0.2, "knee": -0.4}
    ),
    spec_fn=lambda: mujoco.MjSpec.from_string(_HOPPER_FILTER_XML),
    collisions=(CollisionCfg(geom_names_expr=(".*_collision",)),),
    articulation=EntityArticulationInfoCfg(actuators=()),
  )
  cfg = ManagerBasedRlEnvCfg(
    decimation=4,
    episode_length_s=0.2,  # 10 control steps to timeout
    scene=SceneCfg(
      num_envs=num_envs,
      terrain=TerrainImporterCfg(terrain_type="plane"),
      entities={"robot": robot},
    ),
    observations={
      "policy": ObservationGroupCfg(
        terms={"joint_pos": ObservationTermCfg(func=mdp.joint_pos_rel)}
      )
    },
    actions={
      "joint_pos": JointPositionActionCfg(
        asset_name="robot", actuator_names=(".*",), scale=0.5,
        use_default_offset=True,
      )
    },
    rewards={"alive": RewardTermCfg(func=mdp.is_alive, weight=1.0)},
    terminations={"time_out": TerminationTermCfg(func=mdp.time_out, time_out=True)},
    sim=SimulationCfg(
      dtype="float64",
      mujoco=MujocoCfg(timestep=0.005, iterations=5, ls_iterations=10),
    ),
    seed=0,
  )
  return ManagerBasedRlEnv(cfg)


@pytest.mark.slow  # 34s: filter actdyn parity covered fast above
def test_env_with_filter_actuators():
  env = _make_filter_env(num_envs=2)
  assert env.sim.tp.na == 2
  env.reset()
  action = jnp.ones((2, 2)) * 0.4
  for _ in range(5):
    _, rew, *_ = env.step(action)
  act = np.asarray(env.state.data.act)
  assert act.shape == (2, 2)
  # The filter has integrated toward the commanded targets.
  assert (np.abs(act) > 1e-3).all()
  assert np.isfinite(np.asarray(env.state.data.qpos)).all()

  # Run to timeout: auto-reset must zero the activation of reset envs.
  resets = 0
  for _ in range(12):
    _, _, _, _, extras = env.step(action)
    n = int(extras["log"]["reset_count"])
    resets += n
    if n:
      break
  assert resets >= 1
  act = np.asarray(env.state.data.act)
  assert (np.abs(act) < 1e-12).all()
