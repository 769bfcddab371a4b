"""End-to-end env smoke test: toy floating-base robot on a plane, full
manager stack, jitted step, masked auto-reset."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from mjlab_tpu.entity import EntityArticulationInfoCfg, EntityCfg
from mjlab_tpu.envs import ManagerBasedRlEnv, ManagerBasedRlEnvCfg
from mjlab_tpu.envs import mdp
from mjlab_tpu.envs.mdp.actions import JointPositionActionCfg
from mjlab_tpu.managers import (
  EventTermCfg,
  ObservationGroupCfg,
  ObservationTermCfg,
  RewardTermCfg,
  SceneEntityCfg,
  TerminationTermCfg,
)
from mjlab_tpu.scene import SceneCfg
from mjlab_tpu.sensors import ContactMatch, ContactSensorCfg
from mjlab_tpu.sim import MujocoCfg, SimulationCfg
from mjlab_tpu.terrains import TerrainImporterCfg
from mjlab_tpu.utils.noise import UniformNoiseCfg
from mjlab_tpu.utils.spec_config import ActuatorCfg, CollisionCfg

ROBOT_XML = """
<mujoco model="hopper">
  <worldbody>
    <body name="base" pos="0 0 0.6">
      <freejoint/>
      <geom name="base_collision" type="sphere" size="0.12" density="800"/>
      <site name="imu"/>
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
  <sensor>
    <gyro name="imu_ang_vel" site="imu"/>
    <velocimeter name="imu_lin_vel" site="imu"/>
  </sensor>
</mujoco>
"""


def make_robot_cfg() -> EntityCfg:
  def spec_fn():
    return mujoco.MjSpec.from_string(ROBOT_XML)

  return EntityCfg(
    init_state=EntityCfg.InitialStateCfg(
      pos=(0, 0, 0.6), joint_pos={"hip": 0.2, "knee": -0.4}
    ),
    spec_fn=spec_fn,
    collisions=(
      CollisionCfg(
        geom_names_expr=(".*_collision",),
        condim={"foot_collision": 3, ".*_collision": 1},
        priority={"foot_collision": 1},
        friction={"foot_collision": (0.8,)},
      ),
    ),
    articulation=EntityArticulationInfoCfg(
      actuators=(
        ActuatorCfg(
          joint_names_expr=("hip", "knee"),
          effort_limit=30.0,
          stiffness=40.0,
          damping=2.0,
          armature=0.01,
        ),
      ),
      soft_joint_pos_limit_factor=0.9,
    ),
  )


def make_env(num_envs=4, seed=0) -> ManagerBasedRlEnv:
  feet_contact = ContactSensorCfg(
    name="feet_contact",
    primary=ContactMatch(mode="body", pattern="foot", entity="robot"),
    secondary=ContactMatch(mode="geom", pattern="terrain"),
    fields=("found", "force"),
    reduce="netforce",
    track_air_time=True,
  )
  cfg = ManagerBasedRlEnvCfg(
    decimation=4,
    episode_length_s=2.0,
    scene=SceneCfg(
      num_envs=num_envs,
      terrain=TerrainImporterCfg(terrain_type="plane"),
      entities={"robot": make_robot_cfg()},
      sensors=(feet_contact,),
    ),
    observations={
      "policy": ObservationGroupCfg(
        terms={
          "ang_vel": ObservationTermCfg(
            func=mdp.builtin_sensor,
            params={"sensor_name": "robot/imu_ang_vel"},
            noise=UniformNoiseCfg(n_min=-0.1, n_max=0.1),
          ),
          "joint_pos": ObservationTermCfg(func=mdp.joint_pos_rel),
          "joint_vel": ObservationTermCfg(func=mdp.joint_vel_rel, scale=0.05),
          "gravity": ObservationTermCfg(func=mdp.projected_gravity),
          "actions": ObservationTermCfg(func=mdp.last_action),
          "hist": ObservationTermCfg(func=mdp.joint_pos_rel, history_length=3),
        },
        enable_corruption=True,
      ),
      "critic": ObservationGroupCfg(
        terms={
          "joint_pos": ObservationTermCfg(func=mdp.joint_pos_rel),
          "lin_vel": ObservationTermCfg(
            func=mdp.builtin_sensor, params={"sensor_name": "robot/imu_lin_vel"}
          ),
        },
      ),
    },
    actions={
      "joint_pos": JointPositionActionCfg(
        asset_name="robot", actuator_names=(".*",), scale=0.5,
        use_default_offset=True,
      )
    },
    events={
      "reset_base": EventTermCfg(
        func=mdp.reset_root_state_uniform,
        mode="reset",
        params={"pose_range": {"x": (-0.2, 0.2), "yaw": (-1.0, 1.0)},
                "velocity_range": {}},
      ),
      "reset_joints": EventTermCfg(
        func=mdp.reset_joints_by_offset,
        mode="reset",
        params={"position_range": (-0.1, 0.1), "velocity_range": (0.0, 0.0)},
      ),
      "push": EventTermCfg(
        func=mdp.push_by_setting_velocity,
        mode="interval",
        interval_range_s=(0.5, 1.0),
        params={"velocity_range": {"x": (-0.3, 0.3)}},
      ),
      "friction_dr": EventTermCfg(
        func=mdp.randomize_field,
        mode="startup",
        domain_randomization=True,
        params={
          "asset_cfg": SceneEntityCfg("robot", geom_names=("foot_collision",)),
          "operation": "abs",
          "field": "geom_friction",
          "ranges": (0.4, 1.0),
        },
      ),
    },
    rewards={
      "alive": RewardTermCfg(func=mdp.is_alive, weight=1.0),
      "action_rate": RewardTermCfg(func=mdp.action_rate_l2, weight=-0.01),
      "posture": RewardTermCfg(
        func=mdp.posture,
        weight=0.5,
        params={"asset_cfg": SceneEntityCfg("robot", joint_names=(".*",)),
                "std": {".*": 0.5}},
      ),
    },
    terminations={
      "time_out": TerminationTermCfg(func=mdp.time_out, time_out=True),
      "fell": TerminationTermCfg(
        func=mdp.bad_orientation, params={"limit_angle": 1.2}
      ),
    },
    sim=SimulationCfg(
      dtype="float64",
      mujoco=MujocoCfg(timestep=0.005, iterations=10, ls_iterations=10),
    ),
    seed=seed,
  )
  return ManagerBasedRlEnv(cfg)


def test_env_smoke():
  env = make_env(num_envs=4)
  obs, _ = env.reset()
  assert obs["policy"].shape == (4, 3 + 2 + 2 + 3 + 2 + 6)
  assert obs["critic"].shape == (4, 5)

  action = jnp.zeros((4, 2))
  total_resets = 0
  for i in range(10):
    obs, rew, terminated, time_outs, extras = env.step(action)
    assert obs["policy"].shape == (4, 18)
    assert rew.shape == (4,)
    assert np.isfinite(np.asarray(obs["policy"])).all()
    assert np.isfinite(np.asarray(rew)).all()
    total_resets += int(extras["log"]["reset_count"])

  # Robot should still be near its spawn height (not exploded/fallen through).
  z = np.asarray(env.state.data.qpos[:, 2])
  assert (z > 0.1).all() and (z < 1.5).all()


def test_env_determinism():
  env1 = make_env(num_envs=2, seed=7)
  env2 = make_env(num_envs=2, seed=7)
  obs1, _ = env1.reset()
  obs2, _ = env2.reset()
  np.testing.assert_array_equal(np.asarray(obs1["policy"]), np.asarray(obs2["policy"]))
  a = jnp.ones((2, 2)) * 0.1
  for _ in range(3):
    o1 = env1.step(a)
    o2 = env2.step(a)
  np.testing.assert_array_equal(
    np.asarray(o1[0]["policy"]), np.asarray(o2[0]["policy"])
  )
  np.testing.assert_array_equal(np.asarray(o1[1]), np.asarray(o2[1]))


def test_env_auto_reset_on_timeout():
  env = make_env(num_envs=2)
  env.reset()
  action = jnp.zeros((2, 2))
  # episode_length_s=2.0, step_dt=0.02 → 100 steps to timeout.
  resets = 0
  for i in range(101):
    _, _, terminated, time_outs, extras = env.step(action)
    resets += int(extras["log"]["reset_count"])
  assert resets >= 2


def test_env_contact_free_model():
  """Regression (ADVICE r4): a model with NO collision pairs (ncon_max==0)
  hits the collision() early-exit (physics/collision.py:786-789), which must
  still write the scalar ncon_dropped counter — slim state threading drops
  it to None between steps and the env step log sums it unconditionally."""
  no_contact_xml = ROBOT_XML.replace(
    "<geom name=", '<geom contype="0" conaffinity="0" name='
  )
  robot = EntityCfg(
    init_state=EntityCfg.InitialStateCfg(
      pos=(0, 0, 0.6), joint_pos={"hip": 0.2, "knee": -0.4}
    ),
    spec_fn=lambda: mujoco.MjSpec.from_string(no_contact_xml),
    articulation=EntityArticulationInfoCfg(
      actuators=(
        ActuatorCfg(
          joint_names_expr=("hip", "knee"), effort_limit=30.0,
          stiffness=40.0, damping=2.0, armature=0.01,
        ),
      ),
    ),
  )
  cfg = ManagerBasedRlEnvCfg(
    decimation=2,
    episode_length_s=1.0,
    scene=SceneCfg(
      num_envs=2,
      terrain=TerrainImporterCfg(terrain_type="plane"),
      entities={"robot": robot},
    ),
    observations={
      "policy": ObservationGroupCfg(
        terms={"joint_pos": ObservationTermCfg(func=mdp.joint_pos_rel)}
      ),
    },
    actions={
      "joint_pos": JointPositionActionCfg(
        asset_name="robot", actuator_names=(".*",), scale=0.5,
        use_default_offset=True,
      )
    },
    rewards={"alive": RewardTermCfg(func=mdp.is_alive, weight=1.0)},
    terminations={
      "time_out": TerminationTermCfg(func=mdp.time_out, time_out=True)
    },
    sim=SimulationCfg(
      dtype="float32", mujoco=MujocoCfg(timestep=0.005, iterations=2,
                                        ls_iterations=4)
    ),
    seed=0,
  )
  env = ManagerBasedRlEnv(cfg)
  assert env.tp.ncon_max == 0, "test must exercise the contact-free path"
  env.reset()
  _, rew, _, _, extras = env.step(jnp.zeros((2, 2)))
  assert float(extras["log"]["Metrics/physics/terrain_slots_dropped"]) == 0.0
  assert np.isfinite(np.asarray(rew)).all()


def test_env_box_terrain_narrowphase_under_jit():
  """Regression (round 5): the box-terrain narrowphase gathers Model leaves
  by TRACED candidate ids (physics/collision.py _terrain_group_contacts /
  _combine_params_terrain); with numpy model leaves this raised
  TracerArrayConversionError inside jit, so every rough task whose terrain
  contained box sub-terrains (e.g. stairs) failed to build. A stairs-only
  generator terrain guarantees a box terrain group."""
  from mjlab_tpu.terrains import (
    BoxPyramidStairsTerrainCfg,
    TerrainGeneratorCfg,
  )

  gen = TerrainGeneratorCfg(
    seed=3,
    size=(3.0, 3.0),
    num_rows=4,
    num_cols=4,
    sub_terrains={
      "stairs": BoxPyramidStairsTerrainCfg(
        proportion=1.0, step_height_range=(0.05, 0.1), step_width=0.3,
        platform_width=1.0,
      ),
    },
  )
  cfg = ManagerBasedRlEnvCfg(
    decimation=2,
    episode_length_s=1.0,
    scene=SceneCfg(
      num_envs=2,
      terrain=TerrainImporterCfg(terrain_type="generator",
                                 terrain_generator=gen),
      entities={"robot": make_robot_cfg()},
    ),
    observations={
      "policy": ObservationGroupCfg(
        terms={"joint_pos": ObservationTermCfg(func=mdp.joint_pos_rel)}
      ),
    },
    actions={
      "joint_pos": JointPositionActionCfg(
        asset_name="robot", actuator_names=(".*",), scale=0.5,
        use_default_offset=True,
      )
    },
    rewards={"alive": RewardTermCfg(func=mdp.is_alive, weight=1.0)},
    terminations={
      "time_out": TerminationTermCfg(func=mdp.time_out, time_out=True)
    },
    sim=SimulationCfg(
      dtype="float32",
      mujoco=MujocoCfg(timestep=0.005, iterations=4, ls_iterations=6),
    ),
    seed=0,
  )
  env = ManagerBasedRlEnv(cfg)
  assert len(env.tp.terrain_groups) > 0, (
    "stairs terrain must exceed TERRAIN_POOL_MIN and form box terrain "
    "groups, else this test exercises nothing"
  )
  env.reset(seed=0)
  _, rew, _, _, extras = env.step(jnp.zeros((2, 2)))
  assert np.isfinite(np.asarray(rew)).all()
  assert float(extras["log"]["Metrics/physics/terrain_slots_dropped"]) == 0.0
