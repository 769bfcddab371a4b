"""Tracking task: registry wiring + full machinery smoke on a toy robot.

A synthetic standing motion (FK of the keyframe pose held for T frames)
exercises MotionLoader indexing, RSI resets, anchor-relative retargeting,
adaptive sampling, and the tracking rewards/terminations end-to-end."""

import numpy as np
import pytest

import mjlab_tpu.tasks as tasks
from mjlab_tpu.tasks.tracking.motions import make_standing_motion


def test_tracking_registry():
  registered = tasks.list_tasks()
  assert "Mjlab-Tracking-Flat-Unitree-G1" in registered
  assert "Mjlab-Tracking-Flat-Unitree-G1-No-State-Estimation" in registered
  cfg = tasks.load_cfg_from_registry(
    "Mjlab-Tracking-Flat-Unitree-G1", "env_cfg_entry_point"
  )
  assert len(cfg.rewards) == 9
  assert cfg.commands["motion"].anchor_body_name == "torso_link"
  ns = tasks.load_cfg_from_registry(
    "Mjlab-Tracking-Flat-Unitree-G1-No-State-Estimation", "env_cfg_entry_point"
  )
  assert "motion_anchor_pos_b" not in ns.observations["policy"].terms
  assert "base_lin_vel" not in ns.observations["policy"].terms


@pytest.mark.parametrize(
  "sampling_mode",
  [
    pytest.param("adaptive", marks=pytest.mark.slow),  # 75s
    pytest.param("uniform", marks=pytest.mark.slow),  # 63s
    "start",  # one sampling mode stays in the fast gate
  ],
)
def test_tracking_env_toy(tmp_path, sampling_mode):
  import jax.numpy as jnp

  from mjlab_tpu.envs import ManagerBasedRlEnv
  from mjlab_tpu.sensors import ContactMatch, ContactSensorCfg
  from mjlab_tpu.tasks.tracking.tracking_env_cfg import create_tracking_env_cfg
  from test_env_smoke import make_robot_cfg

  motion_file = make_standing_motion(
    make_robot_cfg(), tmp_path / f"motion_{sampling_mode}.npz"
  )
  self_collision_cfg = ContactSensorCfg(
    name="self_collision",
    primary=ContactMatch(mode="subtree", pattern="base", entity="robot"),
    secondary=ContactMatch(mode="subtree", pattern="base", entity="robot"),
    fields=("found",),
    reduce="none",
    num_slots=1,
  )
  cfg = create_tracking_env_cfg(
    robot_cfg=make_robot_cfg(),
    action_scale=0.5,
    viewer_body_name="base",
    motion_file=motion_file,
    anchor_body_name="base",
    body_names=("base", "leg", "foot"),
    foot_friction_geom_names=("foot_collision",),
    ee_body_names=("foot",),
    base_com_body_name="base",
    sensors=(self_collision_cfg,),
    pose_range={"x": (-0.02, 0.02), "yaw": (-0.1, 0.1)},
    velocity_range={"x": (-0.1, 0.1)},
    joint_position_range=(-0.05, 0.05),
  )
  cfg.commands["motion"].sampling_mode = sampling_mode
  cfg.scene.num_envs = 4
  cfg.sim.dtype = "float64"
  env = ManagerBasedRlEnv(cfg)
  obs, _ = env.reset(seed=0)
  # policy obs: command (2nj=4) + anchor_pos (3) + anchor_ori (6) + lin_vel
  # (3) + ang_vel (3) + joint pos/vel (2+2) + actions (2) = 25
  assert obs["policy"].shape == (4, 25)

  action = jnp.zeros((4, 2))
  for _ in range(8):
    obs, rew, term, trunc, extras = env.step(action)
  assert np.isfinite(np.asarray(obs["policy"])).all()
  assert np.isfinite(np.asarray(rew)).all()
  # Standing motion + zero action: robot should track (not all terminated).
  cmd_term = env.command_manager.get_term("motion")
  steps = np.asarray(cmd_term.time_steps)
  assert (steps >= 0).all() and (steps < 60).all()
  # Motion-matching rewards near their exp-kernel max for a standing pose.
  anchor_err = np.asarray(cmd_term.state["metrics"]["error_anchor_pos"])
  assert (anchor_err < 0.5).all()


@pytest.mark.slow  # 76s: RSI covered fast by env_toy[start]
def test_tracking_motion_wraparound(tmp_path):
  """Envs whose motion clock passes the end get resampled in-step."""
  import jax.numpy as jnp

  from mjlab_tpu.envs import ManagerBasedRlEnv
  from mjlab_tpu.sensors import ContactMatch, ContactSensorCfg
  from mjlab_tpu.tasks.tracking.tracking_env_cfg import create_tracking_env_cfg
  from test_env_smoke import make_robot_cfg

  motion_file = make_standing_motion(
    make_robot_cfg(), tmp_path / "motion_short.npz", T=6
  )
  self_collision_cfg = ContactSensorCfg(
    name="self_collision",
    primary=ContactMatch(mode="subtree", pattern="base", entity="robot"),
    secondary=ContactMatch(mode="subtree", pattern="base", entity="robot"),
    fields=("found",), reduce="none", num_slots=1,
  )
  cfg = create_tracking_env_cfg(
    robot_cfg=make_robot_cfg(), action_scale=0.5, viewer_body_name="base",
    motion_file=motion_file, anchor_body_name="base",
    body_names=("base", "leg", "foot"), foot_friction_geom_names=("foot_collision",),
    ee_body_names=("foot",), base_com_body_name="base",
    sensors=(self_collision_cfg,), pose_range={}, velocity_range={},
    joint_position_range=(0.0, 0.0),
  )
  cfg.commands["motion"].sampling_mode = "start"
  cfg.scene.num_envs = 2
  cfg.sim.dtype = "float64"
  env = ManagerBasedRlEnv(cfg)
  env.reset(seed=0)
  for _ in range(10):  # > motion length 6
    env.step(jnp.zeros((2, 2)))
  steps = np.asarray(env.command_manager.get_term("motion").time_steps)
  assert (steps < 6).all()
