"""Asset zoo: every robot builds an Entity and compiles (reference
tests/test_asset_zoo.py:16-18), plus actuator-derivation sanity checks
(reference tests/test_g1_constants.py)."""

import math

import mujoco
import numpy as np
import pytest

from mjlab_tpu.asset_zoo.robots.asimov import asimov_constants, asimov_toe_constants
from mjlab_tpu.asset_zoo.robots.unitree_g1 import g1_constants
from mjlab_tpu.asset_zoo.robots.unitree_go1 import go1_constants
from mjlab_tpu.entity import Entity

ROBOT_CFGS = {
  "g1": g1_constants.get_g1_robot_cfg,
  "go1": go1_constants.get_go1_robot_cfg,
  "asimov": asimov_constants.get_asimov_robot_cfg,
  "asimov_toe": asimov_toe_constants.get_asimov_robot_cfg,
}

EXPECTED_NU = {"g1": 29, "go1": 12, "asimov": 12, "asimov_toe": 14}


@pytest.mark.parametrize("name", list(ROBOT_CFGS))
def test_robot_compiles(name):
  entity = Entity(ROBOT_CFGS[name]())
  model = entity.spec.compile()
  assert model.nu == EXPECTED_NU[name]
  assert model.nq > 7 and model.nv > 6
  # Init-state keyframe exists and is consistent.
  assert model.nkey >= 1
  mujoco.mj_resetDataKeyframe(model, mujoco.MjData(model), 0)


def test_g1_actuator_derivation():
  # 5020 reflected inertia through the two-stage planetary.
  j0, j1, j2 = 0.139e-4, 0.017e-4, 0.169e-4
  g1_, g2_ = 1 + 46 / 18, 1 + 56 / 16
  expected = j0 * (g1_ * g2_) ** 2 + j1 * g2_**2 + j2
  from mjlab_tpu.asset_zoo.robots.unitree_motors import MOTOR_5020

  assert math.isclose(MOTOR_5020.reflected_inertia, expected, rel_tol=1e-12)

  # PD tuning: kp = J ω², kd = 2ζJω at 10 Hz, ζ=2.
  w = 2 * math.pi * 10
  cfg = g1_constants.G1_ACTUATOR_5020
  assert math.isclose(cfg.stiffness, expected * w**2, rel_tol=1e-9)
  assert math.isclose(cfg.damping, 2 * 2.0 * expected * w, rel_tol=1e-9)
  assert math.isclose(cfg.armature, expected, rel_tol=1e-12)

  # Parallel-linkage ankle: doubled armature/effort/gains.
  ankle = g1_constants.G1_ACTUATOR_ANKLE
  assert math.isclose(ankle.armature, 2 * expected, rel_tol=1e-12)
  assert math.isclose(ankle.effort_limit, 50.0)

  # Action scale = 0.25 · effort / stiffness.
  s = g1_constants.G1_ACTION_SCALE
  assert math.isclose(
    s[".*_elbow_joint"], 0.25 * cfg.effort_limit / cfg.stiffness, rel_tol=1e-12
  )


def test_g1_compiled_gains_match_cfg():
  entity = Entity(g1_constants.get_g1_robot_cfg())
  model = entity.spec.compile()
  # Every actuator uses the position-servo encoding kp=gainprm[0]=-biasprm[1].
  np.testing.assert_allclose(model.actuator_gainprm[:, 0], -model.actuator_biasprm[:, 1])
  assert (model.actuator_gainprm[:, 0] > 0).all()
  # Knee actuators carry the 7520_22 gains.
  knee_id = mujoco.mj_name2id(
    model, mujoco.mjtObj.mjOBJ_ACTUATOR, "left_knee_joint"
  )
  assert knee_id >= 0
  expected_kp = g1_constants.G1_ACTUATOR_7520_22.stiffness
  assert math.isclose(
    float(model.actuator_gainprm[knee_id, 0]), expected_kp, rel_tol=1e-9
  )


def test_go1_feet_collision_preset():
  cfg = go1_constants.get_go1_robot_cfg()
  entity = Entity(cfg)
  model = entity.spec.compile()
  foot_geoms = [
    i
    for i in range(model.ngeom)
    if (mujoco.mj_id2name(model, mujoco.mjtObj.mjOBJ_GEOM, i) or "").endswith(
      "_foot_collision"
    )
  ]
  assert len(foot_geoms) == 4
  for g in foot_geoms:
    assert model.geom_condim[g] == 3
    assert model.geom_priority[g] == 1
    assert math.isclose(float(model.geom_friction[g, 0]), 0.6)
