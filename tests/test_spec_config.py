"""Spec-editor tests: inspect editor effects on compiled models.

Mirrors the reference's test_spec_config.py strategy (SURVEY §4): apply
declarative editors to a tiny MjSpec and assert on the compiled MjModel.
"""

import mujoco
import numpy as np
import pytest

from mjlab_tpu.utils.spec_config import (
  ActuatorCfg,
  ActuatorSetCfg,
  CameraCfg,
  CollisionCfg,
  LightCfg,
  MaterialCfg,
  TextureCfg,
)

ARM_XML = """
<mujoco model="arm">
  <worldbody>
    <body name="upper" pos="0 0 0.5">
      <joint name="shoulder" type="hinge" axis="0 1 0" range="-1.5 1.5"/>
      <geom name="upper_collision" type="capsule" fromto="0 0 0 0 0 -0.3" size="0.04"/>
      <body name="lower" pos="0 0 -0.3">
        <joint name="elbow" type="hinge" axis="0 1 0" range="-2.0 0.5"/>
        <geom name="lower_collision" type="capsule" fromto="0 0 0 0 0 -0.25" size="0.03"/>
        <geom name="lower_visual" type="sphere" size="0.02" pos="0 0 -0.25"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def make_spec() -> mujoco.MjSpec:
  return mujoco.MjSpec.from_string(ARM_XML)


class TestActuatorSet:
  def test_pd_encoding(self):
    """gainprm[0]=kp, biasprm[1]=-kp, biasprm[2]=-kd (reference
    spec_config.py:402-414)."""
    spec = make_spec()
    ActuatorSetCfg(
      cfgs=(
        ActuatorCfg(
          joint_names_expr=("shoulder", "elbow"),
          effort_limit=25.0,
          stiffness=100.0,
          damping=5.0,
          armature=0.02,
          frictionloss=0.1,
        ),
      )
    ).edit_spec(spec)
    model = spec.compile()
    assert model.nu == 2
    np.testing.assert_allclose(model.actuator_gainprm[:, 0], 100.0)
    np.testing.assert_allclose(model.actuator_biasprm[:, 1], -100.0)
    np.testing.assert_allclose(model.actuator_biasprm[:, 2], -5.0)
    np.testing.assert_allclose(model.actuator_forcerange, [[-25, 25], [-25, 25]])
    np.testing.assert_allclose(model.dof_armature, 0.02)
    np.testing.assert_allclose(model.dof_frictionloss, 0.1)
    # inheritrange: ctrlrange follows the compiled joint range.
    np.testing.assert_allclose(model.actuator_ctrlrange, model.jnt_range)

  def test_last_match_wins(self):
    spec = make_spec()
    ActuatorSetCfg(
      cfgs=(
        ActuatorCfg(joint_names_expr=(".*",), effort_limit=10.0,
                    stiffness=50.0, damping=1.0),
        ActuatorCfg(joint_names_expr=("elbow",), effort_limit=20.0,
                    stiffness=80.0, damping=2.0),
      )
    ).edit_spec(spec)
    model = spec.compile()
    shoulder = model.actuator("shoulder")
    elbow = model.actuator("elbow")
    assert shoulder.gainprm[0] == 50.0
    assert elbow.gainprm[0] == 80.0
    assert elbow.forcerange[1] == 20.0

  def test_spec_order_deterministic(self):
    """Actuators are created in spec joint order regardless of cfg order."""
    spec = make_spec()
    ActuatorSetCfg(
      cfgs=(
        ActuatorCfg(joint_names_expr=("elbow",), effort_limit=1.0,
                    stiffness=1.0, damping=0.1),
        ActuatorCfg(joint_names_expr=("shoulder",), effort_limit=1.0,
                    stiffness=1.0, damping=0.1),
      )
    ).edit_spec(spec)
    model = spec.compile()
    names = [model.actuator(i).name for i in range(model.nu)]
    assert names == ["shoulder", "elbow"]

  def test_no_match_raises(self):
    spec = make_spec()
    with pytest.raises(ValueError, match="No joints matched"):
      ActuatorSetCfg(
        cfgs=(ActuatorCfg(joint_names_expr=("wrist",), effort_limit=1.0,
                          stiffness=1.0, damping=0.1),)
      ).edit_spec(spec)

  def test_unlimited_joint_raises(self):
    spec = mujoco.MjSpec.from_string("""
      <mujoco><worldbody><body name="b" pos="0 0 1">
        <joint name="free_spin" type="hinge" axis="0 0 1"/>
        <geom type="sphere" size="0.1"/>
      </body></worldbody></mujoco>""")
    with pytest.raises(ValueError, match="must be limited"):
      ActuatorSetCfg(
        cfgs=(ActuatorCfg(joint_names_expr=("free_spin",), effort_limit=1.0,
                          stiffness=1.0, damping=0.1),)
      ).edit_spec(spec)

  def test_validation(self):
    with pytest.raises(ValueError, match="effort_limit"):
      ActuatorSetCfg(
        cfgs=(ActuatorCfg(joint_names_expr=(".*",), effort_limit=0.0,
                          stiffness=1.0, damping=0.1),)
      ).edit_spec(make_spec())
    with pytest.raises(ValueError, match="non-negative"):
      ActuatorSetCfg(
        cfgs=(ActuatorCfg(joint_names_expr=(".*",), effort_limit=1.0,
                          stiffness=-1.0, damping=0.1),)
      ).edit_spec(make_spec())


class TestCollision:
  def test_subset_and_disable_others(self):
    spec = make_spec()
    CollisionCfg(
      geom_names_expr=(".*_collision",),
      condim={"lower_collision": 3, ".*_collision": 1},
      priority={"lower_collision": 1},
      friction={"lower_collision": (0.9, 0.02, 0.001)},
      disable_other_geoms=True,
    ).edit_spec(spec)
    model = spec.compile()
    lower = model.geom("lower_collision")
    upper = model.geom("upper_collision")
    visual = model.geom("lower_visual")
    assert lower.condim == 3 and upper.condim == 1
    assert lower.priority == 1 and upper.priority == 0
    np.testing.assert_allclose(lower.friction, (0.9, 0.02, 0.001))
    # Non-matching geom has collision disabled.
    assert visual.contype == 0 and visual.conaffinity == 0
    assert upper.contype == 1

  def test_keep_other_geoms(self):
    spec = make_spec()
    CollisionCfg(
      geom_names_expr=("upper_collision",), disable_other_geoms=False
    ).edit_spec(spec)
    model = spec.compile()
    assert model.geom("lower_visual").contype == 1

  def test_invalid_condim(self):
    with pytest.raises(ValueError, match="condim"):
      CollisionCfg(geom_names_expr=(".*",), condim=2).edit_spec(make_spec())


class TestVisualEditors:
  def test_texture_material_light_camera(self):
    spec = make_spec()
    TextureCfg(
      name="grid", type="2d", builtin="checker", rgb1=(0.1, 0.2, 0.3),
      rgb2=(0.9, 0.8, 0.7), width=64, height=64, mark="edge",
      markrgb=(1, 1, 1),
    ).edit_spec(spec)
    MaterialCfg(
      name="grid_mat", texuniform=True, texrepeat=(2, 2), reflectance=0.25,
      texture="grid",
    ).edit_spec(spec)
    LightCfg(name="sun", type="directional", pos=(0, 0, 3),
             dir=(0, 0, -1)).edit_spec(spec)
    CameraCfg(name="cam", body="upper", mode="trackcom", fovy=60,
              pos=(1, 0, 0.5)).edit_spec(spec)
    model = spec.compile()
    assert model.ntex == 1 and model.nmat == 1
    assert model.mat("grid_mat").reflectance[0] == pytest.approx(0.25)
    assert model.nlight == 1
    assert model.ncam == 1
    assert model.cam("cam").fovy[0] == pytest.approx(60)

  def test_texture_validation(self):
    with pytest.raises(ValueError, match="positive"):
      TextureCfg(
        name="bad", type="2d", builtin="flat", rgb1=(0, 0, 0),
        rgb2=(1, 1, 1), width=0, height=4,
      ).edit_spec(make_spec())
