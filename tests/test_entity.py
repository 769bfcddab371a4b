"""Entity layer tests: the 4 base-type × articulation combos, regex lookup,
keyframe authoring, and indexing (reference tests/test_entity.py:82-130
fixture matrix)."""

import mujoco
import numpy as np
import pytest

from mjlab_tpu.entity import Entity, EntityArticulationInfoCfg, EntityCfg
from mjlab_tpu.utils.spec_config import ActuatorCfg

FLOATING_ARTICULATED = """
<mujoco model="robot">
  <worldbody>
    <body name="base" pos="0 0 0.5">
      <freejoint/>
      <geom name="base_geom" type="sphere" size="0.1" density="1000"/>
      <site name="imu"/>
      <body name="arm">
        <joint name="shoulder" type="hinge" axis="0 1 0" range="-1 1"/>
        <geom name="arm_geom" type="capsule" fromto="0 0 0 0 0 -0.3" size="0.03"/>
        <body name="hand" pos="0 0 -0.3">
          <joint name="wrist" type="hinge" axis="1 0 0" range="-2 2"/>
          <geom name="hand_geom" type="sphere" size="0.04"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

FLOATING_RIGID = """
<mujoco model="box">
  <worldbody>
    <body name="box" pos="0 0 1">
      <freejoint/>
      <geom name="box_geom" type="box" size="0.1 0.1 0.1" density="500"/>
    </body>
  </worldbody>
</mujoco>
"""

FIXED_ARTICULATED = """
<mujoco model="fixed_arm">
  <worldbody>
    <body name="mount">
      <geom name="mount_geom" type="cylinder" size="0.05 0.1"/>
      <body name="link" pos="0 0 0.1">
        <joint name="pivot" type="hinge" axis="0 0 1" range="-3 3"/>
        <geom name="link_geom" type="capsule" fromto="0 0 0 0.2 0 0" size="0.02"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

FIXED_RIGID = """
<mujoco model="pillar">
  <worldbody>
    <body name="pillar" mocap="true">
      <geom name="pillar_geom" type="box" size="0.1 0.1 0.5"/>
    </body>
  </worldbody>
</mujoco>
"""


def _cfg(xml, **kwargs):
  return EntityCfg(spec_fn=lambda: mujoco.MjSpec.from_string(xml), **kwargs)


class TestClassification:
  def test_floating_articulated_actuated(self):
    e = Entity(_cfg(
      FLOATING_ARTICULATED,
      articulation=EntityArticulationInfoCfg(
        actuators=(ActuatorCfg(joint_names_expr=(".*",), effort_limit=10.0,
                               stiffness=20.0, damping=1.0),),
      ),
    ))
    assert not e.is_fixed_base
    assert e.is_articulated
    assert e.is_actuated
    assert e.num_joints == 2
    assert e.num_actuators == 2

  def test_floating_rigid(self):
    e = Entity(_cfg(FLOATING_RIGID))
    assert not e.is_fixed_base
    assert not e.is_articulated
    assert not e.is_actuated

  def test_fixed_articulated(self):
    e = Entity(_cfg(FIXED_ARTICULATED))
    assert e.is_fixed_base
    assert e.is_articulated
    assert not e.is_actuated
    assert e.joint_names == ("pivot",)

  def test_fixed_rigid_mocap(self):
    e = Entity(_cfg(FIXED_RIGID))
    assert e.is_fixed_base
    assert not e.is_articulated
    assert e.is_mocap


class TestInitState:
  def test_keyframe_qpos(self):
    e = Entity(_cfg(
      FLOATING_ARTICULATED,
      init_state=EntityCfg.InitialStateCfg(
        pos=(1.0, 2.0, 0.7),
        rot=(0.0, 0.0, 0.0, 1.0),
        joint_pos={"shoulder": 0.3, "wrist": -0.5},
      ),
    ))
    model = e.compile()
    key = model.key("init_state")
    np.testing.assert_allclose(key.qpos[:3], [1.0, 2.0, 0.7])
    np.testing.assert_allclose(key.qpos[3:7], [0.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(key.qpos[7:], [0.3, -0.5])

  def test_keyframe_ctrl_matches_joint_pos(self):
    """For PD position actuators the keyframe ctrl equals the joint target."""
    e = Entity(_cfg(
      FLOATING_ARTICULATED,
      init_state=EntityCfg.InitialStateCfg(joint_pos={".*": 0.2}),
      articulation=EntityArticulationInfoCfg(
        actuators=(ActuatorCfg(joint_names_expr=(".*",), effort_limit=10.0,
                               stiffness=20.0, damping=1.0),),
      ),
    ))
    model = e.compile()
    np.testing.assert_allclose(model.key("init_state").ctrl, 0.2)

  def test_fixed_base_pos_written_to_body(self):
    e = Entity(_cfg(
      FIXED_ARTICULATED,
      init_state=EntityCfg.InitialStateCfg(pos=(0.5, 0.0, 1.0)),
    ))
    np.testing.assert_allclose(e.root_body.pos, [0.5, 0.0, 1.0])


class TestFind:
  @pytest.fixture
  def entity(self):
    return Entity(_cfg(FLOATING_ARTICULATED))

  def test_find_bodies(self, entity):
    ids, names = entity.find_bodies("(arm|hand)")
    assert names == ["arm", "hand"]
    assert len(ids) == 2

  def test_find_joints_subset_order(self, entity):
    ids, names = entity.find_joints(["wrist", "shoulder"], preserve_order=True)
    assert names == ["wrist", "shoulder"]
    ids2, names2 = entity.find_joints(["wrist", "shoulder"])
    assert names2 == ["shoulder", "wrist"]  # subset order by default

  def test_find_geoms_regex(self, entity):
    _, names = entity.find_geoms(".*_geom")
    assert set(names) == {"base_geom", "arm_geom", "hand_geom"}

  def test_find_no_match_raises(self, entity):
    with pytest.raises(ValueError):
      entity.find_bodies("nonexistent")


class TestIndexing:
  def test_global_indexing_standalone(self):
    e = Entity(_cfg(
      FLOATING_ARTICULATED,
      articulation=EntityArticulationInfoCfg(
        actuators=(ActuatorCfg(joint_names_expr=(".*",), effort_limit=10.0,
                               stiffness=20.0, damping=1.0),),
      ),
    ))
    model = e.compile()
    idx = e._compute_indexing(model)
    # free joint: qpos 0-6, dofs 0-5; then 2 hinges.
    np.testing.assert_array_equal(idx.free_joint_q_adr, np.arange(7))
    np.testing.assert_array_equal(idx.free_joint_v_adr, np.arange(6))
    np.testing.assert_array_equal(idx.joint_q_adr, [7, 8])
    np.testing.assert_array_equal(idx.joint_v_adr, [6, 7])
    assert idx.root_body_id == 1
    assert len(idx.ctrl_ids) == 2

  def test_indexing_in_attached_scene(self):
    """After spec.attach with a prefix, entity indices map into the composite
    model (reference _compute_indexing entity.py:601-660)."""
    parent = mujoco.MjSpec()
    parent.worldbody.add_geom(
      name="floor", type=mujoco.mjtGeom.mjGEOM_PLANE, size=[0, 0, 1]
    )
    e = Entity(_cfg(FLOATING_ARTICULATED))
    frame = parent.worldbody.add_frame()
    parent.attach(e.spec, prefix="robot/", frame=frame)
    model = parent.compile()
    idx = e._compute_indexing(model)
    hand_id = mujoco.mj_name2id(model, mujoco.mjtObj.mjOBJ_BODY, "robot/hand")
    assert hand_id in idx.body_ids
    assert model.nq == 9 and idx.joint_q_adr.tolist() == [7, 8]
