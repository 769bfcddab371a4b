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

  def __init__(self, num_envs=2):
    model = mujoco.MjSpec.from_string(BOX_XML).compile()
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
