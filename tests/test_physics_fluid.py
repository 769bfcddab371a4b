"""Fluid-force (inertia-box model) parity vs the MuJoCo C reference.

opt.viscosity / opt.density / opt.wind passive forces
(mj_inertiaBoxFluidModel); the reference gets these from mujoco_warp
(ref sim/sim.py conversion surface).
"""

import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from mjlab_tpu import physics

_XML = """
<mujoco>
  <option gravity="0 0 -9.81" timestep="0.002" integrator="{integrator}"
          {fluid}/>
  <worldbody>
    <body name="torso" pos="0 0 1">
      <freejoint/>
      <geom type="capsule" fromto="0 0 -0.2 0 0 0.2" size="0.08"
            contype="0" conaffinity="0"/>
      <body pos="0.1 0 -0.2" quat="0.92 0.38 0 0">
        <joint type="hinge" axis="0 1 0" damping="0.5" armature="0.03"/>
        <geom type="capsule" fromto="0 0 0 0 0 -0.3" size="0.05"
              contype="0" conaffinity="0"/>
        <body pos="0 0 -0.3">
          <joint type="hinge" axis="1 0 0" damping="0.2" armature="0.01"/>
          <geom type="box" size="0.06 0.04 0.08" contype="0" conaffinity="0"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

_FLUIDS = {
  "viscosity": 'viscosity="1.5"',
  "density": 'density="900"',
  "wind": 'density="500" wind="1.2 -0.7 0.4"',
  "all": 'viscosity="0.9" density="1000" wind="-0.5 2.0 0.3"',
}


@pytest.mark.parametrize(
  "integrator",
  [
    "Euler",
    "implicitfast",
    # RK4 re-derives the whole step 4x: ~17s per fluid param (fast gate
    # keeps Euler/implicitfast; RK4 parity also pinned in test_physics_smooth).
    pytest.param("RK4", marks=pytest.mark.slow),
  ],
)
@pytest.mark.parametrize("fluid", sorted(_FLUIDS))
def test_fluid_trajectory_parity(fluid, integrator):
  """Fluid passive-force parity, plus (implicitfast) the fluid-drag
  velocity derivative folded into the integration matrix via jacfwd
  (forward._implicit_matrix; r2 rejected this combination)."""
  xml = _XML.format(fluid=_FLUIDS[fluid], integrator=integrator)
  mjm = mujoco.MjModel.from_xml_string(xml)
  mjd = mujoco.MjData(mjm)
  rng = np.random.default_rng(9)
  qpos = mjm.qpos0.copy()
  qpos[:3] += 0.1 * rng.standard_normal(3)
  qvel = 0.8 * rng.standard_normal(mjm.nv)
  mjd.qpos[:] = qpos
  mjd.qvel[:] = qvel
  mujoco.mj_forward(mjm, mjd)

  tp, model = physics.put_model(mjm, dtype=jnp.float64)
  assert tp.has_fluid
  d = physics.make_data(tp, model)
  d = d.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
  d = physics.forward(tp, model, d)
  np.testing.assert_allclose(
    np.asarray(d.qfrc_passive), mjd.qfrc_passive, atol=1e-10
  )

  for _ in range(50):
    mujoco.mj_step(mjm, mjd)
    d = physics.step(tp, model, d)
  np.testing.assert_allclose(np.asarray(d.qpos), mjd.qpos, atol=1e-8)
  np.testing.assert_allclose(np.asarray(d.qvel), mjd.qvel, atol=1e-7)


def test_ellipsoid_fluidshape_rejected():
  xml = """
  <mujoco>
    <option density="1000"/>
    <worldbody>
      <body><freejoint/>
        <geom type="ellipsoid" size="0.1 0.05 0.03" fluidshape="ellipsoid"
              contype="0" conaffinity="0"/></body>
    </worldbody>
  </mujoco>
  """
  mjm = mujoco.MjModel.from_xml_string(xml)
  with pytest.raises(NotImplementedError, match="fluidshape"):
    physics.put_model(mjm, dtype=jnp.float64)
