"""Domain-randomization tests: values in range, changed vs nominal, diverse
across envs, masked application (reference tests/test_domain_randomization.py
strategy at :75-99)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mjlab_tpu.envs import mdp
from mjlab_tpu.managers import SceneEntityCfg
from tests.test_env_smoke import make_env


@pytest.mark.slow  # 39s: DR op semantics covered fast by masked_and_ops
def test_startup_dr_in_range_and_diverse():
  """The smoke env's friction_dr startup event randomizes foot friction
  uniformly in [0.4, 1.0] per env."""
  env = make_env(num_envs=8)
  friction = np.asarray(env.model.geom_friction)
  # Field was expanded with a leading env axis before tracing.
  assert friction.shape[0] == 8
  foot_gid = env.sim.mj_model.geom("robot/foot_collision").id
  vals = friction[:, foot_gid, 0]
  nominal = float(env.sim.mj_model.geom_friction[foot_gid, 0])
  assert (vals >= 0.4 - 1e-9).all() and (vals <= 1.0 + 1e-9).all()
  assert len(np.unique(vals)) > 4  # diverse across envs
  # Other geoms untouched.
  other_gid = env.sim.mj_model.geom("robot/base_collision").id
  np.testing.assert_allclose(
    friction[:, other_gid, 0], env.sim.mj_model.geom_friction[other_gid, 0]
  )
  del nominal


def test_randomize_field_masked_and_ops():
  env = make_env(num_envs=8)
  env.sim.expand_model_fields(("body_mass",))
  env.model = env.sim.model
  base_mass = np.asarray(env.model.body_mass)

  mask = jnp.arange(8) < 4
  asset_cfg = SceneEntityCfg("robot", body_names=("base",))
  asset_cfg.resolve(env.scene)
  mdp.randomize_field(
    env,
    mask,
    field="body_mass",
    ranges=(1.5, 1.5),
    distribution="uniform",
    operation="scale",
    asset_cfg=asset_cfg,
  )
  new_mass = np.asarray(env.model.body_mass)
  base_bid = env.sim.mj_model.body("robot/base").id
  np.testing.assert_allclose(
    new_mass[:4, base_bid], 1.5 * base_mass[:4, base_bid], rtol=1e-6
  )
  np.testing.assert_allclose(new_mass[4:, base_bid], base_mass[4:, base_bid])
  # Unselected bodies untouched everywhere.
  other = [i for i in range(new_mass.shape[1]) if i != base_bid]
  np.testing.assert_allclose(new_mass[:, other], base_mass[:, other])


def test_randomize_field_add_log_uniform():
  env = make_env(num_envs=8)
  env.sim.expand_model_fields(("dof_armature",))
  env.model = env.sim.model
  base = np.asarray(env.model.dof_armature)
  mask = jnp.ones(8, dtype=bool)
  asset_cfg = SceneEntityCfg("robot", joint_names=(".*",))
  asset_cfg.resolve(env.scene)
  mdp.randomize_field(
    env,
    mask,
    field="dof_armature",
    ranges=(0.01, 0.1),
    distribution="log_uniform",
    operation="add",
    asset_cfg=asset_cfg,
  )
  new = np.asarray(env.model.dof_armature)
  robot_dofs = np.asarray(env.scene["robot"].indexing.joint_v_adr)
  delta = new[:, robot_dofs] - base[:, robot_dofs]
  assert (delta >= 0.01 - 1e-9).all() and (delta <= 0.1 + 1e-9).all()


def test_unbatched_field_raises():
  env = make_env(num_envs=4)
  try:
    mdp.randomize_field(
      env,
      jnp.ones(4, dtype=bool),
      field="body_mass",
      ranges=(0.9, 1.1),
      operation="scale",
    )
  except RuntimeError as e:
    assert "not env-batched" in str(e)
  else:
    raise AssertionError("expected RuntimeError for unbatched field")
