"""End-to-end env smoke with the elliptic friction cone: the full manager
stack must trace, step and stay physical with cone="elliptic"."""

import dataclasses

import pytest

import jax.numpy as jnp
import numpy as np

from tests.test_env_smoke import make_env


@pytest.mark.slow  # 71s: cone math pinned fast by test_physics_elliptic
def test_env_steps_with_elliptic_cone():
  env = make_env(num_envs=2)
  # Rebuild with elliptic cone (cfg is a fresh instance per make_env call).
  cfg = env.cfg
  cfg.sim.mujoco.cone = "elliptic"
  cfg.sim.mujoco.impratio = 2.0
  from mjlab_tpu.envs import ManagerBasedRlEnv

  env = ManagerBasedRlEnv(cfg)
  env.reset()
  action = jnp.zeros((2, 2))
  for _ in range(10):
    obs, rew, term, to, extras = env.step(action)
  assert np.isfinite(np.asarray(obs["policy"])).all()
  z = np.asarray(env.state.data.qpos[:, 2])
  assert (z > 0.1).all() and (z < 1.5).all()
