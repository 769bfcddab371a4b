"""Runner rollout-mode equivalence: the host-loop rollout must produce the
same training math as the fused lax.scan rollout (identical RNG stream)."""

import jax
import numpy as np

from mjlab_tpu.rl import PpoActorCriticCfg, PpoAlgorithmCfg, RlOnPolicyRunnerCfg
from mjlab_tpu.rl.runner import OnPolicyRunner
from tests.test_env_smoke import make_env


def _runner(fused: bool):
  env = make_env(num_envs=4, seed=3)
  cfg = RlOnPolicyRunnerCfg(
    seed=0,
    num_steps_per_env=3,
    fused_rollout=fused,
    policy=PpoActorCriticCfg(
      actor_hidden_dims=(16, 16),
      critic_hidden_dims=(16, 16),
      actor_obs_normalization=True,
      critic_obs_normalization=True,
    ),
    algorithm=PpoAlgorithmCfg(num_learning_epochs=1, num_mini_batches=1),
  )
  return OnPolicyRunner(env, cfg)


def test_hostloop_matches_fused():
  fused = _runner(fused=True)
  hostloop = _runner(fused=False)

  sf, mf = fused._train_iter(fused.state)
  sh, mh = hostloop._train_iter(hostloop.state)

  for k in mf:
    np.testing.assert_allclose(
      np.asarray(mf[k]), np.asarray(mh[k]), rtol=1e-4, atol=1e-6,
      err_msg=f"metric {k} diverged between rollout modes",
    )
  # Updated parameters agree.
  jax.tree_util.tree_map(
    lambda a, b: np.testing.assert_allclose(
      np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
    ),
    jax.device_get(sf.train.params),
    jax.device_get(sh.train.params),
  )
  # Env states advanced identically.
  np.testing.assert_allclose(
    np.asarray(sf.env_state.data.qpos),
    np.asarray(sh.env_state.data.qpos),
    rtol=1e-6,
  )
