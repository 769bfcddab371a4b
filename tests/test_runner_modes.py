"""Runner rollout-mode equivalence: the host-loop rollout must produce the
same training math as the fused lax.scan rollout (identical RNG stream)."""

import jax
import numpy as np
import pytest

from mjlab_tpu.rl import PpoActorCriticCfg, PpoAlgorithmCfg, RlOnPolicyRunnerCfg
from mjlab_tpu.rl.runner import OnPolicyRunner
from tests.test_env_smoke import make_env


def _runner(fused: bool, rollout_chunk: int = 1, epoch_chunk: bool = False,
            epochs: int = 1, minibatches: int = 1,
            packed_hostloop: bool = False):
  env = make_env(num_envs=4, seed=3)
  cfg = RlOnPolicyRunnerCfg(
    seed=0,
    num_steps_per_env=3,
    fused_rollout=fused,
    rollout_chunk=rollout_chunk,
    epoch_chunk=epoch_chunk,
    packed_hostloop=packed_hostloop,
    policy=PpoActorCriticCfg(
      actor_hidden_dims=(16, 16),
      critic_hidden_dims=(16, 16),
      actor_obs_normalization=True,
      critic_obs_normalization=True,
    ),
    algorithm=PpoAlgorithmCfg(
      num_learning_epochs=epochs, num_mini_batches=minibatches
    ),
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


@pytest.mark.slow  # 82s: fast gate keeps test_hostloop_matches_fused
def test_packed_hostloop_matches_unpacked():
  """packed_hostloop (flat-buffer rollout carry) must be math-identical,
  including composed with rollout_chunk."""
  base = _runner(fused=False)
  packed = _runner(fused=False, packed_hostloop=True, rollout_chunk=2)

  sb, mb = base._train_iter(base.state)
  sp, mp = packed._train_iter(packed.state)

  for k in mb:
    np.testing.assert_allclose(
      np.asarray(mb[k]), np.asarray(mp[k]), rtol=1e-4, atol=1e-6,
      err_msg=f"metric {k} diverged between packed and unpacked",
    )
  np.testing.assert_allclose(
    np.asarray(sb.env_state.data.qpos),
    np.asarray(sp.env_state.data.qpos),
    rtol=1e-6,
  )


@pytest.mark.slow  # 60s: fast gate keeps test_hostloop_matches_fused
def test_chunked_hostloop_matches_unchunked():
  """rollout_chunk (unrolled multi-step programs, incl. a T%k remainder)
  and epoch_chunk (one program per PPO epoch) must be math-identical to
  the per-step/per-minibatch host loop."""
  base = _runner(fused=False, epochs=2, minibatches=2)
  chunked = _runner(
    fused=False, rollout_chunk=2, epoch_chunk=True, epochs=2, minibatches=2
  )  # T=3, k=2 → one chunk call + one remainder single

  sb, mb = base._train_iter(base.state)
  sc, mc = chunked._train_iter(chunked.state)

  for k in mb:
    np.testing.assert_allclose(
      np.asarray(mb[k]), np.asarray(mc[k]), rtol=1e-4, atol=1e-6,
      err_msg=f"metric {k} diverged between chunked and unchunked",
    )
  jax.tree_util.tree_map(
    lambda a, b: np.testing.assert_allclose(
      np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
    ),
    jax.device_get(sb.train.params),
    jax.device_get(sc.train.params),
  )
  np.testing.assert_allclose(
    np.asarray(sb.env_state.data.qpos),
    np.asarray(sc.env_state.data.qpos),
    rtol=1e-6,
  )
