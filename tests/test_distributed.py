"""Env-axis sharding over a multi-device mesh (8 virtual CPU devices).

Validates the BASELINE multi-chip contract: the fused train step compiles
and executes with the env state sharded across devices, learner params
replicated, and produces the same numbers as the unsharded run (XLA
inserts the cross-device collectives)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def _make_runner(num_envs: int):
  import __graft_entry__
  from mjlab_tpu.rl import PpoActorCriticCfg, PpoAlgorithmCfg, RlOnPolicyRunnerCfg
  from mjlab_tpu.rl.runner import OnPolicyRunner

  env = __graft_entry__._small_biped_env(num_envs, dtype="float32")
  cfg = RlOnPolicyRunnerCfg(
    seed=0,
    num_steps_per_env=2,
    policy=PpoActorCriticCfg(
      actor_hidden_dims=(16, 16),
      critic_hidden_dims=(16, 16),
      actor_obs_normalization=True,
      critic_obs_normalization=True,
    ),
    algorithm=PpoAlgorithmCfg(num_learning_epochs=1, num_mini_batches=1),
  )
  return OnPolicyRunner(env, cfg)


@pytest.mark.slow
def test_sharded_train_step_matches_unsharded():
  assert len(jax.devices()) >= 8, "conftest must configure 8 virtual devices"
  from mjlab_tpu.distributed import make_env_mesh, shard_batched_pytree

  num_envs = 16
  runner = _make_runner(num_envs)

  # Unsharded reference step.
  base_state = jax.tree_util.tree_map(lambda x: x, runner.state)
  ref_state, ref_metrics = runner._train_iter(base_state)
  ref = {k: np.asarray(v) for k, v in ref_metrics.items()}

  # Sharded step from the same initial state.
  runner2 = _make_runner(num_envs)
  mesh = make_env_mesh(8)
  with mesh:
    sharded = shard_batched_pytree(runner2.state, mesh, num_envs)
    # Confirm the env-batched leaves actually shard.
    qpos_sharding = sharded.env_state.data.qpos.sharding
    assert len(qpos_sharding.device_set) == 8
    out_state, metrics = runner2._train_iter(sharded)
    jax.block_until_ready(out_state.train.params)

  got = {k: np.asarray(v) for k, v in metrics.items()}
  for k in ("Loss/loss", "Loss/kl", "Train/mean_step_reward"):
    np.testing.assert_allclose(got[k], ref[k], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
  import __graft_entry__

  __graft_entry__.dryrun_multichip(8)
