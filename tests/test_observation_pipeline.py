"""Observation-manager pipeline tests with a mock env (reference
tests/test_observation_history.py / test_observation_delay.py strategy:
pure-Python manager logic does not need physics).

Verifies the per-term pipeline order compute → noise → clip → scale →
delay → history (reference observation_manager.py:164-190, order documented
manager_term_config.py:94), shape inference, grouping, and reset semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.managers.manager_term_config import (
  ObservationGroupCfg,
  ObservationTermCfg,
)
from mjlab_tpu.managers.observation_manager import ObservationManager
from mjlab_tpu.utils.noise import (
  ConstantNoiseCfg,
  NoiseModelWithAdditiveBias,
  NoiseModelWithAdditiveBiasCfg,
  UniformNoiseCfg,
)

NUM_ENVS = 4


class MockEnv:
  """Implements the state-context protocol used by managers
  (envs/manager_based_env.py:101-144)."""

  def __init__(self, num_envs=NUM_ENVS):
    self.num_envs = num_envs
    self.dtype = jnp.float32
    self._ms = {}
    self._rng = jax.random.key(0)
    self.counter = 0.0  # terms read this

  def ns(self, name):
    return self._ms.setdefault(name, {})

  def next_key(self):
    self._rng, key = jax.random.split(self._rng)
    return key


def counter_obs(env):
  return jnp.full((env.num_envs, 2), env.counter, dtype=env.dtype)


def make_manager(term_cfg: ObservationTermCfg, env=None, **group_kwargs):
  env = env or MockEnv()
  cfg = {"policy": ObservationGroupCfg(
    terms={"t": term_cfg}, **group_kwargs)}
  return ObservationManager(cfg, env), env


def test_pipeline_order_clip_then_scale():
  """clip happens BEFORE scale: value 5 with clip (-1,1) and scale 10 gives
  10, not clip(50)=1."""
  mgr, env = make_manager(
    ObservationTermCfg(func=counter_obs, clip=(-1.0, 1.0), scale=10.0)
  )
  env.counter = 5.0
  out = mgr.compute()["policy"]
  np.testing.assert_allclose(np.asarray(out), 10.0)


def test_noise_before_clip():
  """Large constant additive noise is clipped away → noise runs before clip."""
  mgr, env = make_manager(
    ObservationTermCfg(
      func=counter_obs,
      noise=ConstantNoiseCfg(bias=100.0, operation="add"),
      clip=(-1.0, 1.0),
    ),
    enable_corruption=True,
  )
  env.counter = 0.0
  out = mgr.compute()["policy"]
  np.testing.assert_allclose(np.asarray(out), 1.0)


def test_corruption_disabled_strips_noise():
  mgr, env = make_manager(
    ObservationTermCfg(
      func=counter_obs, noise=UniformNoiseCfg(n_min=-5, n_max=5)
    ),
    enable_corruption=False,
  )
  env.counter = 2.0
  out = mgr.compute()["policy"]
  np.testing.assert_allclose(np.asarray(out), 2.0)


def test_history_backfill_and_update():
  """First compute backfills history; later computes shift; update_history
  False reads without appending."""
  mgr, env = make_manager(
    ObservationTermCfg(func=counter_obs, history_length=3)
  )
  env.counter = 1.0
  out1 = mgr.compute(update_history=True)["policy"]
  # Backfill: all 3 slots hold the first value → (B, 6).
  assert out1.shape == (NUM_ENVS, 6)
  np.testing.assert_allclose(np.asarray(out1), 1.0)

  env.counter = 2.0
  out2 = mgr.compute(update_history=True)["policy"]
  # Oldest→newest flattening: [1, 1, 2] per feature pair.
  np.testing.assert_allclose(np.asarray(out2[0]), [1, 1, 1, 1, 2, 2])

  env.counter = 9.0
  out3 = mgr.compute(update_history=False)["policy"]
  np.testing.assert_allclose(np.asarray(out3[0]), [1, 1, 1, 1, 2, 2])


def test_history_reset_masked():
  mgr, env = make_manager(
    ObservationTermCfg(func=counter_obs, history_length=2)
  )
  env.counter = 3.0
  mgr.compute(update_history=True)
  mask = jnp.asarray([True, False, False, False])
  mgr.reset(mask)
  env.counter = 7.0
  out = mgr.compute(update_history=True)["policy"]
  # Env 0 backfills with 7; env 1 keeps [3, 7].
  np.testing.assert_allclose(np.asarray(out[0]), [7, 7, 7, 7])
  np.testing.assert_allclose(np.asarray(out[1]), [3, 3, 7, 7])


def test_delay_holds_stale_values():
  """A fixed lag of 1 returns the previous step's value."""
  mgr, env = make_manager(
    ObservationTermCfg(func=counter_obs, delay_min_lag=1, delay_max_lag=1)
  )
  env.counter = 1.0
  mgr.compute(update_history=True)
  env.counter = 2.0
  out = mgr.compute(update_history=True)["policy"]
  np.testing.assert_allclose(np.asarray(out), 1.0)


def test_noise_model_state_in_namespace():
  """NoiseModelWithAdditiveBias keeps bias state in the manager namespace and
  resamples it only on reset."""
  mgr, env = make_manager(
    ObservationTermCfg(
      func=counter_obs,
      noise=NoiseModelWithAdditiveBiasCfg(
        noise_cfg=None,
        bias_noise_cfg=UniformNoiseCfg(n_min=0.5, n_max=1.5),
      ),
    ),
    enable_corruption=True,
  )
  state = env.ns("observation")["noise"]["policy/t"]
  np.testing.assert_allclose(np.asarray(state["bias"]), 0.0)
  env.counter = 1.0
  out0 = mgr.compute()["policy"]
  np.testing.assert_allclose(np.asarray(out0), 1.0)

  mgr.reset(jnp.ones(NUM_ENVS, dtype=bool))
  bias = np.asarray(env.ns("observation")["noise"]["policy/t"]["bias"])
  assert (bias >= 0.5).all() and (bias <= 1.5).all()
  out1 = mgr.compute()["policy"]
  np.testing.assert_allclose(np.asarray(out1), 1.0 + bias, rtol=1e-6)


def test_group_shapes_and_no_concat():
  env = MockEnv()
  cfg = {
    "policy": ObservationGroupCfg(
      terms={
        "a": ObservationTermCfg(func=counter_obs),
        "b": ObservationTermCfg(func=counter_obs, history_length=2),
      }
    ),
    "critic": ObservationGroupCfg(
      terms={"a": ObservationTermCfg(func=counter_obs)},
      concatenate_terms=False,
    ),
  }
  mgr = ObservationManager(cfg, env)
  assert mgr.group_obs_dim["policy"] == (2 + 4,)
  out = mgr.compute(update_history=True)
  assert out["policy"].shape == (NUM_ENVS, 6)
  assert isinstance(out["critic"], dict) and out["critic"]["a"].shape == (
    NUM_ENVS, 2,
  )


def test_group_level_history_override():
  """Group history_length overrides per-term settings (reference
  observation_manager.py group cfg semantics)."""
  env = MockEnv()
  cfg = {
    "policy": ObservationGroupCfg(
      terms={"a": ObservationTermCfg(func=counter_obs, history_length=5)},
      history_length=2,
    )
  }
  mgr = ObservationManager(cfg, env)
  assert mgr.group_obs_dim["policy"] == (4,)
