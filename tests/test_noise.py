"""Noise config / noise model tests (reference utils/noise surface)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils.noise import (
  ConstantNoiseCfg,
  GaussianNoiseCfg,
  NoiseModel,
  NoiseModelCfg,
  NoiseModelWithAdditiveBias,
  NoiseModelWithAdditiveBiasCfg,
  UniformNoiseCfg,
)


def _data():
  return jnp.ones((8, 4), dtype=jnp.float32) * 2.0


class TestNoiseCfg:
  def test_constant_ops(self):
    key = jax.random.PRNGKey(0)
    d = _data()
    np.testing.assert_allclose(
      ConstantNoiseCfg(bias=0.5, operation="add").apply(key, d), 2.5
    )
    np.testing.assert_allclose(
      ConstantNoiseCfg(bias=0.5, operation="scale").apply(key, d), 1.0
    )
    np.testing.assert_allclose(
      ConstantNoiseCfg(bias=0.5, operation="abs").apply(key, d), 0.5
    )

  def test_uniform_range(self):
    key = jax.random.PRNGKey(1)
    out = UniformNoiseCfg(n_min=-0.1, n_max=0.1).apply(key, _data())
    delta = np.asarray(out) - 2.0
    assert (np.abs(delta) <= 0.1 + 1e-6).all()
    assert np.std(delta) > 0  # actually random

  def test_uniform_scale(self):
    key = jax.random.PRNGKey(2)
    out = UniformNoiseCfg(n_min=0.5, n_max=1.5, operation="scale").apply(
      key, _data()
    )
    assert (np.asarray(out) >= 1.0 - 1e-6).all()
    assert (np.asarray(out) <= 3.0 + 1e-6).all()

  def test_gaussian_stats(self):
    key = jax.random.PRNGKey(3)
    d = jnp.zeros((2000,), dtype=jnp.float32)
    out = np.asarray(GaussianNoiseCfg(mean=1.0, std=0.5).apply(key, d))
    assert abs(out.mean() - 1.0) < 0.05
    assert abs(out.std() - 0.5) < 0.05

  def test_deterministic_given_key(self):
    key = jax.random.PRNGKey(4)
    a = UniformNoiseCfg().apply(key, _data())
    b = UniformNoiseCfg().apply(key, _data())
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNoiseModel:
  def test_stateless_passthrough(self):
    model = NoiseModel(NoiseModelCfg(), num_envs=8)
    state = model.init_state(_data())
    out = model.apply(state, jax.random.PRNGKey(0), _data())
    np.testing.assert_allclose(np.asarray(out), 2.0)

  def test_additive_bias_episode_constant(self):
    """Bias is zero at init, resampled on reset for masked envs only, and
    constant between resets (reference noise_model.py:35-84)."""
    cfg = NoiseModelWithAdditiveBiasCfg(
      noise_cfg=None,
      bias_noise_cfg=UniformNoiseCfg(n_min=-1.0, n_max=1.0),
    )
    model = NoiseModelWithAdditiveBias(cfg, num_envs=8)
    state = model.init_state(_data())
    assert state["bias"].shape == (8, 4)
    np.testing.assert_allclose(np.asarray(state["bias"]), 0.0)

    # Reset envs 0-3 only.
    mask = jnp.arange(8) < 4
    state = model.reset(state, jax.random.PRNGKey(1), mask)
    bias = np.asarray(state["bias"])
    assert (bias[:4] != 0).any()
    np.testing.assert_allclose(bias[4:], 0.0)

    # apply() adds the bias and does not mutate it.
    out1 = model.apply(state, jax.random.PRNGKey(2), _data())
    out2 = model.apply(state, jax.random.PRNGKey(3), _data())
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2))
    np.testing.assert_allclose(np.asarray(out1), 2.0 + bias, rtol=1e-6)

    # Second reset with a fresh key changes only the masked rows.
    mask2 = jnp.arange(8) >= 6
    state2 = model.reset(state, jax.random.PRNGKey(9), mask2)
    bias2 = np.asarray(state2["bias"])
    np.testing.assert_allclose(bias2[:6], bias[:6])
    assert (bias2[6:] != bias[6:]).any()

  def test_additive_bias_with_per_step_noise(self):
    cfg = NoiseModelWithAdditiveBiasCfg(
      noise_cfg=ConstantNoiseCfg(bias=1.0, operation="add"),
      bias_noise_cfg=ConstantNoiseCfg(bias=0.25, operation="abs"),
    )
    model = NoiseModelWithAdditiveBias(cfg, num_envs=8)
    state = model.init_state(_data())
    state = model.reset(state, jax.random.PRNGKey(0), jnp.ones(8, bool))
    out = model.apply(state, jax.random.PRNGKey(1), _data())
    np.testing.assert_allclose(np.asarray(out), 2.0 + 1.0 + 0.25)
