"""Exporter / checkpoint tests: TorchScript export parity with the JAX
policy, embedded deployment metadata, and save/load round-trip (reference
exporter strategy, tasks/*/rl/exporter.py + rl/onnx_policy.py)."""

import numpy as np
import pytest

from mjlab_tpu.rl import PpoActorCriticCfg, PpoAlgorithmCfg, RlOnPolicyRunnerCfg
from mjlab_tpu.rl.exporter import (
  collect_robot_metadata,
  export_policy_as_torchscript,
)
from mjlab_tpu.rl.onnx_policy import TorchScriptPolicy
from mjlab_tpu.rl.runner import OnPolicyRunner
from tests.test_env_smoke import make_env


@pytest.fixture(scope="module")
def runner():
  env = make_env(num_envs=4)
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


def test_torchscript_parity_with_jax_policy(runner, tmp_path):
  path = str(tmp_path / "policy.pt")
  export_policy_as_torchscript(runner, runner.env, path)

  loaded = TorchScriptPolicy(path)
  jax_policy = runner.get_inference_policy()

  rng = np.random.default_rng(0)
  obs = rng.normal(size=(5, runner.num_actor_obs)).astype(np.float32)
  torch_act = loaded(obs)
  jax_act = np.asarray(jax_policy({"policy": obs}))
  np.testing.assert_allclose(torch_act, jax_act, rtol=1e-4, atol=1e-5)


def test_metadata_embedded(runner, tmp_path):
  path = str(tmp_path / "policy_meta.pt")
  export_policy_as_torchscript(runner, runner.env, path)
  loaded = TorchScriptPolicy(path)
  meta = loaded.metadata
  assert meta["joint_names"] == ["hip", "knee"]
  # PD gains read back from the compiled model (ActuatorCfg: kp=40, kd=2).
  np.testing.assert_allclose(meta["joint_stiffness"], [40.0, 40.0])
  np.testing.assert_allclose(meta["joint_damping"], [2.0, 2.0])
  # Default pose from the init_state keyframe → qpos0.
  np.testing.assert_allclose(meta["default_joint_pos"], [0.2, -0.4])
  assert "ang_vel" in meta["observation_names"]


def test_metadata_function_directly(runner):
  meta = collect_robot_metadata(runner.env)
  assert set(meta) == {
    "joint_names", "joint_stiffness", "joint_damping", "default_joint_pos",
    "action_scale", "observation_names", "command_names",
  }


def test_save_load_roundtrip(runner, tmp_path):
  import jax

  path = str(tmp_path / "model_0")
  runner.save(path)
  # save() also wrote the deployable policy next to the checkpoint.
  assert (tmp_path / "model_0_policy.pt").exists()

  orig = jax.device_get(runner.state.train.params)
  runner.load(path)
  reloaded = jax.device_get(runner.state.train.params)
  jax.tree_util.tree_map(np.testing.assert_array_equal, orig, reloaded)
