"""Deployable policy export with embedded robot metadata.

The reference exports each checkpoint as ONNX with deployment metadata
(joint names, stiffness/damping from the compiled model, default pose,
obs/command names, action scale) embedded in the graph
(reference tasks/velocity/rl/exporter.py:35-66,
third_party/.../rsl_rl/exporter.py:124). Here the policy (MLP + running
normalizer) is rebuilt in torch from the JAX params and exported as
TorchScript (always) and ONNX (when torch's exporter stack is available);
metadata travels as extra_files / metadata_props.
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np


def _flax_mlp_to_torch(params: dict, activation: str):
  import torch
  import torch.nn as nn

  acts = {"elu": nn.ELU, "relu": nn.ReLU, "tanh": nn.Tanh, "gelu": nn.GELU,
          "selu": nn.SELU, "swish": nn.SiLU}
  dense_keys = sorted(
    (k for k in params if k.startswith("Dense_")), key=lambda k: int(k[6:])
  )
  layers: list[nn.Module] = []
  for i, k in enumerate(dense_keys):
    kernel = np.asarray(params[k]["kernel"])
    bias = np.asarray(params[k]["bias"])
    lin = nn.Linear(kernel.shape[0], kernel.shape[1])
    with torch.no_grad():
      lin.weight.copy_(torch.from_numpy(kernel.T.copy()))
      lin.bias.copy_(torch.from_numpy(bias.copy()))
    layers.append(lin)
    if i < len(dense_keys) - 1:
      layers.append(acts[activation]())
  return nn.Sequential(*layers)


def build_torch_actor(runner) -> "Any":
  """Torch module computing act = actor(normalize(obs)) from runner state."""
  import torch
  import torch.nn as nn

  params = runner.state.train.params["params"]
  actor = _flax_mlp_to_torch(params["actor"], runner.ac.activation)
  norm = runner.state.actor_norm

  class Policy(nn.Module):
    def __init__(self):
      super().__init__()
      self.actor = actor
      self.register_buffer("mean", torch.from_numpy(np.array(norm.mean)))
      self.register_buffer("var", torch.from_numpy(np.array(norm.var)))

    def forward(self, obs):
      x = (obs - self.mean) / torch.sqrt(self.var + 1e-8)
      return self.actor(x)

  return Policy().eval()


def collect_robot_metadata(env, action_term_name: str = "joint_pos") -> dict:
  """Deployment metadata read back from the compiled model
  (reference tasks/velocity/rl/exporter.py:35-66)."""
  robot = env.scene["robot"]
  mj_model = env.sim.mj_model
  import mujoco

  joint_names = list(robot.joint_names)
  kp, kd, default_pose = [], [], []
  # Default pose = the entity's init_state keyframe (authored by the Entity
  # layer), not qpos0 — keyframes don't rewrite qpos0.
  key_id = mujoco.mj_name2id(
    mj_model, mujoco.mjtObj.mjOBJ_KEY, "robot/init_state"
  )
  qpos0 = np.asarray(
    mj_model.key_qpos[key_id] if key_id >= 0 else mj_model.qpos0
  )
  for name in joint_names:
    aid = mujoco.mj_name2id(
      mj_model, mujoco.mjtObj.mjOBJ_ACTUATOR, f"robot/{name}"
    )
    if aid >= 0:
      kp.append(float(mj_model.actuator_gainprm[aid, 0]))
      kd.append(float(-mj_model.actuator_biasprm[aid, 2]))
    else:
      kp.append(0.0)
      kd.append(0.0)
    jid = mujoco.mj_name2id(mj_model, mujoco.mjtObj.mjOBJ_JOINT, f"robot/{name}")
    default_pose.append(float(qpos0[mj_model.jnt_qposadr[jid]]))

  term = env.action_manager.get_term(action_term_name)
  scale = np.asarray(getattr(term, "_scale", 1.0)).tolist()
  obs_names = list(env.observation_manager.active_terms.get("policy", []))
  cmd_names = list(env.command_manager.active_terms)
  return {
    "joint_names": joint_names,
    "joint_stiffness": kp,
    "joint_damping": kd,
    "default_joint_pos": default_pose,
    "action_scale": scale,
    "observation_names": obs_names,
    "command_names": cmd_names,
  }


def export_policy_as_torchscript(runner, env, path: str,
                                 metadata: dict | None = None) -> str:
  import torch

  policy = build_torch_actor(runner)
  example = torch.zeros(1, runner.num_actor_obs)
  scripted = torch.jit.trace(policy, example)
  meta = metadata or collect_robot_metadata(env)
  os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
  torch.jit.save(
    scripted, path, _extra_files={"metadata.json": json.dumps(meta)}
  )
  return path


def export_policy_as_onnx(runner, env, path: str,
                          metadata: dict | None = None) -> str | None:
  """ONNX export with metadata_props; returns None when the ONNX stack is
  unavailable in the environment."""
  import torch

  policy = build_torch_actor(runner)
  example = torch.zeros(1, runner.num_actor_obs)
  os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
  try:
    torch.onnx.export(
      policy, (example,), path, input_names=["obs"], output_names=["action"],
      dynamo=False,
    )
  except Exception as e:
    print(f"[exporter] ONNX export unavailable ({e}); TorchScript only.")
    return None
  try:
    import onnx

    model = onnx.load(path)
    meta = metadata or collect_robot_metadata(env)
    for key, value in meta.items():
      entry = model.metadata_props.add()
      entry.key = key
      entry.value = json.dumps(value)
    onnx.save(model, path)
  except ImportError:
    pass
  return path
