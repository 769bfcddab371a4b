"""Deployed-policy inference wrappers (reference rl/onnx_policy.py:7-85).

OnnxPolicy requires onnxruntime; TorchScriptPolicy loads the .pt exports
from rl/exporter.py. Both expose the same `__call__(obs) → action` and the
embedded deployment metadata."""

from __future__ import annotations

import json

import numpy as np


class TorchScriptPolicy:
  def __init__(self, path: str) -> None:
    import torch

    extra = {"metadata.json": ""}
    self._module = torch.jit.load(path, _extra_files=extra)
    self._module.eval()
    self.metadata = json.loads(extra["metadata.json"]) if extra[
      "metadata.json"
    ] else {}
    self._torch = torch

  def __call__(self, obs: np.ndarray) -> np.ndarray:
    t = self._torch.from_numpy(np.asarray(obs, dtype=np.float32))
    with self._torch.no_grad():
      return self._module(t).numpy()


class OnnxPolicy:
  def __init__(self, path: str) -> None:
    try:
      import onnxruntime as ort
    except ImportError as e:
      raise ImportError(
        "onnxruntime is required for OnnxPolicy; use TorchScriptPolicy for "
        ".pt exports."
      ) from e
    self._session = ort.InferenceSession(path)
    meta = self._session.get_modelmeta().custom_metadata_map
    self.metadata = {k: json.loads(v) for k, v in meta.items()}
    self._input = self._session.get_inputs()[0].name

  def __call__(self, obs: np.ndarray) -> np.ndarray:
    out = self._session.run(None, {self._input: np.asarray(obs, np.float32)})
    return out[0]
