"""Device-mesh sharding of the env batch.

The reference is single-process single-GPU with zero collectives
(SURVEY §2.10); scaling here is net-new and TPU-native: env state and
rollout buffers shard along the env axis of a `jax.sharding.Mesh`, learner
parameters stay replicated, and XLA inserts the psum/all-gather collectives
for batch reductions (losses, metrics) over ICI. Multi-host extends the
same mesh via jax.distributed.initialize(); DCN is only crossed at process
bootstrap and checkpoint I/O.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_env_mesh(
  n_devices: int | None = None, axis_name: str = "env"
) -> Mesh:
  devices = jax.devices()
  if n_devices is not None:
    devices = devices[:n_devices]
  return Mesh(np.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batched_pytree(
  tree: Any, mesh: Mesh, batch_size: int, axis_name: str = "env"
) -> Any:
  """device_put every leaf: leading-dim==batch_size leaves shard along the
  env axis, everything else (model constants, params, counters) replicates."""
  env_sharding = NamedSharding(mesh, P(axis_name))
  rep = replicated(mesh)

  def place(x):
    arr = x
    if hasattr(arr, "shape") and arr.ndim >= 1 and arr.shape[0] == batch_size:
      spec = P(axis_name, *([None] * (arr.ndim - 1)))
      return jax.device_put(arr, NamedSharding(mesh, spec))
    return jax.device_put(arr, rep)

  return jax.tree_util.tree_map(place, tree)
