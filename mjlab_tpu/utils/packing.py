"""Pytree packing: collapse many small leaves into a few flat buffers.

On the tunneled-TPU relay, per-leaf argument/result marshaling dominates
small-program dispatch (docs/PERF_NOTES.md: a 162-leaf output costs
0.55 ms/call where one array costs 0.14 ms). The env step threads ~80
state leaves and returns ~114, but >99% of the BYTES live in ~10 large
leaves (efc_J, contact pools, qM) — so packing the long tail of small
leaves into one buffer per dtype cuts the leaf count ~6× while copying
only ~1% of the state.

`build_packer(template)` returns (pack, unpack) closing over the static
layout. Both are pure jittable functions; inside a jit XLA fuses the
ravel/concat/slice/reshape shuffling, and on real hardware the copies are
bandwidth-negligible (the packed tail is tiny by construction).

PRNG-key leaves and leaves larger than `big_threshold` elements stay
unpacked (keys have an opaque extended dtype; big leaves would turn the
cheap tail copy into a full state copy).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

_GROUPS = ("f32", "f64", "i32", "u32", "bool")

_DTYPE_TO_GROUP = {
  np.dtype(np.float32): "f32",
  np.dtype(np.float64): "f64",
  np.dtype(np.int32): "i32",
  np.dtype(np.uint32): "u32",
  np.dtype(np.bool_): "bool",
}

_GROUP_DTYPE = {
  "f32": jnp.float32,
  "f64": jnp.float64,
  "i32": jnp.int32,
  "u32": jnp.uint32,
  "bool": jnp.bool_,
}


@dataclasses.dataclass(frozen=True)
class _Layout:
  treedef: Any
  n_leaves: int
  # Per-leaf routing: ("group", offset, size, shape) or ("passthrough", k).
  routes: tuple
  group_sizes: dict
  n_pass: int


def build_packer(
  template, big_threshold: int = 1 << 16
) -> tuple[Callable, Callable]:
  """Static packer for pytrees shaped like `template`.

  pack(tree)   -> (buffers_dict, passthrough_tuple)
  unpack(pair) -> tree
  """
  flat, treedef = jax.tree_util.tree_flatten(template)
  routes = []
  offsets = {g: 0 for g in _GROUPS}
  n_pass = 0
  for leaf in flat:
    dtype = getattr(leaf, "dtype", None)
    is_key = dtype is not None and jax.dtypes.issubdtype(
      dtype, jax.dtypes.prng_key
    )
    size = int(np.prod(np.shape(leaf))) if np.shape(leaf) else 1
    group = None if is_key else _DTYPE_TO_GROUP.get(np.dtype(dtype))
    if group is None or size > big_threshold:
      routes.append(("passthrough", n_pass))
      n_pass += 1
    else:
      routes.append((group, offsets[group], size, np.shape(leaf)))
      offsets[group] += size
  layout = _Layout(
    treedef=treedef,
    n_leaves=len(flat),
    routes=tuple(routes),
    group_sizes=dict(offsets),
    n_pass=n_pass,
  )

  def pack(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    assert len(leaves) == layout.n_leaves, (
      f"packer built for {layout.n_leaves} leaves, got {len(leaves)}"
    )
    parts = {g: [] for g in _GROUPS}
    passthrough = [None] * layout.n_pass
    for leaf, route in zip(leaves, layout.routes):
      if route[0] == "passthrough":
        passthrough[route[1]] = leaf
      else:
        g = route[0]
        parts[g].append(jnp.ravel(jnp.asarray(leaf)))
    buffers = {
      g: (jnp.concatenate(parts[g]) if parts[g]
          else jnp.zeros(0, dtype=_GROUP_DTYPE[g]))
      for g in _GROUPS
      if layout.group_sizes[g]
    }
    return buffers, tuple(passthrough)

  def unpack(packed):
    buffers, passthrough = packed
    leaves = []
    for route in layout.routes:
      if route[0] == "passthrough":
        leaves.append(passthrough[route[1]])
      else:
        g, off, size, shape = route
        leaves.append(jnp.reshape(buffers[g][off : off + size], shape))
    return jax.tree_util.tree_unflatten(layout.treedef, leaves)

  return pack, unpack
