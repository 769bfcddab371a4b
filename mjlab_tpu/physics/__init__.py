"""TPU-native batched physics engine (MJX-style, written from scratch).

Replaces the reference's mujoco_warp CUDA backend (reference sim/sim.py:97-199).
The engine is written single-world in JAX and `vmap`ed over the env axis; model
structure (`Topology`) is host-side numpy baked into the trace, model parameters
(`Model`) and state (`Data`) are jnp pytrees.
"""

from mjlab_tpu.physics.types import Contact, Data, Model, Option, Topology
from mjlab_tpu.physics.io import put_model, make_data
from mjlab_tpu.physics.forward import forward, step

__all__ = [
  "Contact",
  "Data",
  "Model",
  "Option",
  "Topology",
  "put_model",
  "make_data",
  "forward",
  "step",
]
