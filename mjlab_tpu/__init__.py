"""mjlab_tpu: Isaac Lab API powered by a TPU-native JAX physics engine.

TPU-native rebuild of the reference `menloresearch/asimov-mjlab` stack
(reference layering: /root/reference/src/mjlab/__init__.py). The CUDA column
(mujoco_warp + warp-lang + torch) is replaced by a JAX/XLA batched physics
engine and pure-functional manager layer; see ARCHITECTURE.md.
"""

from pathlib import Path

MJLAB_SRC_PATH = Path(__file__).parent
MJLAB_ROOT_PATH = MJLAB_SRC_PATH.parent

__version__ = "0.1.0"
