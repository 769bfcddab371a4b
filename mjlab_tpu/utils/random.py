"""Global seeding (reference utils/random.py:9-26).

JAX randomness is explicit (keys threaded through env state), so unlike the
reference there is no hidden device RNG to seed; this seeds the host-side
generators used for terrain generation, numpy-based init, and any torch
export paths. The env itself is bit-reproducible from EnvState.rng.
"""

from __future__ import annotations

import os
import random

import numpy as np


def seed_rng(seed: int) -> None:
  os.environ["PYTHONHASHSEED"] = str(seed)
  random.seed(seed)
  np.random.seed(seed)
  try:
    import torch

    torch.manual_seed(seed)
  except ImportError:
    pass
