"""Env types (reference envs/types.py)."""

from typing import Any, Dict, Tuple

import jax

VecEnvObs = Dict[str, Any]
# (obs, reward, terminated, truncated, extras)
VecEnvStepReturn = Tuple[VecEnvObs, jax.Array, jax.Array, jax.Array, dict]
