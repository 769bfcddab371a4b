"""Velocity-task terminations (reference tasks/velocity/mdp/terminations.py)."""

from __future__ import annotations

from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp

if TYPE_CHECKING:
  from mjlab_tpu.envs.manager_based_rl_env import ManagerBasedRlEnv


def illegal_contact(env: "ManagerBasedRlEnv", sensor_name: str) -> jax.Array:
  """Terminate when the given contact sensor reports any contact."""
  sensor = env.scene[sensor_name]
  return jnp.any(sensor.data.found > 0, axis=-1)
