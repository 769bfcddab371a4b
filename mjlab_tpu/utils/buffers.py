"""Functional ring/delay buffers (obs history + stochastic sensor latency).

State is an explicit dict pytree threaded through the env state. Semantics
mirror the reference's utils/buffers (circular_buffer.py, delay_buffer.py):
  * CircularBuffer: batched ring buffer with BACKFILL — the first append
    after a reset fills every slot with that value (circular_buffer.py:21-72).
  * DelayBuffer: per-env (or shared) integer lag in [min_lag, max_lag] with
    temporal correlation (hold_prob) and periodic refresh with per-env phase
    stagger (delay_buffer.py:17-118).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class CircularBuffer:
  """max_len ring buffer over (B, ...) features; oldest-first view."""

  def __init__(self, max_len: int, batch_size: int):
    assert max_len > 0
    self.max_len = max_len
    self.batch_size = batch_size

  def init_state(self, example: jax.Array) -> dict:
    buf = jnp.zeros(
      (self.batch_size, self.max_len) + example.shape[1:], dtype=example.dtype
    )
    return {"buffer": buf, "count": jnp.zeros(self.batch_size, dtype=jnp.int32)}

  def append(self, state: dict, x: jax.Array) -> dict:
    buf, count = state["buffer"], state["count"]
    pos = count % self.max_len
    b = jnp.arange(self.batch_size)
    updated = buf.at[b, pos].set(x)
    # Backfill: first append after reset fills all slots.
    fresh = (count == 0).reshape((-1,) + (1,) * (buf.ndim - 1))
    backfilled = jnp.broadcast_to(x[:, None], buf.shape)
    return {
      "buffer": jnp.where(fresh, backfilled, updated),
      "count": count + 1,
    }

  def buffer(self, state: dict) -> jax.Array:
    """Ordered view (B, L, ...) oldest → newest."""
    buf, count = state["buffer"], state["count"]
    idx = (count[:, None] + jnp.arange(self.max_len)[None]) % self.max_len
    return jnp.take_along_axis(
      buf, idx.reshape(idx.shape + (1,) * (buf.ndim - 2)), axis=1
    )

  def latest(self, state: dict, lag: jax.Array) -> jax.Array:
    """Value `lag` steps back (clamped to available history)."""
    buf, count = state["buffer"], state["count"]
    lag = jnp.minimum(lag, jnp.maximum(count - 1, 0))
    pos = (count - 1 - lag) % self.max_len
    b = jnp.arange(self.batch_size)
    return buf[b, pos]

  def reset(self, state: dict, env_mask=None) -> dict:
    if env_mask is None:
      return {
        "buffer": state["buffer"],
        "count": jnp.zeros_like(state["count"]),
      }
    return {
      "buffer": state["buffer"],
      "count": jnp.where(env_mask, 0, state["count"]),
    }


class DelayBuffer:
  """Stochastic integer-lag delay line over a CircularBuffer."""

  def __init__(
    self,
    min_lag: int,
    max_lag: int,
    batch_size: int,
    per_env: bool = True,
    hold_prob: float = 0.0,
    update_period: int = 0,
    per_env_phase: bool = True,
  ):
    assert 0 <= min_lag <= max_lag
    self.min_lag = min_lag
    self.max_lag = max_lag
    self.batch_size = batch_size
    self.per_env = per_env
    self.hold_prob = hold_prob
    self.update_period = update_period
    self.per_env_phase = per_env_phase
    self.ring = CircularBuffer(max_lag + 1, batch_size)

  def init_state(self, example: jax.Array, key: jax.Array) -> dict:
    lags = self._sample_lags(key)
    phase_key = jax.random.fold_in(key, 1)
    if self.update_period > 0 and self.per_env_phase:
      phase = jax.random.randint(
        phase_key, (self.batch_size,), 0, self.update_period
      )
    else:
      phase = jnp.zeros(self.batch_size, dtype=jnp.int32)
    return {
      "ring": self.ring.init_state(example),
      "lags": lags,
      "phase": phase,
      "steps": jnp.zeros(self.batch_size, dtype=jnp.int32),
    }

  def _sample_lags(self, key: jax.Array) -> jax.Array:
    if self.per_env:
      return jax.random.randint(
        key, (self.batch_size,), self.min_lag, self.max_lag + 1
      )
    one = jax.random.randint(key, (), self.min_lag, self.max_lag + 1)
    return jnp.full((self.batch_size,), one, dtype=jnp.int32)

  def append(self, state: dict, x: jax.Array, key: jax.Array) -> dict:
    ring = self.ring.append(state["ring"], x)
    steps = state["steps"] + 1
    lags = state["lags"]
    # Periodic refresh (with per-env phase) or every-step resampling.
    if self.update_period > 0:
      due = (steps + state["phase"]) % self.update_period == 0
    else:
      due = jnp.ones_like(steps, dtype=bool)
    new_lags = self._sample_lags(key)
    if self.hold_prob > 0:
      hold = jax.random.uniform(jax.random.fold_in(key, 7), (self.batch_size,))
      new_lags = jnp.where(hold < self.hold_prob, lags, new_lags)
    lags = jnp.where(due, new_lags, lags)
    return {"ring": ring, "lags": lags, "phase": state["phase"], "steps": steps}

  def compute(self, state: dict) -> jax.Array:
    return self.ring.latest(state["ring"], state["lags"])

  def reset(self, state: dict, env_mask=None) -> dict:
    out = dict(state)
    out["ring"] = self.ring.reset(state["ring"], env_mask)
    if env_mask is not None:
      out["steps"] = jnp.where(env_mask, 0, state["steps"])
    else:
      out["steps"] = jnp.zeros_like(state["steps"])
    return out
