"""Circular/delay buffer semantics (reference tests/test_circular_buffer.py,
test_delay_buffer.py): backfill on first append, per-row reset, lag clamping
to available history, per-env vs shared lags, hold-prob correlation."""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils.buffers import CircularBuffer, DelayBuffer


def test_backfill_on_first_append():
  cb = CircularBuffer(max_len=4, batch_size=2)
  st = cb.init_state(jnp.zeros((2, 3)))
  x = jnp.asarray([[1.0, 1, 1], [2.0, 2, 2]])
  st = cb.append(st, x)
  view = np.asarray(cb.buffer(st))
  # Every slot holds the first value after reset (backfill,
  # reference circular_buffer.py:21-72).
  assert (view[0] == 1.0).all() and (view[1] == 2.0).all()


def test_ring_ordering_and_latest():
  cb = CircularBuffer(max_len=3, batch_size=1)
  st = cb.init_state(jnp.zeros((1, 1)))
  for v in (1.0, 2.0, 3.0, 4.0):
    st = cb.append(st, jnp.asarray([[v]]))
  view = np.asarray(cb.buffer(st))[0, :, 0]
  np.testing.assert_array_equal(view, [2.0, 3.0, 4.0])  # oldest → newest
  assert float(cb.latest(st, jnp.asarray([0]))[0, 0]) == 4.0
  assert float(cb.latest(st, jnp.asarray([2]))[0, 0]) == 2.0


def test_per_row_reset_rebackfills():
  cb = CircularBuffer(max_len=3, batch_size=2)
  st = cb.init_state(jnp.zeros((2, 1)))
  for v in (1.0, 2.0):
    st = cb.append(st, jnp.full((2, 1), v))
  st = cb.reset(st, env_mask=jnp.asarray([True, False]))
  st = cb.append(st, jnp.full((2, 1), 9.0))
  view = np.asarray(cb.buffer(st))
  assert (view[0] == 9.0).all()  # reset row fully backfilled
  np.testing.assert_array_equal(view[1, :, 0], [1.0, 2.0, 9.0])


def test_lag_clamped_to_history():
  cb = CircularBuffer(max_len=5, batch_size=1)
  st = cb.init_state(jnp.zeros((1, 1)))
  st = cb.append(st, jnp.asarray([[7.0]]))
  # Only one value in history; a big lag must clamp to it.
  assert float(cb.latest(st, jnp.asarray([4]))[0, 0]) == 7.0


def test_delay_buffer_shared_vs_per_env():
  key = jax.random.key(0)
  shared = DelayBuffer(1, 5, batch_size=8, per_env=False)
  st = shared.init_state(jnp.zeros((8, 1)), key)
  assert len(np.unique(np.asarray(st["lags"]))) == 1
  per_env = DelayBuffer(0, 5, batch_size=64, per_env=True)
  st2 = per_env.init_state(jnp.zeros((64, 1)), key)
  assert len(np.unique(np.asarray(st2["lags"]))) > 1


def test_delay_buffer_delays_signal():
  db = DelayBuffer(2, 2, batch_size=1, per_env=False)  # fixed lag 2
  key = jax.random.key(0)
  st = db.init_state(jnp.zeros((1, 1)), key)
  outs = []
  for v in range(1, 8):
    st = db.append(st, jnp.asarray([[float(v)]]), jax.random.fold_in(key, v))
    outs.append(float(db.compute(st)[0, 0]))
  # After warmup the output is the input from 2 steps earlier.
  np.testing.assert_array_equal(outs[3:], [2.0, 3.0, 4.0, 5.0])


def test_delay_hold_prob_correlation():
  key = jax.random.key(3)
  db = DelayBuffer(0, 10, batch_size=256, per_env=True, hold_prob=1.0)
  st = db.init_state(jnp.zeros((256, 1)), key)
  lags0 = np.asarray(st["lags"]).copy()
  for i in range(5):
    st = db.append(st, jnp.zeros((256, 1)), jax.random.fold_in(key, i))
  # hold_prob=1 keeps every lag frozen.
  np.testing.assert_array_equal(np.asarray(st["lags"]), lags0)
