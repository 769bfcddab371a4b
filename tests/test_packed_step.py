"""Packed-step equivalence: the flat-buffer stepping API must be
math-identical to the regular jitted step (utils/packing.py,
ManagerBasedRlEnv.build_packed_step)."""

import jax
import jax.numpy as jnp
import numpy as np

from mjlab_tpu.utils.packing import build_packer
from tests.test_env_smoke import make_env


def test_packer_roundtrip_mixed_dtypes():
  tree = {
    "a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3),
    "b": jnp.asarray([True, False, True]),
    "c": {"x": jnp.asarray([3, -1], dtype=jnp.int32),
          "y": jnp.zeros((4, 4), dtype=jnp.float32)},
    "key": jax.random.key(7),
    "big": jnp.ones((100, 100), dtype=jnp.float32),
  }
  pack, unpack = build_packer(tree, big_threshold=1000)
  packed = pack(tree)
  buffers, passthrough = packed
  # big + key pass through; the rest lands in 3 dtype buffers.
  assert len(passthrough) == 2
  assert set(buffers) == {"f32", "i32", "bool"}
  out = unpack(packed)

  def _eq(x, y):
    if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
      x, y = jax.random.key_data(x), jax.random.key_data(y)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

  jax.tree_util.tree_map(_eq, tree, out)
  # Jit-compatible end to end.
  out2 = jax.jit(lambda t: unpack(pack(t)))(tree)
  np.testing.assert_array_equal(np.asarray(out2["a"]), np.asarray(tree["a"]))


def test_packed_step_matches_regular_step():
  env = make_env(num_envs=4, seed=0)
  env.reset(seed=0)
  key = jax.random.key(1)
  actions = 0.1 * jax.random.normal(
    key, (5, 4, env.action_manager.total_action_dim), dtype=env.dtype
  )

  jit_packed, pack_s, unpack_s, unpack_o = env.build_packed_step()

  # Two independent copies of the initial state (both step paths donate
  # their input buffers).
  def _copy_leaf(x):
    if jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
      return jax.random.wrap_key_data(jax.random.key_data(x) + 0)
    return x + 0

  copy = jax.jit(lambda t: jax.tree_util.tree_map(_copy_leaf, t))
  state_a = copy(env.state)
  state_b = copy(env.state)

  ref = []
  for t in range(5):
    state_a, out = env._jit_step(state_a, actions[t])
    ref.append(out)

  # Packed path from the identical initial state.
  packed = pack_s(state_b)
  got = []
  for t in range(5):
    packed, out_p = jit_packed(packed, actions[t])
    got.append(unpack_o(out_p))

  for t in range(5):
    jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
      ),
      ref[t], got[t],
    )
  state_b = unpack_s(packed)
  np.testing.assert_allclose(
    np.asarray(state_a.data.qpos), np.asarray(state_b.data.qpos), rtol=1e-6
  )
  np.testing.assert_allclose(
    np.asarray(state_a.episode_length),
    np.asarray(state_b.episode_length),
  )
