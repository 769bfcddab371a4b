import sys; sys.path.insert(0, "/root/repo")
import os, time, json
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.rl.runner import OnPolicyRunner

N = 4096
cfg = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "env_cfg_entry_point")
agent = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "rl_cfg_entry_point")
cfg.scene.num_envs = N
cfg.sim.dtype = "float32"
agent.fused_rollout = False
env = ManagerBasedRlEnv(cfg)
runner = OnPolicyRunner(env, agent)

state = runner.state
rng, scan_key = jax.random.split(state.rng)
T = agent.num_steps_per_env
keys = jax.random.split(scan_key, T)
carry = (state.env_state, state.obs, state.train.params, state.actor_norm, state.critic_norm)

tr_shape, extra_shape = jax.eval_shape(lambda c, k: runner._rollout_step(c, k)[1], carry, keys[0])
alloc = lambda s: jnp.zeros((T,) + s.shape, dtype=s.dtype)
batch = jax.tree_util.tree_map(alloc, tr_shape)
extras = jax.tree_util.tree_map(alloc, extra_shape)

def timeit(name, fn, args, n=5):
    out = fn(*args); jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
    print(json.dumps({name: round((time.perf_counter()-t0)/n*1000, 2)}), flush=True)
    return out

# (a) bare rollout step
timeit("step_ms", runner._rollout_step_jit, (carry, keys[0]))

# (b) fused accum (step + buffer write)
timeit("accum_fused_ms", runner._rollout_accum_jit,
       (carry, keys[0], batch, extras, jnp.uint32(0)))

# (c) separate write program
write = jax.jit(lambda bufs, x, i: jax.tree_util.tree_map(
    lambda b, v: b.at[i].set(v), bufs, x))
_, (tr, extra) = runner._rollout_step_jit(carry, keys[0])
timeit("write_batch_ms", write, (batch, tr, jnp.uint32(0)))
timeit("write_extras_ms", write, (extras, extra, jnp.uint32(0)))
