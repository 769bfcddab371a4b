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
keys = jax.random.split(scan_key, agent.num_steps_per_env)
carry = (state.env_state, state.obs, state.train.params, state.actor_norm, state.critic_norm)

# Warm + time a single rollout step call.
carry2, (tr, extra) = runner._rollout_step_jit(carry, keys[0])
jax.block_until_ready(tr.reward)
t0 = time.perf_counter()
for i in range(10):
    carry2, (tr, extra) = runner._rollout_step_jit(carry2, keys[i % len(keys)])
jax.block_until_ready(tr.reward)
print(json.dumps({"rollout_step_ms": round((time.perf_counter()-t0)/10*1000, 2)}), flush=True)

# Also time the bare env step for comparison in the same process.
action = jnp.zeros((N, env.action_manager.total_action_dim), dtype=env.dtype)
s = state.env_state
s, out = env._jit_step(s, action)
jax.block_until_ready(out[1])
t0 = time.perf_counter()
for _ in range(10):
    s, out = env._jit_step(s, action)
jax.block_until_ready(out[1])
print(json.dumps({"bare_env_step_ms": round((time.perf_counter()-t0)/10*1000, 2)}), flush=True)

# Build batch and time post_rollout.
trs, extras_list = [], []
c = carry
for t in range(agent.num_steps_per_env):
    c, (tr, extra) = runner._rollout_step_jit(c, keys[t])
    trs.append(tr); extras_list.append(extra)
t0 = time.perf_counter()
batch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trs)
extras = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *extras_list)
jax.block_until_ready(batch.reward)
print(json.dumps({"stack_ms": round((time.perf_counter()-t0)*1000, 2)}), flush=True)

ns, metrics = runner._post_rollout_jit(state, c, batch, extras, rng)
jax.block_until_ready(metrics["Loss/loss"])
t0 = time.perf_counter()
for _ in range(3):
    ns, metrics = runner._post_rollout_jit(state, c, batch, extras, rng)
jax.block_until_ready(metrics["Loss/loss"])
print(json.dumps({"post_rollout_ms": round((time.perf_counter()-t0)/3*1000, 2)}), flush=True)
