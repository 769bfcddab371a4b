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
# warmup iteration (compiles everything)
t0 = time.perf_counter()
state, m = runner._train_iter(state)
jax.block_until_ready(m["Loss/loss"])
print(json.dumps({"warmup_s": round(time.perf_counter()-t0,1)}), flush=True)

# instrumented iteration
cfgr = runner.cfg
T = cfgr.num_steps_per_env
rng, scan_key = jax.random.split(state.rng)
keys = jax.random.split(scan_key, T)
carry = (state.env_state, state.obs, state.train.params, state.actor_norm, state.critic_norm)
batch, extras = runner._rollout_buffers
times = []
for t in range(T):
    t0 = time.perf_counter()
    carry, batch, extras = runner._rollout_accum_jit(carry, keys[t], batch, extras, jnp.uint32(t))
    jax.block_until_ready(batch.reward)
    times.append(round((time.perf_counter()-t0)*1000,1))
print(json.dumps({"per_step_ms": times}), flush=True)
t0 = time.perf_counter()
ns, metrics = runner._post_rollout_jit(state, carry, batch, extras, rng)
jax.block_until_ready(metrics["Loss/loss"])
print(json.dumps({"post_ms": round((time.perf_counter()-t0)*1000,1)}), flush=True)
