import sys; sys.path.insert(0, "/root/repo")
import os, time, json
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv

cfg = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "env_cfg_entry_point")
cfg.scene.num_envs = 4096
cfg.sim.dtype = "float32"
env = ManagerBasedRlEnv(cfg)
env.reset(seed=0)
N = 4096
action = 0.1 * jax.random.normal(jax.random.key(0), (N, env.action_manager.total_action_dim), dtype=env.dtype)

state = env.state
step = env._jit_step

for _ in range(5):
    state, out = step(state, action)
jax.block_until_ready(out[1])
t0 = time.perf_counter()
for _ in range(50):
    state, out = step(state, action)
jax.block_until_ready(out[1])
dt_loop = time.perf_counter() - t0
print(json.dumps({"loop_env_steps_per_s": round(N*50/dt_loop,1),
                  "loop_ms_per_step": round(dt_loop/50*1000,3)}), flush=True)

SCAN_LEN = int(os.environ.get("SCAN_LEN", "8"))
def body(s, _):
    s, (obs, rew, term, to, log) = env._step_impl(s, action)
    return s, rew
try:
    fused = jax.jit(lambda s: jax.lax.scan(body, s, None, length=SCAN_LEN))
    state2, rews = fused(state)
    jax.block_until_ready(rews)
    t0 = time.perf_counter()
    for _ in range(3):
        state2, rews = fused(state2)
    jax.block_until_ready(rews)
    dt_scan = (time.perf_counter() - t0) / 3
    print(json.dumps({"scan_len": SCAN_LEN,
                      "scan_env_steps_per_s": round(N*SCAN_LEN/dt_scan,1),
                      "scan_ms_per_step": round(dt_scan/SCAN_LEN*1000,3)}), flush=True)
except Exception as e:
    print(f"SCAN FAILED: {type(e).__name__}: {e}", flush=True)
