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
action = jnp.zeros((N, env.action_manager.total_action_dim), dtype=env.dtype)
state = env.state
print("state leaves:", len(jax.tree_util.tree_leaves(state)))

def timeit(name, fn, s, n=30):
    s2 = fn(s, action); jax.block_until_ready(jax.tree_util.tree_leaves(s2)[0])
    t0 = time.perf_counter()
    for _ in range(n):
        s2 = fn(s2 if name=="full" else s, action)
    jax.block_until_ready(jax.tree_util.tree_leaves(s2)[0])
    print(json.dumps({name+"_ms": round((time.perf_counter()-t0)/n*1000, 3)}), flush=True)

# full state out
full = jax.jit(lambda s, a: env._step_impl(s, a)[0])
timeit("full", full, state)

# qpos-only out (same compute; XLA may DCE unused outputs though!)
qpos_only = jax.jit(lambda s, a: env._step_impl(s, a)[0].data.qpos)
timeit("qpos_only", qpos_only, state)

# obs+rew only (realistic minimal: forces most compute live)
orew = jax.jit(lambda s, a: (env._step_impl(s, a)[1][0], env._step_impl(s, a)[1][1]))
# note: double call traces once due to jit CSE
timeit("obs_rew_only", orew, state)
