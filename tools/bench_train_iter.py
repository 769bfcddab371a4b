import sys; sys.path.insert(0, "/root/repo")
import os, time, json
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.rl.runner import OnPolicyRunner

N = int(os.environ.get("N_ENVS", "4096"))
cfg = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "env_cfg_entry_point")
agent = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "rl_cfg_entry_point")
cfg.scene.num_envs = N
cfg.sim.dtype = "float32"
env = ManagerBasedRlEnv(cfg)
agent.fused_rollout = os.environ.get("FUSED", "1") == "1"
runner = OnPolicyRunner(env, agent)

state = runner.state
t0 = time.perf_counter()
state, metrics = runner._train_iter(state)
jax.block_until_ready(metrics["Loss/loss"])
print(json.dumps({"first_call_s": round(time.perf_counter()-t0, 2)}), flush=True)

t0 = time.perf_counter()
for _ in range(3):
    state, metrics = runner._train_iter(state)
jax.block_until_ready(metrics["Loss/loss"])
dt = (time.perf_counter()-t0)/3
steps = N * agent.num_steps_per_env
print(json.dumps({"train_iter_s": round(dt, 3),
                  "train_env_steps_per_s": round(steps/dt, 1)}), flush=True)
