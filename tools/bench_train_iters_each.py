import sys; sys.path.insert(0, "/root/repo")
import os, time, json
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
import jax
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
times = []
for i in range(10):
    t0 = time.perf_counter()
    state, m = runner._train_iter(state)
    jax.block_until_ready(m["Loss/loss"])
    times.append(round(time.perf_counter()-t0, 3))
print(json.dumps({"iter_times_s": times}), flush=True)
steady = times[3:]
steps = N * agent.num_steps_per_env
print(json.dumps({"steady_env_steps_per_s": round(steps/ (sum(steady)/len(steady)), 1)}), flush=True)
