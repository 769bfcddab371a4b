import sys; sys.path.insert(0, "/root/repo")
import os, time, json
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.rl.runner import OnPolicyRunner
import numpy as np

N = 4096
cfg = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "env_cfg_entry_point")
agent = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "rl_cfg_entry_point")
cfg.scene.num_envs = N
cfg.sim.dtype = "float32"
agent.fused_rollout = False
env = ManagerBasedRlEnv(cfg)
runner = OnPolicyRunner(env, agent)

state = runner.state
# two warmup iterations
for _ in range(2):
    state, m = runner._train_iter(state)
jax.block_until_ready(m["Loss/loss"])

# instrumented steady-state iteration
cfgr = runner.cfg; alg = cfgr.algorithm
T = cfgr.num_steps_per_env
rng, scan_key = jax.random.split(state.rng)
keys = jax.random.split(scan_key, T)
carry = (state.env_state, state.obs, state.train.params, state.actor_norm, state.critic_norm)
batch, extras = runner._rollout_buffers

t0 = time.perf_counter()
for t in range(T):
    carry, batch, extras = runner._rollout_accum_jit(carry, keys[t], batch, extras, jnp.uint32(t))
jax.block_until_ready(batch.reward)
print(json.dumps({"rollout_s": round(time.perf_counter()-t0,3)}), flush=True)

t0 = time.perf_counter()
flat, adv_flat, ret_flat, a_norm, c_norm, rollout_metrics = runner._prep_update_jit(state, carry, batch, extras)
jax.block_until_ready(adv_flat)
print(json.dumps({"prep_s": round(time.perf_counter()-t0,3)}), flush=True)

n = int(np.prod(batch.reward.shape)); mb_size = n // alg.num_mini_batches
params, opt_state, lr, train_rng = state.train.params, state.train.opt_state, state.train.lr, state.train.rng
msum = {k: jnp.zeros((), jnp.float32) for k in ("kl","surrogate","value_loss","entropy","loss","lr")}
t0 = time.perf_counter()
eager_t = 0.0
for e in range(alg.num_learning_epochs):
    te = time.perf_counter()
    train_rng, key = jax.random.split(train_rng)
    perm = jax.random.permutation(key, n)
    idxs = perm[: mb_size*alg.num_mini_batches].reshape(alg.num_mini_batches, mb_size)
    jax.block_until_ready(idxs)
    eager_t += time.perf_counter()-te
    for k in range(alg.num_mini_batches):
        params, opt_state, lr, msum = runner._mb_step_jit(params, opt_state, lr, flat, adv_flat, ret_flat, idxs[k], msum)
jax.block_until_ready(msum["loss"])
print(json.dumps({"update_s": round(time.perf_counter()-t0,3), "perm_eager_s": round(eager_t,3)}), flush=True)
