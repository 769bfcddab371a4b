"""Measure host-loop PPO iteration with UNROLLED multi-step chunk programs,
plus the packed (flat-buffer) stepping variants.

The relay's scan slow path (docs/PERF_NOTES.md) killed the fused rollout;
this probe asks whether (a) a Python-unrolled chunk of K env steps in ONE
jitted program (no lax.scan) dispatches at ~1/K the per-call overhead
without triggering the slow path, (b) packing the ~200 leaf crossings into
a few flat buffers (utils/packing.py) recovers the per-leaf marshaling
cost, and (c) an epoch-chunked minibatch update (num_mini_batches SGD
steps unrolled per call) helps the update phase.

Env knobs: N (4096), CHUNKS ("2,4"), SKIP_BASE=1, SKIP_PACKED=1.
"""

import sys; sys.path.insert(0, "/root/repo")
import os, time, json
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_mjlab")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import numpy as np

import mjlab_tpu.tasks as tasks
from mjlab_tpu.envs import ManagerBasedRlEnv
from mjlab_tpu.rl.runner import OnPolicyRunner

N = int(os.environ.get("N", "4096"))
CHUNKS = [int(x) for x in os.environ.get("CHUNKS", "2,4").split(",")]
cfg = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "env_cfg_entry_point")
agent = tasks.load_cfg_from_registry("Mjlab-Velocity-Flat-Unitree-G1", "rl_cfg_entry_point")
cfg.scene.num_envs = N
cfg.sim.dtype = "float32"
agent.fused_rollout = False
env = ManagerBasedRlEnv(cfg)
runner = OnPolicyRunner(env, agent)

state = runner.state
alg = runner.cfg.algorithm
T = runner.cfg.num_steps_per_env

# Warm up (also allocates rollout buffers and compiles the per-step path).
for _ in range(2):
    state, m = runner._train_iter(state)
jax.block_until_ready(m["Loss/loss"])

# Baseline: whole host-loop iteration wall (per PERF_NOTES, time whole iters).
if os.environ.get("SKIP_BASE") != "1":
    t0 = time.perf_counter()
    state, m = runner._train_iter(state)
    jax.block_until_ready(m["Loss/loss"])
    base = time.perf_counter() - t0
    print(json.dumps({"base_iter_s": round(base, 4),
                      "base_env_steps_per_s": round(T * N / base, 1)}), flush=True)

rng, scan_key = jax.random.split(state.rng)
keys = jax.random.split(scan_key, T)
carry = (state.env_state, state.obs, state.train.params, state.actor_norm,
         state.critic_norm)
batch, extras = runner._rollout_buffers

# Rollout-only baseline wall.
t0 = time.perf_counter()
for t in range(T):
    carry, batch, extras = runner._rollout_accum_jit(
        carry, keys[t], batch, extras, jnp.uint32(t))
jax.block_until_ready(batch.reward)
print(json.dumps({"rollout_1_s": round(time.perf_counter() - t0, 4)}), flush=True)


def make_chunk(k):
    def chunk(carry, keys_k, batch, extras, t0_):
        for i in range(k):
            carry, batch, extras = runner._rollout_step_accum(
                carry, keys_k[i], batch, extras, t0_ + jnp.uint32(i))
        return carry, batch, extras
    return jax.jit(chunk)


for k in CHUNKS:
    if T % k:
        continue
    ck = make_chunk(k)
    tc = time.perf_counter()
    out = ck(carry, keys[:k], batch, extras, jnp.uint32(0))
    jax.block_until_ready(out[1].reward)
    compile_s = time.perf_counter() - tc
    t0 = time.perf_counter()
    c2, b2, e2 = carry, batch, extras
    for t in range(0, T, k):
        c2, b2, e2 = ck(c2, keys[t:t + k], b2, e2, jnp.uint32(t))
    jax.block_until_ready(b2.reward)
    dt = time.perf_counter() - t0
    print(json.dumps({f"rollout_chunk{k}_s": round(dt, 4),
                      f"chunk{k}_compile_s": round(compile_s, 1)}), flush=True)

if os.environ.get("SKIP_PACKED") != "1":
    # (b1) Packed EVAL step: bare env stepping with flat-buffer boundary.
    jit_packed, pack_s, unpack_s, _ = env.build_packed_step()
    act_fixed = jnp.zeros((N, env.action_manager.total_action_dim), dtype=env.dtype)
    pk = pack_s(runner.state.env_state)
    for _ in range(5):
        pk, out = jit_packed(pk, act_fixed)
    jax.block_until_ready(out[0]["f32"])
    t0 = time.perf_counter()
    for _ in range(50):
        pk, out = jit_packed(pk, act_fixed)
    jax.block_until_ready(out[0]["f32"])
    dt = time.perf_counter() - t0
    print(json.dumps({"packed_eval_env_steps_per_s": round(N * 50 / dt, 1),
                      "packed_eval_ms_per_step": round(dt / 50 * 1000, 3)}),
          flush=True)

    # (b2) Packed host-loop ROLLOUT (full 24-step window).
    from mjlab_tpu.utils.packing import build_packer
    pack_c, unpack_c = build_packer((carry, batch, extras),
                                    big_threshold=256 * N)
    def accum_packed(packed, key, t):
        c, b, e = unpack_c(packed)
        c, b, e = runner._rollout_step_accum(c, key, b, e, t)
        return pack_c((c, b, e))
    accum_packed_jit = jax.jit(accum_packed, donate_argnums=(0,))
    pkc = jax.jit(pack_c)((carry, batch, extras))
    tc = time.perf_counter()
    pkc = accum_packed_jit(pkc, keys[0], jnp.uint32(0))
    jax.block_until_ready(pkc[0]["f32"])
    print(json.dumps({"packed_accum_compile_s": round(time.perf_counter()-tc, 1)}),
          flush=True)
    t0 = time.perf_counter()
    for t in range(T):
        pkc = accum_packed_jit(pkc, keys[t], jnp.uint32(t))
    jax.block_until_ready(pkc[0]["f32"])
    print(json.dumps({"rollout_packed_s": round(time.perf_counter() - t0, 4)}),
          flush=True)

# Epoch-chunked update: num_mini_batches SGD steps unrolled in one program.
flat, adv_flat, ret_flat, a_norm, c_norm, rollout_metrics = (
    runner._prep_update_jit(state, carry, batch, extras))
n = int(np.prod(batch.reward.shape))
mb_size = n // alg.num_mini_batches
params, opt_state = state.train.params, state.train.opt_state
lr, train_rng = state.train.lr, state.train.rng
msum = {k: jnp.zeros((), jnp.float32)
        for k in ("kl", "surrogate", "value_loss", "entropy", "loss", "lr")}

# Baseline update wall.
t0 = time.perf_counter()
p1, o1, l1, m1 = params, opt_state, lr, msum
for e in range(alg.num_learning_epochs):
    train_rng, key = jax.random.split(train_rng)
    perm = jax.random.permutation(key, n)
    idxs = perm[: mb_size * alg.num_mini_batches].reshape(
        alg.num_mini_batches, mb_size)
    for kk in range(alg.num_mini_batches):
        p1, o1, l1, m1 = runner._mb_step_jit(p1, o1, l1, flat, adv_flat,
                                             ret_flat, idxs[kk], m1)
jax.block_until_ready(m1["loss"])
print(json.dumps({"update_1_s": round(time.perf_counter() - t0, 4)}), flush=True)


def epoch_step(params, opt_state, lr, flat, adv, ret, idxs_all, msum, key):
    perm = jax.random.permutation(key, n)
    idxs = perm[: mb_size * alg.num_mini_batches].reshape(
        alg.num_mini_batches, mb_size)
    del idxs_all
    for kk in range(alg.num_mini_batches):
        params, opt_state, lr, msum = runner._mb_step_sum(
            params, opt_state, lr, flat, adv, ret, idxs[kk], msum)
    return params, opt_state, lr, msum

epoch_jit = jax.jit(epoch_step)
tc = time.perf_counter()
out = epoch_jit(params, opt_state, lr, flat, adv_flat, ret_flat, None, msum,
                jax.random.key(1))
jax.block_until_ready(out[3]["loss"])
print(json.dumps({"epoch_compile_s": round(time.perf_counter() - tc, 1)}), flush=True)
t0 = time.perf_counter()
p2, o2, l2, m2 = params, opt_state, lr, msum
for e in range(alg.num_learning_epochs):
    train_rng, key = jax.random.split(train_rng)
    p2, o2, l2, m2 = epoch_jit(p2, o2, l2, flat, adv_flat, ret_flat, None, m2, key)
jax.block_until_ready(m2["loss"])
print(json.dumps({"update_epochchunk_s": round(time.perf_counter() - t0, 4)}), flush=True)
