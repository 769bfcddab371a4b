"""On-policy runner: fused rollout + PPO update as one XLA program.

The reference delegates training to rsl_rl's OnPolicyRunner (torch, host
rollout loop, reference tasks/velocity/rl/runner.py:13). Here the entire
training iteration — num_steps_per_env env steps (physics + managers), GAE,
and all PPO epochs/minibatches — is a single jitted function over the env's
pure step (`lax.scan`), so a TPU executes one program per iteration with no
host round-trips.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mjlab_tpu.rl.config import RlOnPolicyRunnerCfg
from mjlab_tpu.rl.networks import (
  ActorCritic,
  RunningNorm,
  gaussian_log_prob,
)
from mjlab_tpu.rl.ppo import PpoTrainState, Transition, make_optimizer, ppo_update


def _mean_noise_std(params) -> jax.Array:
  """Mean policy stddev for logging ('std' or 'log_std' ActorCritic param)."""
  p = params["params"]
  if "std" in p:
    return jnp.mean(p["std"])
  if "log_std" in p:
    return jnp.mean(jnp.exp(p["log_std"]))
  return jnp.zeros(())  # pragma: no cover


@struct.dataclass
class RunnerState:
  env_state: Any
  obs: Any  # dict of group observations (current)
  train: PpoTrainState
  actor_norm: RunningNorm
  critic_norm: RunningNorm
  rng: jax.Array


class OnPolicyRunner:
  """JAX PPO runner over a ManagerBasedRlEnv."""

  def __init__(self, env, cfg: RlOnPolicyRunnerCfg, log_dir: str | None = None,
               mesh=None):
    self.env = env
    self.cfg = cfg
    self.log_dir = log_dir
    self.iteration = 0
    self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
    self.last_metrics: dict[str, float] | None = None
    if self.mesh is not None and env.num_envs % self.mesh.size:
      raise ValueError(
        f"num_envs={env.num_envs} not divisible by mesh size "
        f"{self.mesh.size}; env-axis sharding needs equal shards per device."
      )

    obs_dims = env.observation_manager.group_obs_dim
    self.num_actor_obs = int(obs_dims["policy"][-1])
    critic_group = "critic" if "critic" in obs_dims else "policy"
    self.critic_group = critic_group
    self.num_critic_obs = int(obs_dims[critic_group][-1])
    self.num_actions = env.action_manager.total_action_dim

    p = cfg.policy
    self.ac = ActorCritic(
      num_actions=self.num_actions,
      actor_hidden_dims=tuple(p.actor_hidden_dims),
      critic_hidden_dims=tuple(p.critic_hidden_dims),
      activation=p.activation,
      init_noise_std=p.init_noise_std,
      noise_std_type=p.noise_std_type,
    )
    key, pkey, tkey = jax.random.split(jax.random.key(cfg.seed), 3)
    params = self.ac.init(
      pkey,
      jnp.zeros((1, self.num_actor_obs)),
      jnp.zeros((1, self.num_critic_obs)),
    )
    self.optimizer = make_optimizer(cfg.algorithm)
    opt_state = self.optimizer.init(params)

    obs, _ = env.reset(seed=cfg.seed)
    self.state = RunnerState(
      env_state=env.state,
      obs=obs,
      train=PpoTrainState(
        params=params,
        opt_state=opt_state,
        lr=jnp.asarray(cfg.algorithm.learning_rate, dtype=jnp.float32),
        rng=tkey,
      ),
      actor_norm=RunningNorm.create(self.num_actor_obs),
      critic_norm=RunningNorm.create(self.num_critic_obs),
      rng=key,
    )
    if self.mesh is not None:
      # Env-axis data parallelism (SURVEY §2.10 "must build"): env state and
      # obs shard along the mesh's env axis, learner params/normalizers
      # replicate, and XLA inserts the psum/all-gather collectives for batch
      # reductions inside the jitted train iteration.
      from mjlab_tpu.distributed import shard_batched_pytree

      self.state = shard_batched_pytree(self.state, self.mesh, env.num_envs)
    # NOTE: no buffer donation — donating the RunnerState makes the axon TPU
    # relay ~4000x slower per call (1.5 ms → 5.8 s measured; see
    # docs/PERF_NOTES.md). The extra state copy is cheap next to that.
    fused = cfg.fused_rollout
    if fused is None:
      # Auto: the tunneled 'axon' relay executes scan-over-env programs
      # ~2600x slower than eagerly dispatched steps (docs/PERF_NOTES.md).
      # Probe the actual PJRT client, NOT the JAX_PLATFORMS env var — the
      # var is often unset even when the relay is active (VERDICT r3 #1).
      from mjlab_tpu.utils.backend import is_relay_backend

      fused = not is_relay_backend()
    if fused:
      self._train_iter = jax.jit(self._train_iteration)
    else:
      from mjlab_tpu.rl.ppo import make_minibatch_step

      self._rollout_step_jit = jax.jit(self._rollout_step)
      self._rollout_accum_jit = jax.jit(self._rollout_step_accum)
      if cfg.rollout_chunk > 1:
        self._rollout_chunk_jit = jax.jit(self._rollout_chunk)
      if cfg.epoch_chunk:
        self._epoch_step_jit = jax.jit(self._epoch_step)
      self._packed_rollout = None  # built lazily (needs rollout buffers)
      self._prep_update_jit = jax.jit(self._prep_update)
      self._mb_core = make_minibatch_step(
        cfg.algorithm, self._policy_apply, self.optimizer
      )
      self._mb_step_jit = jax.jit(self._mb_step_sum)
      self._rollout_buffers = None
      self._train_iter = self._train_iteration_hostloop
    self._writer = None

  # -- fused training iteration ------------------------------------------------

  def _policy_apply(self, params, actor_obs, critic_obs):
    return self.ac.apply(params, actor_obs, critic_obs)

  def _rollout_step(self, carry, key):
    """One policy-act + env-step; shared by both rollout modes."""
    cfg = self.cfg
    env_state, obs, params, a_norm, c_norm = carry
    a_obs = a_norm(obs["policy"].astype(jnp.float32))
    c_obs = c_norm(obs[self.critic_group].astype(jnp.float32))
    mean, std, value = self._policy_apply(params, a_obs, c_obs)
    std = jnp.broadcast_to(std, mean.shape)
    action = mean + std * jax.random.normal(key, mean.shape, dtype=mean.dtype)
    log_prob = gaussian_log_prob(mean, std, action)
    act = action
    if cfg.clip_actions is not None:
      act = jnp.clip(act, -cfg.clip_actions, cfg.clip_actions)
    env_state, (next_obs, rew, terminated, time_outs, log) = self.env._step_impl(
      env_state, act.astype(self.env.dtype)
    )
    done = terminated | time_outs
    tr = Transition(
      actor_obs=a_obs,
      critic_obs=c_obs,
      action=action,
      reward=rew.astype(jnp.float32),
      done=done,
      time_out=time_outs.astype(jnp.float32),
      value=value,
      log_prob=log_prob,
      mean=mean,
      std=std,
    )
    extra = {
      "reward_mean": jnp.mean(rew),
      "reset_count": log["reset_count"],
      "episode_length_sum": log["Episode_Length"],
      "log": log,
    }
    return (env_state, next_obs, params, a_norm, c_norm), (tr, extra)

  def _train_iteration(self, state: RunnerState):
    cfg = self.cfg
    rng, scan_key = jax.random.split(state.rng)
    keys = jax.random.split(scan_key, cfg.num_steps_per_env)
    carry = (
      state.env_state,
      state.obs,
      state.train.params,
      state.actor_norm,
      state.critic_norm,
    )
    carry, (batch, extras) = jax.lax.scan(self._rollout_step, carry, keys)
    return self._post_rollout(state, carry, batch, extras, rng)

  def _rollout_step_accum(self, carry, key, batch, extras, t):
    """One rollout step that writes its transition into slot `t` of the
    preallocated (T, ...) buffers — keeps the host loop free of eager
    stacking, which the tunneled-TPU relay executes ~200ms per stack
    (docs/PERF_NOTES.md)."""
    carry, (tr, extra) = self._rollout_step(carry, key)
    batch = jax.tree_util.tree_map(lambda buf, x: buf.at[t].set(x), batch, tr)
    extras = jax.tree_util.tree_map(
      lambda buf, x: buf.at[t].set(x), extras, extra
    )
    return carry, batch, extras

  def _rollout_chunk(self, carry, keys_k, batch, extras, t0):
    """cfg.rollout_chunk accum steps unrolled into ONE program — fewer
    relay dispatches than per-step calls, with no lax.scan (whose relay
    slow path the host-loop mode exists to avoid; docs/PERF_NOTES.md)."""
    for i in range(self.cfg.rollout_chunk):
      carry, batch, extras = self._rollout_step_accum(
        carry, keys_k[i], batch, extras, t0 + jnp.uint32(i)
      )
    return carry, batch, extras

  def _epoch_step(self, params, opt_state, lr, flat, adv_flat, ret_flat,
                  msum, key):
    """One full PPO epoch — on-device permutation + every minibatch SGD
    step — as ONE program (vs num_mini_batches+1 dispatches)."""
    alg = self.cfg.algorithm
    n = adv_flat.shape[0]
    mb_size = n // alg.num_mini_batches
    perm = jax.random.permutation(key, n)
    idxs = perm[: mb_size * alg.num_mini_batches].reshape(
      alg.num_mini_batches, mb_size
    )
    for k in range(alg.num_mini_batches):
      params, opt_state, lr, msum = self._mb_step_sum(
        params, opt_state, lr, flat, adv_flat, ret_flat, idxs[k], msum
      )
    return params, opt_state, lr, msum

  def _train_iteration_hostloop(self, state: RunnerState):
    """Host-loop rollout: per-step jitted calls + one jitted update. Same
    math as the fused path (shared _rollout_step/_post_rollout); only the
    step loop runs on the host. Use via cfg.fused_rollout=False on runtimes
    whose relay executes scan-over-env programs pathologically slowly."""
    cfg = self.cfg
    T = cfg.num_steps_per_env
    rng, scan_key = jax.random.split(state.rng)
    keys = jax.random.split(scan_key, T)
    carry = (
      state.env_state,
      state.obs,
      state.train.params,
      state.actor_norm,
      state.critic_norm,
    )
    if self._rollout_buffers is None:
      # Shape probe: trace one step abstractly to allocate (T, ...) buffers.
      tr_shape, extra_shape = jax.eval_shape(
        lambda c, k: self._rollout_step(c, k)[1], carry, keys[0]
      )
      alloc = lambda s: jnp.zeros((T,) + s.shape, dtype=s.dtype)
      self._rollout_buffers = (
        jax.tree_util.tree_map(alloc, tr_shape),
        jax.tree_util.tree_map(alloc, extra_shape),
      )
      if self.mesh is not None:
        # (T, num_envs, ...) buffers shard along the env axis (dim 1) so
        # the accum steps never reshard the sharded carry against
        # replicated buffers.
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = self.mesh.axis_names[0]
        n_env = self.env.num_envs

        def place(buf):
          if buf.ndim >= 2 and buf.shape[1] == n_env:
            return jax.device_put(
              buf, NamedSharding(self.mesh, P(None, axis))
            )
          return buf

        self._rollout_buffers = jax.tree_util.tree_map(
          place, self._rollout_buffers
        )
    batch, extras = self._rollout_buffers
    k = max(1, cfg.rollout_chunk)
    if cfg.packed_hostloop:
      # Flat-buffer boundary: (carry, batch, extras) cross each accum call
      # as a few dtype buffers instead of ~150 leaves (utils/packing.py).
      if self._packed_rollout is None:
        from mjlab_tpu.utils.packing import build_packer

        pack, unpack = build_packer(
          (carry, batch, extras), big_threshold=256 * self.env.num_envs
        )

        def accum_packed(packed, key, t):
          c, b, e = unpack(packed)
          c, b, e = self._rollout_step_accum(c, key, b, e, t)
          return pack((c, b, e))

        def chunk_packed(packed, keys_k, t0):
          c, b, e = unpack(packed)
          for i in range(k):
            c, b, e = self._rollout_step_accum(
              c, keys_k[i], b, e, t0 + jnp.uint32(i)
            )
          return pack((c, b, e))

        self._packed_rollout = (
          jax.jit(pack),
          jax.jit(unpack),
          jax.jit(accum_packed, donate_argnums=(0,)),
          jax.jit(chunk_packed, donate_argnums=(0,)) if k > 1 else None,
        )
      pack_j, unpack_j, accum_j, chunk_j = self._packed_rollout
      packed = pack_j((carry, batch, extras))
      t = 0
      while chunk_j is not None and t + k <= T:
        packed = chunk_j(packed, keys[t : t + k], jnp.uint32(t))
        t += k
      while t < T:
        packed = accum_j(packed, keys[t], jnp.uint32(t))
        t += 1
      carry, batch, extras = unpack_j(packed)
    else:
      t = 0
      while t + k <= T and k > 1:
        carry, batch, extras = self._rollout_chunk_jit(
          carry, keys[t : t + k], batch, extras, jnp.uint32(t)
        )
        t += k
      while t < T:
        carry, batch, extras = self._rollout_accum_jit(
          carry, keys[t], batch, extras, jnp.uint32(t)
        )
        t += 1

    # PPO update as a host loop of per-minibatch jitted steps (the fused
    # ppo_update's epoch/minibatch scans hit the same relay slow path as
    # the rollout scan; docs/PERF_NOTES.md).
    alg = cfg.algorithm
    env_state, obs, _, _, _ = carry
    flat, adv_flat, ret_flat, a_norm, c_norm, rollout_metrics = (
      self._prep_update_jit(state, carry, batch, extras)
    )
    n = int(np.prod(batch.reward.shape))
    mb_size = n // alg.num_mini_batches
    params = state.train.params
    opt_state = state.train.opt_state
    lr = state.train.lr
    train_rng = state.train.rng
    msum = {
      k: jnp.zeros((), jnp.float32)
      for k in ("kl", "surrogate", "value_loss", "entropy", "loss", "lr")
    }
    count = 0
    if cfg.epoch_chunk:
      for _ in range(alg.num_learning_epochs):
        train_rng, key = jax.random.split(train_rng)
        params, opt_state, lr, msum = self._epoch_step_jit(
          params, opt_state, lr, flat, adv_flat, ret_flat, msum, key
        )
        count += alg.num_mini_batches
    else:
      for _ in range(alg.num_learning_epochs):
        train_rng, key = jax.random.split(train_rng)
        perm = jax.random.permutation(key, n)
        idxs = perm[: mb_size * alg.num_mini_batches].reshape(
          alg.num_mini_batches, mb_size
        )
        for k in range(alg.num_mini_batches):
          params, opt_state, lr, msum = self._mb_step_jit(
            params, opt_state, lr, flat, adv_flat, ret_flat, idxs[k], msum
          )
          count += 1
    train = PpoTrainState(
      params=params, opt_state=opt_state, lr=lr, rng=train_rng
    )
    metrics = dict(rollout_metrics)
    for k, v in msum.items():
      metrics[f"Loss/{k}"] = v / count
    metrics["Policy/noise_std"] = _mean_noise_std(params)
    new_state = RunnerState(
      env_state=env_state,
      obs=obs,
      train=train,
      actor_norm=a_norm,
      critic_norm=c_norm,
      rng=rng,
    )
    return new_state, metrics

  def _prep_update(self, state, carry, batch, extras):
    """Jitted prep for the host-loop update: bootstrap value, GAE, flatten,
    normalizer refresh, and the rollout-side metrics."""
    from mjlab_tpu.rl.ppo import prepare_update

    cfg = self.cfg
    env_state, obs, params, a_norm, c_norm = carry
    last_c_obs = c_norm(obs[self.critic_group].astype(jnp.float32))
    last_value = self.ac.apply(params, last_c_obs, method=ActorCritic.value)
    flat, adv_flat, ret_flat = prepare_update(cfg.algorithm, batch, last_value)
    if cfg.policy.actor_obs_normalization:
      a_norm = a_norm.update(batch.actor_obs)
    if cfg.policy.critic_obs_normalization:
      c_norm = c_norm.update(batch.critic_obs)
    resets = jnp.sum(extras["reset_count"])
    metrics = {
      "Train/mean_step_reward": jnp.mean(extras["reward_mean"]),
      "Train/resets": resets,
      "Train/mean_episode_length": jnp.sum(extras["episode_length_sum"])
      / jnp.clip(resets.astype(jnp.float32), min=1.0),
    }
    for k, v in extras["log"].items():
      if k.startswith(("Episode_Reward/", "Episode_Termination/", "Metrics/",
                       "Curriculum/")):
        metrics[k] = jnp.mean(v)
    return flat, adv_flat, ret_flat, a_norm, c_norm, metrics

  def _mb_step_sum(self, params, opt_state, lr, flat, adv_flat, ret_flat,
                   idx, msum):
    """One minibatch SGD step + on-device metric accumulation (keeps the
    host loop free of eager metric stacking)."""
    params, opt_state, lr, met = self._mb_core(
      params, opt_state, lr, flat, adv_flat, ret_flat, idx
    )
    msum = {k: msum[k] + met[k].astype(jnp.float32) for k in msum}
    return params, opt_state, lr, msum

  def _post_rollout(self, state, carry, batch, extras, rng):
    cfg = self.cfg
    ac_apply = self._policy_apply
    env_state, obs, params, a_norm, c_norm = carry

    # Bootstrap value for the final state.
    last_c_obs = c_norm(obs[self.critic_group].astype(jnp.float32))
    last_value = self.ac.apply(params, last_c_obs, method=ActorCritic.value)

    train, ppo_metrics = ppo_update(
      cfg.algorithm, ac_apply, self.optimizer, state.train, batch, last_value
    )

    # Update normalizer statistics once per iteration (frozen during rollout
    # so acting and learning see identically-normalized observations).
    if cfg.policy.actor_obs_normalization:
      a_norm = a_norm.update(batch.actor_obs)
    if cfg.policy.critic_obs_normalization:
      c_norm = c_norm.update(batch.critic_obs)

    resets = jnp.sum(extras["reset_count"])
    metrics = {
      **{f"Loss/{k}": v for k, v in ppo_metrics.items()},
      "Train/mean_step_reward": jnp.mean(extras["reward_mean"]),
      "Train/resets": resets,
      "Train/mean_episode_length": jnp.sum(extras["episode_length_sum"])
      / jnp.clip(resets.astype(jnp.float32), min=1.0),
      "Policy/noise_std": _mean_noise_std(train.params),
    }
    # Episodic manager logs, averaged over the rollout window.
    for k, v in extras["log"].items():
      if k.startswith(("Episode_Reward/", "Episode_Termination/", "Metrics/",
                       "Curriculum/")):
        metrics[k] = jnp.mean(v)

    new_state = RunnerState(
      env_state=env_state,
      obs=obs,
      train=train,
      actor_norm=a_norm,
      critic_norm=c_norm,
      rng=rng,
    )
    return new_state, metrics

  # -- host API ------------------------------------------------------------------

  def learn(self, num_iterations: int, log_interval: int = 10,
            deferred_logging: bool = True):
    """Run PPO iterations.

    deferred_logging=True (default) keeps ALL metrics on device during the
    loop and pulls them once at the end: the axon TPU runtime permanently
    drops to a slow execution mode after any device→host transfer
    (docs/PERF_NOTES.md), so live per-interval logging would throttle the
    whole run. Set deferred_logging=False on runtimes without that quirk
    for live console/tensorboard output.
    """
    import contextlib

    steps_per_iter = self.cfg.num_steps_per_env * self.env.num_envs
    device_metrics: list = []
    iter_times: list[float] = []
    start_iter = self.iteration
    mesh_ctx = self.mesh if self.mesh is not None else contextlib.nullcontext()
    for _ in range(num_iterations):
      t0 = time.perf_counter()
      with mesh_ctx:
        self.state, metrics = self._train_iter(self.state)
      if deferred_logging:
        device_metrics.append(metrics)
        if self.iteration % log_interval == 0:
          jax.block_until_ready(self.state.train.lr)
          iter_times.append(time.perf_counter() - t0)
          print(
            f"it {self.iteration:6d} | "
            f"{steps_per_iter / iter_times[-1]:9.0f} steps/s "
            f"(metrics deferred)",
            flush=True,
          )
      else:
        if self.iteration % log_interval == 0:
          jax.block_until_ready(self.state.train.params)
          dt = time.perf_counter() - t0
          host = {k: float(np.asarray(v)) for k, v in metrics.items()}
          fps = steps_per_iter / dt
          print(
            f"it {self.iteration:6d} | {fps:9.0f} steps/s | "
            f"rew {host['Train/mean_step_reward']:.4f} | "
            f"len {host['Train/mean_episode_length']:.1f} | "
            f"kl {host['Loss/kl']:.4f} | lr {host['Loss/lr']:.2e}",
            flush=True,
          )
          self._log_metrics(host)
        if (
          self.log_dir is not None
          and self.cfg.save_interval > 0
          and self.iteration % self.cfg.save_interval == 0
        ):
          self.save(os.path.join(self.log_dir, f"model_{self.iteration}"))
      self.iteration += 1

    if deferred_logging and device_metrics:
      # One bulk device→host pull at the end of the run segment.
      host_metrics = jax.device_get(device_metrics)
      for i, host in enumerate(host_metrics):
        if i % log_interval == 0 or i == len(host_metrics) - 1:
          print(
            f"[deferred] it {start_iter + i:6d} | "
            f"rew {float(host['Train/mean_step_reward']):.4f} | "
            f"len {float(host['Train/mean_episode_length']):.1f} | "
            f"kl {float(host['Loss/kl']):.4f} | "
            f"lr {float(host['Loss/lr']):.2e}",
            flush=True,
          )
        self._log_metrics(
          {k: float(np.asarray(v)) for k, v in host.items()}, step=start_iter + i
        )
      self.last_metrics = {
        k: float(np.asarray(v)) for k, v in host_metrics[-1].items()
      }
    elif not deferred_logging and num_iterations > 0:
      self.last_metrics = {
        k: float(np.asarray(v)) for k, v in jax.device_get(metrics).items()
      }
    # Hand the (donated-through) env state back to the env so host-side use
    # (reset, viewers, manager reads) sees live buffers.
    self.env.state = self.state.env_state
    self.env._begin(self.env.state)
    return self.state

  def _log_metrics(self, host_metrics: dict, step: int | None = None) -> None:
    if self.log_dir is None:
      return
    if self._writer is None:
      self._writer = False
      if self.cfg.logger == "wandb":
        # wandb sink (reference rl/config.py:85-88); falls back to
        # tensorboard when the package is absent in this deployment.
        try:
          import wandb

          wandb.init(
            project=self.cfg.wandb_project,
            name=self.cfg.run_name or None,
            dir=self.log_dir,
            config={"runner": str(self.cfg)},
            resume="allow",
          )
          self._writer = "wandb"
        except ImportError:
          print("[runner] wandb not installed; using tensorboard.")
      if self._writer is False:
        try:
          from torch.utils.tensorboard import SummaryWriter

          self._writer = SummaryWriter(self.log_dir)
        except Exception:
          self._writer = False
    if self._writer == "wandb":
      import wandb

      wandb.log(host_metrics, step=self.iteration if step is None else step)
    elif self._writer:
      for k, v in host_metrics.items():
        self._writer.add_scalar(k, v, self.iteration if step is None else step)

  # -- inference / persistence ----------------------------------------------------

  def get_inference_policy(self):
    params = self.state.train.params
    a_norm = self.state.actor_norm

    @jax.jit
    def policy(obs):
      a_obs = a_norm(obs["policy"].astype(jnp.float32))
      return self.ac.apply(params, a_obs, method=ActorCritic.act_mean)

    return policy

  def _checkpoint_tree(self) -> dict:
    return {
      "params": self.state.train.params,
      "opt_state": self.state.train.opt_state,
      "actor_norm": self.state.actor_norm,
      "critic_norm": self.state.critic_norm,
      "lr": self.state.train.lr,
      "iteration": jnp.asarray(self.iteration, dtype=jnp.int32),
    }

  def save(self, path: str, export: bool = True) -> None:
    """Checkpoint learner state (params + optimizer + normalizers) with
    Orbax — multi-host safe, only process 0 writes single-host trees — and
    export a deployable TorchScript policy with embedded robot metadata
    (the reference exports ONNX on every save,
    tasks/velocity/rl/runner.py:16-38)."""
    import orbax.checkpoint as ocp

    from mjlab_tpu.distributed.multihost import is_primary_host

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if is_primary_host() or jax.process_count() > 1:
      # With >1 process Orbax coordinates the distributed write itself and
      # every process must participate; single-host, only write once.
      with ocp.StandardCheckpointer() as ckpt:
        ckpt.save(
          os.path.abspath(path), jax.device_get(self._checkpoint_tree()),
          force=True,
        )
    if export and is_primary_host():
      try:
        from mjlab_tpu.rl.exporter import export_policy_as_torchscript

        export_policy_as_torchscript(self, self.env, path + "_policy.pt")
        # Publish the exported policy to the artifact registry (reference
        # uploads the ONNX to wandb on every save,
        # tasks/velocity/rl/runner.py:16-38; utils/artifacts.py routes to
        # wandb when configured, else the local filesystem registry).
        # Opt-in via MJLAB_REGISTRY_PUBLISH=1 so plain local runs don't
        # grow a registry silently.
        if os.environ.get("MJLAB_REGISTRY_PUBLISH") == "1":
          from mjlab_tpu.utils.artifacts import get_registry

          name = f"policies/{self.cfg.experiment_name or 'run'}"
          dst = get_registry().publish(path + "_policy.pt", name)
          print(f"[runner] policy published: {name} -> {dst}")
      except Exception as e:
        print(f"[runner] policy export skipped: {e}")

  def load(self, path: str) -> None:
    """Restore from an Orbax checkpoint dir (or a legacy .pkl file)."""
    if path.endswith(".pkl") or os.path.isfile(path + ".pkl"):
      import pickle

      with open(path if path.endswith(".pkl") else path + ".pkl", "rb") as f:
        payload = pickle.load(f)
      opt_state = self.state.train.opt_state
      iteration = payload["iteration"]
    else:
      import orbax.checkpoint as ocp

      with ocp.StandardCheckpointer() as ckpt:
        payload = ckpt.restore(
          os.path.abspath(path), jax.device_get(self._checkpoint_tree())
        )
      opt_state = payload["opt_state"]
      iteration = int(payload["iteration"])
    self.state = self.state.replace(
      train=self.state.train.replace(
        params=payload["params"],
        opt_state=opt_state,
        lr=jnp.asarray(payload["lr"]),
      ),
      actor_norm=payload["actor_norm"],
      critic_norm=payload["critic_norm"],
    )
    self.iteration = iteration
