"""PPO learner in JAX.

Matches the semantic surface of the external torch trainer the reference
uses (rsl_rl; config mirrored in reference rl/config.py:8-110):

- GAE(γ, λ) with bootstrap-on-timeout (rewards += γ·V·timeout, as done by
  the reference's vecenv wrapper + rsl_rl).
- Clipped surrogate + (optionally clipped) value loss + entropy bonus.
- Adaptive-KL learning rate: lr /= 1.5 when KL > 2·desired, lr *= 1.5 when
  KL < desired/2, clamped to [1e-5, 1e-2], adjusted per minibatch.
- num_learning_epochs × num_mini_batches sweeps over the flattened rollout.
- Global gradient-norm clipping.

Everything (GAE, epochs, minibatch sweep, lr adaptation) runs inside one
jitted update via lax.scan — no host round-trips during learning.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from mjlab_tpu.rl.config import PpoAlgorithmCfg
from mjlab_tpu.rl.networks import gaussian_entropy, gaussian_log_prob


@struct.dataclass
class Transition:
  actor_obs: jax.Array  # (T, B, O)
  critic_obs: jax.Array  # (T, B, Oc)
  action: jax.Array  # (T, B, A)
  reward: jax.Array  # (T, B)
  done: jax.Array  # (T, B) terminated | truncated
  time_out: jax.Array  # (T, B)
  value: jax.Array  # (T, B)
  log_prob: jax.Array  # (T, B)
  mean: jax.Array  # (T, B, A)
  std: jax.Array  # (T, B, A)


@struct.dataclass
class PpoTrainState:
  params: Any
  opt_state: Any
  lr: jax.Array  # () dynamic learning rate (adaptive-KL schedule)
  rng: jax.Array


def make_optimizer(cfg: PpoAlgorithmCfg):
  """SGD chain: clip-by-global-norm → Adam with injected dynamic lr."""
  return optax.chain(
    optax.clip_by_global_norm(cfg.max_grad_norm),
    optax.inject_hyperparams(optax.adam)(learning_rate=cfg.learning_rate),
  )


def compute_gae(t: Transition, last_value: jax.Array, gamma: float, lam: float):
  """Returns (advantages, returns), both (T, B).

  Timeout bootstrap: rsl_rl adds γ·V(s) to rewards where the episode was
  truncated rather than terminated, so value targets see the tail."""
  rewards = t.reward + gamma * t.value * t.time_out

  def scan_fn(adv_next, inp):
    reward, value, done, next_value = inp
    not_done = 1.0 - done
    delta = reward + gamma * next_value * not_done - value
    adv = delta + gamma * lam * not_done * adv_next
    return adv, adv

  next_values = jnp.concatenate([t.value[1:], last_value[None]], axis=0)
  _, advantages = jax.lax.scan(
    scan_fn,
    jnp.zeros_like(last_value),
    (rewards, t.value, t.done.astype(rewards.dtype), next_values),
    reverse=True,
  )
  returns = advantages + t.value
  return advantages, returns


def prepare_update(cfg: PpoAlgorithmCfg, batch: Transition, last_value):
  """GAE + advantage normalization + (T·B)-flattening — the data prep shared
  by both update drivers (fused scan and host loop)."""
  advantages, returns = compute_gae(batch, last_value, cfg.gamma, cfg.lam)
  if not cfg.normalize_advantage_per_mini_batch:
    advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
  T, B = batch.reward.shape
  flat = jax.tree_util.tree_map(lambda x: x.reshape((T * B,) + x.shape[2:]), batch)
  return flat, advantages.reshape(-1), returns.reshape(-1)


def make_minibatch_step(cfg: PpoAlgorithmCfg, apply_fn, optimizer):
  """Build the pure single-minibatch SGD step
  (params, opt_state, lr, flat, adv_flat, ret_flat, idx) →
  (params, opt_state, lr, metrics). The fused ppo_update scans it; the
  runner's host-loop mode jits and calls it per minibatch."""

  def loss_fn(params, mb, lr):
    mean, std, value = apply_fn(params, mb["actor_obs"], mb["critic_obs"])
    log_prob = gaussian_log_prob(mean, std, mb["action"])
    ratio = jnp.exp(log_prob - mb["old_log_prob"])

    adv = mb["adv"]
    if cfg.normalize_advantage_per_mini_batch:
      adv = (adv - adv.mean()) / (adv.std() + 1e-8)

    surr1 = -adv * ratio
    surr2 = -adv * jnp.clip(ratio, 1.0 - cfg.clip_param, 1.0 + cfg.clip_param)
    surrogate_loss = jnp.mean(jnp.maximum(surr1, surr2))

    if cfg.use_clipped_value_loss:
      value_clipped = mb["old_value"] + jnp.clip(
        value - mb["old_value"], -cfg.clip_param, cfg.clip_param
      )
      v_loss = jnp.maximum(
        jnp.square(value - mb["ret"]), jnp.square(value_clipped - mb["ret"])
      ).mean()
    else:
      v_loss = jnp.square(value - mb["ret"]).mean()

    entropy = jnp.mean(gaussian_entropy(std))
    total = surrogate_loss + cfg.value_loss_coef * v_loss - cfg.entropy_coef * entropy

    # KL(old ‖ new) for the adaptive-lr schedule (rsl_rl form).
    old_std, old_mean = mb["old_std"], mb["old_mean"]
    kl = jnp.sum(
      jnp.log(std / old_std + 1e-5)
      + (jnp.square(old_std) + jnp.square(old_mean - mean))
      / (2.0 * jnp.square(std))
      - 0.5,
      axis=-1,
    )
    aux = {
      "kl": jnp.mean(kl),
      "surrogate": surrogate_loss,
      "value_loss": v_loss,
      "entropy": entropy,
    }
    return total, aux

  grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

  def minibatch_step(params, opt_state, lr, flat, adv_flat, ret_flat, idx):
    mb = {
      "actor_obs": flat.actor_obs[idx],
      "critic_obs": flat.critic_obs[idx],
      "action": flat.action[idx],
      "old_log_prob": flat.log_prob[idx],
      "old_value": flat.value[idx],
      "old_mean": flat.mean[idx],
      "old_std": flat.std[idx],
      "adv": adv_flat[idx],
      "ret": ret_flat[idx],
    }
    (loss, aux), grads = grad_fn(params, mb, lr)

    # Adaptive-KL lr (applied before the optimizer step, per minibatch).
    if cfg.schedule == "adaptive" and cfg.desired_kl is not None:
      lr = jnp.where(aux["kl"] > cfg.desired_kl * 2.0, lr / 1.5, lr)
      lr = jnp.where(aux["kl"] < cfg.desired_kl / 2.0, lr * 1.5, lr)
      lr = jnp.clip(lr, 1e-5, 1e-2)
    # opt_state = (clip_state, InjectHyperparamsState); swap in the new lr.
    inject = opt_state[1]
    inject = inject._replace(
      hyperparams={**inject.hyperparams, "learning_rate": lr}
    )
    opt_state = (opt_state[0], inject)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    metrics = {**aux, "loss": loss, "lr": lr}
    return params, opt_state, lr, metrics

  return minibatch_step


def ppo_update(
  cfg: PpoAlgorithmCfg,
  apply_fn,
  optimizer,
  train_state: PpoTrainState,
  batch: Transition,
  last_value: jax.Array,
):
  """One PPO update over a rollout batch. Fully traced.

  apply_fn(params, actor_obs, critic_obs) -> (mean, std, value).
  Returns (new_train_state, metrics dict).
  """
  flat, adv_flat, ret_flat = prepare_update(cfg, batch, last_value)
  n = adv_flat.shape[0]
  mb_size = n // cfg.num_mini_batches
  mb_step = make_minibatch_step(cfg, apply_fn, optimizer)

  def minibatch_step(carry, idx):
    params, opt_state, lr, rng = carry
    params, opt_state, lr, metrics = mb_step(
      params, opt_state, lr, flat, adv_flat, ret_flat, idx
    )
    return (params, opt_state, lr, rng), metrics

  def epoch_step(carry, _):
    params, opt_state, lr, rng = carry
    rng, key = jax.random.split(rng)
    perm = jax.random.permutation(key, n)
    idxs = perm[: mb_size * cfg.num_mini_batches].reshape(
      cfg.num_mini_batches, mb_size
    )
    carry, metrics = jax.lax.scan(
      minibatch_step, (params, opt_state, lr, rng), idxs
    )
    return carry, metrics

  carry = (train_state.params, train_state.opt_state, train_state.lr,
           train_state.rng)
  carry, metrics = jax.lax.scan(
    epoch_step, carry, None, length=cfg.num_learning_epochs
  )
  params, opt_state, lr, rng = carry
  mean_metrics = jax.tree_util.tree_map(jnp.mean, metrics)
  new_state = PpoTrainState(params=params, opt_state=opt_state, lr=lr, rng=rng)
  return new_state, mean_metrics
