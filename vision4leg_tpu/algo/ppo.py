"""PPO learner — the reference's workhorse algorithm, as one jitted epoch.

Reference: torchrl/algo/on_policy/ppo.py (+ a2c.py, on_rl_algo.py).
Semantics reproduced:
  * separate Adam(eps=1e-5) optimizers for pf and vf parameter sets; the
    shared encoder belongs to BOTH (the reference passes the same encoder
    module into both networks, so it is stepped twice per minibatch —
    a2c.py optimizers over pf.parameters()/vf.parameters()),
  * critic step first, then actor step on the updated params (ppo.py:152-153
    update() calls update_critic then update_actor),
  * ratio against behavior log-probs (the reference recomputes them through
    a frozen `target_pf` copied once per epoch before any update, ppo.py:34;
    since collection used exactly those params, storing log-probs at
    collection time is numerically identical),
  * per-minibatch advantage normalization (ppo.py:148),
  * clipped surrogate + entropy bonus, optional clipped value loss,
  * per-network grad-norm clip 0.5,
  * linear LR decay per epoch (ppo.py:30-33, algo/utils.py:28),
  * minibatch iteration: shuffled TIME rows x all envs, reshaped flat
    (replay_buffers/on_policy.py:73-97).

The whole epoch — rollout + GAE + opt_epochs x minibatch updates — compiles
to a single XLA program; data-parallel scaling comes from sharding the env
axis over the device mesh (vision4leg_tpu/parallel/mesh.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vision4leg_tpu.collector.rollout import CollectorState, Transition
from vision4leg_tpu.data import gae as gae_lib


@dataclasses.dataclass(frozen=True)
class PPOConfig:
  """Maps 1:1 onto the reference JSON `ppo` + `general_setting` sections."""
  plr: float = 3e-4
  vlr: float = 3e-4
  clip_para: float = 0.2
  opt_epochs: int = 10
  clipped_value_loss: bool = False
  entropy_coeff: float = 0.001
  discount: float = 0.99
  tau: float = 0.95          # GAE lambda
  gae: bool = True
  shuffle: bool = True
  batch_size: int = 1024
  num_epochs: int = 1500
  epoch_frames: int = 16384
  max_episode_frames: int = 999
  time_limit_filter: bool = True
  grad_clip: float = 0.5
  adam_eps: float = 1e-5


@struct.dataclass
class PPOTrainState:
  params: Any
  pf_opt: Any
  vf_opt: Any
  epoch: jnp.ndarray  # () int32


def _param_labels(params, vf_prefixes=("vf",), shared_prefixes=("encoder",
                                                                "base")):
  """Label each top-level param subtree as pf / vf / both."""
  def label(path_key):
    name = path_key
    if any(name.startswith(p) for p in vf_prefixes):
      return "vf"
    if any(name.startswith(p) for p in shared_prefixes):
      return "both"
    return "pf"
  return {k: label(k) for k in params["params"].keys()}


def make_optimizers(cfg: PPOConfig, params):
  """Masked Adam pairs over {pf-own + shared} and {vf-own + shared}."""
  labels = _param_labels(params)

  def mask(want):
    return {"params": {
        k: (v == want or v == "both") for k, v in labels.items()}}

  updates_per_epoch = cfg.opt_epochs * (cfg.epoch_frames // cfg.batch_size)

  def lr_schedule(base):
    def f(count):
      epoch = count // updates_per_epoch
      frac = 1.0 - epoch.astype(jnp.float32) / cfg.num_epochs
      return base * frac
    return f

  def masked_adam(base_lr, which):
    return optax.masked(
        optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.scale_by_adam(eps=cfg.adam_eps),
            optax.scale_by_learning_rate(lr_schedule(base_lr)),
        ),
        mask(which))

  pf_tx = masked_adam(cfg.plr, "pf")
  vf_tx = masked_adam(cfg.vlr, "vf")
  return pf_tx, vf_tx


class PPOLearner:
  """Functional PPO update. `apply_pi`/`apply_v` close over the module."""

  def __init__(self, cfg: PPOConfig, apply_pi: Callable, apply_v: Callable,
               params):
    self.cfg = cfg
    self.apply_pi = apply_pi
    self.apply_v = apply_v
    self.pf_tx, self.vf_tx = make_optimizers(cfg, params)

  def init_state(self, params) -> PPOTrainState:
    return PPOTrainState(
        params=params,
        pf_opt=self.pf_tx.init(params),
        vf_opt=self.vf_tx.init(params),
        epoch=jnp.zeros((), jnp.int32))

  # ------------------------------------------------------------------
  def _minibatch_update(self, ts: PPOTrainState, batch):
    cfg = self.cfg
    obs, acts, advs, est_rets, old_values, old_logp = batch
    # per-minibatch advantage normalization (ppo.py:148)
    advs = (advs - advs.mean()) / (advs.std() + 1e-5)

    # --- critic first (ppo.py:152) ---
    def vf_loss_fn(params):
      values = self.apply_v(params, obs)
      if cfg.clipped_value_loss:
        clipped = old_values + jnp.clip(values - old_values,
                                        -cfg.clip_para, cfg.clip_para)
        loss = 0.5 * jnp.maximum((values - est_rets) ** 2,
                                 (clipped - est_rets) ** 2).mean()
      else:
        loss = jnp.mean((values - est_rets) ** 2)
      return loss

    vf_loss, vf_grads = jax.value_and_grad(vf_loss_fn)(ts.params)
    vf_updates, vf_opt = self.vf_tx.update(vf_grads, ts.vf_opt, ts.params)
    params = optax.apply_updates(ts.params, vf_updates)

    # --- actor on the updated params (ppo.py:153) ---
    def pf_loss_fn(params):
      mean, std, logstd = self.apply_pi(params, obs)
      log_prob = jnp.sum(
          -0.5 * ((acts - mean) / std) ** 2 - jnp.log(std)
          - 0.5 * jnp.log(2 * jnp.pi), axis=-1, keepdims=True)
      ent = jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std),
                    axis=-1, keepdims=True)
      ratio = jnp.exp(log_prob - old_logp)
      surr = ratio * advs
      surr_clip = jnp.clip(ratio, 1.0 - cfg.clip_para,
                           1.0 + cfg.clip_para) * advs
      loss = -jnp.mean(jnp.minimum(surr, surr_clip))
      loss = loss - cfg.entropy_coeff * ent.mean()
      return loss, (ratio, logstd, log_prob)

    (pf_loss, aux), pf_grads = jax.value_and_grad(
        pf_loss_fn, has_aux=True)(params)
    pf_updates, pf_opt = self.pf_tx.update(pf_grads, ts.pf_opt, params)
    params = optax.apply_updates(params, pf_updates)

    ratio, logstd, log_prob = aux
    metrics = {
        "Training/policy_loss": pf_loss,
        "Training/vf_loss": vf_loss,
        "logprob/mean": log_prob.mean(),
        "log_std/mean": logstd.mean(),
        "ratio/max": ratio.max(),
        "ratio/min": ratio.min(),
    }
    return ts.replace(params=params, pf_opt=pf_opt, vf_opt=vf_opt), metrics

  # ------------------------------------------------------------------
  def update_per_epoch(self, ts: PPOTrainState, traj: Transition,
                       last_value: jnp.ndarray, key: jax.Array):
    """GAE + opt_epochs x shuffled minibatch sweeps. All shapes static."""
    cfg = self.cfg
    T, E = traj.rewards.shape[:2]

    if cfg.gae:
      advs, rets = gae_lib.gae(
          traj.rewards[..., 0], traj.values[..., 0],
          traj.terminals[..., 0].astype(jnp.float32),
          traj.time_limits[..., 0].astype(jnp.float32),
          last_value, cfg.discount, cfg.tau, cfg.time_limit_filter)
    else:
      advs, rets = gae_lib.discounted_returns(
          traj.rewards[..., 0], traj.values[..., 0],
          traj.terminals[..., 0].astype(jnp.float32),
          traj.time_limits[..., 0].astype(jnp.float32),
          last_value, cfg.discount, cfg.time_limit_filter)

    rows_per_batch = cfg.batch_size // E
    n_batches = T // rows_per_batch

    adv_metrics = {
        "advs/mean": advs.mean(), "advs/std": advs.std(),
        "advs/max": advs.max(), "advs/min": advs.min(),
    }

    def opt_epoch(carry, k):
      ts = carry
      perm = (jax.random.permutation(k, T) if cfg.shuffle
              else jnp.arange(T))

      def mb_step(ts, i):
        idx = jax.lax.dynamic_slice_in_dim(perm, i * rows_per_batch,
                                           rows_per_batch)
        def take(x):
          return x[idx].reshape((rows_per_batch * E,) + x.shape[2:])
        batch = (take(traj.obs), take(traj.acts),
                 take(advs[..., None]), take(rets[..., None]),
                 take(traj.values), take(traj.log_probs))
        return self._minibatch_update(ts, batch)

      ts, metrics = jax.lax.scan(mb_step, ts, jnp.arange(n_batches))
      return ts, metrics

    keys = jax.random.split(key, cfg.opt_epochs)
    ts, metrics = jax.lax.scan(opt_epoch, ts, keys)
    metrics = {k: v.mean() for k, v in metrics.items()}
    metrics.update(adv_metrics)
    ts = ts.replace(epoch=ts.epoch + 1)
    return ts, metrics
