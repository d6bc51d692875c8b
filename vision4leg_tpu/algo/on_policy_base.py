"""Shared scaffolding for on-policy learners.

Reference: torchrl/algo/on_policy/on_rl_algo.py (process_epoch_samples +
minibatch sweeps) — here as one jitted program: GAE over the (T, E)
trajectory, then opt_epochs x shuffled time-row minibatches
(replay_buffers/on_policy.py:73-97 iteration semantics), with the
per-algorithm `_minibatch_update` supplied by subclasses.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vision4leg_tpu.collector.rollout import Transition
from vision4leg_tpu.data import gae as gae_lib


@dataclasses.dataclass(frozen=True)
class OnPolicyConfig:
  """Maps onto the reference JSON `ppo`/`general_setting` sections."""
  plr: float = 3e-4
  vlr: float = 3e-4
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
  opt_epochs: int = 1
  lr_decay: bool = True      # linear schedule (PPO/TRPO yes, VMPO no)


def param_labels(params, vf_prefixes=("vf",),
                 shared_prefixes=("encoder", "base", "backbone",
                                  "visual_base", "visual_proj",
                                  "state_mlp")):
  """Label each top-level param subtree as pf / vf / both (the shared
  encoder belongs to both optimizers, as in the reference: each torch
  optimizer is built over the full pf.parameters()/vf.parameters(), and
  a shared encoder appears in BOTH — a1_hardware aside, every reference
  starter wires one encoder into pf and vf).  The prefixes cover every
  ActorCritic module's shared-trunk names: encoder (LocoTransformer /
  VisionOnly / NatureFuse), base (State), backbone (VisualNet),
  visual_base / visual_proj / state_mlp (ImpalaFuseResidual) — heads
  (pf_*, vf_*, head, aux_head) stay single-owner."""
  def label(name):
    if any(name.startswith(p) for p in vf_prefixes):
      return "vf"
    if any(name.startswith(p) for p in shared_prefixes):
      return "both"
    return "pf"
  return {k: label(k) for k in params["params"].keys()}


def make_masked_adam(cfg: OnPolicyConfig, params, which: str,
                     base_lr: float):
  labels = param_labels(params)
  mask = {"params": {k: (v == which or v == "both")
                     for k, v in labels.items()}}
  updates_per_epoch = max(
      cfg.opt_epochs * (cfg.epoch_frames // cfg.batch_size), 1)

  def schedule(count):
    if not cfg.lr_decay:
      return base_lr
    epoch = count // updates_per_epoch
    return base_lr * (1.0 - epoch.astype(jnp.float32) / cfg.num_epochs)

  return optax.masked(
      optax.chain(
          optax.clip_by_global_norm(cfg.grad_clip),
          optax.scale_by_adam(eps=cfg.adam_eps),
          optax.scale_by_learning_rate(schedule),
      ),
      mask)


@struct.dataclass
class TrainState:
  params: Any
  pf_opt: Any
  vf_opt: Any
  epoch: jnp.ndarray           # () int32
  extras: Any = None           # algo-specific (e.g. VMPO duals)


class OnPolicyLearner:
  """Base learner; subclasses implement `_minibatch_update(ts, batch)`.

  batch = (obs, acts, advs, est_rets, old_values, old_logp, means, stds),
  all flattened (B, ...).
  """

  def __init__(self, cfg: OnPolicyConfig, apply_pi: Callable,
               apply_v: Callable, params):
    self.cfg = cfg
    self.apply_pi = apply_pi
    self.apply_v = apply_v
    self.pf_tx = make_masked_adam(cfg, params, "pf", cfg.plr)
    self.vf_tx = make_masked_adam(cfg, params, "vf", cfg.vlr)

  def init_state(self, params) -> TrainState:
    return TrainState(
        params=params,
        pf_opt=self.pf_tx.init(params),
        vf_opt=self.vf_tx.init(params),
        epoch=jnp.zeros((), jnp.int32),
        extras=self.init_extras())

  def init_extras(self):
    return None

  def _minibatch_update(self, ts: TrainState, batch):
    raise NotImplementedError

  # ------------------------------------------------------------------
  def compute_advantages(self, traj: Transition, last_value):
    cfg = self.cfg
    fn = gae_lib.gae if cfg.gae else gae_lib.discounted_returns
    kwargs = dict(gamma=cfg.discount,
                  time_limit_filter=cfg.time_limit_filter)
    if cfg.gae:
      kwargs["tau"] = cfg.tau
    return fn(traj.rewards[..., 0], traj.values[..., 0],
              traj.terminals[..., 0].astype(jnp.float32),
              traj.time_limits[..., 0].astype(jnp.float32),
              last_value, **kwargs)

  def update_per_epoch(self, ts: TrainState, traj: Transition,
                       last_value: jnp.ndarray, key: jax.Array):
    cfg = self.cfg
    T, E = traj.rewards.shape[:2]
    advs, rets = self.compute_advantages(traj, last_value)

    rows_per_batch = max(cfg.batch_size // E, 1)
    n_batches = T // rows_per_batch

    adv_metrics = {
        "advs/mean": advs.mean(), "advs/std": advs.std(),
        "advs/max": advs.max(), "advs/min": advs.min(),
    }

    def opt_epoch(ts, k):
      perm = (jax.random.permutation(k, T) if cfg.shuffle
              else jnp.arange(T))

      def mb_step(ts, i):
        idx = jax.lax.dynamic_slice_in_dim(perm, i * rows_per_batch,
                                           rows_per_batch)

        def take(x):
          return x[idx].reshape((rows_per_batch * E,) + x.shape[2:])

        batch = (take(traj.obs), take(traj.acts),
                 take(advs[..., None]), take(rets[..., None]),
                 take(traj.values), take(traj.log_probs),
                 take(traj.means), take(traj.stds))
        return self._minibatch_update(ts, batch)

      return jax.lax.scan(mb_step, ts, jnp.arange(n_batches))

    keys = jax.random.split(key, cfg.opt_epochs)
    ts, metrics = jax.lax.scan(opt_epoch, ts, keys)
    metrics = {k: v.mean() for k, v in metrics.items()}
    metrics.update(adv_metrics)
    return ts.replace(epoch=ts.epoch + 1), metrics


def normal_log_prob(mean, std, acts):
  return jnp.sum(
      -0.5 * ((acts - mean) / std) ** 2 - jnp.log(std)
      - 0.5 * jnp.log(2 * jnp.pi), axis=-1, keepdims=True)


def normal_entropy(std):
  return jnp.sum(0.5 + 0.5 * jnp.log(2 * jnp.pi) + jnp.log(std),
                 axis=-1, keepdims=True)


def normal_kl(mean_old, std_old, mean_new, std_new):
  """KL(old || new) per sample, summed over action dims."""
  return jnp.sum(
      jnp.log(std_new) - jnp.log(std_old)
      + (std_old**2 + (mean_old - mean_new)**2) / (2.0 * std_new**2) - 0.5,
      axis=-1, keepdims=True)
