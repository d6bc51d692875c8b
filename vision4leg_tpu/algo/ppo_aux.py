"""PPO with an auxiliary self-supervised loss.

Reference: torchrl/algo/on_policy/ppo_aux.py — identical to PPO except the
actor loss adds `aux_coeff * aux_loss` from the policy network's
`forward_and_compute_aux_loss` (displacement prediction from visual
features, nets.py:488-530).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from vision4leg_tpu.algo.on_policy_base import (TrainState, normal_entropy,
                                                normal_log_prob)
from vision4leg_tpu.algo.ppo import PPOConfig, PPOLearner


@dataclasses.dataclass(frozen=True)
class PPOAuxConfig(PPOConfig):
  aux_coeff: float = 1.0


class PPOAuxLearner(PPOLearner):
  """apply_pi_aux(params, obs) -> ((mean, std, logstd), aux_loss)."""

  def __init__(self, cfg: PPOAuxConfig, apply_pi: Callable,
               apply_v: Callable, params, apply_pi_aux: Callable = None):
    super().__init__(cfg, apply_pi, apply_v, params)
    self.apply_pi_aux = apply_pi_aux

  def _minibatch_update(self, ts: TrainState, batch):
    cfg = self.cfg
    obs, acts, advs, est_rets, old_values, old_logp, _, _ = batch
    advs = (advs - advs.mean()) / (advs.std(ddof=1) + 1e-5)

    def vf_loss_fn(params):
      values = self.apply_v(params, obs)
      if cfg.clipped_value_loss:   # ppo_aux.py:110-120, same form as PPO
        clipped = old_values + jnp.clip(values - old_values,
                                        -cfg.clip_para, cfg.clip_para)
        return 0.5 * jnp.maximum((values - est_rets) ** 2,
                                 (clipped - est_rets) ** 2).mean()
      return jnp.mean((values - est_rets) ** 2)

    vf_loss, vf_grads = jax.value_and_grad(vf_loss_fn)(ts.params)
    vf_updates, vf_opt = self.vf_tx.update(vf_grads, ts.vf_opt, ts.params)
    params = optax.apply_updates(ts.params, vf_updates)

    def pf_loss_fn(params):
      (mean, std, logstd), aux_loss = self.apply_pi_aux(params, obs)
      log_prob = normal_log_prob(mean, std, acts)
      ent = normal_entropy(std)
      ratio = jnp.exp(log_prob - old_logp)
      surr = ratio * advs
      surr_clip = jnp.clip(ratio, 1.0 - cfg.clip_para,
                           1.0 + cfg.clip_para) * advs
      loss = (-jnp.mean(jnp.minimum(surr, surr_clip))
              - cfg.entropy_coeff * ent.mean()
              + cfg.aux_coeff * aux_loss)   # ppo_aux.py:74-76
      return loss, aux_loss

    (pf_loss, aux_loss), pf_grads = jax.value_and_grad(
        pf_loss_fn, has_aux=True)(params)
    pf_updates, pf_opt = self.pf_tx.update(pf_grads, ts.pf_opt, params)
    params = optax.apply_updates(params, pf_updates)

    metrics = {
        "Training/policy_loss": pf_loss,
        "Training/vf_loss": vf_loss,
        "Training/aux_loss": aux_loss,
    }
    return ts.replace(params=params, pf_opt=pf_opt, vf_opt=vf_opt), metrics
