"""A2C learner (reference: torchrl/algo/on_policy/a2c.py:8-114).

Policy gradient -logp * normalized-adv with entropy bonus; value MSE;
independent grads from the pre-update params, pf step then vf step.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from vision4leg_tpu.algo.on_policy_base import (OnPolicyConfig,
                                                OnPolicyLearner, TrainState,
                                                normal_entropy,
                                                normal_log_prob)


@dataclasses.dataclass(frozen=True)
class A2CConfig(OnPolicyConfig):
  opt_epochs: int = 1
  lr_decay: bool = False  # A2C has no schedule in the reference


class A2CLearner(OnPolicyLearner):

  def _minibatch_update(self, ts: TrainState, batch):
    cfg = self.cfg
    obs, acts, advs, est_rets, _, _, _, _ = batch
    advs = (advs - advs.mean()) / (advs.std(ddof=1) + 1e-5)

    def pf_loss_fn(params):
      mean, std, _ = self.apply_pi(params, obs)
      log_prob = normal_log_prob(mean, std, acts)
      ent = normal_entropy(std)
      loss = jnp.mean(-log_prob * advs) - cfg.entropy_coeff * ent.mean()
      return loss, (log_prob, ent, std)

    def vf_loss_fn(params):
      values = self.apply_v(params, obs)
      return jnp.mean((values - est_rets) ** 2), values

    (pf_loss, (log_prob, ent, std)), pf_grads = jax.value_and_grad(
        pf_loss_fn, has_aux=True)(ts.params)
    (vf_loss, values), vf_grads = jax.value_and_grad(
        vf_loss_fn, has_aux=True)(ts.params)

    pf_updates, pf_opt = self.pf_tx.update(pf_grads, ts.pf_opt, ts.params)
    params = optax.apply_updates(ts.params, pf_updates)
    vf_updates, vf_opt = self.vf_tx.update(vf_grads, ts.vf_opt, params)
    params = optax.apply_updates(params, vf_updates)

    metrics = {
        "Training/policy_loss": pf_loss,
        "Training/vf_loss": vf_loss,
        "v_pred/mean": values.mean(),
        "std/mean": std.mean(),
        "ent": ent.mean(),
        "log_prob": log_prob.mean(),
    }
    return ts.replace(params=params, pf_opt=pf_opt, vf_opt=vf_opt), metrics


class ReinforceLearner(OnPolicyLearner):
  """Vanilla policy gradient (reference: reinforce.py:7-82): -logp * adv
  with per-minibatch advantage normalization (reinforce.py:57), where adv
  is the discounted return minus the collected values (the reference pins
  vf to ZeroNet, reinforce.py:22, so adv == return there).  The reference
  forces gae=False (reinforce.py:32) and — like A2C — inherits the
  schedule-free OnRLAlgo.update_per_epoch, so there is no lr decay; both
  are forced here to match."""

  def __init__(self, cfg, apply_pi, apply_v, params):
    cfg = dataclasses.replace(cfg, gae=False, lr_decay=False)
    super().__init__(cfg, apply_pi, apply_v, params)

  def _minibatch_update(self, ts: TrainState, batch):
    cfg = self.cfg
    obs, acts, advs, est_rets, _, _, _, _ = batch
    advs = (advs - advs.mean()) / (advs.std(ddof=1) + 1e-5)

    def pf_loss_fn(params):
      mean, std, _ = self.apply_pi(params, obs)
      log_prob = normal_log_prob(mean, std, acts)
      ent = normal_entropy(std)
      return (jnp.mean(-log_prob * advs)
              - cfg.entropy_coeff * ent.mean())

    pf_loss, pf_grads = jax.value_and_grad(pf_loss_fn)(ts.params)
    pf_updates, pf_opt = self.pf_tx.update(pf_grads, ts.pf_opt, ts.params)
    params = optax.apply_updates(ts.params, pf_updates)
    return (ts.replace(params=params, pf_opt=pf_opt),
            {"Training/policy_loss": pf_loss})
