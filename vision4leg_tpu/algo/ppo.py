"""PPO learner — the reference's workhorse algorithm, as one jitted epoch.

Reference: torchrl/algo/on_policy/ppo.py (+ a2c.py, on_rl_algo.py).
Semantics reproduced:
  * separate Adam(eps=1e-5) optimizers for pf and vf parameter sets; the
    shared encoder belongs to BOTH (the reference passes the same encoder
    module into both networks — a2c.py optimizers over
    pf.parameters()/vf.parameters()),
  * critic step first, then actor step on the updated params (ppo.py:152-153),
  * ratio against behavior log-probs (the reference recomputes them through
    a frozen `target_pf` copied once per epoch before any update, ppo.py:34;
    collection used exactly those params, so stored log-probs are identical),
  * per-minibatch advantage normalization (ppo.py:148),
  * clipped surrogate + entropy bonus, optional clipped value loss,
  * per-network grad-norm clip 0.5,
  * linear LR decay per epoch (ppo.py:30-33, algo/utils.py:28),
  * minibatch iteration: shuffled TIME rows x all envs, reshaped flat
    (replay_buffers/on_policy.py:73-97).
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
class PPOConfig(OnPolicyConfig):
  clip_para: float = 0.2
  opt_epochs: int = 10
  clipped_value_loss: bool = False


# backwards-compatible alias used by the agent
PPOTrainState = TrainState


class PPOLearner(OnPolicyLearner):

  def _minibatch_update(self, ts: TrainState, batch):
    cfg = self.cfg
    obs, acts, advs, est_rets, old_values, old_logp, _, _ = batch
    # per-minibatch advantage normalization (ppo.py:148)
    advs = (advs - advs.mean()) / (advs.std(ddof=1) + 1e-5)

    # --- critic first (ppo.py:152) ---
    def vf_loss_fn(params):
      values = self.apply_v(params, obs)
      if cfg.clipped_value_loss:
        clipped = old_values + jnp.clip(values - old_values,
                                        -cfg.clip_para, cfg.clip_para)
        return 0.5 * jnp.maximum((values - est_rets) ** 2,
                                 (clipped - est_rets) ** 2).mean()
      return jnp.mean((values - est_rets) ** 2)

    vf_loss, vf_grads = jax.value_and_grad(vf_loss_fn)(ts.params)
    vf_updates, vf_opt = self.vf_tx.update(vf_grads, ts.vf_opt, ts.params)
    params = optax.apply_updates(ts.params, vf_updates)

    # --- actor on the updated params (ppo.py:153) ---
    def pf_loss_fn(params):
      mean, std, logstd = self.apply_pi(params, obs)
      log_prob = normal_log_prob(mean, std, acts)
      ent = normal_entropy(std)
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
