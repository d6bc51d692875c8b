"""V-MPO learner (reference: torchrl/algo/on_policy/v_mpo.py:11-192).

EM-style on-policy MPO: top-half advantage filtering, learnable temperature
eta and KL-penalty alpha duals (clamped >= 1e-8), KL against the
behavior-policy distribution (frozen per-epoch target copy == collection
stats), no LR decay.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax

from vision4leg_tpu.algo.on_policy_base import (OnPolicyConfig,
                                                OnPolicyLearner, TrainState,
                                                normal_kl, normal_log_prob)


@dataclasses.dataclass(frozen=True)
class VMPOConfig(OnPolicyConfig):
  opt_epochs: int = 10
  eta_eps: float = 0.02
  alpha_eps: float = 0.1
  lr_decay: bool = False  # v_mpo.py:46-49 (schedule commented out)


class VMPOLearner(OnPolicyLearner):

  def __init__(self, cfg: VMPOConfig, apply_pi, apply_v, params):
    super().__init__(cfg, apply_pi, apply_v, params)
    # dual optimizer over (eta, alpha) with plr (v_mpo.py:35-39)
    self.dual_tx = optax.chain(optax.scale_by_adam(eps=cfg.adam_eps),
                               optax.scale_by_learning_rate(cfg.plr))

  def init_extras(self):
    duals = {"eta": jnp.asarray(1.0), "alpha": jnp.asarray(0.1)}
    return {"duals": duals, "dual_opt": self.dual_tx.init(duals)}

  def _minibatch_update(self, ts: TrainState, batch):
    cfg = self.cfg
    obs, acts, advs, est_rets, _, _, b_means, b_stds = batch
    advs = (advs - advs.mean()) / (advs.std(ddof=1) + 1e-5)

    # --- critic first (v_mpo.py:185) ---
    def vf_loss_fn(params):
      values = self.apply_v(params, obs)
      return jnp.mean((values - est_rets) ** 2)

    vf_loss, vf_grads = jax.value_and_grad(vf_loss_fn)(ts.params)
    vf_updates, vf_opt = self.vf_tx.update(vf_grads, ts.vf_opt, ts.params)
    params = optax.apply_updates(ts.params, vf_updates)

    # --- top-half advantage filter (v_mpo.py:64-73) ---
    B = advs.shape[0]
    half = B // 2
    order = jnp.argsort(-advs[:, 0])
    idx = order[:half]
    obs_h, acts_h, advs_h = obs[idx], acts[idx], advs[idx]
    bm_h, bs_h = b_means[idx], b_stds[idx]

    duals = ts.extras["duals"]

    def loss_fn(params, duals):
      eta, alpha = duals["eta"], duals["alpha"]
      mean, std, _ = self.apply_pi(params, obs_h)
      log_prob = normal_log_prob(mean, std, acts_h)
      phis = jax.nn.softmax(advs_h / jax.lax.stop_gradient(eta), axis=0)
      policy_loss = -phis * log_prob
      eta_loss = eta * cfg.eta_eps + eta * jnp.log(
          jnp.mean(jnp.exp(advs_h / eta)))
      # KL(new || behavior) per v_mpo.py:94-96 kl_divergence(dis, target_dis)
      kl = normal_kl(mean, std, bm_h, bs_h)
      alpha_loss = (alpha * cfg.alpha_eps
                    - alpha * jax.lax.stop_gradient(kl.mean()))
      policy_loss = policy_loss + jax.lax.stop_gradient(alpha) * kl
      total = policy_loss.mean() + eta_loss + alpha_loss
      return total, (policy_loss.mean(), alpha_loss, kl, log_prob)

    (loss, aux), (pf_grads, dual_grads) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(params, duals)
    pf_updates, pf_opt = self.pf_tx.update(pf_grads, ts.pf_opt, params)
    params = optax.apply_updates(params, pf_updates)
    dual_updates, dual_opt = self.dual_tx.update(
        dual_grads, ts.extras["dual_opt"], duals)
    duals = optax.apply_updates(duals, dual_updates)
    duals = jax.tree.map(lambda x: jnp.maximum(x, 1e-8), duals)

    policy_loss, alpha_loss, kl, log_prob = aux
    metrics = {
        "Training/policy_loss": policy_loss,
        "Training/vf_loss": vf_loss,
        "Training/alpha_loss": alpha_loss,
        "Training/alpha": duals["alpha"],
        "Training/eta": duals["eta"],
        "logprob/mean": log_prob.mean(),
        "KL/mean": kl.mean(),
    }
    return (ts.replace(params=params, pf_opt=pf_opt, vf_opt=vf_opt,
                       extras={"duals": duals, "dual_opt": dual_opt}),
            metrics)
