"""TRPO learner (reference: torchrl/algo/on_policy/trpo.py:13-287).

Full-batch natural policy gradient: conjugate-gradient solve of
F^-1 g with Fisher-vector products as Hessian-of-KL jvp's, sqrt-scaled
step to the max_kl trust region, 10-backtrack line search on the
surrogate, then v_opt_times minibatch value sweeps.

The policy-parameter subset (everything the pf optimizer owns in the
reference: shared base + pf head + logstd) is flattened with
`ravel_pytree` for the vector algebra.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from vision4leg_tpu.algo.on_policy_base import (OnPolicyConfig,
                                                OnPolicyLearner, TrainState,
                                                normal_entropy, normal_kl,
                                                normal_log_prob,
                                                param_labels)


@dataclasses.dataclass(frozen=True)
class TRPOConfig(OnPolicyConfig):
  max_kl: float = 0.01
  cg_damping: float = 0.1
  cg_iters: int = 10
  residual_tol: float = 1e-10
  v_opt_times: int = 10
  opt_epochs: int = 1


class TRPOLearner(OnPolicyLearner):

  def update_per_epoch(self, ts: TrainState, traj, last_value, key):
    cfg = self.cfg
    T, E = traj.rewards.shape[:2]
    advs, rets = self.compute_advantages(traj, last_value)

    flat = lambda x: x.reshape((T * E,) + x.shape[2:])
    obs, acts = flat(traj.obs), flat(traj.acts)
    advs_f = flat(advs[..., None])
    # ddof=1: torch .std() is Bessel-corrected; the scale reaches g's
    # ratio/entropy mix and hence the CG direction (trpo.py:172)
    advs_n = (advs_f - advs_f.mean()) / (advs_f.std(ddof=1) + 1e-4)

    # split params into the pf-owned subset (optimized by TRPO) + rest
    labels = param_labels(ts.params)
    pf_names = {k for k, v in labels.items() if v != "vf"}

    def split(params):
      pf = {"params": {k: v for k, v in params["params"].items()
                       if k in pf_names}}
      return pf

    def merge(params, pf):
      merged = dict(params["params"])
      merged.update(pf["params"])
      return {"params": merged}

    pf_params = split(ts.params)
    theta0, unravel = ravel_pytree(pf_params)

    def pi(theta):
      params = merge(ts.params, unravel(theta))
      return self.apply_pi(params, obs)

    mean0, std0, _ = pi(theta0)
    mean0, std0 = jax.lax.stop_gradient(mean0), jax.lax.stop_gradient(std0)
    logp0 = jax.lax.stop_gradient(normal_log_prob(mean0, std0, acts))

    def surrogate(theta):
      mean, std, _ = pi(theta)
      log_prob = normal_log_prob(mean, std, acts)
      ent = normal_entropy(std)
      ratio = jnp.exp(log_prob - logp0)
      return (-jnp.mean(ratio * advs_n)
              - cfg.entropy_coeff * ent.mean())

    def ls_surrogate(theta):
      # the reference's LINE-SEARCH objective has NO entropy term
      # (trpo.py:114-131 surrogate_loss: -mean(ratio * advs) only), even
      # though the policy gradient g it searches along includes one
      # (trpo.py:181-186) — replicated exactly
      mean, std, _ = pi(theta)
      ratio = jnp.exp(normal_log_prob(mean, std, acts) - logp0)
      return -jnp.mean(ratio * advs_n)

    def mean_kl(theta):
      mean, std, _ = pi(theta)
      # KL(current-theta dist || frozen) as trpo.py:30-64 (old = grad side).
      # Axis quirk replicated exactly: the reference evaluates the KL on the
      # UNFLATTENED (T, E, A) batch and `torch.sum(..., 1)` sums the ENV
      # axis — not the action axis — before the mean over (T, A)
      # (trpo.py:37-40 with update()'s obs straight from the buffer,
      # trpo.py:159-163).  Its mean-KL is therefore sum_all/(T*A): the
      # trust region scales with E/A, and because CG is damped the warp is
      # direction-dependent (sqrt(E/A) on high-curvature blocks), so a
      # per-sample KL would NOT land on the reference's parameters.
      kl = normal_kl(mean, std, mean0, std0)   # (T*E, 1), summed over A
      return jnp.sum(kl) / (T * acts.shape[-1])

    g = jax.grad(surrogate)(theta0)

    def fvp(v):
      # Hessian of KL at theta0 times v, + damping (trpo.py:66-87)
      return (jax.jvp(jax.grad(mean_kl), (theta0,), (v,))[1]
              + cfg.cg_damping * v)

    # conjugate gradient on F x = -g (trpo.py:89-113)
    b = -g

    def cg_body(state, _):
      x, r, p, rdotr = state
      z = fvp(p)
      alpha = rdotr / jnp.dot(p, z)
      x = x + alpha * p
      r = r - alpha * z
      new_rdotr = jnp.dot(r, r)
      p = r + (new_rdotr / rdotr) * p
      return (x, r, p, new_rdotr), None

    x0 = jnp.zeros_like(b)
    (step_dir, _, _, _), _ = jax.lax.scan(
        cg_body, (x0, b, b, jnp.dot(b, b)), None, length=cfg.cg_iters)

    shs = 0.5 * jnp.dot(step_dir, fvp(step_dir))
    lm = jnp.sqrt(shs / cfg.max_kl)
    fullstep = step_dir / lm
    gdotstepdir = jnp.dot(-g, step_dir)
    expected_rate = gdotstepdir / lm

    # backtracking line search (trpo.py:133-152), unrolled 10 halvings
    fval0 = surrogate(theta0)
    ls_fval0 = ls_surrogate(theta0)

    def ls_body(carry, stepfrac):
      theta_best, accepted = carry
      theta_new = theta0 + stepfrac * fullstep
      newf = ls_surrogate(theta_new)
      improve = ls_fval0 - newf
      ok = ((improve / (expected_rate * stepfrac) > 0.1)
            & (improve > 0) & (~accepted))
      theta_best = jnp.where(ok, theta_new, theta_best)
      return (theta_best, accepted | ok), None

    fracs = 0.5 ** jnp.arange(10, dtype=jnp.float32)
    (theta_new, _), _ = jax.lax.scan(ls_body, (theta0, jnp.array(False)),
                                     fracs)
    theta_new = jnp.where(jnp.any(jnp.isnan(theta_new)), theta0, theta_new)
    params = merge(ts.params, unravel(theta_new))
    ts = ts.replace(params=params)

    pf_metrics = {
        "Training/policy_loss": fval0,
        "Training/kl_after": mean_kl(theta_new),
        "advs/mean": advs_f.mean(), "advs/std": advs_f.std(),
    }

    # --- value sweeps (trpo.py:236-276) ---
    rows_per_batch = max(cfg.batch_size // E, 1)
    n_batches = T // rows_per_batch

    def vf_epoch(ts, k):
      perm = (jax.random.permutation(k, T) if cfg.shuffle
              else jnp.arange(T))

      def mb(ts, i):
        idx = jax.lax.dynamic_slice_in_dim(perm, i * rows_per_batch,
                                           rows_per_batch)
        ob = traj.obs[idx].reshape((rows_per_batch * E, -1))
        rt = rets[idx].reshape((rows_per_batch * E, 1))

        def vf_loss_fn(params):
          values = self.apply_v(params, ob)
          return 0.5 * jnp.mean((values - rt) ** 2)

        vf_loss, grads = jax.value_and_grad(vf_loss_fn)(ts.params)
        updates, vf_opt = self.vf_tx.update(grads, ts.vf_opt, ts.params)
        params = optax.apply_updates(ts.params, updates)
        return ts.replace(params=params, vf_opt=vf_opt), vf_loss

      return jax.lax.scan(mb, ts, jnp.arange(n_batches))

    keys = jax.random.split(key, cfg.v_opt_times)
    ts, vf_losses = jax.lax.scan(vf_epoch, ts, keys)
    metrics = dict(pf_metrics)
    metrics["Training/vf_loss"] = vf_losses.mean()
    return ts.replace(epoch=ts.epoch + 1), metrics
