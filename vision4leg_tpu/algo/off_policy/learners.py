"""Off-policy learners: SAC family, TD3, DDPG, DQN family.

Reference: torchrl/algo/off_policy/*.py.  Exported by the reference but
unused by the papers (README.md:92 "users can still use them") — provided
here for API/capability parity, each as a pure jitted `update(state, batch,
key) -> (state, metrics)` plus target-network soft/hard updates
(algo/utils.py:16-26, off_rl_algo.py:38-52).

All continuous-control learners act in tanh-squashed [-1, 1] space (the
reference pairs them with the NormAct wrapper).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vision4leg_tpu.models import distributions as tanh_normal


@dataclasses.dataclass(frozen=True)
class OffPolicyConfig:
  plr: float = 3e-4
  qlr: float = 3e-4
  discount: float = 0.99
  batch_size: int = 256
  # target updates (off_rl_algo.py:27-31)
  use_soft_update: bool = True
  tau: float = 0.001
  target_hard_update_period: int = 1000
  opt_times: int = 1
  # SAC
  automatic_entropy_tuning: bool = True
  target_entropy: float | None = None
  policy_std_reg_weight: float = 1e-3
  policy_mean_reg_weight: float = 1e-3
  # TD3 (td3.py)
  policy_update_delay: int = 2
  norm_std_policy: float = 0.2
  noise_clip: float = 0.5
  grad_clip: float | None = None
  # DQN
  epsilon: float = 0.05
  num_quantiles: int = 32    # QRDQN
  num_heads: int = 10        # BootstrappedDQN


@struct.dataclass
class OffPolicyState:
  params: Any          # dict of network param trees
  target_params: Any
  opt_states: Any      # dict matching params keys
  extras: Any          # e.g. log_alpha + its opt state
  update_count: jnp.ndarray


def soft_update(target, online, tau):
  return jax.tree.map(lambda t, o: (1 - tau) * t + tau * o, target, online)


def maybe_update_targets(cfg: OffPolicyConfig, state: OffPolicyState,
                         keys, gate=None) -> OffPolicyState:
  """Soft update every step or hard copy on a period (rl_algo.py:173-186).

  `gate` (traced bool) suppresses the update entirely when False — TD3
  only touches its targets inside the delayed policy branch (td3.py:143).
  """
  if cfg.use_soft_update:
    new_t = {k: soft_update(state.target_params[k], state.params[k], cfg.tau)
             for k in keys}
  else:
    do = (state.update_count % cfg.target_hard_update_period) == 0
    if gate is not None:
      do = do & gate
      gate = None
    new_t = {k: jax.tree.map(
        lambda t, o: jnp.where(do, o, t), state.target_params[k],
        state.params[k]) for k in keys}
  if gate is not None:
    new_t = {k: jax.tree.map(
        lambda n, t: jnp.where(gate, n, t), new_t[k],
        state.target_params[k]) for k in keys}
  targets = dict(state.target_params)
  targets.update(new_t)
  return state.replace(target_params=targets)


def _adam(lr):
  return optax.adam(lr)


class TwinSACQLearner:
  """Twin SAC without V (twin_sac_q.py:10-215): the canonical modern SAC."""

  def __init__(self, cfg: OffPolicyConfig, apply_pf: Callable,
               apply_qf: Callable, action_dim: int):
    self.cfg = cfg
    self.apply_pf = apply_pf    # (params, obs) -> (mean, std, logstd)
    self.apply_qf = apply_qf    # (params, obs, act) -> (B, 1)
    self.target_entropy = (cfg.target_entropy if cfg.target_entropy
                           is not None else -float(action_dim))
    self.pf_tx = _adam(cfg.plr)
    self.qf_tx = _adam(cfg.qlr)
    self.alpha_tx = _adam(cfg.plr)

  def init_state(self, pf_params, qf1_params, qf2_params) -> OffPolicyState:
    params = {"pf": pf_params, "qf1": qf1_params, "qf2": qf2_params}
    log_alpha = jnp.zeros(())
    return OffPolicyState(
        params=params,
        target_params={"qf1": qf1_params, "qf2": qf2_params},
        opt_states={"pf": self.pf_tx.init(pf_params),
                    "qf1": self.qf_tx.init(qf1_params),
                    "qf2": self.qf_tx.init(qf2_params)},
        extras={"log_alpha": log_alpha,
                "alpha_opt": self.alpha_tx.init(log_alpha)},
        update_count=jnp.zeros((), jnp.int32))

  def update(self, state: OffPolicyState, batch, key):
    cfg = self.cfg
    obs, acts = batch["obs"], batch["acts"]
    next_obs = batch["next_obs"]
    rewards, terminals = batch["rewards"], batch["terminals"]
    k1, k2 = jax.random.split(key)

    p = state.params
    mean, std, logstd = self.apply_pf(p["pf"], obs)
    new_actions, _, log_probs = tanh_normal.sample_with_log_prob(
        k1, mean, std)

    # alpha (twin_sac_q.py:113-121)
    if cfg.automatic_entropy_tuning:
      def alpha_loss_fn(log_alpha):
        return -(log_alpha * jax.lax.stop_gradient(
            log_probs + self.target_entropy)).mean()
      a_loss, a_grad = jax.value_and_grad(alpha_loss_fn)(
          state.extras["log_alpha"])
      a_up, a_opt = self.alpha_tx.update(a_grad, state.extras["alpha_opt"])
      log_alpha = optax.apply_updates(state.extras["log_alpha"], a_up)
      alpha = jax.lax.stop_gradient(jnp.exp(log_alpha))
      extras = {"log_alpha": log_alpha, "alpha_opt": a_opt}
    else:
      alpha, a_loss = 1.0, 0.0
      extras = state.extras

    # targets (twin_sac_q.py:125-143)
    t_mean, t_std, _ = self.apply_pf(p["pf"], next_obs)
    t_act, _, t_logp = tanh_normal.sample_with_log_prob(k2, t_mean, t_std)
    tq = jnp.minimum(
        self.apply_qf(state.target_params["qf1"], next_obs, t_act),
        self.apply_qf(state.target_params["qf2"], next_obs, t_act))
    target_v = tq - alpha * t_logp
    q_target = jax.lax.stop_gradient(
        rewards + (1.0 - terminals) * cfg.discount * target_v)

    def qf_loss_fn(qf_params, which):
      q = self.apply_qf(qf_params, obs, acts)
      return jnp.mean((q - q_target) ** 2)

    q1_loss, g1 = jax.value_and_grad(qf_loss_fn)(p["qf1"], 1)
    q2_loss, g2 = jax.value_and_grad(qf_loss_fn)(p["qf2"], 2)

    def pf_loss_fn(pf_params):
      mean, std, logstd = self.apply_pf(pf_params, obs)
      new_act, _, logp = tanh_normal.sample_with_log_prob(k1, mean, std)
      q_new = jnp.minimum(self.apply_qf(p["qf1"], obs, new_act),
                          self.apply_qf(p["qf2"], obs, new_act))
      loss = (alpha * logp - q_new).mean()
      loss += cfg.policy_std_reg_weight * (logstd ** 2).mean()
      loss += cfg.policy_mean_reg_weight * (mean ** 2).mean()
      return loss

    pf_loss, gp = jax.value_and_grad(pf_loss_fn)(p["pf"])

    params = dict(p)
    opts = dict(state.opt_states)
    for name, grad, tx in (("pf", gp, self.pf_tx), ("qf1", g1, self.qf_tx),
                           ("qf2", g2, self.qf_tx)):
      up, opts[name] = tx.update(grad, opts[name], params[name])
      params[name] = optax.apply_updates(params[name], up)

    state = state.replace(params=params, opt_states=opts, extras=extras,
                          update_count=state.update_count + 1)
    state = maybe_update_targets(cfg, state, ("qf1", "qf2"))
    metrics = {
        "Training/policy_loss": pf_loss,
        "Training/qf1_loss": q1_loss,
        "Training/qf2_loss": q2_loss,
        "Alpha": alpha if cfg.automatic_entropy_tuning else jnp.asarray(1.0),
        "log_probs/mean": log_probs.mean(),
        "Reward_Mean": rewards.mean(),
    }
    return state, metrics


class TD3Learner:
  """TD3 (td3.py:10-180): twin critics, target policy smoothing, delayed
  deterministic actor updates."""

  def __init__(self, cfg: OffPolicyConfig, apply_pf: Callable,
               apply_qf: Callable):
    self.cfg = cfg
    self.apply_pf = apply_pf   # (params, obs) -> tanh action
    self.apply_qf = apply_qf
    self.pf_tx = _adam(cfg.plr)
    self.qf_tx = _adam(cfg.qlr)

  def init_state(self, pf_params, qf1_params, qf2_params) -> OffPolicyState:
    params = {"pf": pf_params, "qf1": qf1_params, "qf2": qf2_params}
    return OffPolicyState(
        params=params, target_params=dict(params),
        opt_states={"pf": self.pf_tx.init(pf_params),
                    "qf1": self.qf_tx.init(qf1_params),
                    "qf2": self.qf_tx.init(qf2_params)},
        extras=None, update_count=jnp.zeros((), jnp.int32))

  def update(self, state: OffPolicyState, batch, key):
    cfg = self.cfg
    obs, acts = batch["obs"], batch["acts"]
    next_obs = batch["next_obs"]
    rewards, terminals = batch["rewards"], batch["terminals"]

    t_act = self.apply_pf(state.target_params["pf"], next_obs)
    noise = jnp.clip(
        cfg.norm_std_policy * jax.random.normal(key, t_act.shape),
        -cfg.noise_clip, cfg.noise_clip)
    t_act = jnp.clip(t_act + noise, -1.0, 1.0)
    tq = jnp.minimum(
        self.apply_qf(state.target_params["qf1"], next_obs, t_act),
        self.apply_qf(state.target_params["qf2"], next_obs, t_act))
    q_target = jax.lax.stop_gradient(
        rewards + (1.0 - terminals) * cfg.discount * tq)

    def qf_loss_fn(qf_params):
      return jnp.mean((self.apply_qf(qf_params, obs, acts) - q_target) ** 2)

    q1_loss, g1 = jax.value_and_grad(qf_loss_fn)(state.params["qf1"])
    q2_loss, g2 = jax.value_and_grad(qf_loss_fn)(state.params["qf2"])

    params = dict(state.params)
    opts = dict(state.opt_states)
    for name, grad in (("qf1", g1), ("qf2", g2)):
      up, opts[name] = self.qf_tx.update(grad, opts[name], params[name])
      params[name] = optax.apply_updates(params[name], up)

    # delayed policy update (td3.py:58+124: training_update_num increments
    # BEFORE the `num % policy_update_delay` truthiness check, so the FIRST
    # update steps the policy and every `delay`-th one skips it)
    count = state.update_count + 1
    do_pf = (count % cfg.policy_update_delay) != 0

    def pf_loss_fn(pf_params):
      a = self.apply_pf(pf_params, obs)
      return -self.apply_qf(params["qf1"], obs, a).mean()

    pf_loss, gp = jax.value_and_grad(pf_loss_fn)(params["pf"])
    # a zeroed gradient still advances Adam's moments, which the reference's
    # skipped optimizer step does not — suppress the whole update instead
    up, pf_opt = self.pf_tx.update(
        jax.tree.map(lambda g: g * do_pf, gp), opts["pf"], params["pf"])
    opts["pf"] = jax.tree.map(lambda n, o: jnp.where(do_pf, n, o),
                              pf_opt, opts["pf"])
    params["pf"] = jax.tree.map(
        lambda p, u: jnp.where(do_pf, p + u, p), params["pf"], up)

    state = state.replace(params=params, opt_states=opts,
                          update_count=count)
    # targets only move when the policy stepped (td3.py:143)
    state = maybe_update_targets(cfg, state, ("pf", "qf1", "qf2"),
                                 gate=do_pf)
    return state, {
        "Training/policy_loss": pf_loss,
        "Training/qf1_loss": q1_loss,
        "Training/qf2_loss": q2_loss,
        "Reward_Mean": rewards.mean(),
    }


class DDPGLearner:
  """DDPG (ddpg.py): single critic, deterministic actor."""

  def __init__(self, cfg: OffPolicyConfig, apply_pf, apply_qf):
    self.cfg = cfg
    self.apply_pf = apply_pf
    self.apply_qf = apply_qf
    self.pf_tx = _adam(cfg.plr)
    self.qf_tx = _adam(cfg.qlr)

  def init_state(self, pf_params, qf_params) -> OffPolicyState:
    params = {"pf": pf_params, "qf": qf_params}
    return OffPolicyState(
        params=params, target_params=dict(params),
        opt_states={"pf": self.pf_tx.init(pf_params),
                    "qf": self.qf_tx.init(qf_params)},
        extras=None, update_count=jnp.zeros((), jnp.int32))

  def update(self, state: OffPolicyState, batch, key):
    del key
    cfg = self.cfg
    obs, acts = batch["obs"], batch["acts"]
    next_obs = batch["next_obs"]
    rewards, terminals = batch["rewards"], batch["terminals"]

    t_act = self.apply_pf(state.target_params["pf"], next_obs)
    tq = self.apply_qf(state.target_params["qf"], next_obs, t_act)
    q_target = jax.lax.stop_gradient(
        rewards + (1.0 - terminals) * cfg.discount * tq)

    def qf_loss_fn(qf_params):
      return jnp.mean((self.apply_qf(qf_params, obs, acts) - q_target) ** 2)

    qf_loss, gq = jax.value_and_grad(qf_loss_fn)(state.params["qf"])

    def pf_loss_fn(pf_params):
      a = self.apply_pf(pf_params, obs)
      return -self.apply_qf(state.params["qf"], obs, a).mean()

    pf_loss, gp = jax.value_and_grad(pf_loss_fn)(state.params["pf"])

    params = dict(state.params)
    opts = dict(state.opt_states)
    for name, grad, tx in (("qf", gq, self.qf_tx), ("pf", gp, self.pf_tx)):
      up, opts[name] = tx.update(grad, opts[name], params[name])
      params[name] = optax.apply_updates(params[name], up)

    state = state.replace(params=params, opt_states=opts,
                          update_count=state.update_count + 1)
    state = maybe_update_targets(cfg, state, ("pf", "qf"))
    return state, {"Training/policy_loss": pf_loss,
                   "Training/qf_loss": qf_loss,
                   "Reward_Mean": rewards.mean()}


class DQNLearner:
  """DQN (dqn.py) / QRDQN (qrdqn.py) / Bootstrapped DQN
  (bootstrapped_dqn.py), selected by the apply function's output shape:
  (B, A) plain, (B, A, Q) quantile, (B, K, A) bootstrapped."""

  def __init__(self, cfg: OffPolicyConfig, apply_qf, mode: str = "dqn"):
    assert mode in ("dqn", "qrdqn", "bootstrapped")
    self.cfg = cfg
    self.apply_qf = apply_qf
    self.mode = mode
    self.qf_tx = _adam(cfg.qlr)

  def init_state(self, qf_params) -> OffPolicyState:
    return OffPolicyState(
        params={"qf": qf_params}, target_params={"qf": qf_params},
        opt_states={"qf": self.qf_tx.init(qf_params)},
        extras=None, update_count=jnp.zeros((), jnp.int32))

  def update(self, state: OffPolicyState, batch, key):
    cfg = self.cfg
    obs, acts = batch["obs"], batch["acts"]   # acts: (B,) int32
    next_obs = batch["next_obs"]
    rewards, terminals = batch["rewards"], batch["terminals"]
    acts = acts.astype(jnp.int32)

    tq = self.apply_qf(state.target_params["qf"], next_obs)

    def qf_loss_fn(qf_params):
      q = self.apply_qf(qf_params, obs)
      if self.mode == "dqn":
        target = rewards[:, 0] + (1 - terminals[:, 0]) * cfg.discount * (
            jnp.max(tq, axis=-1))
        pred = jnp.take_along_axis(q, acts[:, None], axis=-1)[:, 0]
        return jnp.mean((pred - jax.lax.stop_gradient(target)) ** 2)
      if self.mode == "bootstrapped":
        # (B, K, A): per-head TD loss, weighted by the Bernoulli bootstrap
        # masks stored at collection time, summed over heads / K and
        # averaged over the batch — exactly
        # (mse_losses * masks / head_num).sum(1).mean()
        # (bootstrapped_dqn.py:73-90).  Without masks (all ones) this is
        # the plain head-average.
        target = rewards[:, None, 0:1] + (
            1 - terminals[:, None, 0:1]) * cfg.discount * jnp.max(
                tq, axis=-1, keepdims=True)
        pred = jnp.take_along_axis(
            q, acts[:, None, None].repeat(q.shape[1], 1), axis=-1)
        mse = (pred - jax.lax.stop_gradient(target)) ** 2    # (B, K, 1)
        masks = batch.get("masks")
        if masks is not None:
          mse = mse * masks.reshape(mse.shape[0], mse.shape[1], 1)
        return jnp.mean(mse)
      # QRDQN (qrdqn.py:23+): quantile regression Huber loss
      nq = cfg.num_quantiles
      taus = (jnp.arange(nq) + 0.5) / nq
      next_best = jnp.argmax(jnp.mean(tq, axis=-1), axis=-1)   # (B,)
      t_quant = jnp.take_along_axis(
          tq, next_best[:, None, None].repeat(nq, -1), axis=1)[:, 0]
      target = rewards + (1 - terminals) * cfg.discount * t_quant
      target = jax.lax.stop_gradient(target)                   # (B, Q)
      pred = jnp.take_along_axis(
          q, acts[:, None, None].repeat(nq, -1), axis=1)[:, 0]  # (B, Q)
      u = target[:, None, :] - pred[:, :, None]                # (B, Q, Q')
      huber = jnp.where(jnp.abs(u) <= 1.0, 0.5 * u**2,
                        jnp.abs(u) - 0.5)
      weight = jnp.abs(taus[None, :, None] - (u < 0))
      # full mean over (B, Q, Q'), the reference's reduction
      # (utils.py:5-9 quantile_regression_loss: loss.mean()) — NOT the
      # paper's sum-over-pred-quantiles, which is Q x larger (Adam is
      # scale-invariant so dynamics match either way, but the loss metric
      # and the golden update only pin down one choice)
      return jnp.mean(weight * huber)

    qf_loss, gq = jax.value_and_grad(qf_loss_fn)(state.params["qf"])
    up, qf_opt = self.qf_tx.update(gq, state.opt_states["qf"],
                                   state.params["qf"])
    params = {"qf": optax.apply_updates(state.params["qf"], up)}
    state = state.replace(params=params, opt_states={"qf": qf_opt},
                          update_count=state.update_count + 1)
    state = maybe_update_targets(cfg, state, ("qf",))
    return state, {"Training/qf_loss": qf_loss,
                   "Reward_Mean": rewards.mean()}


class SACLearner:
  """Original SAC with a state-value function (sac.py:10-180): V target
  network, Q + V + policy updates, optional entropy tuning."""

  def __init__(self, cfg: OffPolicyConfig, apply_pf: Callable,
               apply_qf: Callable, apply_vf: Callable, action_dim: int,
               twin: bool = False):
    self.cfg = cfg
    self.apply_pf = apply_pf
    self.apply_qf = apply_qf   # (params, obs, act) -> (B, 1)
    self.apply_vf = apply_vf   # (params, obs) -> (B, 1)
    self.twin = twin           # TwinSAC (twin_sac.py): min over two Qs
    self.target_entropy = (cfg.target_entropy if cfg.target_entropy
                           is not None else -float(action_dim))
    self.pf_tx = _adam(cfg.plr)
    self.qf_tx = _adam(cfg.qlr)
    self.vf_tx = _adam(cfg.qlr)
    self.alpha_tx = _adam(cfg.plr)

  def init_state(self, pf_params, qf_params, vf_params,
                 qf2_params=None) -> OffPolicyState:
    params = {"pf": pf_params, "qf": qf_params, "vf": vf_params}
    opts = {"pf": self.pf_tx.init(pf_params),
            "qf": self.qf_tx.init(qf_params),
            "vf": self.vf_tx.init(vf_params)}
    if self.twin:
      params["qf2"] = qf2_params
      opts["qf2"] = self.qf_tx.init(qf2_params)
    log_alpha = jnp.zeros(())
    return OffPolicyState(
        params=params, target_params={"vf": vf_params}, opt_states=opts,
        extras={"log_alpha": log_alpha,
                "alpha_opt": self.alpha_tx.init(log_alpha)},
        update_count=jnp.zeros((), jnp.int32))

  def _q_min(self, params, obs, act):
    q = self.apply_qf(params["qf"], obs, act)
    if self.twin:
      q = jnp.minimum(q, self.apply_qf(params["qf2"], obs, act))
    return q

  def update(self, state: OffPolicyState, batch, key):
    cfg = self.cfg
    obs, acts = batch["obs"], batch["acts"]
    next_obs = batch["next_obs"]
    rewards, terminals = batch["rewards"], batch["terminals"]
    p = state.params

    mean, std, logstd = self.apply_pf(p["pf"], obs)
    new_actions, _, log_probs = tanh_normal.sample_with_log_prob(
        key, mean, std)

    if cfg.automatic_entropy_tuning:
      def alpha_loss_fn(log_alpha):
        return -(log_alpha * jax.lax.stop_gradient(
            log_probs + self.target_entropy)).mean()
      a_loss, a_grad = jax.value_and_grad(alpha_loss_fn)(
          state.extras["log_alpha"])
      a_up, a_opt = self.alpha_tx.update(a_grad, state.extras["alpha_opt"])
      log_alpha = optax.apply_updates(state.extras["log_alpha"], a_up)
      alpha = jnp.exp(log_alpha)
      extras = {"log_alpha": log_alpha, "alpha_opt": a_opt}
    else:
      alpha = 1.0
      extras = state.extras

    # QF loss: target from the V target network (sac.py:121-125)
    target_v = self.apply_vf(state.target_params["vf"], next_obs)
    q_target = jax.lax.stop_gradient(
        rewards + (1.0 - terminals) * cfg.discount * target_v)

    def qf_loss_fn(qf_params):
      return jnp.mean((self.apply_qf(qf_params, obs, acts) - q_target) ** 2)

    qf_loss, gq = jax.value_and_grad(qf_loss_fn)(p["qf"])
    grads = {"qf": gq}
    if self.twin:
      qf2_loss, gq2 = jax.value_and_grad(qf_loss_fn)(p["qf2"])
      grads["qf2"] = gq2

    # VF loss: V <- Q(s, a_new) - alpha logp (sac.py:127-133)
    q_new = self._q_min(p, obs, new_actions)
    v_target = jax.lax.stop_gradient(q_new - alpha * log_probs)

    def vf_loss_fn(vf_params):
      return jnp.mean((self.apply_vf(vf_params, obs) - v_target) ** 2)

    vf_loss, gv = jax.value_and_grad(vf_loss_fn)(p["vf"])
    grads["vf"] = gv

    # policy loss (reparameterized, sac.py:135-150)
    def pf_loss_fn(pf_params):
      mean, std, logstd = self.apply_pf(pf_params, obs)
      a, _, logp = tanh_normal.sample_with_log_prob(key, mean, std)
      q = self._q_min(p, obs, a)
      loss = (jax.lax.stop_gradient(alpha) * logp - q).mean()
      loss += cfg.policy_std_reg_weight * (logstd ** 2).mean()
      loss += cfg.policy_mean_reg_weight * (mean ** 2).mean()
      return loss

    pf_loss, gp = jax.value_and_grad(pf_loss_fn)(p["pf"])
    grads["pf"] = gp

    params = dict(p)
    opts = dict(state.opt_states)
    for name, tx in (("pf", self.pf_tx), ("qf", self.qf_tx),
                     ("vf", self.vf_tx)):
      up, opts[name] = tx.update(grads[name], opts[name], params[name])
      params[name] = optax.apply_updates(params[name], up)
    if self.twin:
      up, opts["qf2"] = self.qf_tx.update(grads["qf2"], opts["qf2"],
                                          params["qf2"])
      params["qf2"] = optax.apply_updates(params["qf2"], up)

    state = state.replace(params=params, opt_states=opts, extras=extras,
                          update_count=state.update_count + 1)
    state = maybe_update_targets(cfg, state, ("vf",))
    metrics = {
        "Training/policy_loss": pf_loss,
        "Training/qf_loss": qf_loss,
        "Training/vf_loss": vf_loss,
        "log_probs/mean": log_probs.mean(),
        "Reward_Mean": rewards.mean(),
    }
    if cfg.automatic_entropy_tuning:
      metrics["Alpha"] = alpha
    return state, metrics
