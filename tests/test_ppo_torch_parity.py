"""Cross-framework parity: one PPO epoch (minibatch sweeps incl. shared
encoder, dual Adam, grad clip, adv normalization) must produce the same
updated parameters as a faithful torch reimplementation of the
reference's update math (torchrl/algo/on_policy/ppo.py:42-153, a2c.py).

This pins the full update semantics — critic-then-actor ordering on a
SHARED encoder (ppo_state.py:93-104 vf.base = pf.base), per-minibatch
advantage normalization (ppo.py:148), clipped surrogate against frozen
behavior log-probs, per-optimizer global-norm clip 0.5, Adam eps 1e-5 —
not just the loss values.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import flax.linen as nn

from vision4leg_tpu.algo.ppo import PPOConfig, PPOLearner
from vision4leg_tpu.collector.rollout import Transition
from vision4leg_tpu.data import gae as gae_lib

OBS, ADIM, HID = 5, 2, 8
T, E = 8, 4


class _TinyAC(nn.Module):
  """Shared tanh encoder -> Gaussian mean head + value head (the
  ppo_state wiring: one base in both optimizers)."""

  def setup(self):
    self.encoder_dense = nn.Dense(HID)
    self.pf_mean_d = nn.Dense(ADIM, name="pf_mean")
    self.vf_out = nn.Dense(1)
    self.pf_logstd = self.param("pf_logstd",
                                nn.initializers.constant(-0.5), (ADIM,))

  def __call__(self, x):
    return self.pi(x), self.v(x)

  def pi(self, x):
    h = jnp.tanh(self.encoder_dense(x))
    mean = self.pf_mean_d(h)
    logstd = jnp.broadcast_to(self.pf_logstd, mean.shape)
    return mean, jnp.exp(logstd), logstd

  def v(self, x):
    return self.vf_out(jnp.tanh(self.encoder_dense(x)))


def _torch_twin(params):
  p = params["params"]
  enc = torch.nn.Linear(OBS, HID)
  pf_mean = torch.nn.Linear(HID, ADIM)
  vf_out = torch.nn.Linear(HID, 1)
  logstd = torch.nn.Parameter(torch.full((ADIM,), -0.5))
  with torch.no_grad():
    enc.weight.copy_(torch.tensor(np.array(p["encoder_dense"]["kernel"]).T))
    enc.bias.copy_(torch.tensor(np.array(p["encoder_dense"]["bias"])))
    pf_mean.weight.copy_(torch.tensor(np.array(p["pf_mean"]["kernel"]).T))
    pf_mean.bias.copy_(torch.tensor(np.array(p["pf_mean"]["bias"])))
    vf_out.weight.copy_(torch.tensor(np.array(p["vf_out"]["kernel"]).T))
    vf_out.bias.copy_(torch.tensor(np.array(p["vf_out"]["bias"])))
  return enc, pf_mean, vf_out, logstd


def _torch_logprob_ent(enc, pf_mean, logstd, obs, acts):
  mean = pf_mean(torch.tanh(enc(obs)))
  std = torch.exp(logstd).expand_as(mean)
  lp = (-0.5 * ((acts - mean) / std) ** 2 - torch.log(std)
        - 0.5 * float(np.log(2 * np.pi))).sum(-1, keepdim=True)
  ent = (0.5 + 0.5 * float(np.log(2 * np.pi))
         + torch.log(std)).sum(-1, keepdim=True)
  return lp, ent


def test_ppo_epoch_matches_torch_reference():
  cfg = PPOConfig(plr=3e-3, vlr=4e-3, clip_para=0.2, entropy_coeff=0.01,
                  discount=0.99, tau=0.95, batch_size=2 * E,
                  epoch_frames=T * E, max_episode_frames=999,
                  opt_epochs=2, num_epochs=100, shuffle=True)

  module = _TinyAC()
  key = jax.random.PRNGKey(0)
  params = module.init(key, jnp.zeros((1, OBS)))

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  learner = PPOLearner(cfg, apply_pi, apply_v, params)
  ts = learner.init_state(params)

  ks = jax.random.split(jax.random.PRNGKey(7), 6)
  obs = jax.random.normal(ks[0], (T, E, OBS))
  acts = jax.random.normal(ks[1], (T, E, ADIM))
  rewards = jax.random.normal(ks[2], (T, E, 1))
  terminals = (jax.random.uniform(ks[3], (T, E, 1)) < 0.1)
  mean0, std0, _ = apply_pi(params, obs.reshape(-1, OBS))
  logp0 = jnp.sum(
      -0.5 * ((acts.reshape(-1, ADIM) - mean0) / std0) ** 2
      - jnp.log(std0) - 0.5 * jnp.log(2 * jnp.pi), -1, keepdims=True)
  values0 = apply_v(params, obs.reshape(-1, OBS))
  traj = Transition(
      obs=obs, acts=acts, log_probs=logp0.reshape(T, E, 1),
      values=values0.reshape(T, E, 1), rewards=rewards,
      terminals=terminals, time_limits=jnp.zeros((T, E, 1), bool),
      means=mean0.reshape(T, E, ADIM), stds=std0.reshape(T, E, ADIM))
  last_value = jax.random.normal(ks[4], (E,))

  up_key = ks[5]
  new_ts, _ = jax.jit(learner.update_per_epoch)(ts, traj, last_value,
                                                up_key)

  # ---- torch twin of the reference update ----
  advs, rets = gae_lib.gae(
      rewards[..., 0], values0.reshape(T, E),
      terminals[..., 0].astype(jnp.float32), jnp.zeros((T, E)),
      last_value, gamma=cfg.discount, tau=cfg.tau, time_limit_filter=True)
  enc, pf_mean, vf_out, logstd = _torch_twin(params)
  pf_params = [enc.weight, enc.bias, pf_mean.weight, pf_mean.bias, logstd]
  vf_params = [enc.weight, enc.bias, vf_out.weight, vf_out.bias]
  pf_opt = torch.optim.Adam(pf_params, lr=cfg.plr, eps=1e-5)
  vf_opt = torch.optim.Adam(vf_params, lr=cfg.vlr, eps=1e-5)

  obs_f = torch.tensor(np.array(obs))
  acts_f = torch.tensor(np.array(acts))
  advs_f = torch.tensor(np.array(advs))[..., None]
  rets_f = torch.tensor(np.array(rets))[..., None]
  logp_f = torch.tensor(np.array(logp0.reshape(T, E, 1)))

  rows = cfg.batch_size // E
  for k in jax.random.split(up_key, cfg.opt_epochs):
    perm = np.asarray(jax.random.permutation(k, T))
    for b in range(T // rows):
      idx = perm[b * rows:(b + 1) * rows]
      o = obs_f[idx].reshape(-1, OBS)
      a = acts_f[idx].reshape(-1, ADIM)
      adv = advs_f[idx].reshape(-1, 1)
      ret = rets_f[idx].reshape(-1, 1)
      lp_old = logp_f[idx].reshape(-1, 1)
      adv = (adv - adv.mean()) / (adv.std() + 1e-5)  # torch default: Bessel, as the real reference
      # critic first (ppo.py:152)
      vf_loss = ((vf_out(torch.tanh(enc(o))) - ret) ** 2).mean()
      vf_opt.zero_grad(); vf_loss.backward()
      torch.nn.utils.clip_grad_norm_(vf_params, 0.5)
      vf_opt.step()
      # actor on the updated encoder (ppo.py:153)
      lp, ent = _torch_logprob_ent(enc, pf_mean, logstd, o, a)
      ratio = torch.exp(lp - lp_old)
      surr = ratio * adv
      clipped = torch.clamp(ratio, 1 - cfg.clip_para,
                            1 + cfg.clip_para) * adv
      loss = -torch.min(surr, clipped).mean() - cfg.entropy_coeff * ent.mean()
      pf_opt.zero_grad(); loss.backward()
      torch.nn.utils.clip_grad_norm_(pf_params, 0.5)
      pf_opt.step()

  got = new_ts.params["params"]
  np.testing.assert_allclose(np.asarray(got["encoder_dense"]["kernel"]),
                             enc.weight.detach().numpy().T, atol=2e-6)
  np.testing.assert_allclose(np.asarray(got["pf_mean"]["kernel"]),
                             pf_mean.weight.detach().numpy().T, atol=2e-6)
  np.testing.assert_allclose(np.asarray(got["pf_logstd"]),
                             logstd.detach().numpy(), atol=2e-6)
  np.testing.assert_allclose(np.asarray(got["vf_out"]["kernel"]),
                             vf_out.weight.detach().numpy().T, atol=2e-6)
  np.testing.assert_allclose(np.asarray(got["vf_out"]["bias"]),
                             vf_out.bias.detach().numpy(), atol=2e-6)
