"""Host-environment collector: generic gym IDs with batched device inference.

Reference: torchrl/env/get_env.py (plain-gym entry) + SubProcVecEnv +
VecOnPolicyCollector — for environments that cannot live on the TPU
(arbitrary gymnasium envs).  Envs step in worker processes
(gymnasium.vector.AsyncVectorEnv ~ the reference's SubProcVecEnv); the
policy runs as ONE batched jitted forward per tick (the north star's
batched-inference collector, replacing the reference's per-step
`.to(device)` ping-pong with a single exchange per vector step).

Produces the same `Transition` structure as the on-device rollout, so all
learners (PPO/A2C/...) consume either data path unchanged.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.collector.rollout import Transition
from vision4leg_tpu.data import normalizer as norm

try:
  import gymnasium
except ImportError:  # pragma: no cover
  gymnasium = None


def make_vec_env(env_id: str, num_envs: int, seed: int = 0,
                 asynchronous: bool = True, wrappers=()):
  """get_vec_env / get_subprocvec_env equivalent for gymnasium IDs."""
  if gymnasium is None:
    raise ImportError("gymnasium not available")

  def thunk(i):
    def f():
      env = gymnasium.make(env_id)
      for w in wrappers:
        env = w(env)
      env.reset(seed=seed * num_envs + i)  # vecenv.py:64-68 seeding scheme
      return env
    return f

  cls = (gymnasium.vector.AsyncVectorEnv if asynchronous
         else gymnasium.vector.SyncVectorEnv)
  return cls([thunk(i) for i in range(num_envs)])


class HostOnPolicyCollector:
  """Collect (T, E, ...) trajectories from host envs with device inference.

  apply_pi(params, obs) -> (mean, std, logstd); apply_v -> (B, 1).
  Continuous actions map through NormAct (tanh + rescale).
  """

  def __init__(self, vec_env, apply_pi: Callable, apply_v: Callable,
               discount: float = 0.99, max_episode_frames: int = 999,
               obs_norm: bool = True, seed: int = 0):
    self.env = vec_env
    self.num_envs = vec_env.num_envs
    space = vec_env.single_action_space
    self.discrete = hasattr(space, "n")
    if not self.discrete:
      self.act_low = np.asarray(space.low)
      self.act_high = np.asarray(space.high)
    self.discount = discount
    self.max_episode_frames = max_episode_frames
    self.obs_norm = obs_norm
    obs_dim = int(np.prod(vec_env.single_observation_space.shape))
    self.normalizer = norm.init_normalizer(obs_dim)
    self._norm_update = jax.jit(norm.update)
    self._norm_filt = jax.jit(norm.filt)

    @jax.jit
    def act_fn(params, obs, key):
      mean, std, _ = apply_pi(params, obs)
      noise = jax.random.normal(key, mean.shape)
      act = mean + std * noise
      logp = jnp.sum(-0.5 * noise**2 - jnp.log(std)
                     - 0.5 * jnp.log(2 * jnp.pi), axis=-1, keepdims=True)
      value = apply_v(params, obs)
      return act, logp, value, mean, std

    self._act = act_fn
    self._value = jax.jit(apply_v)
    self.key = jax.random.PRNGKey(seed)
    obs, _ = vec_env.reset(seed=seed)
    self.raw_obs = obs.reshape(self.num_envs, -1)
    self.ep_steps = np.zeros(self.num_envs, np.int32)
    self.train_rews = []
    self._ep_rew = np.zeros(self.num_envs)

  def _normalize(self, raw):
    if not self.obs_norm:
      return jnp.asarray(raw, jnp.float32)
    self.normalizer = self._norm_update(self.normalizer,
                                        jnp.asarray(raw, jnp.float32))
    return self._norm_filt(self.normalizer, jnp.asarray(raw, jnp.float32))

  def collect(self, params, horizon: int):
    """One epoch of (horizon, E, ...) data + bootstrap value."""
    store = {k: [] for k in Transition._fields}
    for _ in range(horizon):
      obs = self._normalize(self.raw_obs)
      self.key, k = jax.random.split(self.key)
      act, logp, value, mean, std = self._act(params, obs, k)
      act_np = np.asarray(act)
      if self.discrete:
        env_act = np.asarray(jnp.argmax(mean, axis=-1))
      else:
        env_act = self.act_low + (np.tanh(act_np) + 1) * 0.5 * (
            self.act_high - self.act_low)
      next_obs, rew, term, trunc, _ = self.env.step(env_act)
      next_obs = next_obs.reshape(self.num_envs, -1)
      self.ep_steps += 1
      surpass = self.ep_steps >= self.max_episode_frames
      done = np.asarray(term) | np.asarray(trunc)
      terminal = done | surpass
      rew = np.asarray(rew, np.float64)
      self._ep_rew += rew
      if surpass.any():
        nv = np.asarray(self._value(params, self._normalize(next_obs)))[:, 0]
        rew = rew + self.discount * nv * surpass
      if terminal.any():
        self.train_rews += list(self._ep_rew[terminal])
        self._ep_rew[terminal] = 0.0
        self.ep_steps[terminal] = 0
        # AsyncVectorEnv auto-resets; next_obs is already the reset obs
      store["obs"].append(np.asarray(obs))
      store["acts"].append(act_np)
      store["log_probs"].append(np.asarray(logp))
      store["values"].append(np.asarray(value))
      store["rewards"].append(rew[:, None])
      store["terminals"].append(terminal[:, None])
      store["time_limits"].append((np.asarray(trunc) | surpass)[:, None])
      store["means"].append(np.asarray(mean))
      store["stds"].append(np.asarray(std))
      self.raw_obs = next_obs

    traj = Transition(**{k: jnp.asarray(np.stack(v)) for k, v in
                         store.items()})
    last_obs = self._normalize(self.raw_obs)
    last_value = np.asarray(self._value(params, last_obs))[:, 0]
    last_value = last_value * (1.0 - np.asarray(traj.terminals[-1, :, 0]))
    return traj, jnp.asarray(last_value)
