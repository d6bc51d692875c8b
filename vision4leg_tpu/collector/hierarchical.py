"""Hierarchical rollout: a high-level policy commands a heading angle that
a frozen low-level locomotion policy executes.

Reference: torchrl/collector/on_policy_hierarchical.py
(VecOnPolicyHierarchicalCollector, unused by the shipped configs):
  * the high-level policy explores a 1-dim action a; angle = a * pi/2
    (:28-31),
  * the low-level policy observes [cos(angle), sin(angle), state] where
    `state` is the PROPRIO head of the obs (nets.py:768-780
    `state[..., :state_input_shape]` via `return_state=True`) — the
    RandoDirWrapper observation layout (env_builder.py:110-156),
  * the low level acts deterministically (`eval_act` = tanh(mean), :38),
  * the buffer stores the HIGH-level (obs, acts, values, ...) (:56-67),
    so PPO trains the high level against the env reward.

Here the whole two-level act path plugs into `make_rollout_fn` via its
`act_fn` hook, so collection stays one fused `lax.scan` program; GAE,
minibatching, and the PPO update are unchanged (they never see the
low-level actions, exactly like the reference buffer).
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from vision4leg_tpu.collector import rollout as rollout_lib


def make_hierarchical_act_fn(apply_high_pi: Callable,
                             apply_low_pi: Callable,
                             low_params,
                             proprio_dim: int,
                             action_low, action_high):
  """Build act(params, obs, key) -> (high_act, logp, env_act12, mean, std).

  apply_high_pi: (params, obs) -> (mean, std, logstd), 1-dim action.
  apply_low_pi: (low_params, low_obs) -> (mean, std, logstd), motor action.
  proprio_dim: width of the proprio head the low level sees (nets.py:770).
  """

  def act(params, obs, key):
    mean, std, _ = apply_high_pi(params, obs)
    noise = jax.random.normal(key, mean.shape)
    high_act = mean + std * noise
    logp = jnp.sum(-0.5 * noise**2 - jnp.log(std)
                   - 0.5 * jnp.log(2 * jnp.pi), axis=-1, keepdims=True)
    angle = high_act * jnp.pi * 0.5
    low_obs = jnp.concatenate(
        [jnp.cos(angle), jnp.sin(angle), obs[..., :proprio_dim]], axis=-1)
    low_mean, _, _ = apply_low_pi(low_params, low_obs)
    env_act = jnp.tanh(low_mean)
    env_act = action_low + (env_act + 1.0) * 0.5 * (action_high - action_low)
    return high_act, logp, env_act, mean, std

  return act


def make_hierarchical_rollout_fn(env, apply_high_pi: Callable,
                                 apply_v: Callable,
                                 apply_low_pi: Callable, low_params,
                                 horizon: int, max_episode_frames: int,
                                 discount: float, proprio_dim: int,
                                 obs_norm: bool = True,
                                 env_time_limit: int = 1000):
  """Full hierarchical collector: `make_rollout_fn` with the two-level
  action path.  Trains the high level; the low level stays frozen."""
  act_fn = make_hierarchical_act_fn(
      apply_high_pi, apply_low_pi, low_params, proprio_dim,
      env.action_low, env.action_high)
  return rollout_lib.make_rollout_fn(
      env, apply_high_pi, apply_v, horizon, max_episode_frames, discount,
      proprio_dim, obs_norm=obs_norm, update_normalizer=True,
      action_low=env.action_low, action_high=env.action_high,
      env_time_limit=env_time_limit, act_fn=act_fn)
