"""Hierarchical rollout: a high-level policy commands a heading angle that
a frozen low-level locomotion policy executes.

Reference: torchrl/collector/on_policy_hierarchical.py
(VecOnPolicyHierarchicalCollector, unused by the shipped configs):
the high-level action a (1-dim) becomes an angle a * pi/2; the low-level
policy observes [cos(angle), sin(angle), proprio-state] (the
RandoDirWrapper observation layout, env_builder.py:110-156) and produces
the motor action deterministically (eval_act = mean).

The PPO learner trains the HIGH-level policy on (obs, high_act) pairs —
structurally identical to the flat rollout, so this module only swaps the
action path of `make_rollout_fn`.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_hierarchical_act_fn(apply_high_pi: Callable,
                             apply_low_pi: Callable,
                             low_params,
                             action_low, action_high):
  """Build act(params, obs, key) -> (high_act, logp, env_act12).

  apply_high_pi: (params, obs) -> (mean, std, logstd), 1-dim action.
  apply_low_pi: (low_params, low_obs) -> (mean, std, logstd), motor action.
  """

  def act(params, obs, key):
    mean, std, _ = apply_high_pi(params, obs)
    noise = jax.random.normal(key, mean.shape)
    high_act = mean + std * noise
    logp = jnp.sum(-0.5 * noise**2 - jnp.log(std)
                   - 0.5 * jnp.log(2 * jnp.pi), axis=-1, keepdims=True)
    angle = high_act * jnp.pi * 0.5
    low_obs = jnp.concatenate(
        [jnp.cos(angle), jnp.sin(angle), obs], axis=-1)
    low_mean, _, _ = apply_low_pi(low_params, low_obs)
    env_act = jnp.tanh(low_mean)
    env_act = action_low + (env_act + 1.0) * 0.5 * (action_high - action_low)
    return high_act, logp, env_act

  return act
