"""GAE and discounted returns as reverse `lax.scan`s.

Reference math: torchrl/replay_buffers/on_policy.py:17-71, including the
`time_limit_filter` semantics (the advantage is zeroed *at* time-limit
steps after accumulation, so returns equal values there and the recursion
restarts across the truncation boundary).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def gae(rewards: jnp.ndarray, values: jnp.ndarray, terminals: jnp.ndarray,
        time_limits: jnp.ndarray, last_value: jnp.ndarray, gamma: float,
        tau: float, time_limit_filter: bool = True
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Generalized advantage estimation over (T, E) arrays.

  rewards/terminals/time_limits: (T, E); values: (T, E); last_value: (E,)
  (already zeroed for terminal tails by the caller, on_rl_algo.py:23-34).
  Returns (advs, estimate_returns), each (T, E).
  """
  values_tp1 = jnp.concatenate([values[1:], last_value[None]], axis=0)

  def body(A, xs):
    r, v, v1, term, tl = xs
    delta = r + (1.0 - term) * gamma * v1 - v
    A = delta + (1.0 - term) * gamma * tau * A
    if time_limit_filter:
      A = A * (1.0 - tl)  # on_policy.py:27-34
    return A, (A, A + v)

  _, (advs, rets) = jax.lax.scan(
      body, jnp.zeros_like(last_value),
      (rewards, values, values_tp1, terminals, time_limits), reverse=True)
  return advs, rets


def discounted_returns(rewards, values, terminals, time_limits, last_value,
                       gamma: float, time_limit_filter: bool = True):
  """discount_reward path (on_policy.py:47-71), for gae=False configs."""

  def body(R, xs):
    r, v, term, tl = xs
    if time_limit_filter:
      R = (r + (1.0 - term) * gamma * R * (1.0 - tl)) + tl * v
    else:
      R = r + (1.0 - term) * gamma * R
    return R, (R - v, R)

  _, (advs, rets) = jax.lax.scan(
      body, last_value, (rewards, values, terminals, time_limits),
      reverse=True)
  return advs, rets
