"""Discrete action policies (reference: torchrl/policies/
discrete_policies.py — epsilon-greedy, Boltzmann, bootstrapped heads)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def epsilon_greedy(key, q_values: jnp.ndarray, epsilon: float):
  """EpsilonGreedyDQNDiscretePolicy.explore: argmax with prob 1-eps."""
  k1, k2 = jax.random.split(key)
  greedy = jnp.argmax(q_values, axis=-1)
  rand = jax.random.randint(k1, greedy.shape, 0, q_values.shape[-1])
  explore = jax.random.uniform(k2, greedy.shape) < epsilon
  return jnp.where(explore, rand, greedy)


def boltzmann(key, q_values: jnp.ndarray, temperature: float = 1.0):
  """BoltzmannDQNDiscretePolicy: categorical over softmax(q / T)."""
  return jax.random.categorical(key, q_values / temperature, axis=-1)


def bootstrapped_head(key, q_heads: jnp.ndarray, head_idx=None):
  """BootstrappedDQNDiscretePolicy: act greedily w.r.t. one sampled head.

  q_heads: (..., K, A)."""
  if head_idx is None:
    head_idx = jax.random.randint(key, (), 0, q_heads.shape[-2])
  q = jnp.take_along_axis(
      q_heads, head_idx.reshape((1,) * (q_heads.ndim - 2) + (1, 1)),
      axis=-2)[..., 0, :]
  return jnp.argmax(q, axis=-1)


def eval_greedy(q_values: jnp.ndarray):
  return jnp.argmax(q_values, axis=-1)
