"""TanhNormal distribution utilities (reference: torchrl/policies/
distribution.py:5-80, RLKIT-style squashed Gaussian with pre-tanh
log-prob)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(key, mean, std):
  """rsample with pre-tanh value: returns (action, pre_tanh)."""
  z = mean + std * jax.random.normal(key, mean.shape)
  return jnp.tanh(z), z


def log_prob(mean, std, action, pre_tanh):
  """log pi(a): Normal log-prob of pre-tanh minus the tanh Jacobian
  (distribution.py log_prob: N(z) - log(1 - tanh(z)^2 + 1e-6))."""
  normal_lp = (-0.5 * ((pre_tanh - mean) / std) ** 2 - jnp.log(std)
               - 0.5 * jnp.log(2 * jnp.pi))
  return normal_lp - jnp.log(1.0 - action**2 + 1e-6)


def sample_with_log_prob(key, mean, std):
  action, z = sample(key, mean, std)
  lp = jnp.sum(log_prob(mean, std, action, z), axis=-1, keepdims=True)
  return action, z, lp
