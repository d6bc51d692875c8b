"""Networks for the off-policy family (reference: torchrl policies +
QNet/BootstrappedNet in networks/nets.py).

  * TanhGaussianPolicy — SAC actor (GaussianContPolicy: state-dependent
    mean/logstd, logstd clamped [-5, 2], tanh squashing).
  * DetTanhPolicy — DDPG/TD3 actor (DetContPolicy with tanh output).
  * QNet — Q(s, a) critic (nets.py QNet: concat obs/action input).
  * DiscreteQNet — DQN/QRDQN head; BootstrappedQNet — K heads.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from vision4leg_tpu.models import init as winit
from vision4leg_tpu.models.base import MLPBase

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -5.0


class TanhGaussianPolicy(nn.Module):
  action_dim: int
  hidden_shapes: Sequence[int] = (256, 256)
  append_hidden_shapes: Sequence[int] = ()

  @nn.compact
  def __call__(self, x):
    h = MLPBase(self.hidden_shapes)(x)
    for hs in self.append_hidden_shapes:
      h = nn.Dense(hs, kernel_init=winit.fanin_uniform(),
                   bias_init=winit.constant_bias(0.1))(h)
      h = nn.relu(h)
    out = nn.Dense(2 * self.action_dim, kernel_init=winit.uniform_small(),
                   bias_init=winit.uniform_small())(h)
    mean, logstd = jnp.split(out, 2, axis=-1)
    logstd = jnp.clip(logstd, LOG_SIG_MIN, LOG_SIG_MAX)
    return mean, jnp.exp(logstd), logstd


class DetTanhPolicy(nn.Module):
  action_dim: int
  hidden_shapes: Sequence[int] = (256, 256)

  @nn.compact
  def __call__(self, x):
    h = MLPBase(self.hidden_shapes)(x)
    a = nn.Dense(self.action_dim, kernel_init=winit.uniform_small(),
                 bias_init=winit.uniform_small())(h)
    return jnp.tanh(a)


class QNet(nn.Module):
  """Q(s, a) (nets.py QNet: input = concat(obs, action))."""
  hidden_shapes: Sequence[int] = (256, 256)

  @nn.compact
  def __call__(self, obs, act):
    h = MLPBase(self.hidden_shapes)(jnp.concatenate([obs, act], axis=-1))
    return nn.Dense(1, kernel_init=winit.uniform_small(),
                    bias_init=winit.uniform_small())(h)


class DiscreteQNet(nn.Module):
  num_actions: int
  hidden_shapes: Sequence[int] = (256, 256)
  num_quantiles: int = 1  # >1 for QRDQN

  @nn.compact
  def __call__(self, obs):
    h = MLPBase(self.hidden_shapes)(obs)
    out = nn.Dense(self.num_actions * self.num_quantiles,
                   kernel_init=winit.uniform_small(),
                   bias_init=winit.uniform_small())(h)
    if self.num_quantiles > 1:
      return out.reshape(out.shape[:-1] + (self.num_actions,
                                           self.num_quantiles))
    return out


class BootstrappedQNet(nn.Module):
  """K bootstrapped heads over a shared base (nets.py BootstrappedNet)."""
  num_actions: int
  num_heads: int = 10
  hidden_shapes: Sequence[int] = (256, 256)

  @nn.compact
  def __call__(self, obs):
    h = MLPBase(self.hidden_shapes)(obs)
    outs = [nn.Dense(self.num_actions, kernel_init=winit.uniform_small(),
                     bias_init=winit.uniform_small())(h)
            for _ in range(self.num_heads)]
    return jnp.stack(outs, axis=-2)  # (..., K, A)
