"""Running observation normalizer as device state.

Reference: torchrl/env/base_wrapper.py:44-101 (`update_mean_var_count` from
OpenAI Baselines + `Normalizer.filt` clip(+-10) with 1e-4 std epsilon) and
vision4leg/get_env.py:41-67 (`NormObsWithImg`: only the first
`prod(obs_space.shape)` dims — the proprio part — are normalized; the image
tail passes through raw).
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NormalizerState:
  mean: jnp.ndarray   # (D,)
  var: jnp.ndarray    # (D,)
  count: jnp.ndarray  # ()


def init_normalizer(dim: int) -> NormalizerState:
  return NormalizerState(mean=jnp.zeros(dim), var=jnp.ones(dim),
                         count=jnp.asarray(1e-4))


def update(state: NormalizerState, batch: jnp.ndarray) -> NormalizerState:
  """Welford merge with a batch (base_wrapper.py:44-61). batch: (B, D)."""
  b_mean = jnp.mean(batch, axis=0)
  b_var = jnp.var(batch, axis=0)
  b_count = batch.shape[0]
  delta = b_mean - state.mean
  tot = state.count + b_count
  new_mean = state.mean + delta * b_count / tot
  m_a = state.var * state.count
  m_b = b_var * b_count
  m2 = m_a + m_b + jnp.square(delta) * state.count * b_count / tot
  return NormalizerState(mean=new_mean, var=m2 / tot, count=tot)


def filt(state: NormalizerState, x: jnp.ndarray,
         clip: float = 10.0) -> jnp.ndarray:
  return jnp.clip((x - state.mean) / (jnp.sqrt(state.var) + 1e-4),
                  -clip, clip)


def filt_with_img_tail(state: NormalizerState, x: jnp.ndarray,
                       proprio_dim: int, clip: float = 10.0) -> jnp.ndarray:
  """NormObsWithImg: normalize proprio head, pass image tail raw."""
  head = filt(state, x[..., :proprio_dim], clip)
  return jnp.concatenate([head, x[..., proprio_dim:]], axis=-1)
