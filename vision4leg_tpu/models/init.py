"""Weight initializers matching the reference (torchrl/networks/init.py).

Note: the reference's `_fanin_init` computes the bound from
`tensor.size()[0]`, which for a torch Linear weight (out, in) is the *output*
dimension — we reproduce that exact distribution (bound = 1/sqrt(fan_out)
for dense layers) so training dynamics match.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fanin_uniform():
  """basic_init weights: U(+-1/sqrt(size0)) (init.py:6-16)."""
  def init(key, shape, dtype=jnp.float32):
    # flax Dense kernel shape = (in, out); torch computed from size()[0] of
    # the (out, in) weight => fan = out
    if len(shape) == 2:
      fan = shape[1]
    else:
      fan = int(np.prod(shape[:-1]))  # conv: in_ch * k * k
    bound = float(np.sqrt(1.0 / fan))
    return jax.random.uniform(key, shape, dtype, -bound, bound)
  return init


def constant_bias(value: float = 0.1):
  def init(key, shape, dtype=jnp.float32):
    del key
    return jnp.full(shape, value, dtype)
  return init


def uniform_small(param: float = 3e-3):
  """uniform_init for final layers: U(+-3e-3) weight AND bias."""
  def init(key, shape, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -param, param)
  return init


def orthogonal(scale: float = float(np.sqrt(2))):
  return jax.nn.initializers.orthogonal(scale)
