"""Off-policy replay buffer as device state.

Reference: torchrl/replay_buffers/base.py (dict-of-arrays ring buffer) —
here a fixed-capacity pytree ring living in HBM, written by the collector
and sampled uniformly inside the jitted update (replaces the reference's
POSIX shared-memory variants: with all actors on-device there is nothing
to share across processes).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayBuffer:
  data: Dict[str, jnp.ndarray]   # each (capacity, ...)
  pos: jnp.ndarray               # () int32 next write index
  size: jnp.ndarray              # () int32 valid entries

  @property
  def capacity(self) -> int:
    return next(iter(self.data.values())).shape[0]


def init_replay(capacity: int, example: Dict[str, jnp.ndarray]
                ) -> ReplayBuffer:
  data = {k: jnp.zeros((capacity,) + v.shape, v.dtype)
          for k, v in example.items()}
  return ReplayBuffer(data=data, pos=jnp.zeros((), jnp.int32),
                      size=jnp.zeros((), jnp.int32))


def add_batch(rb: ReplayBuffer, batch: Dict[str, jnp.ndarray]
              ) -> ReplayBuffer:
  """Insert a batch of B transitions at the ring position."""
  b = next(iter(batch.values())).shape[0]
  cap = rb.capacity
  idx = (rb.pos + jnp.arange(b)) % cap
  data = {k: rb.data[k].at[idx].set(v) for k, v in batch.items()}
  return ReplayBuffer(data=data, pos=(rb.pos + b) % cap,
                      size=jnp.minimum(rb.size + b, cap))


def sample(rb: ReplayBuffer, key: jax.Array, batch_size: int
           ) -> Dict[str, jnp.ndarray]:
  idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(rb.size, 1))
  return {k: v[idx] for k, v in rb.data.items()}
