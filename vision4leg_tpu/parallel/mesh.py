"""Device-mesh utilities: data-parallel sharding over ICI.

The reference's only parallelism is CPU-side env multiprocessing +
single-GPU compute (SURVEY 2.6); the TPU-native equivalent is sharding the
environment/batch axis of the jitted train step across the chips of a slice
(`jax.sharding.Mesh` + NamedSharding annotations — GSPMD inserts the
gradient all-reduces over ICI automatically).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
  devs = jax.devices()
  if num_devices is not None:
    devs = devs[:num_devices]
  return Mesh(np.array(devs), (DATA_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the leading (env) axis across the mesh."""
  return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_collector_state(mesh: Mesh, cs):
  """Place env-major pytree leaves on the mesh: leaves whose leading axis is
  the env axis get sharded; scalars replicate."""
  num_envs = cs.raw_obs.shape[0]
  env_s = env_sharding(mesh)
  rep = replicated(mesh)

  def place(x):
    if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == num_envs:
      return jax.device_put(x, env_s)
    return jax.device_put(x, rep)

  return jax.tree.map(place, cs)
