"""Kinematic-tree model description for the JAX rigid-body engine.

A `Model` is a pytree of static arrays describing a floating-base kinematic
tree with revolute joints (all the engine needs for quadrupeds).  The A1
instance is built in `vision4leg_tpu.robots.a1_model`.

Replaces the reference's URDF loading through PyBullet
(`vision4leg/robots/minitaur.py:93+` / `a1.py:221+`): instead of an opaque
C++ engine, the tree is explicit data consumed by pure JAX functions.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Model:
  """Static description of a floating-base tree. Shapes use:

  B = number of bodies (body 0 is the floating base),
  J = number of revolute joints = B - 1 (body j+1 is the child of joint j),
  P = number of collision points.
  """
  # tree topology (static: it defines the program structure, not data)
  parent: tuple = struct.field(pytree_node=False)  # (B,) ints; parent[0] = -1
  # bodies grouped by tree depth (level-synchronous kinematics: each level
  # is one batch of vectorized ops instead of per-joint sequential chains)
  levels: tuple = struct.field(pytree_node=False)
  joint_axis: jnp.ndarray    # (J, 3) axis in the child-body frame
  joint_offset: jnp.ndarray  # (J, 3) child-frame origin in the parent frame
  # per-dof ancestry: mask[i, k] = 1 if joint k is on the path root->body i
  ancestor_mask: jnp.ndarray  # (B, J) float32
  # inertial parameters (body frame)
  mass: jnp.ndarray          # (B,)
  com: jnp.ndarray           # (B, 3)
  inertia: jnp.ndarray       # (B, 3, 3) about the COM, body frame
  # joint properties
  joint_lower: jnp.ndarray   # (J,)
  joint_upper: jnp.ndarray   # (J,)
  armature: jnp.ndarray      # (J,) reflected rotor inertia added to M diagonal
  joint_damping: jnp.ndarray  # (J,) viscous damping (Nm s/rad)
  joint_friction: jnp.ndarray  # (J,) Coulomb friction torque (Nm)
  # collision points: spheres rigidly attached to bodies.  cp_body is
  # static like the topology: the engine indexes bodies with Python ints
  # so the traced program has no gathers (Pallas TPU rejects >2D gathers)
  cp_body: tuple = struct.field(pytree_node=False)  # (P,) ints
  cp_offset: jnp.ndarray     # (P, 3) body-frame offset
  cp_radius: jnp.ndarray     # (P,)
  cp_is_foot: jnp.ndarray    # (P,) 1.0 for toe points (feet), else 0.0
  # world
  gravity: jnp.ndarray       # (3,)
  dt: float = struct.field(pytree_node=False, default=0.0025)

  @property
  def nbody(self) -> int:
    return len(self.parent)

  @property
  def njoint(self) -> int:
    return self.joint_axis.shape[0]

  @property
  def nv(self) -> int:
    """Generalized-velocity dimension: 6 base dofs + joints."""
    return 6 + self.njoint

  @property
  def ncp(self) -> int:
    return len(self.cp_body)


def make_model(parent, joint_axis, joint_offset, mass, com, inertia,
               joint_lower, joint_upper, cp_body, cp_offset, cp_radius,
               cp_is_foot, gravity=(0.0, 0.0, -10.0), dt: float = 0.0025,
               armature: Any = 0.01, joint_damping: Any = 0.0,
               joint_friction: Any = 0.0) -> Model:
  """Build a Model from numpy inputs, computing the ancestry mask.

  gravity default (0,0,-10) matches the reference env's setGravity call
  (locomotion_gym_env_with_rich_information.py:343).
  """
  parent = np.asarray(parent, np.int32)
  nb = parent.shape[0]
  nj = nb - 1
  mask = np.zeros((nb, nj), np.float32)
  depth = np.zeros(nb, np.int32)
  for i in range(1, nb):
    b = i
    while b > 0:
      mask[i, b - 1] = 1.0
      b = parent[b]
    depth[i] = depth[parent[i]] + 1
  levels = tuple(
      tuple(int(i) for i in np.where(depth == d)[0])
      for d in range(1, depth.max() + 1))

  def arr(x, shape):
    x = np.asarray(x, np.float32)
    return np.broadcast_to(x, shape).astype(np.float32)

  return Model(
      parent=tuple(int(p) for p in parent),
      levels=levels,
      joint_axis=jnp.asarray(joint_axis, jnp.float32),
      joint_offset=jnp.asarray(joint_offset, jnp.float32),
      ancestor_mask=jnp.asarray(mask),
      mass=jnp.asarray(mass, jnp.float32),
      com=jnp.asarray(com, jnp.float32),
      inertia=jnp.asarray(inertia, jnp.float32),
      joint_lower=jnp.asarray(joint_lower, jnp.float32),
      joint_upper=jnp.asarray(joint_upper, jnp.float32),
      armature=jnp.asarray(arr(armature, (nj,))),
      joint_damping=jnp.asarray(arr(joint_damping, (nj,))),
      joint_friction=jnp.asarray(arr(joint_friction, (nj,))),
      cp_body=tuple(int(b) for b in np.asarray(cp_body)),
      cp_offset=jnp.asarray(cp_offset, jnp.float32),
      cp_radius=jnp.asarray(cp_radius, jnp.float32),
      cp_is_foot=jnp.asarray(cp_is_foot, jnp.float32),
      gravity=jnp.asarray(gravity, jnp.float32),
      dt=float(dt),
  )
