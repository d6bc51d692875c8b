"""A1 leg kinematics: foot FK/IK and Jacobians in the base frame.

Replaces the reference's PyBullet-backed helpers
(`vision4leg/robots/kinematics.py`, `minitaur.ComputeMotorAnglesFromFoot
LocalPosition` :679, `ComputeJacobian` :717, `a1_sim.py:457-496` IK):
closed-form analytic IK for the 3-DOF (hip-roll, thigh-pitch, knee-pitch)
leg, FK by composition, Jacobian by jax.jacfwd — all jittable/vmappable.

Leg frame convention: the leg chain starts at the hip-joint origin on the
trunk at (front_x * 0.183, side_y * 0.047, 0); the thigh joint sits
side_y * 0.08505 lateral of the hip-roll axis; thigh and calf links are
both 0.2 m.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.robots import a1_params as P

L_HIP = P.UPPER_OFFSET_Y   # 0.08505 lateral offset (signed by leg side)
L_THIGH = P.UPPER_LEN      # 0.2
L_CALF = P.LOWER_LEN       # 0.2

_FRONT_X, _SIDE_Y = P.leg_signs()
HIP_ORIGINS = np.stack([
    _FRONT_X * P.HIP_OFFSET_X,
    _SIDE_Y * P.HIP_OFFSET_Y,
    np.zeros(4),
], axis=-1)  # (4, 3) hip-joint origins in base frame
SIDE_SIGN = _SIDE_Y  # (4,) +1 left, -1 right


def foot_position_hip_frame(angles: jnp.ndarray, side: float) -> jnp.ndarray:
  """FK of one leg relative to its hip-joint origin, base orientation.

  angles: (3,) [hip_roll, thigh_pitch, knee_pitch]; side: +-1.
  """
  t1, t2, t3 = angles[0], angles[1], angles[2]
  d = side * L_HIP
  # planar 2-link in the x-z plane of the post-roll frame
  x = -L_THIGH * jnp.sin(t2) - L_CALF * jnp.sin(t2 + t3)
  z = -L_THIGH * jnp.cos(t2) - L_CALF * jnp.cos(t2 + t3)
  # lift through the hip roll
  c1, s1 = jnp.cos(t1), jnp.sin(t1)
  y = c1 * d - s1 * z
  z = s1 * d + c1 * z
  return jnp.stack([x, y, z])


def foot_positions_base_frame(joint_q: jnp.ndarray) -> jnp.ndarray:
  """All four feet in the base frame. joint_q: (12,) reference motor order."""
  q = joint_q.reshape(4, 3)
  feet = jax.vmap(foot_position_hip_frame)(q, jnp.asarray(SIDE_SIGN))
  return feet + jnp.asarray(HIP_ORIGINS)


def foot_ik_hip_frame(pos: jnp.ndarray, side: float) -> jnp.ndarray:
  """Closed-form IK: foot position (hip-joint frame) -> (3,) joint angles,
  choosing the knee-backward branch the A1 uses (knee angle < 0).

  Derivation: with d = side*L_HIP, zp = -sqrt(y^2+z^2-d^2) (foot below the
  hip-roll axis), the FK reads
    (y, z) = Rot(t1) @ (d, zp),
    x  = -k1 sin t2 - k2 cos t2,   zp = -k1 cos t2 + k2 sin t2,
  with k1 = l2 + l3 cos t3, k2 = l3 sin t3 and
  x^2 + zp^2 = l2^2 + l3^2 + 2 l2 l3 cos t3.
  """
  x, y, z = pos[0], pos[1], pos[2]
  d = side * L_HIP
  zp = -jnp.sqrt(jnp.maximum(y * y + z * z - d * d, 1e-12))
  t1 = jnp.arctan2(z, y) - jnp.arctan2(zp, d)
  # wrap to [-pi, pi]
  t1 = jnp.arctan2(jnp.sin(t1), jnp.cos(t1))
  reach2 = x * x + zp * zp
  cos_knee = (reach2 - L_THIGH**2 - L_CALF**2) / (2 * L_THIGH * L_CALF)
  t3 = -jnp.arccos(jnp.clip(cos_knee, -1.0, 1.0))
  k1 = L_THIGH + L_CALF * jnp.cos(t3)
  k2 = L_CALF * jnp.sin(t3)
  sin_t2 = (-k1 * x + k2 * zp)
  cos_t2 = (-k2 * x - k1 * zp)
  t2 = jnp.arctan2(sin_t2, cos_t2)
  return jnp.stack([t1, t2, t3])


def foot_ik_base_frame(pos: jnp.ndarray, leg: int) -> jnp.ndarray:
  return foot_ik_hip_frame(pos - jnp.asarray(HIP_ORIGINS)[leg],
                           float(SIDE_SIGN[leg]))


def leg_jacobian(angles: jnp.ndarray, side: float) -> jnp.ndarray:
  """(3, 3) Jacobian d foot_pos / d angles in the base frame."""
  return jax.jacfwd(foot_position_hip_frame)(angles, side)


def all_leg_jacobians(joint_q: jnp.ndarray) -> jnp.ndarray:
  q = joint_q.reshape(4, 3)
  return jax.vmap(leg_jacobian)(q, jnp.asarray(SIDE_SIGN))  # (4, 3, 3)
