"""Quaternion / rotation math for the rigid-body engine.

Conventions:
  * Quaternions are (w, x, y, z), unit norm, Hamilton convention.
    (PyBullet uses (x, y, z, w); conversion helpers are provided because the
    reference exposes xyzw quats in observations, e.g. the orientation
    penalty in move_forward_task.py:229-240.)
  * ``quat_rotate(q, v)`` rotates v from the body frame into the world frame
    when q is the body->world orientation.
  * Euler angles are roll-pitch-yaw (x, y, z extrinsic), matching
    pybullet.getEulerFromQuaternion semantics used by the reference's
    IMU sensor (vision4leg/envs/sensors/robot_sensors.py:358+).
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_identity() -> jnp.ndarray:
  return jnp.array([1.0, 0.0, 0.0, 0.0])


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  """Hamilton product a ⊗ b (both wxyz)."""
  aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
  bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
  return jnp.stack(
      [
          aw * bw - ax * bx - ay * by - az * bz,
          aw * bx + ax * bw + ay * bz - az * by,
          aw * by - ax * bz + ay * bw + az * bx,
          aw * bz + ax * by - ay * bx + az * bw,
      ],
      axis=-1,
  )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
  return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
  """Rotate vector v by quaternion q (body->world if q is body->world)."""
  w = q[..., 0:1]
  u = q[..., 1:4]
  # v' = v + 2 w (u × v) + 2 u × (u × v)
  uv = jnp.cross(u, v)
  return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
  return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
  """3x3 rotation matrix from wxyz quaternion."""
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  return jnp.stack(
      [
          jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                     2 * (x * z + w * y)], axis=-1),
          jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                     2 * (y * z - w * x)], axis=-1),
          jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                     1 - 2 * (x * x + y * y)], axis=-1),
      ],
      axis=-2,
  )


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
  half = 0.5 * angle
  return jnp.concatenate(
      [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray,
                   dt: float) -> jnp.ndarray:
  """Integrate orientation by world-frame angular velocity over dt (exp map)."""
  angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
  # Safe normalize: when |w| ~ 0 the sin(half)/1 term vanishes anyway.
  axis = omega_world / jnp.maximum(angle, 1e-9)
  dq = quat_from_axis_angle(axis, (angle * dt)[..., 0])
  out = quat_mul(dq, q)
  return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def quat_to_rpy(q: jnp.ndarray) -> jnp.ndarray:
  """Roll-pitch-yaw (extrinsic xyz) from wxyz quaternion.

  Matches pybullet.getEulerFromQuaternion for the observation path used by
  the reference IMU sensor.
  """
  w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
  roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
  sinp = jnp.clip(2 * (w * y - z * x), -1.0, 1.0)
  pitch = jnp.arcsin(sinp)
  yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
  return jnp.stack([roll, pitch, yaw], axis=-1)


def rpy_to_quat(rpy: jnp.ndarray) -> jnp.ndarray:
  """wxyz quaternion from roll-pitch-yaw (inverse of quat_to_rpy)."""
  r, p, y = rpy[..., 0] * 0.5, rpy[..., 1] * 0.5, rpy[..., 2] * 0.5
  cr, sr = jnp.cos(r), jnp.sin(r)
  cp, sp = jnp.cos(p), jnp.sin(p)
  cy, sy = jnp.cos(y), jnp.sin(y)
  return jnp.stack(
      [
          cr * cp * cy + sr * sp * sy,
          sr * cp * cy - cr * sp * sy,
          cr * sp * cy + sr * cp * sy,
          cr * cp * sy - sr * sp * cy,
      ],
      axis=-1,
  )


def wxyz_to_xyzw(q: jnp.ndarray) -> jnp.ndarray:
  """Convert to pybullet-style xyzw (the reference's observation format)."""
  return jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)


def xyzw_to_wxyz(q: jnp.ndarray) -> jnp.ndarray:
  return jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)


def skew(v: jnp.ndarray) -> jnp.ndarray:
  """Skew-symmetric cross-product matrix: skew(a) @ b == cross(a, b)."""
  x, y, z = v[..., 0], v[..., 1], v[..., 2]
  zero = jnp.zeros_like(x)
  return jnp.stack(
      [
          jnp.stack([zero, -z, y], axis=-1),
          jnp.stack([z, zero, -x], axis=-1),
          jnp.stack([-y, x, zero], axis=-1),
      ],
      axis=-2,
  )
