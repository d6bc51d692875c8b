"""Compliant contact models for the JAX physics engine.

Sphere collision points vs. (a) an analytic/heightfield terrain surface and
(b) oriented boxes (the terrain randomizer's obstacle blocks,
ref: vision4leg/envs/utilities/a1_randomizer_ground.py).  Forces are
penalty-based (spring-damper normal + regularized Coulomb friction), which
is the standard compliant replacement for PyBullet's LCP solver and is
fully differentiable/jittable.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ContactParams:
  stiffness: float = struct.field(pytree_node=False, default=5000.0)
  damping: float = struct.field(pytree_node=False, default=150.0)
  # regularization velocity for the Coulomb cone (m/s)
  v_slip: float = struct.field(pytree_node=False, default=0.02)


def _contact_force(phi: jnp.ndarray, normal: jnp.ndarray, vel: jnp.ndarray,
                   friction: jnp.ndarray, params: ContactParams):
  """Penalty force for penetration phi (>0 inside) along `normal`.

  phi: (..., P), normal: (..., P, 3), vel: (..., P, 3).
  Returns force (..., P, 3).
  """
  in_contact = phi > 0.0
  v_n = jnp.sum(vel * normal, axis=-1)
  f_n = (params.stiffness * phi - params.damping * v_n)
  f_n = jnp.maximum(f_n, 0.0) * in_contact
  v_t = vel - v_n[..., None] * normal
  v_t_norm = jnp.sqrt(jnp.sum(v_t * v_t, axis=-1) + params.v_slip**2)
  f_t = -(friction * f_n / v_t_norm)[..., None] * v_t
  return f_n[..., None] * normal + f_t


def make_terrain_contact_fn(
    height_fn: Callable[[jnp.ndarray], jnp.ndarray],
    normal_fn: Callable[[jnp.ndarray], jnp.ndarray],
    boxes: jnp.ndarray | None = None,
    spheres: jnp.ndarray | None = None,
    friction: float | jnp.ndarray = 0.8,
    box_friction: float | jnp.ndarray = 0.8,
    params: ContactParams = ContactParams(),
):
  """Build a ContactFn for the engine.

  height_fn: (N, 2) xy -> (N,) ground height.
  normal_fn: (N, 2) xy -> (N, 3) unit ground normal.
  boxes: optional (K, 8) obstacle array [cx, cy, cz, hx, hy, hz, yaw, valid].
  """

  def contact_fn(pos: jnp.ndarray, vel: jnp.ndarray,
                 radius: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # --- ground ---
    h = height_fn(pos[..., :2])
    n = normal_fn(pos[..., :2])
    # sphere-lowest-point penetration along the surface normal (plane-local
    # approximation, exact for flat ground)
    phi = h - (pos[..., 2] - radius)
    force = _contact_force(phi, n, vel, friction, params)
    phib = jnp.full_like(phi, -1.0)
    # --- obstacle boxes ---
    if boxes is not None and boxes.shape[0] > 0:
      fb, phib = _sphere_box_forces(pos, vel, radius, boxes, box_friction,
                                    params)
      force = force + fb
    # --- obstacle spheres (random_sphere_with_subgoal) ---
    if spheres is not None and spheres.shape[0] > 0:
      fs, phis = _sphere_sphere_forces(pos, vel, radius, spheres,
                                       box_friction, params)
      force = force + fs
      phib = jnp.maximum(phib, phis)
    # penetration reported separately for ground vs. obstacles: the task's
    # contact-based termination distinguishes them (move_forward_task.py:
    # 113-132 treats *any* obstacle contact as non-foot contact)
    return force, jnp.stack([phi, phib], axis=-1)

  return contact_fn


def _sphere_box_forces(pos, vel, radius, boxes, friction, params):
  """Contact of P spheres against K yaw-oriented boxes.

  boxes: (K, 8) = [center(3), half_extents(3), yaw, valid].
  Returns (forces (P,3), max penetration per point (P,)).
  """
  c = boxes[:, 0:3]
  half = boxes[:, 3:6]
  yaw = boxes[:, 6]
  valid = boxes[:, 7]
  cy, sy = jnp.cos(yaw), jnp.sin(yaw)
  # world->box rotation (yaw only)
  d = pos[:, None, :] - c[None]                      # (P, K, 3)
  lx = cy[None] * d[..., 0] + sy[None] * d[..., 1]
  ly = -sy[None] * d[..., 0] + cy[None] * d[..., 1]
  lp = jnp.stack([lx, ly, d[..., 2]], axis=-1)       # (P, K, 3) box-local
  closest = jnp.clip(lp, -half[None], half[None])
  delta = lp - closest
  dist_out = jnp.linalg.norm(delta, axis=-1)         # 0 when center inside
  # outside: penetration = r - dist; inside: r + distance to nearest face
  inside = dist_out <= 1e-9
  face_gap = half[None] - jnp.abs(lp)                # (P, K, 3) >=0 inside
  min_gap = jnp.min(face_gap, axis=-1)
  phi = jnp.where(inside, radius[:, None] + min_gap,
                  radius[:, None] - dist_out)
  # normal: outward from closest point (outside) or nearest-face axis (inside)
  n_out = delta / jnp.maximum(dist_out, 1e-9)[..., None]
  # branchless one-hot argmin (first-min tie-break, same as jnp.argmin):
  # gather/take_along_axis do not lower inside Pallas TPU kernels
  g0, g1, g2 = face_gap[..., 0], face_gap[..., 1], face_gap[..., 2]
  m0 = (g0 <= g1) & (g0 <= g2)
  m1 = jnp.logical_not(m0) & (g1 <= g2)
  m2 = jnp.logical_not(m0 | m1)
  onehot = jnp.stack([m0, m1, m2], axis=-1).astype(lp.dtype)   # (P, K, 3)
  sign = jnp.sign(jnp.sum(lp * onehot, axis=-1))
  n_face = onehot * sign[..., None]
  n_local = jnp.where(inside[..., None], n_face, n_out)
  # rotate normal back to world (yaw)
  nw = jnp.stack([
      cy[None] * n_local[..., 0] - sy[None] * n_local[..., 1],
      sy[None] * n_local[..., 0] + cy[None] * n_local[..., 1],
      n_local[..., 2],
  ], axis=-1)
  phi = jnp.where(valid[None] > 0.5, phi, -1.0)
  f = _contact_force(phi, nw, vel[:, None, :], friction, params)  # (P, K, 3)
  return jnp.sum(f, axis=1), jnp.max(phi, axis=1)


def _sphere_sphere_forces(pos, vel, radius, spheres, friction, params):
  """Contact of P collision spheres against Q static obstacle spheres.

  spheres: (Q, 5) = [center(3), radius, valid].
  """
  c = spheres[:, 0:3]
  r = spheres[:, 3]
  valid = spheres[:, 4]
  d = pos[:, None, :] - c[None]                      # (P, Q, 3)
  dist = jnp.linalg.norm(d, axis=-1)
  phi = (radius[:, None] + r[None]) - dist
  phi = jnp.where(valid[None] > 0.5, phi, -1.0)
  n = d / jnp.maximum(dist, 1e-9)[..., None]
  f = _contact_force(phi, n, vel[:, None, :], friction, params)
  return jnp.sum(f, axis=1), jnp.max(phi, axis=1)
