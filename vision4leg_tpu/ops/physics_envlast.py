"""Env-last (structure-of-arrays) rigid-body physics for the Pallas TPU
window kernel.

The engine in `physics/engine.py` is written per-env and batched with
`jax.vmap`, which places the environment axis FIRST.  Inside a Pallas
kernel that layout is hostile to the hardware: TPU vector registers tile
the LAST two axes (8 sublanes x 128 lanes), so an (E, 13, 3, 3) tensor
keeps 9 of 1024 vreg slots busy, and the (…,1,1)->(…,3,3) broadcasts the
per-env math needs crash this Mosaic version outright.

This module is the same math with the env axis LAST: every per-env array
is (…, E) so each scalar operation of the physics becomes one full-width
vector op over E environments, and all broadcasting happens on leading
(untiled) axes.  Model constants stay env-free and broadcast in.

It is intentionally self-contained and mirrors, function by function:
  * engine.fwd_kinematics / body_velocities / mass_matrix / bias_forces
  * engine.contact_points_world / point_jacobian
  * contact.make_terrain_contact_fn (flat ground + pruned boxes)
  * engine.solve_spd_cg / integrate, a1.motor_torques / robot_step
Parity is enforced by tests/test_physics_kernel.py against the vmapped
engine.  (Reference behavior citations live on the mirrored functions.)

Pallas constraints honored throughout: no gathers/scatters (static
Python indices + stacks), no array-literal constants (iota-built eyes),
fori_loop instead of scan, vector dots as mul+sum.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from vision4leg_tpu.physics.model import Model

# contact params — must match physics/contact.py ContactParams defaults
STIFFNESS = 5000.0
DAMPING = 150.0
V_SLIP = 0.02


# ---------------------------------------------------------------------------
# small env-last linalg helpers: (..., m, k, E) with broadcasting on the
# leading axes only
# ---------------------------------------------------------------------------

def mm(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
  """(..., m, k, E) @ (..., k, n, E) -> (..., m, n, E)."""
  return jnp.sum(A[..., :, :, None, :] * B[..., None, :, :, :], axis=-3)


def mv(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
  """(..., m, k, E) @ (..., k, E) -> (..., m, E)."""
  return jnp.sum(A * x[..., None, :, :], axis=-2)


def transpose(A: jnp.ndarray) -> jnp.ndarray:
  """Matrix transpose of the two leading-of-trailing axes (..., m, n, E)."""
  return jnp.swapaxes(A, -3, -2)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  """(..., 3, E) x (..., 3, E)."""
  a0, a1, a2 = a[..., 0, :], a[..., 1, :], a[..., 2, :]
  b0, b1, b2 = b[..., 0, :], b[..., 1, :], b[..., 2, :]
  return jnp.stack(
      [a1 * b2 - a2 * b1, a2 * b0 - a0 * b2, a0 * b1 - a1 * b0], axis=-2)


def skew(v: jnp.ndarray) -> jnp.ndarray:
  """(..., 3, E) -> (..., 3, 3, E) with skew(a) @ b = a x b."""
  x, y, z = v[..., 0, :], v[..., 1, :], v[..., 2, :]
  zero = jnp.zeros_like(x)
  return jnp.stack([
      jnp.stack([zero, -z, y], axis=-2),
      jnp.stack([z, zero, -x], axis=-2),
      jnp.stack([-y, x, zero], axis=-2),
  ], axis=-3)


def eye_el(n: int, dtype=jnp.float32) -> jnp.ndarray:
  """(n, n) identity built from 2D iota (array literals are rejected as
  captured constants inside pallas_call)."""
  ii = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
  jj = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
  return (ii == jj).astype(dtype)


def quat_to_mat(q: jnp.ndarray) -> jnp.ndarray:
  """(4, E) wxyz -> (3, 3, E); mirrors maths.quat_to_mat."""
  w, x, y, z = q[0], q[1], q[2], q[3]
  return jnp.stack([
      jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                 2 * (x * z + w * y)]),
      jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                 2 * (y * z - w * x)]),
      jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                 1 - 2 * (x * x + y * y)]),
  ])


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
  """(4, E) Hamilton product; mirrors maths.quat_mul."""
  aw, ax, ay, az = a[0], a[1], a[2], a[3]
  bw, bx, by, bz = b[0], b[1], b[2], b[3]
  return jnp.stack([
      aw * bw - ax * bx - ay * by - az * bz,
      aw * bx + ax * bw + ay * bz - az * by,
      aw * by - ax * bz + ay * bw + az * bx,
      aw * bz + ax * by - ay * bx + az * bw,
  ])


def quat_integrate(q: jnp.ndarray, omega: jnp.ndarray,
                   dt: float) -> jnp.ndarray:
  """(4, E), (3, E) world angular velocity; mirrors maths.quat_integrate."""
  angle = jnp.sqrt(jnp.sum(omega * omega, axis=0))
  axis = omega / jnp.maximum(angle, 1e-9)[None]
  half = 0.5 * angle * dt
  dq = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half)[None] * axis])
  out = quat_mul(dq, q)
  return out / jnp.sqrt(jnp.sum(out * out, axis=0))[None]


# ---------------------------------------------------------------------------
# kinematics / dynamics (mirror engine.py, env-last)
# ---------------------------------------------------------------------------

def _rodrigues(axes: jnp.ndarray, ang: jnp.ndarray) -> jnp.ndarray:
  """axes (L, 3) model constants, ang (L, E) -> (L, 3, 3, E)."""
  c = jnp.cos(ang)[:, None, None, :]
  s = jnp.sin(ang)[:, None, None, :]
  # skew/outer of the constant axes, env axis appended for broadcast
  x, y, z = axes[:, 0], axes[:, 1], axes[:, 2]
  zero = jnp.zeros_like(x)
  K = jnp.stack([
      jnp.stack([zero, -z, y], axis=-1),
      jnp.stack([z, zero, -x], axis=-1),
      jnp.stack([-y, x, zero], axis=-1),
  ], axis=-2)[..., None]                                    # (L,3,3,1)
  aaT = (axes[:, :, None] * axes[:, None, :])[..., None]    # (L,3,3,1)
  eye = eye_el(3)[None, :, :, None]                         # (1,3,3,1)
  return c * eye + s * K + (1.0 - c) * aaT


def fk(model: Model, pos, quat, q):
  """Env-last fwd_kinematics. pos (3,E), quat (4,E), q (12,E).

  Returns dict R (B,3,3,E), p (B,3,E), com_w (B,3,E), ax_w (J,3,E),
  jp_w (J,3,E).
  """
  nb = model.nbody
  R_list = [None] * nb
  p_list = [None] * nb
  ax_list = [None] * (nb - 1)
  R_list[0] = quat_to_mat(quat)
  p_list[0] = pos
  for level in model.levels:
    jl = [b - 1 for b in level]
    plz = [model.parent[b] for b in level]
    Rp = jnp.stack([R_list[i] for i in plz])                # (L,3,3,E)
    pp = jnp.stack([p_list[i] for i in plz])                # (L,3,E)
    offs = jnp.stack([model.joint_offset[j] for j in jl])   # (L,3)
    axes = jnp.stack([model.joint_axis[j] for j in jl])     # (L,3)
    ang = jnp.stack([q[j] for j in jl])                     # (L,E)
    p_lvl = pp + mv(Rp, offs[:, :, None])
    R_lvl = mm(Rp, _rodrigues(axes, ang))
    ax_lvl = mv(Rp, axes[:, :, None])
    for k, b in enumerate(level):
      R_list[b] = R_lvl[k]
      p_list[b] = p_lvl[k]
      ax_list[b - 1] = ax_lvl[k]
  R = jnp.stack(R_list)
  p = jnp.stack(p_list)
  com_w = p + mv(R, model.com[:, :, None])
  return dict(R=R, p=p, com_w=com_w, ax_w=jnp.stack(ax_list), jp_w=p[1:])


def body_velocities(model: Model, kin, ang, lin, qd):
  """Env-last engine.body_velocities: per-body omega/v_com + bias accel."""
  nb = model.nbody
  zero3 = jnp.zeros_like(lin)
  om_l = [zero3] * nb
  al_l = [zero3] * nb
  vr_l = [zero3] * nb
  ar_l = [zero3] * nb
  rf_l = [zero3] * nb
  om_l[0] = ang
  vr_l[0] = lin
  rf_l[0] = kin["p"][0]
  for level in model.levels:
    jl = [b - 1 for b in level]
    plz = [model.parent[b] for b in level]
    om_p = jnp.stack([om_l[i] for i in plz])
    al_p = jnp.stack([al_l[i] for i in plz])
    vr_p = jnp.stack([vr_l[i] for i in plz])
    ar_p = jnp.stack([ar_l[i] for i in plz])
    jpw = jnp.stack([kin["jp_w"][j] for j in jl])           # (L,3,E)
    r = jpw - jnp.stack([rf_l[i] for i in plz])
    a = jnp.stack([kin["ax_w"][j] for j in jl])
    qd_l = jnp.stack([qd[j] for j in jl])[:, None, :]       # (L,1,E)
    om_n = om_p + a * qd_l
    al_n = al_p + cross(om_p, a) * qd_l
    vr_n = vr_p + cross(om_p, r)
    ar_n = ar_p + cross(al_p, r) + cross(om_p, cross(om_p, r))
    for k, b in enumerate(level):
      om_l[b] = om_n[k]
      al_l[b] = al_n[k]
      vr_l[b] = vr_n[k]
      ar_l[b] = ar_n[k]
      rf_l[b] = jpw[k]
  omega = jnp.stack(om_l)
  alpha = jnp.stack(al_l)
  v_ref = jnp.stack(vr_l)
  a_ref = jnp.stack(ar_l)
  ref = jnp.stack(rf_l)
  rc = kin["com_w"] - ref
  v_com = v_ref + cross(omega, rc)
  a_com = a_ref + cross(alpha, rc) + cross(omega, cross(omega, rc))
  return omega, v_com, alpha, a_com


def body_jacobians(model: Model, kin):
  """Env-last engine._body_jacobians: (B,3,nv,E) rotational/translational."""
  nb, nj = model.nbody, model.njoint
  E = kin["p"].shape[-1]
  mask = model.ancestor_mask                                # (B,J)
  eye3 = eye_el(3)
  Jw_base = jnp.concatenate([eye3, jnp.zeros((3, 3))], axis=1)  # (3,6)
  Jw_base = jnp.broadcast_to(Jw_base[None, :, :, None], (nb, 3, 6, E))
  axT = jnp.swapaxes(kin["ax_w"], 0, 1)                     # (3,J,E)
  Jw_j = axT[None] * mask[:, None, :, None]                 # (B,3,J,E)
  Jw = jnp.concatenate([Jw_base, Jw_j], axis=2)             # (B,3,nv,E)

  r_base = kin["com_w"] - kin["p"][0][None]                 # (B,3,E)
  Jv_rot = transpose(skew(r_base))                          # (B,3,3,E)
  r_joint = kin["com_w"][:, None] - kin["jp_w"][None]       # (B,J,3,E)
  # mask pre-expanded along E: an operand may broadcast at most ONE of the
  # two tiled (trailing) axes per op — (B,J,1,1) would broadcast both and
  # crashes this Mosaic version
  mask_e = jnp.broadcast_to(mask[:, :, None], mask.shape + (E,))  # (B,J,E)
  Jv_j = cross(kin["ax_w"][None], r_joint) * mask_e[:, :, None, :]
  Jv_j = jnp.swapaxes(Jv_j, 1, 2)                           # (B,3,J,E)
  eye_b = jnp.broadcast_to(eye3[None, :, :, None], (nb, 3, 3, E))
  Jv = jnp.concatenate([Jv_rot, eye_b, Jv_j], axis=2)       # (B,3,nv,E)
  return Jw, Jv


def mass_and_bias(model: Model, kin, ang, lin, qd, mass_e, inertia_e):
  """Env-last mass matrix (nv,nv,E) and bias force (nv,E).

  mass_e (B,E) and inertia_e (B,3,3,E) carry the per-env dynamics
  randomization scaling (a1.apply_dynamics)."""
  nb = model.nbody
  nv = model.nv
  E = kin["p"].shape[-1]
  Jw, Jv = body_jacobians(model, kin)
  Iw = mm(mm(kin["R"], inertia_e), transpose(kin["R"]))     # (B,3,3,E)

  M = jnp.zeros((nv, nv, E))
  for b in range(nb):
    Jvb = Jv[b]                                             # (3,nv,E)
    Jwb = Jw[b]
    mJvb = mass_e[b][None, None, :] * Jvb
    M = M + jnp.sum(mJvb[:, :, None, :] * Jvb[:, None, :, :], axis=0)
    IwJwb = mm(Iw[b], Jwb)                                  # (3,nv,E)
    M = M + jnp.sum(Jwb[:, :, None, :] * IwJwb[:, None, :, :], axis=0)

  omega, _, alpha, a_com = body_velocities(model, kin, ang, lin, qd)
  F = mass_e[:, None, :] * (a_com - model.gravity[None, :, None])
  T = mv(Iw, alpha) + cross(omega, mv(Iw, omega))
  h = (jnp.sum(Jv * F[:, :, None, :], axis=(0, 1))
       + jnp.sum(Jw * T[:, :, None, :], axis=(0, 1)))       # (nv,E)
  return M, h


def contact_points(model: Model, kin, ang, lin, qd):
  """Env-last engine.contact_points_world: pos/vel (P,3,E), Jp (P,3,nv,E)."""
  Rb = jnp.stack([kin["R"][b] for b in model.cp_body])      # (P,3,3,E)
  pb = jnp.stack([kin["p"][b] for b in model.cp_body])
  pos = pb + mv(Rb, model.cp_offset[:, :, None])

  mask = jnp.stack([model.ancestor_mask[b] for b in model.cp_body])  # (P,J)
  E = pos.shape[-1]
  r_joint = pos[:, None] - kin["jp_w"][None]                # (P,J,3,E)
  # see body_jacobians: mask pre-expanded along E to avoid a both-tiled-axis
  # broadcast, which crashes Mosaic
  mask_e = jnp.broadcast_to(mask[:, :, None], mask.shape + (E,))
  cols = cross(kin["ax_w"][None], r_joint) * mask_e[:, :, None, :]
  cols = jnp.swapaxes(cols, 1, 2)                           # (P,3,J,E)
  base_rot = transpose(skew(pos - kin["p"][0][None]))       # (P,3,3,E)
  P, _, _, E = base_rot.shape
  eye_b = jnp.broadcast_to(eye_el(3)[None, :, :, None], (P, 3, 3, E))
  Jp = jnp.concatenate([base_rot, eye_b, cols], axis=2)     # (P,3,nv,E)

  gen_v = jnp.concatenate([ang, lin, qd], axis=0)           # (nv,E)
  vel = jnp.sum(Jp * gen_v[None, None, :, :], axis=2)       # (P,3,E)
  return pos, vel, Jp


# ---------------------------------------------------------------------------
# contacts (mirror physics/contact.py, env-last, flat ground + boxes)
# ---------------------------------------------------------------------------

def _contact_force(phi, normal, vel, friction):
  """phi (..., E), normal/vel (..., 3, E), friction broadcastable (E,)."""
  in_contact = phi > 0.0
  v_n = jnp.sum(vel * normal, axis=-2)
  f_n = jnp.maximum(STIFFNESS * phi - DAMPING * v_n, 0.0) * in_contact
  v_t = vel - v_n[..., None, :] * normal
  v_t_norm = jnp.sqrt(jnp.sum(v_t * v_t, axis=-2) + V_SLIP ** 2)
  f_t = -(friction * f_n / v_t_norm)[..., None, :] * v_t
  return f_n[..., None, :] * normal + f_t


def _box_forces(pos, vel, radius, boxes, friction):  # noqa: D401
  """pos/vel (P,3,E), radius (P,), boxes (K,8,E) [c3,h3,yaw,valid]."""
  c = boxes[:, 0:3]                                         # (K,3,E)
  half = boxes[:, 3:6]
  yaw = boxes[:, 6]                                         # (K,E)
  valid = boxes[:, 7]
  cy, sy = jnp.cos(yaw), jnp.sin(yaw)
  d = pos[:, None] - c[None]                                # (P,K,3,E)
  lx = cy[None] * d[:, :, 0] + sy[None] * d[:, :, 1]        # (P,K,E)
  ly = -sy[None] * d[:, :, 0] + cy[None] * d[:, :, 1]
  lp = jnp.stack([lx, ly, d[:, :, 2]], axis=2)              # (P,K,3,E)
  closest = jnp.clip(lp, -half[None], half[None])
  delta = lp - closest
  dist_out = jnp.sqrt(jnp.sum(delta * delta, axis=2))       # (P,K,E)
  inside = dist_out <= 1e-9
  face_gap = half[None] - jnp.abs(lp)                       # (P,K,3,E)
  min_gap = jnp.min(face_gap, axis=2)
  # radius expanded to (P,K,1): (P,1,1) would broadcast both tiled axes
  K = boxes.shape[0]
  rad = jnp.broadcast_to(radius[:, None], (radius.shape[0], K))[..., None]
  phi = jnp.where(inside, rad + min_gap, rad - dist_out)
  n_out = delta / jnp.maximum(dist_out, 1e-9)[:, :, None]
  g0, g1, g2 = face_gap[:, :, 0], face_gap[:, :, 1], face_gap[:, :, 2]
  m0 = (g0 <= g1) & (g0 <= g2)
  m1 = jnp.logical_not(m0) & (g1 <= g2)
  m2 = jnp.logical_not(m0 | m1)
  # cast each mask BEFORE stacking: concatenation of i1 vectors crashes
  # Mosaic; f32 stacks are fine
  dt = lp.dtype
  onehot = jnp.stack([m0.astype(dt), m1.astype(dt), m2.astype(dt)],
                     axis=2)                                # (P,K,3,E)
  sign = jnp.sign(jnp.sum(lp * onehot, axis=2))
  n_face = onehot * sign[:, :, None]
  n_local = jnp.where(inside[:, :, None], n_face, n_out)
  nw = jnp.stack([
      cy[None] * n_local[:, :, 0] - sy[None] * n_local[:, :, 1],
      sy[None] * n_local[:, :, 0] + cy[None] * n_local[:, :, 1],
      n_local[:, :, 2],
  ], axis=2)                                                # (P,K,3,E)
  phi = jnp.where(valid[None] > 0.5, phi, -1.0)
  f = _contact_force(phi, nw, vel[:, None], friction)       # (P,K,3,E)
  return jnp.sum(f, axis=1), jnp.max(phi, axis=1)           # (P,3,E),(P,E)


def _sphere_forces(pos, vel, radius, spheres, friction):
  """Contact of P collision spheres vs Q static obstacle spheres.

  pos/vel (P,3,E); spheres (Q,5,E) = [center(3), r, valid].
  Mirrors contact._sphere_sphere_forces, env-last."""
  c = spheres[:, 0:3]                                       # (Q,3,E)
  r = spheres[:, 3]                                         # (Q,E)
  valid = spheres[:, 4]
  d = pos[:, None] - c[None]                                # (P,Q,3,E)
  dist = jnp.sqrt(jnp.sum(d * d, axis=2))                   # (P,Q,E)
  Q = spheres.shape[0]
  radq = jnp.broadcast_to(radius[:, None], (radius.shape[0], Q))[..., None]
  phi = (radq + r[None]) - dist
  phi = jnp.where(valid[None] > 0.5, phi, -1.0)
  n = d / jnp.maximum(dist, 1e-9)[:, :, None]
  f = _contact_force(phi, n, vel[:, None], friction)        # (P,Q,3,E)
  return jnp.sum(f, axis=1), jnp.max(phi, axis=1)


def flat_contact(model: Model, pos, vel, boxes, spheres,
                 fric_ground, fric_box):
  """Flat-ground + pruned-box/sphere contact.
  Returns force (P,3,E), pen (P,2,E).

  Two friction coefficients mirror the env's contact builder
  (envs/env.py _contact_fn): ground = lateral_friction * fric_coeff[0],
  obstacles = lateral_friction."""
  radius = model.cp_radius                                  # (P,)
  phi = radius[:, None] - pos[:, 2]                         # (P,E)
  up = jnp.stack([jnp.zeros_like(phi), jnp.zeros_like(phi),
                  jnp.ones_like(phi)], axis=1)              # (P,3,E)
  force = _contact_force(phi, up, vel, fric_ground)
  fb, phib = _box_forces(pos, vel, radius, boxes, fric_box)
  if spheres is not None and spheres.shape[0] > 0:
    fs, phis = _sphere_forces(pos, vel, radius, spheres, fric_box)
    fb = fb + fs
    phib = jnp.maximum(phib, phis)
  return force + fb, jnp.stack([phi, phib], axis=1)         # (P,2,E)


# ---------------------------------------------------------------------------
# solver / integration / motor model
# ---------------------------------------------------------------------------

def solve_spd_cg(M: jnp.ndarray, b: jnp.ndarray,
                 iters: int = 16) -> jnp.ndarray:
  """Env-last Jacobi-PCG: M (nv,nv,E), b (nv,E)."""
  nv = M.shape[0]
  diag = jnp.stack([M[i, i] for i in range(nv)])            # (nv,E)
  dinv = 1.0 / diag
  matvec = lambda p: jnp.sum(M * p[None, :, :], axis=1)
  vdot = lambda a, b: jnp.sum(a * b, axis=0)                # (E,)
  x = b * dinv
  r = b - matvec(x)
  z = dinv * r
  p = z
  rz = vdot(r, z)

  def body(_, carry):
    x, r, p, rz = carry
    Mp = matvec(p)
    alpha = rz / jnp.maximum(vdot(p, Mp), 1e-12)
    x = x + alpha[None] * p
    r = r - alpha[None] * Mp
    z = dinv * r
    rz_new = vdot(r, z)
    p = z + (rz_new / jnp.maximum(rz, 1e-12))[None] * p
    return (x, r, p, rz_new)

  x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
  return x


def joint_limit_torque(model: Model, q, qd, k_lim=300.0, d_lim=1.0):
  lo = model.joint_lower[:, None]
  hi = model.joint_upper[:, None]
  below = jnp.maximum(lo - q, 0.0)
  above = jnp.maximum(q - hi, 0.0)
  viol = (below > 0) | (above > 0)
  return k_lim * (below - above) - d_lim * qd * viol


def motor_torques(q, qd, commands, kp, kd, strength):
  """Env-last a1.motor_torques; all (12, E)."""
  return strength * (-kp * (q - commands) - kd * qd)


def end_contact_pen(model: Model, st: Dict[str, jnp.ndarray], boxes,
                    spheres, fric_ground, fric_box) -> jnp.ndarray:
  """Contact penetration (P,2,E) of the CURRENT state — the env reads
  post-window contact (pybullet getContactPoints reads the post-step
  world, envs/env.py step)."""
  kin = fk(model, st["pos"], st["quat"], st["q"])
  cpos, cvel, _ = contact_points(model, kin, st["ang"], st["lin"],
                                 st["qd"])
  _, pen = flat_contact(model, cpos, cvel, boxes, spheres, fric_ground,
                        fric_box)
  return pen


def substep(model: Model, st: Dict[str, jnp.ndarray], tau_j,
            mass_e, inertia_e, damping_e, coulomb_e, boxes, spheres,
            fric_ground, fric_box):
  """One env-last physics substep (engine.fwd_dynamics + integrate)."""
  kin = fk(model, st["pos"], st["quat"], st["q"])
  M, h = mass_and_bias(model, kin, st["ang"], st["lin"], st["qd"],
                       mass_e, inertia_e)
  cpos, cvel, Jp = contact_points(model, kin, st["ang"], st["lin"],
                                  st["qd"])
  f_c, pen = flat_contact(model, cpos, cvel, boxes, spheres, fric_ground,
                          fric_box)
  tau_c = jnp.sum(Jp * f_c[:, :, None, :], axis=(0, 1))     # (nv,E)
  tau_full = (tau_j + joint_limit_torque(model, st["q"], st["qd"])
              - damping_e * st["qd"]
              - coulomb_e * jnp.tanh(st["qd"] / 0.05))
  E = tau_full.shape[-1]
  tau = jnp.concatenate([jnp.zeros((6, E)), tau_full], axis=0)
  arm18 = jnp.concatenate([jnp.zeros(6), model.armature])
  Mr = M + (arm18[:, None] * eye_el(model.nv))[:, :, None]
  vdot = solve_spd_cg(Mr, tau + tau_c - h)

  dt = model.dt
  ang = st["ang"] + dt * vdot[0:3]
  lin = st["lin"] + dt * vdot[3:6]
  qd = st["qd"] + dt * vdot[6:]
  return dict(
      pos=st["pos"] + dt * lin,
      quat=quat_integrate(st["quat"], ang, dt),
      q=st["q"] + dt * qd,
      ang=ang, lin=lin, qd=qd,
  ), pen


def window(model: Model, rs: Dict[str, jnp.ndarray], action,
           dyn: Dict[str, jnp.ndarray], boxes, spheres, fric_ground,
           fric_box, n_substeps: int, interpolate: bool = False,
           tau_ff=None, tau_mask=None
           ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
  """Full action-repeat window, env-last (a1.robot_step + the env's
  post-window contact read, fused).

  rs: pos(3,E) quat(4,E) q(12,E) ang(3,E) lin(3,E) qd(12,E)
      hist(20,31,E) obs_tau(12,E) last_action(12,E) counter(E,)
  action (12,E) motor commands; dyn: kp/kd/strength (12,E),
  motor_friction/joint_friction (E,), mass_scale/inertia_scale (B,E).
  boxes (K,8,E); spheres (Q,5,E) or None; fric_ground/fric_box (E,).
  tau_ff/tau_mask (12,E), optional: HYBRID control for the MPC env —
  per-joint torque = (1-mask)*PD(action) + mask*tau_ff (swing legs track
  `action` under PD, stance legs apply the MPC feedforward torque; both
  fixed across the window like the reference's per-tick hybrid command,
  a1_sim.py Step).
  Returns (new rs, pen_end (P,2,E): [ground, obstacle] penetration of the
  post-window state — what envs/env.py step() feeds the contact-based
  termination).
  """
  mass_e = model.mass[:, None] * dyn["mass_scale"]          # (B,E)
  inertia_e = (model.inertia[..., None]
               * dyn["inertia_scale"][:, None, None, :])    # (B,3,3,E)
  damping_e = model.joint_damping[:, None] + dyn["motor_friction"][None]
  coulomb_e = model.joint_friction[:, None] + dyn["joint_friction"][None]
  prev = rs["last_action"]

  st0 = {k: rs[k] for k in ("pos", "quat", "q", "ang", "lin", "qd")}

  def body(i, carry):
    st, hist, obs_tau = carry
    if interpolate:
      lerp = (i.astype(jnp.float32) + 1.0) / n_substeps
      cmd = prev + lerp * (action - prev)
    else:
      cmd = action
    tau = motor_torques(st["q"], st["qd"], cmd, dyn["kp"], dyn["kd"],
                        dyn["strength"])
    if tau_ff is not None:
      tau = (1.0 - tau_mask) * tau + tau_mask * tau_ff
    st, _ = substep(model, st, tau, mass_e, inertia_e, damping_e,
                    coulomb_e, boxes, spheres, fric_ground, fric_box)
    rec = jnp.concatenate([st["q"], st["qd"], st["quat"], st["ang"]],
                          axis=0)                           # (31,E)
    hist = jnp.concatenate([rec[None], hist[:-1]], axis=0)
    return st, hist, tau

  st, hist, obs_tau = jax.lax.fori_loop(
      0, n_substeps, body, (st0, rs["hist"], rs["obs_tau"]))
  pen_end = end_contact_pen(model, st, boxes, spheres, fric_ground,
                            fric_box)
  new_rs = dict(st, hist=hist, obs_tau=obs_tau, last_action=action,
                counter=rs["counter"] + n_substeps)
  return new_rs, pen_end
