"""JAX rigid-body dynamics for floating-base revolute trees.

This module is the TPU-native replacement for the reference's PyBullet
physics (the `pyb.stepSimulation()` inner loop at
`vision4leg/robots/minitaur.py:255-286`).  Design:

  * generalized coordinates: base pose (pos + wxyz quat) + joint angles;
    generalized velocity v = [omega_world(3), v_base_world(3), qd(J)].
  * mass matrix via world-frame composite-rigid-body Jacobians
    (M = sum_i J_i^T I_i J_i) — dense einsums that XLA fuses and batches
    perfectly under vmap over environments.
  * Coriolis/centrifugal/gravity bias via a point-form Newton-Euler
    propagation at qddot = 0 (13-body unrolled loop, no dynamic control
    flow, so the whole step jits into straight-line XLA).
  * compliant (penalty) contacts at sphere collision points with
    regularized Coulomb friction — contact geometry is supplied by the
    caller as a pure function, so terrains live in `envs/terrain.py`.
  * semi-implicit Euler integration.

Everything is f32 and shape-static; `step` is designed to be wrapped in
`jax.vmap` over thousands of parallel environments and `lax.scan` over
substeps — the whole rollout compiles to a single XLA program.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vision4leg_tpu.physics import maths
from vision4leg_tpu.physics.model import Model


@struct.dataclass
class PhysState:
  """Dynamic state of one articulated system."""
  pos: jnp.ndarray       # (3,) base origin, world
  quat: jnp.ndarray      # (4,) wxyz base->world
  joint_q: jnp.ndarray   # (J,)
  ang: jnp.ndarray       # (3,) base angular velocity, world
  lin: jnp.ndarray       # (3,) base linear velocity (of base origin), world
  joint_qd: jnp.ndarray  # (J,)


class Kin(NamedTuple):
  """Forward-kinematics products reused by dynamics, contacts and sensors."""
  R: jnp.ndarray      # (B, 3, 3) body->world rotations
  p: jnp.ndarray      # (B, 3) body-frame origins, world
  com_w: jnp.ndarray  # (B, 3) body COMs, world
  ax_w: jnp.ndarray   # (J, 3) joint axes, world
  jp_w: jnp.ndarray   # (J, 3) joint anchors, world (= p[j+1])


# A contact function maps (point positions, point velocities, radii)
# -> (forces (P,3), penetration depths (P,)).  It closes over terrain data.
ContactFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray],
                     Tuple[jnp.ndarray, jnp.ndarray]]


def zero_state(model: Model) -> PhysState:
  nj = model.njoint
  return PhysState(
      pos=jnp.zeros(3), quat=maths.quat_identity(),
      joint_q=jnp.zeros(nj), ang=jnp.zeros(3), lin=jnp.zeros(3),
      joint_qd=jnp.zeros(nj))


def _mm(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
  """Batched small matmul (..., m, k) @ (..., k, n) as broadcast mul+sum.

  The 3x3/3xN products here are far below MXU size; expressing them as
  mul+reduce (VPU) also sidesteps Mosaic's 1-batch-dim tpu.matmul limit,
  which the env-tile vmap inside the Pallas window kernel would exceed.
  """
  return jnp.sum(A[..., :, :, None] * B[..., None, :, :], axis=-2)


def _mv(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
  """Batched small matvec (..., m, k) @ (..., k) as broadcast mul+sum."""
  return jnp.sum(A * x[..., None, :], axis=-1)


def _rodrigues(axes: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
  """Batched axis-angle rotation matrices: (L, 3), (L,) -> (L, 3, 3)."""
  c = jnp.cos(angles)[:, None, None]
  s = jnp.sin(angles)[:, None, None]
  K = maths.skew(axes)                         # (L, 3, 3)
  aaT = axes[:, :, None] * axes[:, None, :]
  eye = jnp.eye(3)[None]
  return c * eye + s * K + (1.0 - c) * aaT


def fwd_kinematics(model: Model, state: PhysState) -> Kin:
  """Propagate frames root->leaves, one vectorized batch per tree level
  (for the A1: 3 levels of 4 legs each instead of 12 sequential joints —
  the sequential-op count was the dominant rollout cost on TPU)."""
  nb = model.nbody
  # per-body values live in Python lists (filled root->leaves, then stacked
  # once): no functional array updates, so the traced body contains neither
  # scatters nor constant index arrays — both reject in Pallas TPU lowering
  R_list = [None] * nb
  p_list = [None] * nb
  ax_list = [None] * (nb - 1)
  R_list[0] = maths.quat_to_mat(state.quat)
  p_list[0] = state.pos
  for level in model.levels:
    jl = [b - 1 for b in level]
    plz = [model.parent[b] for b in level]
    Rp = jnp.stack([R_list[i] for i in plz])   # (L, 3, 3)
    pp = jnp.stack([p_list[i] for i in plz])   # (L, 3)
    offs = jnp.stack([model.joint_offset[j] for j in jl])
    axes = jnp.stack([model.joint_axis[j] for j in jl])
    q = jnp.stack([state.joint_q[j] for j in jl])
    p_lvl = pp + _mv(Rp, offs)
    R_lvl = _mm(Rp, _rodrigues(axes, q))
    ax_lvl = _mv(Rp, axes)
    for k, b in enumerate(level):
      R_list[b] = R_lvl[k]
      p_list[b] = p_lvl[k]
      ax_list[b - 1] = ax_lvl[k]
  R_acc = jnp.stack(R_list)
  p_acc = jnp.stack(p_list)
  ax_acc = jnp.stack(ax_list)
  com_w = p_acc + _mv(R_acc, model.com)
  return Kin(R=R_acc, p=p_acc, com_w=com_w, ax_w=ax_acc, jp_w=p_acc[1:])


def point_jacobian(model: Model, kin: Kin, x: jnp.ndarray,
                   body) -> jnp.ndarray:
  """Translational Jacobian (3, nv) of world point x attached to `body`.

  `body` is a static int or tuple of ints (matching leading axes of x):
  static indexing keeps the traced program gather-free for Pallas.
  """
  if isinstance(body, (tuple, list)):
    mask = jnp.stack([model.ancestor_mask[b] for b in body])  # (P, J)
  else:
    mask = model.ancestor_mask[body]                  # (..., J)
  r_joint = x[..., None, :] - kin.jp_w                # (..., J, 3)
  cols_j = jnp.cross(kin.ax_w, r_joint) * mask[..., None]  # (..., J, 3)
  eye = jnp.eye(3, dtype=x.dtype)
  # v(point) = lin + ang x (x - p0): columns for ang dofs are e_k x (x - p0)
  base_rot = maths.skew(x - kin.p[0]).swapaxes(-1, -2)  # (...,3,3) col k = e_k x r
  jac = jnp.concatenate(
      [base_rot, jnp.broadcast_to(eye, base_rot.shape),
       cols_j.swapaxes(-1, -2)], axis=-1)             # (..., 3, nv)
  return jac


def _body_jacobians(model: Model, kin: Kin):
  """Rotational/translational COM Jacobians for every body.

  Returns (Jw, Jv) each (B, 3, nv).
  """
  nb, nj = model.nbody, model.njoint
  mask = model.ancestor_mask                          # (B, J)
  # rotational: base ang dofs = identity; base lin dofs = 0; joint j = a_j
  Jw_base = jnp.concatenate(
      [jnp.eye(3), jnp.zeros((3, 3))], axis=1)        # (3, 6)
  Jw_joints = kin.ax_w.T[None] * mask[:, None, :]     # (B, 3, J)
  Jw = jnp.concatenate(
      [jnp.broadcast_to(Jw_base, (nb, 3, 6)), Jw_joints], axis=2)
  # translational at the COM
  r_base = kin.com_w - kin.p[0]                       # (B, 3)
  Jv_rot = maths.skew(r_base).swapaxes(-1, -2)        # col k = e_k x r
  r_joint = kin.com_w[:, None, :] - kin.jp_w[None]    # (B, J, 3)
  Jv_joints = (jnp.cross(kin.ax_w[None], r_joint)
               * mask[..., None]).swapaxes(-1, -2)    # (B, 3, J)
  Jv = jnp.concatenate(
      [Jv_rot, jnp.broadcast_to(jnp.eye(3), (nb, 3, 3)), Jv_joints], axis=2)
  return Jw, Jv


def mass_matrix(model: Model, kin: Kin) -> jnp.ndarray:
  """Joint-space inertia matrix (nv, nv) via CRB in world coordinates."""
  Jw, Jv = _body_jacobians(model, kin)
  Iw = _mm(_mm(kin.R, model.inertia), jnp.swapaxes(kin.R, -1, -2))
  # mass scaling as explicit mul: a "b,biv,..." einsum stage becomes a
  # contraction-free dot_general, which Mosaic fails to (de)serialize.
  # The remaining (b,i)-contractions keep exactly one batch dim under the
  # env vmap, which tpu.matmul accepts — and they are the real FLOPs.
  mJv = model.mass[:, None, None] * Jv
  IwJw = _mm(Iw, Jw)

  # merge (body, axis) into one contraction dim: Mosaic's tpu.matmul
  # requires exactly one contracting dim
  def flat2(A):
    return A.reshape(A.shape[:-3] + (-1, A.shape[-1]))   # (..., 3B, nv)

  M = (jnp.einsum("...kv,...kw->...vw", flat2(mJv), flat2(Jv))
       + jnp.einsum("...kv,...kw->...vw", flat2(Jw), flat2(IwJw)))
  return M


def body_velocities(model: Model, state: PhysState, kin: Kin):
  """Per-body (omega, v_com) plus bias (qddot=0) accelerations.

  Newton-Euler propagation in point form, root->leaves, vectorized per
  tree level.  Returns (omega (B,3), v_com (B,3), alpha_bias (B,3),
  a_com_bias (B,3)).
  """
  nb = model.nbody
  # Python-list accumulators for the same reason as fwd_kinematics: the
  # traced body must stay free of scatters for Pallas TPU lowering
  zero3 = jnp.zeros(3)
  om_list = [zero3] * nb
  al_list = [zero3] * nb
  vr_list = [zero3] * nb
  ar_list = [zero3] * nb
  ref_list = [zero3] * nb
  om_list[0] = state.ang
  vr_list[0] = state.lin
  ref_list[0] = kin.p[0]
  for level in model.levels:
    jl = [b - 1 for b in level]
    plz = [model.parent[b] for b in level]
    om_p = jnp.stack([om_list[i] for i in plz])
    al_p = jnp.stack([al_list[i] for i in plz])
    vr_p = jnp.stack([vr_list[i] for i in plz])
    ar_p = jnp.stack([ar_list[i] for i in plz])
    jpw = jnp.stack([kin.jp_w[j] for j in jl])
    r = jpw - jnp.stack([ref_list[i] for i in plz])   # (L, 3)
    a = jnp.stack([kin.ax_w[j] for j in jl])
    qd = jnp.stack([state.joint_qd[j] for j in jl])[:, None]
    om_l = om_p + a * qd
    al_l = al_p + jnp.cross(om_p, a) * qd
    vr_l = vr_p + jnp.cross(om_p, r)
    ar_l = (ar_p + jnp.cross(al_p, r)
            + jnp.cross(om_p, jnp.cross(om_p, r)))
    for k, b in enumerate(level):
      om_list[b] = om_l[k]
      al_list[b] = al_l[k]
      vr_list[b] = vr_l[k]
      ar_list[b] = ar_l[k]
      ref_list[b] = jpw[k]
  omega = jnp.stack(om_list)
  alpha = jnp.stack(al_list)
  v_ref = jnp.stack(vr_list)
  a_ref = jnp.stack(ar_list)
  ref = jnp.stack(ref_list)
  rc = kin.com_w - ref
  v_com = v_ref + jnp.cross(omega, rc)
  a_com = (a_ref + jnp.cross(alpha, rc)
           + jnp.cross(omega, jnp.cross(omega, rc)))
  return omega, v_com, alpha, a_com


def bias_forces(model: Model, state: PhysState, kin: Kin) -> jnp.ndarray:
  """Generalized Coriolis + centrifugal + gravity force h(q, v).

  EOM convention: M(q) vdot + h(q, v) = tau + J_c^T f_c.
  """
  Jw, Jv = _body_jacobians(model, kin)
  omega, _, alpha, a_com = body_velocities(model, state, kin)
  Iw = _mm(_mm(kin.R, model.inertia), jnp.swapaxes(kin.R, -1, -2))
  F = model.mass[:, None] * (a_com - model.gravity)     # (B, 3)
  Iww = _mv(Iw, omega)
  T = _mv(Iw, alpha) + jnp.cross(omega, Iww)
  return (jnp.sum(Jv * F[..., None], axis=(-3, -2))
          + jnp.sum(Jw * T[..., None], axis=(-3, -2)))


def contact_points_world(model: Model, state: PhysState, kin: Kin):
  """World positions and velocities of all collision points."""
  # cp_body holds static ints: stack of static slices, not a gather
  Rb = jnp.stack([kin.R[b] for b in model.cp_body])      # (P, 3, 3)
  pb = jnp.stack([kin.p[b] for b in model.cp_body])      # (P, 3)
  pos = pb + _mv(Rb, model.cp_offset)
  omega, _, _, _ = body_velocities(model, state, kin)
  # velocity of point = v_ref(body origin path) — recompute via Jacobian to
  # stay allocation-friendly: v = J_p v_gen
  Jp = point_jacobian(model, kin, pos, model.cp_body)    # (P, 3, nv)
  v = jnp.sum(Jp * gen_velocity(state)[..., None, None, :], axis=-1)
  return pos, v, Jp


def gen_velocity(state: PhysState) -> jnp.ndarray:
  return jnp.concatenate([state.ang, state.lin, state.joint_qd])


def joint_limit_torque(model: Model, state: PhysState,
                       k_lim: float = 300.0, d_lim: float = 1.0):
  """Penalty torques enforcing URDF joint limits (PyBullet enforces these
  as hard constraints; a stiff penalty is the compliant equivalent)."""
  q, qd = state.joint_q, state.joint_qd
  below = jnp.maximum(model.joint_lower - q, 0.0)
  above = jnp.maximum(q - model.joint_upper, 0.0)
  viol = (below > 0) | (above > 0)
  return k_lim * (below - above) - d_lim * qd * viol


def solve_spd_cg(M: jnp.ndarray, b: jnp.ndarray,
                 iters: int = 16) -> jnp.ndarray:
  """Jacobi-preconditioned conjugate gradient for the (nv, nv) SPD mass
  matrix.  Fixed iteration count, pure vector ops — lowers inside Pallas
  kernels (LAPACK-style cho_factor does not) and avoids the batched-
  small-Cholesky custom call.

  16 iterations reach the f32 solution floor on this system: across random
  A1 states the rel err vs Cholesky is 1.7e-7 median / 3.8e-7 max at 16
  (identical at 24/32; 1.5e-6 at 12)."""
  # vector dots as mul+sum: Mosaic fails to parse dot_general attrs with
  # empty non-contracting dims (vector-vector dot)
  vdot = lambda a, b: jnp.sum(a * b)
  mv = lambda A, v: jnp.sum(A * v[..., None, :], axis=-1)
  dinv = 1.0 / jnp.diagonal(M)
  x = b * dinv
  r = b - mv(M, x)
  z = dinv * r
  p = z
  rz = vdot(r, z)

  def body(_, carry):
    x, r, p, rz = carry
    Mp = mv(M, p)
    alpha = rz / jnp.maximum(vdot(p, Mp), 1e-12)
    x = x + alpha * p
    r = r - alpha * Mp
    z = dinv * r
    rz_new = vdot(r, z)
    p = z + (rz_new / jnp.maximum(rz, 1e-12)) * p
    return (x, r, p, rz_new)

  # fori_loop (not scan): Mosaic's while lowering only accepts the
  # fori pattern, and this must lower inside the Pallas window kernel
  x, _, _, _ = jax.lax.fori_loop(0, iters, body, (x, r, p, rz))
  return x


def fwd_dynamics(model: Model, state: PhysState, tau_joints: jnp.ndarray,
                 contact_fn: ContactFn, solver: str = "chol"):
  """Forward dynamics: generalized acceleration and contact diagnostics."""
  kin = fwd_kinematics(model, state)
  M = mass_matrix(model, kin)
  h = bias_forces(model, state, kin)
  cpos, cvel, Jp = contact_points_world(model, state, kin)
  f_c, penetration = contact_fn(cpos, cvel, model.cp_radius)
  tau_c = jnp.sum(Jp * f_c[..., None], axis=(-3, -2))
  tau_j = (tau_joints + joint_limit_torque(model, state)
           - model.joint_damping * state.joint_qd
           - model.joint_friction * jnp.tanh(state.joint_qd / 0.05))
  tau = jnp.concatenate([jnp.zeros(6), tau_j])
  Mr = M + jnp.diag(jnp.concatenate([jnp.zeros(6), model.armature]))
  rhs = tau + tau_c - h
  if solver == "cg":
    vdot = solve_spd_cg(Mr, rhs)
  else:
    vdot = jax.scipy.linalg.cho_solve(
        jax.scipy.linalg.cho_factor(Mr), rhs)
  return vdot, kin, penetration, f_c


def integrate(model: Model, state: PhysState,
              vdot: jnp.ndarray) -> PhysState:
  """Semi-implicit Euler: update velocities first, then positions."""
  dt = model.dt
  ang = state.ang + dt * vdot[0:3]
  lin = state.lin + dt * vdot[3:6]
  qd = state.joint_qd + dt * vdot[6:]
  return PhysState(
      pos=state.pos + dt * lin,
      quat=maths.quat_integrate(state.quat, ang, dt),
      joint_q=state.joint_q + dt * qd,
      ang=ang, lin=lin, joint_qd=qd)


def step(model: Model, state: PhysState, tau_joints: jnp.ndarray,
         contact_fn: ContactFn, solver: str = "chol"):
  """One physics substep. Returns (new_state, penetration (P,), forces)."""
  vdot, _, penetration, f_c = fwd_dynamics(model, state, tau_joints,
                                           contact_fn, solver=solver)
  return integrate(model, state, vdot), penetration, f_c


def kinetic_energy(model: Model, state: PhysState) -> jnp.ndarray:
  """Total kinetic energy — used for testing M(q) and the bias recursion."""
  kin = fwd_kinematics(model, state)
  omega, v_com, _, _ = body_velocities(model, state, kin)
  Iw = jnp.einsum("bij,bjk,blk->bil", kin.R, model.inertia, kin.R)
  ke_lin = 0.5 * jnp.sum(model.mass * jnp.sum(v_com * v_com, axis=-1))
  ke_rot = 0.5 * jnp.sum(omega * jnp.einsum("bij,bj->bi", Iw, omega))
  return ke_lin + ke_rot


def potential_energy(model: Model, state: PhysState) -> jnp.ndarray:
  kin = fwd_kinematics(model, state)
  return -jnp.sum(model.mass[:, None] * model.gravity[None] * kin.com_w)
