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
  R_acc = jnp.zeros((nb, 3, 3))
  p_acc = jnp.zeros((nb, 3))
  ax_acc = jnp.zeros((nb - 1, 3))
  R_acc = R_acc.at[0].set(maths.quat_to_mat(state.quat))
  p_acc = p_acc.at[0].set(state.pos)
  for level in model.levels:
    bidx = jnp.asarray(level)
    jidx = jnp.asarray([b - 1 for b in level])
    pidx = jnp.asarray([model.parent[b] for b in level])
    Rp = R_acc[pidx]                           # (L, 3, 3)
    pp = p_acc[pidx]                           # (L, 3)
    offs = model.joint_offset[jidx]            # (L, 3)
    axes = model.joint_axis[jidx]              # (L, 3)
    q = state.joint_q[jidx]                    # (L,)
    p_lvl = pp + jnp.einsum("lij,lj->li", Rp, offs)
    R_lvl = jnp.einsum("lij,ljk->lik", Rp, _rodrigues(axes, q))
    ax_lvl = jnp.einsum("lij,lj->li", Rp, axes)
    R_acc = R_acc.at[bidx].set(R_lvl)
    p_acc = p_acc.at[bidx].set(p_lvl)
    ax_acc = ax_acc.at[jidx].set(ax_lvl)
  com_w = p_acc + jnp.einsum("bij,bj->bi", R_acc, model.com)
  return Kin(R=R_acc, p=p_acc, com_w=com_w, ax_w=ax_acc, jp_w=p_acc[1:])


def point_jacobian(model: Model, kin: Kin, x: jnp.ndarray,
                   body: jnp.ndarray) -> jnp.ndarray:
  """Translational Jacobian (3, nv) of world point x attached to `body`.

  Vectorized over leading axes of (x, body) if present.
  """
  mask = model.ancestor_mask[body]                    # (..., J)
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
  Iw = jnp.einsum("bij,bjk,blk->bil", kin.R, model.inertia, kin.R)
  M = (jnp.einsum("b,biv,biw->vw", model.mass, Jv, Jv)
       + jnp.einsum("biv,bij,bjw->vw", Jw, Iw, Jw))
  return M


def body_velocities(model: Model, state: PhysState, kin: Kin):
  """Per-body (omega, v_com) plus bias (qddot=0) accelerations.

  Newton-Euler propagation in point form, root->leaves, vectorized per
  tree level.  Returns (omega (B,3), v_com (B,3), alpha_bias (B,3),
  a_com_bias (B,3)).
  """
  nb = model.nbody
  omega = jnp.zeros((nb, 3)).at[0].set(state.ang)
  alpha = jnp.zeros((nb, 3))
  v_ref = jnp.zeros((nb, 3)).at[0].set(state.lin)
  a_ref = jnp.zeros((nb, 3))
  ref = jnp.zeros((nb, 3)).at[0].set(kin.p[0])
  for level in model.levels:
    bidx = jnp.asarray(level)
    jidx = jnp.asarray([b - 1 for b in level])
    pidx = jnp.asarray([model.parent[b] for b in level])
    om_p = omega[pidx]
    al_p = alpha[pidx]
    vr_p = v_ref[pidx]
    ar_p = a_ref[pidx]
    r = kin.jp_w[jidx] - ref[pidx]             # (L, 3)
    a = kin.ax_w[jidx]
    qd = state.joint_qd[jidx][:, None]
    omega = omega.at[bidx].set(om_p + a * qd)
    alpha = alpha.at[bidx].set(al_p + jnp.cross(om_p, a) * qd)
    v_ref = v_ref.at[bidx].set(vr_p + jnp.cross(om_p, r))
    a_ref = a_ref.at[bidx].set(
        ar_p + jnp.cross(al_p, r) + jnp.cross(om_p, jnp.cross(om_p, r)))
    ref = ref.at[bidx].set(kin.jp_w[jidx])
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
  Iw = jnp.einsum("bij,bjk,blk->bil", kin.R, model.inertia, kin.R)
  F = model.mass[:, None] * (a_com - model.gravity)     # (B, 3)
  Iww = jnp.einsum("bij,bj->bi", Iw, omega)
  T = jnp.einsum("bij,bj->bi", Iw, alpha) + jnp.cross(omega, Iww)
  return (jnp.einsum("biv,bi->v", Jv, F)
          + jnp.einsum("biv,bi->v", Jw, T))


def contact_points_world(model: Model, state: PhysState, kin: Kin):
  """World positions and velocities of all collision points."""
  Rb = kin.R[model.cp_body]                              # (P, 3, 3)
  pos = kin.p[model.cp_body] + jnp.einsum("pij,pj->pi", Rb, model.cp_offset)
  omega, _, _, _ = body_velocities(model, state, kin)
  # velocity of point = v_ref(body origin path) — recompute via Jacobian to
  # stay allocation-friendly: v = J_p v_gen
  Jp = point_jacobian(model, kin, pos, model.cp_body)    # (P, 3, nv)
  v = jnp.einsum("piv,v->pi", Jp, gen_velocity(state))
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


def fwd_dynamics(model: Model, state: PhysState, tau_joints: jnp.ndarray,
                 contact_fn: ContactFn):
  """Forward dynamics: generalized acceleration and contact diagnostics."""
  kin = fwd_kinematics(model, state)
  M = mass_matrix(model, kin)
  h = bias_forces(model, state, kin)
  cpos, cvel, Jp = contact_points_world(model, state, kin)
  f_c, penetration = contact_fn(cpos, cvel, model.cp_radius)
  tau_c = jnp.einsum("piv,pi->v", Jp, f_c)
  tau_j = (tau_joints + joint_limit_torque(model, state)
           - model.joint_damping * state.joint_qd
           - model.joint_friction * jnp.tanh(state.joint_qd / 0.05))
  tau = jnp.concatenate([jnp.zeros(6), tau_j])
  Mr = M + jnp.diag(jnp.concatenate([jnp.zeros(6), model.armature]))
  vdot = jax.scipy.linalg.cho_solve(
      jax.scipy.linalg.cho_factor(Mr), tau + tau_c - h)
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
         contact_fn: ContactFn):
  """One physics substep. Returns (new_state, penetration (P,), forces)."""
  vdot, _, penetration, f_c = fwd_dynamics(model, state, tau_joints,
                                           contact_fn)
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
