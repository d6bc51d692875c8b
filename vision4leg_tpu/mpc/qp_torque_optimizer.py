"""Zeroth-order whole-body force QP for stance control — jittable.

Reference: mpc_controller/qp_torque_optimizer.py:16-98 (quadprog-based):
  min || M f - (g + desired_acc) ||_Q^2 + reg ||f||^2
  s.t. fz bounds per contact leg + friction pyramid,
with M the 6x12 centroidal "mass matrix" mapping forces to base
accelerations.  The quadprog active-set solve becomes the same
box-constrained ADMM used by the convex MPC, so this vmaps across
environments.
"""
from __future__ import annotations

import jax.numpy as jnp

from vision4leg_tpu.mpc.convex_mpc import _admm_box_qp

ACC_WEIGHT = jnp.array([1.0, 1.0, 1.0, 10.0, 10.0, 1.0])


def compute_mass_matrix(robot_mass, robot_inertia, foot_positions):
  """(6, 12): rows = base [lin acc(3), ang acc(3)] per unit leg force."""
  inv_mass = jnp.eye(3) / robot_mass
  inv_inertia = jnp.linalg.inv(robot_inertia)
  blocks = []
  for leg in range(4):
    x = foot_positions[leg]
    skew = jnp.array([[0, -x[2], x[1]], [x[2], 0, -x[0]],
                      [-x[1], x[0], 0.0]])
    blocks.append(jnp.concatenate([inv_mass, inv_inertia @ skew], axis=0))
  return jnp.concatenate(blocks, axis=1)


def compute_contact_force(mass, inertia, foot_positions, desired_acc,
                          contacts, acc_weight=ACC_WEIGHT,
                          reg_weight: float = 1e-4,
                          friction_coef: float = 0.45,
                          f_min_ratio: float = 0.1,
                          f_max_ratio: float = 10.0,
                          iters: int = 60) -> jnp.ndarray:
  """Returns (4, 3) robot-applied forces (negated ground reaction), like
  the reference (:98)."""
  M = compute_mass_matrix(mass, inertia, foot_positions)
  g = jnp.array([0.0, 0.0, 9.8, 0.0, 0.0, 0.0])
  Q = jnp.diag(acc_weight)
  P = 2.0 * (M.T @ Q @ M + reg_weight * jnp.eye(12) + 1e-4 * jnp.eye(12))
  q = -2.0 * M.T @ Q @ (g + desired_acc)

  # constraints: per leg fz in [f_min, f_max] (contact) or ~0, plus pyramid
  f_min = f_min_ratio * mass * 9.8
  f_max = f_max_ratio * mass * 9.8
  contacts = contacts.astype(jnp.float32)
  rows = []
  lbs = []
  ubs = []
  big = 1e7
  for leg in range(4):
    e = jnp.zeros((1, 12)).at[0, leg * 3 + 2].set(1.0)
    rows.append(e)
    lbs.append(contacts[leg] * f_min - (1 - contacts[leg]) * 1e-7)
    ubs.append(contacts[leg] * f_max + (1 - contacts[leg]) * 1e-7)
    for cx, cy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
      r = jnp.zeros((1, 12))
      r = r.at[0, leg * 3].set(cx).at[0, leg * 3 + 1].set(cy)
      r = r.at[0, leg * 3 + 2].set(friction_coef)
      rows.append(r)
      lbs.append(jnp.asarray(0.0))
      ubs.append(jnp.asarray(big))
  A = jnp.concatenate(rows, axis=0)
  lb = jnp.stack(lbs)
  ub = jnp.stack(ubs)
  f = _admm_box_qp(P, q, A, lb, ub, iters, rho=0.1, sigma=1e-6)
  return -f.reshape(4, 3)
