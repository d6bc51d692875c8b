"""Convex MPC for quadruped stance control — JAX, batched, jittable.

Reference: mpc_controller/mpc_osqp.cc (MIT-style convex MPC):
  * 13-dim state [rpy(3), pos(3), omega(3), vel(3), -g] with rpy-rate
    kinematics A(psi) (CalculateAMat :303-324) and contact-force input
    matrix B from world-frame foot positions (CalculateBMat :325-338),
  * zero-order-hold discretization by matrix exponential of [[A,B],[0,0]]dt
    (CalculateExponentials :339-352),
  * condensed horizon-H QP over contact forces:
      min  (A_qp x0 + B_qp U - X_ref)^T L (A_qp x0 + B_qp U - X_ref)
           + U^T alpha U
    with 5 friction-pyramid rows per leg per step
    (UpdateConstraintsMatrix :453-463, CalculateConstraintBounds :465-494),
  * fz bounds scaled by contact state; fz_max = mass * g * 10 (kMaxScale).

TPU-native solver: a fixed-iteration dense OSQP-style ADMM (the reference
links the OSQP C library; this is the same splitting).  The KKT matrix
P + sigma I + rho A^T A is factored once per rho setting and its explicit
inverse formed by a single multi-RHS Cholesky solve, so every ADMM
iteration is pure matmuls (sequential triangular solves are the worst
primitive on the MXU); the friction-pyramid constraints stay in
block-diagonal (5, 3) form end to end (_admm_box_qp_blockdiag), so the
dense (5Hn, 3Hn) constraint matrix is never built.  Everything is
shape-static, so the whole `compute_contact_forces` jits and vmaps over
environments — batched model-predictive control on device, which the
reference cannot do at all.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

STATE_DIM = 13
CONSTRAINT_DIM = 5
GRAVITY = 9.8
KMAX_SCALE = 10.0


class MpcConfig(NamedTuple):
  mass: float
  inertia: tuple           # 9 values, row-major 3x3 (body frame)
  num_legs: int = 4
  horizon: int = 10
  timestep: float = 0.025
  qp_weights: tuple = ()   # 13 values
  alpha: float = 1e-5
  admm_iters: int = 50
  rho: float = 0.1
  sigma: float = 1e-6
  # warm-started per-tick path (compute_contact_forces_warm)
  warm_iters: int = 15
  ns_iters: int = 1


def _a_matrix(rpy):
  cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
  # clamp pitch: tan/sec blow up at +-pi/2 (a FALLEN robot mid-episode
  # reaches that), and the exploded A cascades into a NaN KKT system —
  # an MPC solve at >80 deg pitch is physically meaningless anyway, the
  # episode is terminating
  p = jnp.clip(rpy[1], -1.4, 1.4)
  cp, tp = jnp.cos(p), jnp.tan(p)
  R = jnp.array([[cy / cp, sy / cp, 0.0],
                 [-sy, cy, 0.0],
                 [cy * tp, sy * tp, 1.0]])
  A = jnp.zeros((STATE_DIM, STATE_DIM))
  A = A.at[0:3, 6:9].set(R)
  A = A.at[3, 9].set(1.0).at[4, 10].set(1.0).at[5, 11].set(1.0)
  A = A.at[11, 12].set(1.0)
  return A


def _b_matrix(inv_mass, inv_inertia_world, foot_positions_world):
  """B: (13, 3*num_legs)."""
  n = foot_positions_world.shape[0]

  def skew(v):
    return jnp.array([[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]])

  B = jnp.zeros((STATE_DIM, 3 * n))
  for i in range(n):
    B = B.at[6:9, 3 * i: 3 * i + 3].set(
        inv_inertia_world @ skew(foot_positions_world[i]))
    B = B.at[9, 3 * i].set(inv_mass)
    B = B.at[10, 3 * i + 1].set(inv_mass)
    B = B.at[11, 3 * i + 2].set(inv_mass)
  return B


def _rpy_to_rot(rpy):
  """Extrinsic X-Y-Z rotation (ConvertRpyToRot)."""
  cr, sr = jnp.cos(rpy[0]), jnp.sin(rpy[0])
  cp, sp = jnp.cos(rpy[1]), jnp.sin(rpy[1])
  cy, sy = jnp.cos(rpy[2]), jnp.sin(rpy[2])
  Rx = jnp.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
  Ry = jnp.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
  Rz = jnp.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
  return Rz @ Ry @ Rx


def _friction_cone_rows(mu):
  """(5, 3) friction pyramid block (UpdateConstraintsMatrix :453-463)."""
  return jnp.array([
      [-1.0, 0.0, mu],
      [1.0, 0.0, mu],
      [0.0, -1.0, mu],
      [0.0, 1.0, mu],
      [0.0, 0.0, 1.0],
  ])


def _ruiz_equilibrate(P, q, A, lb, ub, iters: int = 10):
  """Modified Ruiz equilibration of the QP data (OSQP sec. 5.1).

  Iteratively scales variables by D and constraints by E so every
  row/column of the stacked [[P, A^T], [A, 0]] matrix has unit inf-norm.
  Without this, SRB inertias like a1_sim.py's (0.017,0.057,0.064)*0.1
  give the condensed P a ~1e7+ dynamic range (B entries carry 1/I), which
  is beyond what an f32 Cholesky can factor usefully — the reference gets
  away with it because OSQP both equilibrates AND runs f64.  Returns the
  scaled problem plus D so the solution can be unscaled (x = D x_bar)."""
  n, m = P.shape[0], A.shape[0]
  D = jnp.ones(n)
  E = jnp.ones(m)
  for _ in range(iters):   # static unroll: tiny (n+m) work per pass
    Ps = D[:, None] * P * D[None, :]
    As = E[:, None] * A * D[None, :]
    col = jnp.maximum(jnp.max(jnp.abs(Ps), axis=0),
                      jnp.max(jnp.abs(As), axis=0))
    row = jnp.max(jnp.abs(As), axis=1)
    D = D / jnp.sqrt(jnp.maximum(col, 1e-12))
    E = E / jnp.sqrt(jnp.maximum(row, 1e-12))
  # cost normalization (OSQP's c): bring the scaled objective to O(1)
  Ps = D[:, None] * P * D[None, :]
  c = 1.0 / jnp.maximum(
      jnp.maximum(jnp.mean(jnp.max(jnp.abs(Ps), axis=0)),
                  jnp.max(jnp.abs(D * q))), 1e-12)
  return (c * Ps, c * D * q, E[:, None] * A * D[None, :],
          E * lb, E * ub, D)


def _admm_box_qp(P, q, A, lb, ub, iters: int, rho: float, sigma: float,
                 adapt_every: int = 25):
  """OSQP-style ADMM for min 1/2 x^T P x + q^T x, s.t. lb <= A x <= ub.

  The data is Ruiz-equilibrated first (see _ruiz_equilibrate); rho starts
  scaled to the problem magnitude and is re-balanced every `adapt_every`
  iterations by the primal/dual residual ratio (OSQP's adaptive-rho
  rule), with a fresh factorization.  TPU note: the KKT system is solved
  by forming K^-1 ONCE per rho setting (a single multi-RHS Cholesky
  solve) so the iteration body is pure matmuls — sequential per-iteration
  triangular solves are the slowest possible primitive on the MXU,
  whereas an n x n matmul per iteration rides it at full tilt.  K is SPD
  and Ruiz-equilibrated, so the explicit inverse is numerically safe at
  these sizes (<= ~120x120, f32)."""
  P, q, A, lb, ub, D = _ruiz_equilibrate(P, q, A, lb, ub)
  n = P.shape[0]
  m = A.shape[0]
  scale = jnp.maximum(jnp.trace(P) / n, 1e-9)
  rho0 = rho * scale
  # f32 conditioning floor: ADMM's fixed point is sigma-independent (a
  # proximal term), but the KKT solves' accuracy is not — when rho is
  # driven small (inactive constraints), cond(K) ~ lam_max(P)/sigma.
  # Floor sigma at 1e-6x a Gershgorin bound on lam_max: large enough to
  # keep K invertible in f32 for near-singular condensed P (zero QP
  # weights + tiny alpha give cond(P) ~ 1e8 on small-inertia robots),
  # small enough not to slow convergence measurably.
  lam_max = jnp.max(jnp.sum(jnp.abs(P), axis=1))
  sigma = jnp.maximum(sigma * scale, 1e-6 * lam_max)
  n_outer = max(iters // adapt_every, 1)

  def factor(rho_v):
    K = P + sigma * jnp.eye(n) + rho_v * (A.T @ A)
    # LU, not Cholesky: at cond(K) near 1/eps_f32 the f32 Cholesky can
    # break down silently (loss of positive-definiteness to roundoff);
    # partially-pivoted LU stays backward-stable there.
    return K, jnp.linalg.inv(K)

  def inner(K, Kinv, rho_v, x, z, y):
    def body(carry, _):
      x, z, y = carry
      rhs = sigma * x - q + A.T @ (rho_v * z - y)
      x_new = Kinv @ rhs
      # one iterative-refinement step: the explicit inverse alone leaves
      # a cond(K)*eps solve residual that biases the f32 ADMM fixed
      # point on ill-conditioned problems (tiny SRB inertias); the
      # refinement squares that error away for two more matmuls.
      x_new = x_new + Kinv @ (rhs - K @ x_new)
      Ax = A @ x_new
      z_new = jnp.clip(Ax + y / rho_v, lb, ub)
      y_new = y + rho_v * (Ax - z_new)
      return (x_new, z_new, y_new), None

    return jax.lax.scan(body, (x, z, y), None, length=adapt_every)[0]

  def outer(carry, _):
    x, z, y, rho_v = carry
    K, Kinv = factor(rho_v)
    x, z, y = inner(K, Kinv, rho_v, x, z, y)
    # residual balancing (OSQP sec. 5.2)
    Ax = A @ x
    r_prim = jnp.linalg.norm(Ax - z) / jnp.maximum(
        jnp.maximum(jnp.linalg.norm(Ax), jnp.linalg.norm(z)), 1e-6)
    r_dual = jnp.linalg.norm(P @ x + q + A.T @ y) / jnp.maximum(
        jnp.linalg.norm(q), 1e-6)
    ratio = jnp.sqrt(r_prim / jnp.maximum(r_dual, 1e-12))
    rho_sug = jnp.clip(rho_v * jnp.clip(ratio, 0.1, 10.0),
                       1e-6 * scale, 1e6 * scale)
    # OSQP sec. 5.2 adapts rho only when the suggested change exceeds 5x
    # — without the threshold, f32 residual noise near convergence makes
    # rho random-walk and the iterates scatter on ill-conditioned QPs
    big_change = jnp.maximum(rho_sug / rho_v, rho_v / rho_sug) > 5.0
    rho_new = jnp.where(big_change, rho_sug, rho_v)
    return (x, z, y, rho_new), None

  x0 = jnp.zeros(n)
  z0 = jnp.clip(jnp.zeros(m), lb, ub)
  y0 = jnp.zeros(m)
  (x, z, y, _), _ = jax.lax.scan(outer, (x0, z0, y0, rho0), None,
                                 length=n_outer)
  return D * x


def _ruiz_equilibrate_blockdiag(P, q, blocks, lb, ub, iters: int = 10):
  """_ruiz_equilibrate for a block-diagonal constraint matrix.

  `blocks` is (M, r, c): constraint row-block i touches only variable
  columns [c*i, c*(i+1)).  Row/column inf-norms of A therefore decompose
  per block, so the whole equilibration runs on (M, r, c) tensors and the
  dense (M*r, M*c) constraint matrix is never materialized.  Same math as
  the dense version (same pass count, same clamps), same return contract
  — except A comes back in block form."""
  M, r, c = blocks.shape
  n = P.shape[0]
  assert n == M * c, (n, M, c)
  D = jnp.ones(n)
  E = jnp.ones(M * r)
  for _ in range(iters):
    Db = D.reshape(M, c)
    Eb = E.reshape(M, r)
    Ps = D[:, None] * P * D[None, :]
    As = Eb[:, :, None] * blocks * Db[:, None, :]
    col_a = jnp.max(jnp.abs(As), axis=1).reshape(-1)      # per-column |A|
    col = jnp.maximum(jnp.max(jnp.abs(Ps), axis=0), col_a)
    row = jnp.max(jnp.abs(As), axis=2).reshape(-1)        # per-row |A|
    D = D / jnp.sqrt(jnp.maximum(col, 1e-12))
    E = E / jnp.sqrt(jnp.maximum(row, 1e-12))
  Ps = D[:, None] * P * D[None, :]
  c_norm = 1.0 / jnp.maximum(
      jnp.maximum(jnp.mean(jnp.max(jnp.abs(Ps), axis=0)),
                  jnp.max(jnp.abs(D * q))), 1e-12)
  As = E.reshape(M, r)[:, :, None] * blocks * D.reshape(M, c)[:, None, :]
  return c_norm * Ps, c_norm * D * q, As, E * lb, E * ub, D


def _admm_box_qp_blockdiag(P, q, blocks, lb, ub, iters: int, rho: float,
                           sigma: float, adapt_every: int = 25):
  """_admm_box_qp specialized to a block-diagonal constraint matrix.

  The MPC's friction-pyramid constraints couple each horizon-step leg's
  3 force components to its own 5 pyramid rows and nothing else
  (mpc_osqp.cc UpdateConstraintsMatrix :453-463), i.e. A is
  block-diagonal with (5, 3) blocks.  Exploiting that here:
    * A x / A^T y are (M, r, c) einsums instead of (M*r, M*c) dense
      matmuls — 40x less FLOPs and HBM traffic per ADMM iteration;
    * A^T A is M small (c, c) blocks added to K's diagonal;
    * the dense constraint matrix never exists at all (the old
      jax.scipy block_diag build traced M Python-loop updates).
  Iteration math is identical to _admm_box_qp (Ruiz, adaptive rho,
  explicit K^-1 so the inner loop is matmuls on the MXU)."""
  P, q, As, lb, ub, D = _ruiz_equilibrate_blockdiag(P, q, blocks, lb, ub)
  M, r, c = As.shape
  n = P.shape[0]
  scale = jnp.maximum(jnp.trace(P) / n, 1e-9)
  rho0 = rho * scale
  # f32 conditioning floor: ADMM's fixed point is sigma-independent (a
  # proximal term), but the KKT solves' accuracy is not — when rho is
  # driven small (inactive constraints), cond(K) ~ lam_max(P)/sigma.
  # Floor sigma at 1e-6x a Gershgorin bound on lam_max: large enough to
  # keep K invertible in f32 for near-singular condensed P (zero QP
  # weights + tiny alpha give cond(P) ~ 1e8 on small-inertia robots),
  # small enough not to slow convergence measurably.
  lam_max = jnp.max(jnp.sum(jnp.abs(P), axis=1))
  sigma = jnp.maximum(sigma * scale, 1e-6 * lam_max)
  n_outer = max(iters // adapt_every, 1)
  AtA = jnp.einsum("mij,mik->mjk", As, As)                # (M, c, c)
  bidx = jnp.arange(M)

  def a_mv(x):
    return jnp.einsum("mij,mj->mi", As, x.reshape(M, c)).reshape(-1)

  def at_mv(w):
    return jnp.einsum("mij,mi->mj", As, w.reshape(M, r)).reshape(-1)

  def factor(rho_v):
    K = (P + sigma * jnp.eye(n)).reshape(M, c, M, c)
    K = K.at[bidx, :, bidx, :].add(rho_v * AtA).reshape(n, n)
    # LU, not Cholesky — see _admm_box_qp.factor
    return K, jnp.linalg.inv(K)

  def inner(K, Kinv, rho_v, x, z, y):
    def body(carry, _):
      x, z, y = carry
      rhs = sigma * x - q + at_mv(rho_v * z - y)
      x_new = Kinv @ rhs
      # iterative refinement — see _admm_box_qp.inner
      x_new = x_new + Kinv @ (rhs - K @ x_new)
      Ax = a_mv(x_new)
      z_new = jnp.clip(Ax + y / rho_v, lb, ub)
      y_new = y + rho_v * (Ax - z_new)
      return (x_new, z_new, y_new), None

    return jax.lax.scan(body, (x, z, y), None, length=adapt_every)[0]

  def outer(carry, _):
    x, z, y, rho_v = carry
    K, Kinv = factor(rho_v)
    x, z, y = inner(K, Kinv, rho_v, x, z, y)
    Ax = a_mv(x)
    r_prim = jnp.linalg.norm(Ax - z) / jnp.maximum(
        jnp.maximum(jnp.linalg.norm(Ax), jnp.linalg.norm(z)), 1e-6)
    r_dual = jnp.linalg.norm(P @ x + q + at_mv(y)) / jnp.maximum(
        jnp.linalg.norm(q), 1e-6)
    ratio = jnp.sqrt(r_prim / jnp.maximum(r_dual, 1e-12))
    rho_sug = jnp.clip(rho_v * jnp.clip(ratio, 0.1, 10.0),
                       1e-6 * scale, 1e6 * scale)
    # OSQP sec. 5.2 adapts rho only when the suggested change exceeds 5x
    # — without the threshold, f32 residual noise near convergence makes
    # rho random-walk and the iterates scatter on ill-conditioned QPs
    big_change = jnp.maximum(rho_sug / rho_v, rho_v / rho_sug) > 5.0
    rho_new = jnp.where(big_change, rho_sug, rho_v)
    return (x, z, y, rho_new), None

  x0 = jnp.zeros(n)
  z0 = jnp.clip(jnp.zeros(M * r), lb, ub)
  y0 = jnp.zeros(M * r)
  (x, z, y, _), _ = jax.lax.scan(outer, (x0, z0, y0, rho0), None,
                                 length=n_outer)
  return D * x


def _build_qp(
    cfg: MpcConfig,
    com_position,            # (3,) or z-only usage: pass full, z used
    com_velocity,            # (3,) world
    com_roll_pitch_yaw,      # (3,)
    com_angular_velocity,    # (3,) world
    foot_contact_states,     # (num_legs,) 0/1
    foot_positions_body,     # (num_legs, 3) base frame
    foot_friction_coeffs,    # (num_legs,)
    desired_com_position,    # (3,)
    desired_com_velocity,    # (3,)
    desired_com_rpy,         # (3,)
    desired_com_ang_vel,     # (3,)
):
  """Condensed-QP data (P, q, cone blocks, lb, ub) for one MPC problem —
  shared by the cold solve (compute_contact_forces) and the warm-started
  per-tick path (compute_contact_forces_warm)."""
  n = cfg.num_legs
  H = cfg.horizon
  dt = cfg.timestep
  inertia = jnp.asarray(cfg.inertia).reshape(3, 3)
  inv_inertia = jnp.linalg.inv(inertia)
  qp_w = jnp.asarray(cfg.qp_weights)

  rot = _rpy_to_rot(com_roll_pitch_yaw)
  foot_world = (rot @ foot_positions_body.T).T              # (n, 3)

  # body height from contacts when absolute z unknown (:646-651); the
  # shape is static, so the branch is resolved at trace time
  contacts = foot_contact_states.astype(jnp.float32)
  if com_position.shape[0] == 3:
    com_z = com_position[2]
  else:
    com_z = jnp.abs(jnp.sum(foot_world[:, 2] * contacts)
                    / jnp.maximum(jnp.sum(contacts), 1.0))

  x0 = jnp.concatenate([
      com_roll_pitch_yaw,
      jnp.array([0.0, 0.0, com_z]),
      com_angular_velocity,
      com_velocity,
      jnp.array([-GRAVITY]),
  ])

  steps = jnp.arange(1, H + 1, dtype=jnp.float32)[:, None]
  x_ref = jnp.zeros((H, STATE_DIM))
  x_ref = x_ref.at[:, 0].set(desired_com_rpy[0])
  x_ref = x_ref.at[:, 1].set(desired_com_rpy[1])
  x_ref = x_ref.at[:, 2].set(
      com_roll_pitch_yaw[2] + dt * steps[:, 0] * desired_com_ang_vel[2])
  x_ref = x_ref.at[:, 3].set(dt * steps[:, 0] * desired_com_velocity[0])
  x_ref = x_ref.at[:, 4].set(dt * steps[:, 0] * desired_com_velocity[1])
  x_ref = x_ref.at[:, 5].set(desired_com_position[2])
  x_ref = x_ref.at[:, 6:9].set(desired_com_ang_vel)
  x_ref = x_ref.at[:, 9].set(desired_com_velocity[0])
  x_ref = x_ref.at[:, 10].set(desired_com_velocity[1])
  # vz reference = 0 ("prefer to stabilize body height"), x[12] = -g
  x_ref = x_ref.at[:, 12].set(-GRAVITY)
  x_ref = x_ref.reshape(-1)

  A = _a_matrix(com_roll_pitch_yaw)
  inv_inertia_world = rot @ inv_inertia @ rot.T
  B = _b_matrix(1.0 / cfg.mass, inv_inertia_world, foot_world)

  # ZOH discretization.  The reference computes expm([[A, B], [0, 0]] dt)
  # numerically (CalculateExponentials :339-352, Pade-6).  But A is
  # nilpotent of index 3 — it is pure integrator chains (rpy <- omega,
  # pos <- vel, and A^2's single entry [5, 12] is the z <- gravity
  # quadratic drift; A^3 = 0) — so the exponential has an EXACT closed
  # form, a quadratic polynomial in A.  This removes a batched 133x133
  # LU solve, the Pade branch chain (all branches execute under vmap),
  # and the squaring scan from every controller tick.
  adim = 3 * n
  A2 = A @ A
  A_exp = jnp.eye(STATE_DIM) + dt * A + (dt * dt / 2.0) * A2
  B_exp = (dt * jnp.eye(STATE_DIM) + (dt * dt / 2.0) * A
           + (dt ** 3 / 6.0) * A2) @ B

  # condensed prediction matrices
  def a_power_scan(Ak, _):
    Ak1 = A_exp @ Ak
    return Ak1, Ak1

  _, a_powers = jax.lax.scan(a_power_scan, jnp.eye(STATE_DIM), None,
                             length=H)      # A^1..A^H, (H, 13, 13)
  A_qp = a_powers.reshape(H * STATE_DIM, STATE_DIM)

  # anb_aux[i] = A^i B  (i = 0..H-1)
  anb = jnp.concatenate(
      [B_exp[None], jnp.einsum("hij,jk->hik", a_powers[:-1], B_exp)], axis=0)

  # B_qp[i, j] = A^(i-j) B for j <= i
  ii = jnp.arange(H)[:, None]
  jj = jnp.arange(H)[None, :]
  idx = jnp.clip(ii - jj, 0, H - 1)
  blocks = anb[idx] * (jj <= ii)[..., None, None]   # (H, H, 13, adim)
  B_qp = blocks.transpose(0, 2, 1, 3).reshape(H * STATE_DIM, H * adim)

  L_diag = jnp.tile(qp_w, H)                        # (H*13,)
  P = 2.0 * (B_qp.T * L_diag[None, :]) @ B_qp
  P = P + cfg.alpha * jnp.eye(H * adim)
  state_diff = A_qp @ x0 - x_ref
  q = 2.0 * B_qp.T @ (L_diag * state_diff)

  # constraints: block-diag friction pyramids (H*n blocks of (5, 3)),
  # kept in block form — see _admm_box_qp_blockdiag
  cone = jax.vmap(_friction_cone_rows)(
      jnp.tile(foot_friction_coeffs, H))            # (H*n, 5, 3)
  fz_max = cfg.mass * GRAVITY * KMAX_SCALE
  fz_min = 0.0
  cs = jnp.tile(contacts, H)                        # (H*n,)
  mu0 = foot_friction_coeffs[0]
  ub_blk = jnp.stack([(mu0 + 1) * fz_max * cs] * 4 + [fz_max * cs], axis=-1)
  lb_blk = jnp.concatenate(
      [jnp.zeros((H * n, 4)), (fz_min * cs)[:, None]], axis=-1)
  lb = lb_blk.reshape(-1)
  ub = ub_blk.reshape(-1)
  return P, q, cone, lb, ub


@functools.partial(jax.jit, static_argnums=0)
def compute_contact_forces(cfg: MpcConfig, *state_args):
  """Returns contact forces (num_legs, 3), world frame (sign: force the
  robot applies on the ground is -f; this returns the ground reaction
  forces like the reference, consumed negated by the stance controller).

  Cold solve: full Ruiz equilibration + adaptive-rho ADMM + fresh KKT
  factorization per call.  The training env uses the warm-started path
  (compute_contact_forces_warm) instead, which this function remains the
  accuracy reference for.

  Matmul precision is pinned to HIGHEST throughout the solver: the TPU's
  default bf16 matmul passes are fatal on these QPs — cond(K) ~ 1e6
  after the sigma floor, so 8-bit-mantissa products in the KKT solves /
  refinement steps turn the iteration into noise (measured round 5: the
  warm path NaN'd at the first gait switch on the chip while bit-stable
  on CPU)."""
  with jax.default_matmul_precision("highest"):
    P, q, cone, lb, ub = _build_qp(cfg, *state_args)
    u = _admm_box_qp_blockdiag(P, q, cone, lb, ub, cfg.admm_iters,
                               cfg.rho, cfg.sigma)
  # first-step forces; reference returns -qp_solution (ground reaction
  # convention flip happens at the caller, torque_stance_leg_controller)
  return -u[: 3 * cfg.num_legs].reshape(cfg.num_legs, 3)


# ---------------------------------------------------------------------------
# Warm-started per-tick path.
#
# Profiling (round 5, 128 envs on the v5e chip): one cold solve costs
# 10.4 ms, of which 8.5 ms is the batched 120x120 `jnp.linalg.inv` (LU
# pivoting is the worst primitive on the TPU), and the MPC env pays it
# policy_freq=20 times per env step — 89% of the whole step.  The warm
# path removes it using two structural facts:
#   * The ill-conditioning Ruiz equilibration fixes is STRUCTURAL (B
#     carries 1/inertia ~ 1e2-1e3 entries), not state-dependent — so the
#     scaling D, E, c and the sigma/rho floors can be frozen per MpcConfig
#     from a canonical standing problem (canonical_constants).
#   * With the scaled space fixed, K = P_s + sigma I + rho A^T A drifts
#     only through P_s (feet/rpy; A is constant, contact switches touch
#     only the BOUNDS) — and K does not depend on the desired command or
#     contact states at all, so ONE exact inverse per ENV STEP
#     (kkt_inverse, from the step-start pose) serves all policy_freq
#     ticks: per-tick Newton-Schulz (X <- X(2I - KX), pure matmuls on the
#     MXU) then only has to track the tiny intra-step drift from an exact
#     starting point.  (Carrying X across whole episodes does NOT work:
#     cond(K) ~ 1e6 after the sigma floor, so O(1e-4) relative drift
#     already gives ||I - K X|| > 1 and NS diverges — measured round 5.)
#     The ADMM x/z/y iterates DO carry across ticks (same scaled basis),
#     cutting warm iterations to cfg-controlled warm_iters.
# The reference warm-starts the same way: OSQP's workspace reuse
# (mpc_osqp.cc:705-810 UpdateMats vs Setup) keeps its factorization and
# iterates across controller ticks.
# ---------------------------------------------------------------------------
class CanonicalScaling(NamedTuple):
  D: jnp.ndarray        # (n,) variable scaling
  E: jnp.ndarray        # (m,) constraint scaling
  c: jnp.ndarray        # () cost scaling
  sigma: jnp.ndarray    # () proximal weight (scaled space)
  rho: jnp.ndarray      # () ADMM penalty (scaled space)
  kinv0: jnp.ndarray    # (n, n) exact K^-1 of the canonical problem


class WarmState(NamedTuple):
  x: jnp.ndarray        # (n,) scaled primal iterate
  z: jnp.ndarray        # (m,) scaled slack iterate
  y: jnp.ndarray        # (m,) scaled dual iterate
  kinv: jnp.ndarray     # (n, n) tracked K^-1 (scaled space)


def _canonical_qp(cfg: MpcConfig):
  """A canonical standing problem: nominal pose, all legs in stance."""
  # nominal A1-class foot positions (base frame); exact values are
  # uncritical — they only seed the scaling, which is structural
  feet = jnp.array([[0.17, -0.13, -0.25], [0.17, 0.13, -0.25],
                    [-0.17, -0.13, -0.25], [-0.17, 0.13, -0.25]],
                   jnp.float32)[: cfg.num_legs]
  z = jnp.array([0.0, 0.0, 0.25])
  return _build_qp(
      cfg, z, jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
      jnp.ones(cfg.num_legs), feet, jnp.full(cfg.num_legs, 0.45),
      jnp.array([0.0, 0.0, 0.25]), jnp.zeros(3), jnp.zeros(3),
      jnp.zeros(3))


def canonical_constants(cfg: MpcConfig) -> CanonicalScaling:
  """Frozen scaling + penalty constants + canonical K^-1 for the warm
  path.  Computed once per MpcConfig on the host CPU backend (cheap, and
  avoids a remote compile when the default backend is a TPU tunnel)."""
  cpu = jax.local_devices(backend="cpu")[0]
  with jax.default_device(cpu):
    P, q, cone, lb, ub = _canonical_qp(cfg)
    M, r, c_blk = cone.shape
    n = P.shape[0]
    # the same modified-Ruiz recursion as _ruiz_equilibrate_blockdiag,
    # run here because we need E (that helper returns only D)
    E = jnp.ones(M * r)
    Dv = jnp.ones(n)
    for _ in range(10):
      Db = Dv.reshape(M, c_blk)
      Eb = E.reshape(M, r)
      Ps_i = Dv[:, None] * P * Dv[None, :]
      As_i = Eb[:, :, None] * cone * Db[:, None, :]
      col_a = jnp.max(jnp.abs(As_i), axis=1).reshape(-1)
      col = jnp.maximum(jnp.max(jnp.abs(Ps_i), axis=0), col_a)
      row = jnp.max(jnp.abs(As_i), axis=2).reshape(-1)
      Dv = Dv / jnp.sqrt(jnp.maximum(col, 1e-12))
      E = E / jnp.sqrt(jnp.maximum(row, 1e-12))
    Ps_f = Dv[:, None] * P * Dv[None, :]
    c = 1.0 / jnp.maximum(
        jnp.maximum(jnp.mean(jnp.max(jnp.abs(Ps_f), axis=0)),
                    jnp.max(jnp.abs(Dv * q))), 1e-12)
    scale = jnp.maximum(jnp.trace(c * Ps_f) / n, 1e-9)
    rho = cfg.rho * scale
    lam_max = jnp.max(jnp.sum(jnp.abs(c * Ps_f), axis=1))
    sigma = jnp.maximum(cfg.sigma * scale, 1e-6 * lam_max)
    As_f = (E.reshape(M, r)[:, :, None] * cone
            * Dv.reshape(M, c_blk)[:, None, :])
    AtA = jnp.einsum("mij,mik->mjk", As_f, As_f)
    bidx = jnp.arange(M)
    K = (c * Ps_f + sigma * jnp.eye(n)).reshape(M, c_blk, M, c_blk)
    K = K.at[bidx, :, bidx, :].add(rho * AtA).reshape(n, n)
    kinv0 = jnp.linalg.inv(K)
    out = CanonicalScaling(D=Dv, E=E, c=c, sigma=sigma, rho=rho,
                           kinv0=kinv0)
  return jax.tree.map(lambda a: np.asarray(jax.device_get(a)), out)


def init_warm_state(canon: CanonicalScaling) -> WarmState:
  n = canon.D.shape[0]
  m = canon.E.shape[0]
  return WarmState(x=jnp.zeros(n), z=jnp.zeros(m), y=jnp.zeros(m),
                   kinv=jnp.asarray(canon.kinv0))


def _scaled_kkt(canon: CanonicalScaling, P, blocks):
  """K = P_s + sigma I + rho A^T A in the frozen canonical scaled space."""
  D, c = jnp.asarray(canon.D), jnp.asarray(canon.c)
  M, r, cb = blocks.shape
  n = P.shape[0]
  Ps = c * (D[:, None] * P * D[None, :])
  As = (jnp.asarray(canon.E).reshape(M, r)[:, :, None] * blocks
        * D.reshape(M, cb)[:, None, :])
  AtA = jnp.einsum("mij,mik->mjk", As, As)
  bidx = jnp.arange(M)
  K = (Ps + jnp.asarray(canon.sigma) * jnp.eye(n)).reshape(M, cb, M, cb)
  K = K.at[bidx, :, bidx, :].add(jnp.asarray(canon.rho) * AtA)
  return K.reshape(n, n), As


def kkt_inverse(cfg: MpcConfig, canon: CanonicalScaling, rpy_yawless,
                foot_positions_body, friction: float = 0.45):
  """Exact scaled-space KKT inverse for the CURRENT pose.

  K depends only on feet/rpy (through B_qp -> P) — not on contact states,
  bounds, or the desired command — so the env computes this ONCE per env
  step and every per-tick warm solve tracks the small intra-step drift
  with Newton-Schulz from this exact start."""
  n = cfg.num_legs
  with jax.default_matmul_precision("highest"):
    P, _, cone, _, _ = _build_qp(
        cfg, jnp.array([0.0, 0.0, 0.25]), jnp.zeros(3), rpy_yawless,
        jnp.zeros(3), jnp.ones(n), foot_positions_body,
        jnp.full(n, friction), jnp.array([0.0, 0.0, 0.25]), jnp.zeros(3),
        jnp.zeros(3), jnp.zeros(3))
    K, _ = _scaled_kkt(canon, P, cone)
    X = jnp.linalg.inv(K)
    # a degenerate pose (fallen robot) can make K singular in f32 — fall
    # back to the canonical inverse rather than propagating NaN into the
    # whole tick scan
    ok = jnp.all(jnp.isfinite(X))
    return jnp.where(ok, X, jnp.asarray(canon.kinv0))


def _solve_warm(canon: CanonicalScaling, P, q, blocks, lb, ub,
                warm: WarmState, iters: int, ns_iters: int):
  """Fixed-scaling ADMM with a Newton-Schulz-tracked KKT inverse.

  Same splitting as _admm_box_qp_blockdiag, but: scaling/penalties frozen
  (canon), no per-call Ruiz, no factorization — warm.kinv is refined by
  `ns_iters` Newton-Schulz steps (quadratic convergence; per-tick K drift
  is tiny) and the x-update keeps the one iterative-refinement step, so a
  slightly stale inverse costs accuracy O(||I-KX||^2) only."""
  D, E, c = (jnp.asarray(canon.D), jnp.asarray(canon.E),
             jnp.asarray(canon.c))
  sigma, rho = jnp.asarray(canon.sigma), jnp.asarray(canon.rho)
  M, r, cb = blocks.shape
  n = P.shape[0]
  qs = c * (D * q)
  lbs, ubs = E * lb, E * ub
  K, As = _scaled_kkt(canon, P, blocks)

  X = warm.kinv
  for _ in range(ns_iters):          # X <- X + X(I - KX): pure matmuls
    X = X + X @ (jnp.eye(n) - K @ X)

  def a_mv(x):
    return jnp.einsum("mij,mj->mi", As, x.reshape(M, cb)).reshape(-1)

  def at_mv(w):
    return jnp.einsum("mij,mi->mj", As, w.reshape(M, r)).reshape(-1)

  def body(carry, _):
    x, z, y = carry
    rhs = sigma * x - qs + at_mv(rho * z - y)
    x_new = X @ rhs
    x_new = x_new + X @ (rhs - K @ x_new)   # iterative refinement
    Ax = a_mv(x_new)
    z_new = jnp.clip(Ax + y / rho, lbs, ubs)
    y_new = y + rho * (Ax - z_new)
    return (x_new, z_new, y_new), None

  z0 = jnp.clip(warm.z, lbs, ubs)          # bounds may have switched
  (x, z, y), _ = jax.lax.scan(body, (warm.x, z0, warm.y), None,
                              length=iters)
  # self-heal on divergence (extreme pose, singular K): zero forces for
  # this tick, reset the carried iterates and inverse — the next env
  # step recomputes an exact K^-1 and the episode is terminating anyway
  ok = (jnp.all(jnp.isfinite(x)) & jnp.all(jnp.isfinite(z))
        & jnp.all(jnp.isfinite(y)) & jnp.all(jnp.isfinite(X)))
  x = jnp.where(ok, x, 0.0)
  z = jnp.where(ok, z, 0.0)
  y = jnp.where(ok, y, 0.0)
  X = jnp.where(ok, X, jnp.asarray(canon.kinv0))
  return D * x, WarmState(x=x, z=z, y=y, kinv=X)


def compute_contact_forces_warm(cfg: MpcConfig, canon: CanonicalScaling,
                                warm: WarmState, *state_args,
                                warm_iters: int = 15, ns_iters: int = 2):
  """Warm-started compute_contact_forces: same QP, frozen canonical
  scaling, carried iterates + tracked K^-1.  Returns (forces, warm').
  HIGHEST matmul precision for the same reason as the cold solve."""
  with jax.default_matmul_precision("highest"):
    P, q, cone, lb, ub = _build_qp(cfg, *state_args)
    u, warm = _solve_warm(canon, P, q, cone, lb, ub, warm, warm_iters,
                          ns_iters)
  # belt-and-braces: the true solution always lies in the friction box,
  # so clamping never harms a correct solve but bounds a transiently
  # diverging one before it reaches the physics
  fmax = cfg.mass * GRAVITY * KMAX_SCALE * 2.0
  u = jnp.clip(u, -fmax, fmax)
  return -u[: 3 * cfg.num_legs].reshape(cfg.num_legs, 3), warm
