"""Correctness tests for the JAX rigid-body engine.

The reference has no physics tests (PyBullet is trusted); since we replace
the physics engine entirely, these are the foundation of the rebuild:
  * mass matrix vs. independently-computed kinetic energy,
  * momentum & energy conservation in free space (validates Coriolis bias),
  * free-fall acceleration (validates gravity handling),
  * quaternion math round-trips.

All numerical work is jitted: on this host per-op XLA compiles dominate, so
eager execution of the unrolled kinematics is pathologically slow.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision4leg_tpu.physics import engine, maths
from vision4leg_tpu.robots import a1_model

MODEL = a1_model.build(dt=0.001)


def random_state(model, key, vel_scale=1.0):
  k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
  quat = jax.random.normal(k1, (4,))
  quat = quat / jnp.linalg.norm(quat)
  lo, hi = model.joint_lower, model.joint_upper
  q = lo + (hi - lo) * jax.random.uniform(k2, (12,))
  return engine.PhysState(
      pos=jax.random.normal(k3, (3,)),
      quat=quat,
      joint_q=q,
      ang=vel_scale * jax.random.normal(k4, (3,)),
      lin=vel_scale * jax.random.normal(k5, (3,)),
      joint_qd=vel_scale * jax.random.normal(k6, (12,)),
  )


def test_quat_roundtrip():
  key = jax.random.PRNGKey(0)
  q = jax.random.normal(key, (32, 4))
  q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)

  @jax.jit
  def f(q):
    q2 = maths.rpy_to_quat(maths.quat_to_rpy(q))
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))  # q and -q: same rotation
    v = jnp.tile(jnp.array([0.3, -0.5, 0.8]), (q.shape[0], 1))
    r1 = maths.quat_rotate(q, v)
    r2 = jnp.einsum("bij,bj->bi", maths.quat_to_mat(q), v)
    return dot, r1, r2

  dot, r1, r2 = f(q)
  np.testing.assert_allclose(dot, 1.0, atol=1e-5)
  np.testing.assert_allclose(r1, r2, atol=1e-5)


def test_total_mass():
  # trunk 4.713 + 4*(0.696 + 1.013 + 0.166 + 0.06) = 12.453 kg
  np.testing.assert_allclose(float(jnp.sum(MODEL.mass)), 12.453, rtol=1e-6)


@functools.partial(jax.jit, static_argnums=())
def _ke_pair(model, s):
  kin = engine.fwd_kinematics(model, s)
  M = engine.mass_matrix(model, kin)
  v = engine.gen_velocity(s)
  return 0.5 * v @ M @ v, engine.kinetic_energy(model, s), M


def test_mass_matrix_matches_kinetic_energy():
  """1/2 v^T M v must equal the sum of per-body kinetic energies.

  M comes from Jacobians; body KE comes from the Newton-Euler velocity
  recursion — two independent code paths.
  """
  keys = jax.random.split(jax.random.PRNGKey(0), 8)
  states = jax.vmap(lambda k: random_state(MODEL, k))(keys)
  ke_quad, ke_direct, M = jax.vmap(lambda s: _ke_pair(MODEL, s))(states)
  # in f64 the two paths agree to 1e-15 (verified); f32 tolerance accounts
  # for cancellation in the quadratic form
  np.testing.assert_allclose(np.array(ke_quad), np.array(ke_direct),
                             rtol=5e-3)
  np.testing.assert_allclose(np.array(M), np.array(M).swapaxes(-1, -2),
                             atol=1e-4)


def test_momentum_and_energy_conservation_free_space():
  """No gravity, no contact, no torque: momenta and energy are constant.

  This is the strongest single check of the Coriolis/centrifugal bias term:
  any sign/term error breaks conservation immediately.
  """
  model0g = MODEL.replace(gravity=jnp.zeros(3), armature=jnp.zeros(12))
  no_contact = lambda p, v, r: (jnp.zeros_like(p), -jnp.ones(p.shape[0]))

  @jax.jit
  def run(key):
    s = random_state(model0g, key, vel_scale=0.5)

    def momentum(s):
      kin = engine.fwd_kinematics(model0g, s)
      omega, v_com, _, _ = engine.body_velocities(model0g, s, kin)
      lin = jnp.sum(model0g.mass[:, None] * v_com, axis=0)
      Iw = jnp.einsum("bij,bjk,blk->bil", kin.R, model0g.inertia, kin.R)
      ang = jnp.sum(
          jnp.einsum("bij,bj->bi", Iw, omega)
          + model0g.mass[:, None] * jnp.cross(kin.com_w, v_com), axis=0)
      return lin, ang

    def body(s, _):
      s, _, _ = engine.step(model0g, s, jnp.zeros(12), no_contact)
      return s, None

    lin0, ang0 = momentum(s)
    e0 = engine.kinetic_energy(model0g, s)
    s1 = jax.lax.scan(body, s, None, length=200)[0]
    lin1, ang1 = momentum(s1)
    e1 = engine.kinetic_energy(model0g, s1)
    return lin0, ang0, e0, lin1, ang1, e1

  lin0, ang0, e0, lin1, ang1, e1 = run(jax.random.PRNGKey(42))
  np.testing.assert_allclose(np.array(lin1), np.array(lin0), atol=2e-3)
  np.testing.assert_allclose(np.array(ang1), np.array(ang0), atol=5e-3)
  assert abs(float(e1) - float(e0)) < 0.02 * max(float(e0), 1.0)


def test_free_fall():
  """From rest with zero torque and no contact, the COM accelerates at g."""
  no_contact = lambda p, v, r: (jnp.zeros_like(p), -jnp.ones(p.shape[0]))
  init_q = jnp.asarray(np.array([0, 0.9, -1.8] * 4, np.float32))

  @jax.jit
  def run():
    s = engine.zero_state(MODEL)
    s = s.replace(pos=jnp.array([0.0, 0.0, 10.0]), joint_q=init_q)

    def com(s):
      kin = engine.fwd_kinematics(MODEL, s)
      return jnp.sum(MODEL.mass[:, None] * kin.com_w, axis=0) / jnp.sum(
          MODEL.mass)

    def body(s, _):
      s, _, _ = engine.step(MODEL, s, jnp.zeros(12), no_contact)
      return s, None

    c0 = com(s)
    s1 = jax.lax.scan(body, s, None, length=100)[0]
    return c0, com(s1)

  c0, c1 = run()
  n, dt = 100, MODEL.dt
  t = n * dt
  # semi-implicit Euler: z(t) = z0 - g/2 * t(t+dt)
  expected_dz = -0.5 * 10.0 * t * (t + dt)
  assert float(c1[2] - c0[2]) == pytest.approx(expected_dz, rel=1e-2)
  np.testing.assert_allclose(np.array(c1[:2]), np.array(c0[:2]), atol=1e-4)


def test_fk_standing_geometry():
  """At the init pose the four toes are level and just below the ground
  plane contact height."""
  init_q = jnp.asarray(np.array([0, 0.9, -1.8] * 4, np.float32))

  @jax.jit
  def f():
    s = engine.zero_state(MODEL)
    s = s.replace(pos=jnp.array([0.0, 0.0, 0.32]), joint_q=init_q)
    kin = engine.fwd_kinematics(MODEL, s)
    pos, _, _ = engine.contact_points_world(MODEL, s, kin)
    return pos

  pos = f()
  toe_z = np.array(pos[:4, 2])
  np.testing.assert_allclose(toe_z, toe_z[0], atol=1e-5)
  assert 0.0 < float(toe_z[0]) < 0.1


def test_cg_solver_matches_cholesky():
  """The fixed-iteration CG used inside Pallas-capable paths must match
  the Cholesky solve on realistic mass matrices."""
  from vision4leg_tpu.physics.engine import solve_spd_cg

  @jax.jit
  def both(key):
    s = random_state(MODEL, key)
    kin = engine.fwd_kinematics(MODEL, s)
    M = engine.mass_matrix(MODEL, kin)
    Mr = M + jnp.diag(jnp.concatenate([jnp.zeros(6), MODEL.armature]))
    b = jax.random.normal(jax.random.fold_in(key, 1), (18,))
    x_cg = solve_spd_cg(Mr, b)
    x_ch = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Mr), b)
    return x_cg, x_ch, Mr, b

  for seed in range(4):
    x_cg, x_ch, Mr, b = both(jax.random.PRNGKey(seed))
    rel = float(jnp.linalg.norm(x_cg - x_ch) / jnp.linalg.norm(x_ch))
    assert rel < 5e-3, rel


def test_standing_with_cg_solver():
  """Standing stability must hold with the CG dynamics solver."""
  from vision4leg_tpu.physics import contact
  from vision4leg_tpu.envs import terrain as terr
  ts = terr.gen_plane(jax.random.PRNGKey(0))
  h, n = terr.flat_height_fn(ts)
  cfn = contact.make_terrain_contact_fn(h, n, boxes=ts.boxes)
  init_q = jnp.asarray(np.array([0, 0.9, -1.8] * 4, np.float32))

  @jax.jit
  def run():
    s = engine.zero_state(MODEL).replace(
        pos=jnp.array([0.0, 0.0, 0.27]), joint_q=init_q)

    def body(s, _):
      s, _, _ = engine.step(MODEL, s, -80.0 * (s.joint_q - init_q)
                            - 0.4 * s.joint_qd, cfn, solver="cg")
      return s, s.pos[2]

    return jax.lax.scan(body, s, None, length=800)[1]

  zs = np.asarray(run())
  assert np.all(zs[200:] > 0.2) and np.all(zs[200:] < 0.35), (
      zs.min(), zs.max())
