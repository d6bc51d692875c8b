"""MPC stack tests: leg kinematics round trips and cross-checks against the
physics-engine FK, plus convex-MPC standing forces."""
import os
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.mpc import leg_kinematics as lk
from vision4leg_tpu.physics import engine
from vision4leg_tpu.robots import a1_model, a1_params as P


def test_fk_matches_engine():
  """foot_positions_base_frame must equal the engine's toe positions with
  an identity base pose."""
  model = a1_model.build()
  key = jax.random.PRNGKey(0)

  @jax.jit
  def both(q):
    s = engine.zero_state(model).replace(joint_q=q)
    kin = engine.fwd_kinematics(model, s)
    toes, _, _ = engine.contact_points_world(model, s, kin)
    return lk.foot_positions_base_frame(q), toes[:4]

  for seed in range(3):
    lo, hi = np.asarray(P.JOINT_LOWER), np.asarray(P.JOINT_UPPER)
    q = jnp.asarray(lo + (hi - lo) * np.random.RandomState(seed).rand(12),
                    jnp.float32)
    mine, eng = both(q)
    np.testing.assert_allclose(np.array(mine), np.array(eng), atol=1e-5)


def test_ik_roundtrip():
  """IK(FK(q)) == q for random angles inside the joint limits."""
  lo, hi = np.asarray(P.JOINT_LOWER), np.asarray(P.JOINT_UPPER)

  @jax.jit
  def roundtrip(q):
    feet = lk.foot_positions_base_frame(q)
    qs = [lk.foot_ik_base_frame(feet[leg], leg) for leg in range(4)]
    return jnp.concatenate(qs)

  rng = np.random.RandomState(1)
  for _ in range(5):
    # restrict to the locomotion envelope (foot below the hip-roll axis;
    # the IK picks that branch, matching where swing targets live)
    q = lo + (hi - lo) * rng.rand(12)
    q[1::3] = 0.2 + 1.0 * rng.rand(4)       # thigh
    q[2::3] = -2.2 + 1.2 * rng.rand(4)      # knee
    q = jnp.asarray(q, jnp.float32)
    q2 = roundtrip(q)
    np.testing.assert_allclose(np.array(q2), np.array(q), atol=1e-4)


def test_leg_jacobian_matches_fd():
  q = jnp.asarray(np.array([0.1, 0.8, -1.7]), jnp.float32)

  @jax.jit
  def jac(q):
    return lk.leg_jacobian(q, -1.0)

  J = np.array(jac(q))
  eps = 1e-4
  for i in range(3):
    qp = q.at[i].add(eps)
    qm = q.at[i].add(-eps)
    fd = (np.array(lk.foot_position_hip_frame(qp, -1.0))
          - np.array(lk.foot_position_hip_frame(qm, -1.0))) / (2 * eps)
    np.testing.assert_allclose(J[:, i], fd, atol=1e-2)


def test_convex_mpc_standing():
  """All four feet in stance, zero velocity at desired height: the MPC
  should command ground-reaction forces ~ mg/4 each (returned negated)."""
  from vision4leg_tpu.mpc.convex_mpc import MpcConfig, compute_contact_forces
  cfg = MpcConfig(
      mass=float(P.MPC_BODY_MASS),
      inertia=tuple(float(x) for x in P.MPC_BODY_INERTIA),
      qp_weights=(5, 5, 0.2, 0, 0, 10, 0., 0., 1., 1., 1., 0., 0),
      admm_iters=60)
  feet = np.array([[0.17, -0.13, -0.24], [0.17, 0.13, -0.24],
                   [-0.19, -0.13, -0.24], [-0.19, 0.13, -0.24]], np.float32)
  forces = compute_contact_forces(
      cfg,
      jnp.array([0.0, 0.0, 0.24]),
      jnp.zeros(3),
      jnp.zeros(3),
      jnp.zeros(3),
      jnp.ones(4, jnp.int32),
      jnp.asarray(feet),
      jnp.full(4, 0.45),
      jnp.array([0.0, 0.0, 0.24]),
      jnp.zeros(3),
      jnp.zeros(3),
      jnp.zeros(3),
  )
  forces = np.array(forces)
  total_fz = -forces[:, 2].sum()   # returned negated (robot-applied)
  weight = float(P.MPC_BODY_MASS) * 9.8
  assert abs(total_fz - weight) / weight < 0.25, (total_fz, weight)
  # roughly even split
  assert np.all(-forces[:, 2] > 0.1 * weight / 4)


def test_mpc_env_walks_forward():
  """The full MPC pipeline: commanded 0.3 m/s forward on flat ground, the
  robot should stay upright and make forward progress."""
  from vision4leg_tpu.envs.mpc_env import A1MPCGymEnv, MpcEnvConfig
  cfg = MpcEnvConfig(
      motor_control_mode="POSITION", clip_num=(0.3, 0.4),
      time_step_s=0.001, num_action_repeat=5, policy_freq=20,
      terrain_type="plane", target_vel=0.3, check_contact=False,
      settle_steps=300, alive_reward=0.1)
  env = A1MPCGymEnv(cfg)

  @jax.jit
  def run(key):
    state, obs = env.reset(key)

    def body(carry, _):
      state = carry
      act = jnp.array([0.3, 0.0])
      state, obs, rew, done, _ = env.step(state, act)
      return state, (state.robot.phys.pos, done, rew)

    state, (pos, done, rew) = jax.lax.scan(body, state, None, length=20)
    return obs, pos, done, rew

  obs, pos, done, rew = run(jax.random.PRNGKey(0))
  pos, done = np.array(pos), np.array(done)
  assert obs.shape == (6,)
  assert np.all(np.isfinite(pos))
  # 20 policy steps @ 10 Hz = 2 s of walking at 0.3 m/s
  assert not done.any(), f"fell at step {done.argmax()}, z={pos[:, 2]}"
  assert pos[-1, 0] > 0.15, f"no forward progress: {pos[-1]}"
  assert np.all(pos[:, 2] > 0.15), f"body too low: {pos[:, 2].min()}"


def test_native_mpc_matches_jax():
  """The C++ ConvexMpc core and the JAX batched MPC solve the same QP;
  their first-step forces should agree."""
  import sys
  import os.path as osp
  sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                              "vision4leg_tpu/mpc/native"))
  import mpc_osqp
  from vision4leg_tpu.mpc.convex_mpc import MpcConfig, compute_contact_forces

  weights = (5, 5, 0.2, 0, 0, 10, 0., 0., 1., 1., 1., 0., 0)
  native = mpc_osqp.ConvexMpc(float(P.MPC_BODY_MASS),
                              list(P.MPC_BODY_INERTIA), 4, 10, 0.025,
                              list(weights), 1e-5)
  cfg = MpcConfig(mass=float(P.MPC_BODY_MASS),
                  inertia=tuple(float(x) for x in P.MPC_BODY_INERTIA),
                  qp_weights=weights, admm_iters=100)
  feet = np.array([[0.17, -0.13, -0.24], [0.17, 0.13, -0.24],
                   [-0.19, -0.13, -0.24], [-0.19, 0.13, -0.24]])
  vel = np.array([0.1, 0.02, 0.0])
  rpy = np.array([0.02, -0.03, 0.0])
  f_native = np.array(native.compute_contact_forces(
      [0.0, 0.0, 0.24], vel, rpy, np.zeros(3), np.ones(4, np.int32),
      feet.flatten(), np.full(4, 0.45), [0., 0., 0.24],
      np.array([0.3, 0., 0.]), np.zeros(3), np.zeros(3))[:12]).reshape(4, 3)
  f_jax = np.array(compute_contact_forces(
      cfg, jnp.array([0.0, 0.0, 0.24]), jnp.asarray(vel, jnp.float32),
      jnp.asarray(rpy, jnp.float32), jnp.zeros(3), jnp.ones(4, jnp.int32),
      jnp.asarray(feet, jnp.float32), jnp.full(4, 0.45),
      jnp.array([0.0, 0.0, 0.24]), jnp.array([0.3, 0.0, 0.0]),
      jnp.zeros(3), jnp.zeros(3)))
  # both solvers approximate; agree to a few percent of body weight
  np.testing.assert_allclose(f_native, f_jax, atol=3.0)


def test_static_gait_steps_and_stays_up():
  """The static-gait state machine (COM shift + one-foot steps) must keep
  the robot statically stable while completing forward foot steps
  (ref: mpc_controller/static_gait_controller.py + foot_stepper.py)."""
  import numpy as np
  from vision4leg_tpu.envs import terrain as terr
  from vision4leg_tpu.mpc import leg_kinematics as lk
  from vision4leg_tpu.mpc.static_gait import StaticGaitController
  from vision4leg_tpu.physics import contact, engine
  from vision4leg_tpu.robots import a1, a1_model
  from vision4leg_tpu.robots import a1_params as P

  model = a1_model.build(dt=0.002)
  ts = terr.gen_plane(jax.random.PRNGKey(0))
  h, n = terr.flat_height_fn(ts)
  cfn = contact.make_terrain_contact_fn(h, n, boxes=ts.boxes)
  dyn = a1.default_dynamics(model)
  model_d = a1.apply_dynamics(model, dyn)
  init_q = jnp.asarray(np.array(P.INIT_MOTOR_ANGLES, np.float32))

  @jax.jit
  def settle(rs):
    def body(rs, _):
      rs, _ = a1.substep(model_d, rs, init_q, dyn, cfn)
      return rs, None
    return jax.lax.scan(body, rs, None, length=400)[0]

  @jax.jit
  def tick_physics(rs, cmd):
    def body(rs, _):
      rs, _ = a1.substep(model_d, rs, cmd, dyn, cfn)
      return rs, None
    return jax.lax.scan(body, rs, None, length=2)[0]  # 2 x 2ms = 1/250 s

  phys = engine.zero_state(model).replace(
      pos=jnp.array([0.0, 0.0, 0.27]), joint_q=init_q)
  rs = settle(a1.init_robot_state(model, phys))

  toe_ref = np.asarray(lk.foot_positions_base_frame(rs.phys.joint_q))
  ctl = StaticGaitController(toe_ref, step_dist=0.08, dt=1.0 / 250)

  @jax.jit
  def toe_world(rs):
    kin = engine.fwd_kinematics(model, rs.phys)
    pos, _, _ = engine.contact_points_world(model, rs.phys, kin)
    return pos[:4], rs.phys.pos, rs.phys.quat

  zs, steps_started = [], 0
  for t in range(1200):
    toes, base, quat = toe_world(rs)
    was_swinging = ctl.stepper.move_swing_foot
    cmd = ctl.act(np.asarray(base), np.asarray(quat), np.asarray(toes))
    if ctl.stepper.move_swing_foot and not was_swinging:
      steps_started += 1
    rs = tick_physics(rs, jnp.asarray(cmd))
    if t % 50 == 0:
      zs.append(float(rs.phys.pos[2]))

  zs = np.array(zs)
  assert np.all(zs > 0.15) and np.all(zs < 0.40), zs
  assert steps_started >= 1, "no foot step was ever triggered"


def test_convex_mpc_standing_all_robots():
  """The MPC math is robot-agnostic given a RobotMpcParams set
  (mpc_controller/{a1,laikago,spirit40}_sim.py constants): for each robot,
  four-feet stance at its own body height must recover the QP's optimum.

  The expected totals are the x64 ADMM fixed points (2000 iters, same
  code under JAX_ENABLE_X64): with the reference _MPC_WEIGHTS the
  condensed tracking objective's optimum sits ~18% above mg for all
  three robots, so the assertion targets the optimum, not mg.  The a1
  row uses a1_sim.py's tiny SRB inertia ((0.017,0.057,0.064)*0.1) — the
  ill-conditioned case that motivated Ruiz equilibration in
  _admm_box_qp.  That row is degenerate at f32: its condensed P keeps
  cond ~ 1.5e8 AFTER equilibration (zero QP weights + alpha=1e-5 + the
  0.1x inertias), the dual residual of any fixed-budget f32 first-order
  method stalls near 1e-2, and the f32-BUILT P/q's own x64 optimum
  already sits ~8% from the x64-built one — so the f32 answer is only
  determined to O(20%) and reshuffles with any float-level code change.
  The f64 fixed point for the same robots is pinned tightly by
  test_native_mpc_standing_all_robots (C++ solver); here the a1 row
  carries the honest f32 band and the well-conditioned robots stay
  tight."""
  from vision4leg_tpu.mpc.convex_mpc import MpcConfig, compute_contact_forces
  from vision4leg_tpu.mpc import robot_params

  expected_total_fz = {"a1": 126.5, "laikago": 253.9, "spirit40": 139.4}
  for name, rp in robot_params.ROBOTS.items():
    cfg = MpcConfig(
        mass=rp.body_mass,
        inertia=tuple(float(x) for x in rp.body_inertia),
        qp_weights=(5, 5, 0.2, 0, 0, 10, 0., 0., 1., 1., 1., 0., 0),
        admm_iters=200)
    feet = np.asarray(
        [[hx, hy, -rp.body_height] for hx, hy, _ in rp.hip_positions],
        np.float32)
    forces = np.array(compute_contact_forces(
        cfg,
        jnp.array([0.0, 0.0, rp.body_height]),
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
        jnp.ones(4, jnp.int32),
        jnp.asarray(feet),
        jnp.full(4, 0.45),
        jnp.array([0.0, 0.0, rp.body_height]),
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
    ))
    total_fz = float(-forces[:, 2].sum())
    weight = rp.body_mass * 9.8
    exp = expected_total_fz[name]
    tol = {"a1": 0.35, "laikago": 0.10, "spirit40": 0.10}[name]
    assert abs(total_fz - exp) / exp < tol, (name, total_fz, exp)
    # physical sanity: supports the body, roughly even split
    assert 0.75 * weight < total_fz < 1.5 * weight, (name, total_fz, weight)
    assert np.all(-forces[:, 2] > 0.1 * weight / 4), (name, forces[:, 2])


def test_native_mpc_standing_all_robots():
  """The C++ core (f64, Jacobi equilibration + adaptive rho) must hit the
  x64 ADMM fixed points for every robot's standing QP — including
  a1_sim.py's tiny SRB inertia, which stalls an unequilibrated ADMM near
  u=0 (the reference survives it because OSQP equilibrates too)."""
  import sys
  import os.path as osp
  sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                              "vision4leg_tpu/mpc/native"))
  import mpc_osqp
  from vision4leg_tpu.mpc import robot_params

  weights = (5, 5, 0.2, 0, 0, 10, 0., 0., 1., 1., 1., 0., 0)
  expected_total_fz = {"a1": 126.5, "laikago": 253.9, "spirit40": 139.4}
  for name, rp in robot_params.ROBOTS.items():
    native = mpc_osqp.ConvexMpc(rp.body_mass, list(rp.body_inertia), 4, 10,
                                0.025, list(weights), 1e-5)
    feet = np.asarray(
        [[hx, hy, -rp.body_height] for hx, hy, _ in rp.hip_positions])
    f = np.array(native.compute_contact_forces(
        [0.0, 0.0, rp.body_height], np.zeros(3), np.zeros(3), np.zeros(3),
        np.ones(4, np.int32), feet.flatten(), np.full(4, 0.45),
        [0.0, 0.0, rp.body_height], np.zeros(3), np.zeros(3),
        np.zeros(3))[:12]).reshape(4, 3)
    total_fz = float(-f[:, 2].sum())
    exp = expected_total_fz[name]
    assert abs(total_fz - exp) / exp < 0.02, (name, total_fz, exp)


def test_admm_blockdiag_matches_dense():
  """The block-diagonal ADMM specialization (_admm_box_qp_blockdiag) is
  the same math as the generic dense solver — same Ruiz equilibration,
  same adaptive-rho iteration — evaluated without materializing the
  block-diagonal constraint matrix.  Random SPD QPs must agree to float
  tolerance."""
  from vision4leg_tpu.mpc.convex_mpc import (_admm_box_qp,
                                             _admm_box_qp_blockdiag)
  rng = np.random.RandomState(7)
  for trial in range(3):
    M, r, c = 8, 5, 3
    n = M * c
    G = rng.randn(n, n).astype(np.float32)
    P_mat = G @ G.T + 0.1 * np.eye(n, dtype=np.float32)
    q = rng.randn(n).astype(np.float32)
    blocks = rng.randn(M, r, c).astype(np.float32)
    lb = -np.abs(rng.randn(M * r)).astype(np.float32)
    ub = np.abs(rng.randn(M * r)).astype(np.float32)
    dense = np.zeros((M * r, n), np.float32)
    for i in range(M):
      dense[i * r:(i + 1) * r, i * c:(i + 1) * c] = blocks[i]
    x_dense = np.array(_admm_box_qp(jnp.asarray(P_mat), jnp.asarray(q),
                                    jnp.asarray(dense), jnp.asarray(lb),
                                    jnp.asarray(ub), 100, 0.1, 1e-6))
    x_blk = np.array(_admm_box_qp_blockdiag(
        jnp.asarray(P_mat), jnp.asarray(q), jnp.asarray(blocks),
        jnp.asarray(lb), jnp.asarray(ub), 100, 0.1, 1e-6))
    np.testing.assert_allclose(x_blk, x_dense, rtol=1e-4, atol=1e-5,
                               err_msg=f"trial {trial}")


def test_warm_mpc_matches_cold_along_trajectory():
  """The warm-started per-tick QP path (convex_mpc.compute_contact_forces
  _warm: frozen canonical Ruiz scaling, per-env-step exact KKT inverse +
  per-tick Newton-Schulz tracking, carried ADMM iterates) must stay close
  to the cold adaptive-rho reference solve along a REAL rolled
  trajectory — including across gait switches, where the carried duals
  are most stale.  Tolerance matches the f32 determinacy band the cold
  solver itself carries on the ill-conditioned a1 SRB case (see
  test_convex_mpc_standing_all_robots' a1 row)."""
  from vision4leg_tpu.envs.mpc_env import A1MPCGymEnv, MpcEnvConfig
  from vision4leg_tpu.mpc import controllers as ctrl
  from vision4leg_tpu.mpc import convex_mpc
  from vision4leg_tpu.mpc import leg_kinematics as lk
  from vision4leg_tpu.physics import maths

  env = A1MPCGymEnv(MpcEnvConfig(
      motor_control_mode="POSITION", clip_num=(0.3, 0.4),
      time_step_s=0.001, num_action_repeat=5, policy_freq=20,
      terrain_type="plane", target_vel=0.3, check_contact=False,
      settle_steps=100, alive_reward=0.1))
  state, _ = jax.jit(env.reset)(jax.random.PRNGKey(0))
  step_j = jax.jit(env.step)
  act = jnp.array([0.3, 0.0])

  errs = []
  for _ in range(8):  # 0.8 s: crosses the first trot gait switches
    rs, cs = state.robot, state.controller
    rpy = maths.quat_to_rpy(rs.phys.quat)
    rpy_rate = maths.quat_rotate_inv(rs.phys.quat, rs.phys.ang)
    feet = lk.foot_positions_base_frame(rs.phys.joint_q)
    contact_state = ((cs.desired_leg_state == 1)
                     | (cs.desired_leg_state == 2)).astype(jnp.int32)
    args = (jnp.zeros(1), ctrl.com_velocity_body(cs), rpy.at[2].set(0.0),
            rpy_rate, contact_state, feet, jnp.full(4, 0.45),
            jnp.array([0.0, 0.0, ctrl.MPC_BODY_HEIGHT]),
            jnp.array([0.3, 0.0, 0.0]), jnp.zeros(3), jnp.zeros(3))
    f_cold = np.asarray(convex_mpc.compute_contact_forces(env.mpc_cfg,
                                                          *args))
    kinv = convex_mpc.kkt_inverse(env.mpc_cfg, env.mpc_canon,
                                  rpy.at[2].set(0.0), feet)
    f_warm, _ = convex_mpc.compute_contact_forces_warm(
        env.mpc_cfg, env.mpc_canon, cs.qp_warm._replace(kinv=kinv), *args)
    errs.append(np.abs(f_cold - np.asarray(f_warm)).max()
                / max(np.abs(f_cold).max(), 1.0))
    state, _, rew, done, _ = step_j(state, act)
    assert np.isfinite(float(rew)) and not bool(done)
  assert max(errs) < 0.35, f"warm path drifted from cold solve: {errs}"


def test_convex_mpc_a1_x64_pins_tight():
  """ADVICE r4: the a1 row above carries an honest ~35% f32 band (its
  condensed P keeps cond ~1.5e8 after equilibration).  This companion
  pins the SAME JAX solver under JAX_ENABLE_X64 tightly to the x64 ADMM
  fixed point (126.5 N), so f32 rounding stays the ONLY loosened axis —
  any structural solver regression shows up here at 2%.  Runs in a
  subprocess because x64 is a process-global switch."""
  import subprocess
  import sys
  code = r'''
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from vision4leg_tpu.mpc.convex_mpc import MpcConfig, compute_contact_forces
from vision4leg_tpu.mpc import robot_params

rp = robot_params.ROBOTS["a1"]
cfg = MpcConfig(mass=rp.body_mass,
                inertia=tuple(float(x) for x in rp.body_inertia),
                qp_weights=(5, 5, 0.2, 0, 0, 10, 0., 0., 1., 1., 1., 0., 0),
                admm_iters=200)
feet = np.asarray([[hx, hy, -rp.body_height] for hx, hy, _ in rp.hip_positions])
forces = np.array(compute_contact_forces(
    cfg, jnp.array([0.0, 0.0, rp.body_height]),
    jnp.zeros(3), jnp.zeros(3), jnp.zeros(3), jnp.ones(4, jnp.int32),
    jnp.asarray(feet), jnp.full(4, 0.45),
    jnp.array([0.0, 0.0, rp.body_height]),
    jnp.zeros(3), jnp.zeros(3), jnp.zeros(3)))
total_fz = float(-forces[:, 2].sum())
assert abs(total_fz - 126.5) / 126.5 < 0.02, total_fz
print(f"OK {total_fz:.2f}")
'''
  r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                     text=True, timeout=600,
                     cwd=os.path.dirname(os.path.dirname(
                         os.path.abspath(__file__))))
  assert r.returncode == 0, (r.stdout, r.stderr)
  assert r.stdout.startswith("OK"), r.stdout


def test_warm_mpc_survives_degenerate_poses():
  """Round-5 incident: a FALLEN robot (pitch ~ +-pi/2, where tan in the
  A-matrix explodes) NaN'd the warm QP, the NaN reward entered the PPO
  buffer, and one epoch later the whole run was NaN.  The solver now
  clamps pitch, falls back to the canonical inverse on a singular K,
  self-heals diverged iterates, and box-clamps the output — so every
  output here must be finite, for poses far outside the controller's
  design envelope and even for NaN-poisoned warm state."""
  from vision4leg_tpu.mpc import controllers as ctrl
  from vision4leg_tpu.mpc import convex_mpc

  cfg = convex_mpc.MpcConfig(
      mass=12.5, inertia=(0.0017, 0, 0, 0, 0.0057, 0, 0, 0, 0.0064),
      qp_weights=(5, 5, 0.2, 0, 0, 10, 0., 0., 1., 1., 1., 0., 0))
  canon = convex_mpc.canonical_constants(cfg)
  feet_nom = jnp.array([[0.17, -0.13, -0.25], [0.17, 0.13, -0.25],
                        [-0.17, -0.13, -0.25], [-0.17, 0.13, -0.25]])
  poses = [
      jnp.array([0.0, 1.5707, 0.0]),      # face-plant: pitch at pi/2
      jnp.array([3.1, -1.57, 0.0]),       # upside down + pitched
      jnp.array([0.0, 0.0, 0.0]),         # nominal
  ]
  warm = convex_mpc.init_warm_state(canon)
  for rpy in poses:
    kinv = convex_mpc.kkt_inverse(cfg, canon, rpy, feet_nom)
    assert np.all(np.isfinite(np.asarray(kinv))), rpy
    f, warm2 = convex_mpc.compute_contact_forces_warm(
        cfg, canon, warm._replace(kinv=kinv),
        jnp.zeros(1), jnp.array([0.0, 0.0, -3.0]), rpy,
        jnp.array([9.0, -7.0, 2.0]), jnp.ones(4, jnp.int32), feet_nom,
        jnp.full(4, 0.45), jnp.array([0.0, 0.0, 0.25]),
        jnp.array([0.3, 0.0, 0.0]), jnp.zeros(3), jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(f))), (rpy, f)
    fmax = cfg.mass * 9.8 * 10.0 * 2.0
    assert np.abs(np.asarray(f)).max() <= fmax + 1e-3

  # NaN-poisoned carried state must self-heal to finite zero forces
  bad = convex_mpc.WarmState(
      x=jnp.full_like(warm.x, jnp.nan), z=warm.z, y=warm.y,
      kinv=jnp.asarray(canon.kinv0))
  f, healed = convex_mpc.compute_contact_forces_warm(
      cfg, canon, bad,
      jnp.zeros(1), jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
      jnp.ones(4, jnp.int32), feet_nom, jnp.full(4, 0.45),
      jnp.array([0.0, 0.0, 0.25]), jnp.zeros(3), jnp.zeros(3),
      jnp.zeros(3))
  assert np.all(np.isfinite(np.asarray(f)))
  assert np.all(np.isfinite(np.asarray(healed.x)))


def test_mpc_step_batch_matches_vmap_step():
  """step_batch (the collector's batched path: hybrid-control physics
  window + vmapped controller stack) must be semantically equivalent to
  jax.vmap(step).  On CPU the window takes the identical-math XLA
  fallback, so the only tolerated deltas are solver op-order (window
  uses CG, the per-env engine Cholesky) through one env step."""
  from vision4leg_tpu.envs.mpc_env import A1MPCGymEnv, MpcEnvConfig
  env = A1MPCGymEnv(MpcEnvConfig(
      motor_control_mode="POSITION", clip_num=(0.3, 0.4),
      time_step_s=0.001, num_action_repeat=5, policy_freq=5,
      terrain_type="random_blocks_sparse", target_vel=0.3,
      check_contact=True, settle_steps=50, alive_reward=-0.05,
      random_init_range=0.5, get_image=False))
  E = 4
  keys = jax.random.split(jax.random.PRNGKey(3), E)
  states, obs0 = jax.jit(jax.vmap(env.reset))(keys)
  acts = jnp.tile(jnp.array([[0.3, 0.1]]), (E, 1))

  sa, oa, ra, da, _ = jax.jit(jax.vmap(env.step))(states, acts)
  sb, ob, rb, db, _ = jax.jit(env.step_batch)(states, acts)

  np.testing.assert_allclose(np.asarray(sa.robot.phys.pos),
                             np.asarray(sb.robot.phys.pos), atol=2e-3)
  np.testing.assert_allclose(np.asarray(sa.robot.phys.joint_q),
                             np.asarray(sb.robot.phys.joint_q), atol=5e-3)
  np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=5e-3)
  np.testing.assert_allclose(np.asarray(ra), np.asarray(rb), atol=1e-2)
  np.testing.assert_array_equal(np.asarray(da), np.asarray(db))
  np.testing.assert_allclose(np.asarray(sa.current_time),
                             np.asarray(sb.current_time), atol=1e-6)
