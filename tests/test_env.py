"""End-to-end environment tests: reset/step shapes, standing stability,
termination, reward sign conventions."""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
from vision4leg_tpu.robots import a1_params as P

STATE_CFG = EnvConfig(
    # state-only-baseline.json env_build (minus terrain, simplified to plane)
    motor_control_mode="POSITION",
    z_penalty=1.0,
    clip_num=(0.05, 0.5, 0.5) * 4,
    time_step_s=0.0025,
    num_action_repeat=16,
    add_last_action_input=True,
    no_displacement=True,
    diagonal_act=True,
    alive_reward=-0.05,
    fall_reward=-20.0,
    fric_coeff=(1.0, 0.01, 0.01),
    target_vel=1.0,
    random_init_range=1.0,
    domain_randomization=False,
    terrain_type="plane",
)


def test_obs_dim():
  env = A1GymEnv(STATE_CFG)
  # IMU 12 + LastAction 36 + MotorAngle 36
  assert env.obs_dim == 84
  assert STATE_CFG.action_dim == 6


def test_reset_and_standing():
  """After reset the robot must stand stably while holding the init pose."""
  env = A1GymEnv(STATE_CFG)

  @jax.jit
  def run(key):
    state, obs = env.reset(key)
    hold = jnp.zeros(6)  # NormAct-space center -> init angles

    def body(carry, _):
      state, _ = carry
      # action already in env space: init angles (= mid of clip range)
      act = jnp.asarray(P.INIT_MOTOR_ANGLES[:6], jnp.float32)
      state, obs, rew, done, _ = env.step(state, act)
      return (state, done), (state.robot.phys.pos[2], done)

    (state, _), (zs, dones) = jax.lax.scan(body, (state, jnp.array(False)),
                                           None, length=50)
    return obs, zs, dones, state.robot.phys.quat

  obs, zs, dones, quat = run(jax.random.PRNGKey(0))
  assert obs.shape == (84,)
  assert np.all(np.isfinite(np.array(obs)))
  zs = np.array(zs)
  # standing height stays in a sane band and the episode never terminates
  assert np.all(zs > 0.20), f"fell: min z={zs.min()}"
  assert np.all(zs < 0.40), f"jumped: max z={zs.max()}"
  assert not np.any(np.array(dones))
  # upright: quaternion close to identity
  assert abs(float(quat[0])) > 0.99


def test_random_actions_dont_nan():
  env = A1GymEnv(STATE_CFG)

  @jax.jit
  def run(key):
    state, obs = env.reset(key)

    def body(carry, k):
      state = carry
      act = jax.random.uniform(k, (6,), minval=-1.0, maxval=1.0)
      # NormAct mapping (continuous_wrapper.py:19-22)
      act = env.action_low + (jnp.tanh(act) + 1) * 0.5 * (
          env.action_high - env.action_low)
      state, obs, rew, done, _ = env.step(state, act)
      return state, (obs, rew, done)

    keys = jax.random.split(key, 30)
    state, (obs, rew, done) = jax.lax.scan(body, state, keys)
    return obs, rew, done

  obs, rew, done = run(jax.random.PRNGKey(1))
  assert np.all(np.isfinite(np.array(obs)))
  assert np.all(np.isfinite(np.array(rew)))


def test_fall_terminates():
  """Dropping the robot on its side must trigger rot/height termination."""
  env = A1GymEnv(STATE_CFG)

  @jax.jit
  def run(key):
    state, _ = env.reset(key)
    # flip the robot: set orientation sideways, let it fall
    from vision4leg_tpu.physics import maths
    quat = maths.rpy_to_quat(jnp.array([2.0, 0.0, 0.0]))
    phys = state.robot.phys.replace(
        quat=quat, pos=jnp.array([0.0, 0.0, 0.5]))
    state = state.replace(robot=state.robot.replace(phys=phys))

    def body(carry, _):
      state, done_any = carry
      act = jnp.asarray(P.INIT_MOTOR_ANGLES[:6], jnp.float32)
      state, _, _, done, _ = env.step(state, act)
      return (state, done_any | done), done

    (_, done_any), _ = jax.lax.scan(body, (state, jnp.array(False)), None,
                                    length=20)
    return done_any

  assert bool(run(jax.random.PRNGKey(2)))


def test_vmapped_reset_step():
  """The env must vmap cleanly over a batch of environments."""
  env = A1GymEnv(STATE_CFG)

  @jax.jit
  def run(keys):
    states, obs = jax.vmap(env.reset)(keys)
    acts = jnp.tile(jnp.asarray(P.INIT_MOTOR_ANGLES[:6], jnp.float32),
                    (keys.shape[0], 1))
    states, obs, rew, done, _ = jax.vmap(env.step)(states, acts)
    return obs, rew, done

  obs, rew, done = run(jax.random.split(jax.random.PRNGKey(3), 4))
  assert obs.shape == (4, 84)
  assert rew.shape == (4,)


def test_step_batch_matches_vmapped_step():
  """env.step_batch (the Pallas-kernel integration point) must be
  semantically identical to jax.vmap(env.step) — state, obs, reward and
  termination — on a box terrain with domain randomization."""
  cfg = EnvConfig(**{**STATE_CFG.__dict__,
                     "terrain_type": "random_blocks_sparse_thin_wide",
                     "domain_randomization": True})
  env = A1GymEnv(cfg)
  assert env.kernel_capable
  E = 4
  keys = jax.random.split(jax.random.PRNGKey(7), E)

  @jax.jit
  def run(keys):
    states, _ = jax.vmap(env.reset)(keys)
    acts = jnp.tile(jnp.asarray(P.INIT_MOTOR_ANGLES[:6], jnp.float32),
                    (E, 1)) * 0.1
    out_a = jax.vmap(env.step)(states, acts)
    out_b = env.step_batch(states, acts)
    return out_a, out_b

  (sa, oa, ra, da, _), (sb, ob, rb, db, _) = run(keys)
  np.testing.assert_allclose(np.asarray(oa), np.asarray(ob), atol=2e-4)
  np.testing.assert_allclose(np.asarray(ra), np.asarray(rb), atol=1e-4)
  np.testing.assert_array_equal(np.asarray(da), np.asarray(db))
  np.testing.assert_allclose(np.asarray(sa.robot.phys.pos),
                             np.asarray(sb.robot.phys.pos), atol=1e-5)
  np.testing.assert_allclose(np.asarray(sa.robot.obs_hist),
                             np.asarray(sb.robot.obs_hist), atol=2e-4)


def test_render_pruning_is_exact():
  """View-axis culling of render boxes/spheres must be pixel-exact after
  the 10 m depth clip, for random camera poses on the dense terrains."""
  from vision4leg_tpu.envs import camera as cam
  from vision4leg_tpu.envs import terrain as terr
  from vision4leg_tpu.physics import maths

  # reference renderer: no pruning (force the thresholds out of reach)
  orig = (cam.MAX_RENDER_BOXES, cam.MAX_RENDER_SPHERES)

  def render_all(ts, pos, rot, flat, subgoals):
    cam.MAX_RENDER_BOXES = 10_000
    cam.MAX_RENDER_SPHERES = 10_000
    try:
      h, _ = terr.height_fns(ts, flat)
      return cam.render_depth(pos, rot, ts, h, flat, subgoals)
    finally:
      cam.MAX_RENDER_BOXES, cam.MAX_RENDER_SPHERES = orig

  def render_pruned(ts, pos, rot, flat, subgoals, cap):
    h, _ = terr.height_fns(ts, flat)
    return cam.render_depth(pos, rot, ts, h, flat, subgoals, max_boxes=cap)

  for gen, flat, subgoals, cap in (
      (terr.gen_thin_wide, True, True,
       terr.RENDER_BOX_CAPS["random_blocks_sparse_thin_wide"]),
      (lambda k: terr.gen_blocks_sparse(k, subgoal=True), True, True,
       terr.RENDER_BOX_CAPS["random_blocks_sparse_with_subgoal"]),
      (terr.gen_chair_desk, True, False,
       terr.RENDER_BOX_CAPS["random_chair_desk"]),
      (terr.gen_spheres_with_subgoal, True, True, 40),
  ):
    ts = gen(jax.random.PRNGKey(3))
    for i in range(6):
      k = jax.random.PRNGKey(100 + i)
      kp, kq = jax.random.split(k)
      pos = jnp.concatenate([
          jax.random.uniform(kp, (1,), minval=-1.0, maxval=20.0),
          jax.random.uniform(jax.random.fold_in(kp, 1), (1,),
                             minval=-2.5, maxval=2.5),
          jnp.array([0.27])])
      rpy = jnp.array([0.0, 0.0,
                       float(jax.random.uniform(kq, (), minval=-3.1,
                                                maxval=3.1))])
      rot = maths.quat_to_mat(maths.rpy_to_quat(rpy))
      full = jax.jit(lambda p, r, ts=ts, f=flat, s=subgoals:
                     render_all(ts, p, r, f, s))(pos, rot)
      pruned = jax.jit(lambda p, r, ts=ts, f=flat, s=subgoals, c=cap:
                       render_pruned(ts, p, r, f, s, c))(pos, rot)
      a = np.clip(np.asarray(full), 0.3, 10.0)
      b = np.clip(np.asarray(pruned), 0.3, 10.0)
      # identical up to f32 ULP noise from the reordered min-reduction
      np.testing.assert_allclose(a, b, atol=1e-5)


def test_heightfield_march_matches_dense_reference():
  """The chunked, clip-truncated ray march must match a dense one-shot
  march (the pre-optimization formulation) after the 10 m depth clip, on
  random hill terrains and camera poses."""
  from vision4leg_tpu.envs import camera as cam
  from vision4leg_tpu.envs import terrain as terr
  from vision4leg_tpu.physics import maths

  def dense_march(eye, dirs, height_fn, n_steps=96, far=20.0):
    ts = jnp.linspace(0.05, far, n_steps)
    pts = eye[None, None, :] + ts[None, :, None] * dirs[:, None, :]
    below = pts[..., 2] <= height_fn(pts[..., :2])
    any_hit = jnp.any(below, axis=-1)
    first = jnp.argmax(below, axis=-1)
    t_hi = ts[first]
    t_lo = jnp.where(first == 0, 0.0, ts[jnp.maximum(first - 1, 0)])
    for _ in range(12):
      mid = 0.5 * (t_lo + t_hi)
      p = eye[None] + mid[:, None] * dirs
      under = p[:, 2] <= height_fn(p[:, :2])
      t_lo, t_hi = jnp.where(under, t_lo, mid), jnp.where(under, mid, t_hi)
    return jnp.where(any_hit, 0.5 * (t_lo + t_hi), jnp.inf)

  for i in range(4):
    ts_state = terr.gen_hill(jax.random.PRNGKey(i))
    h, _ = terr.height_fns(ts_state, False)
    k = jax.random.PRNGKey(100 + i)
    pos = jnp.array([
        float(jax.random.uniform(k, (), minval=-4.0, maxval=4.0)),
        float(jax.random.uniform(jax.random.fold_in(k, 1), (),
                                 minval=-4.0, maxval=4.0)), 0.0])
    pos = pos.at[2].set(h(pos[None, :2])[0] + 0.35)
    yaw = float(jax.random.uniform(jax.random.fold_in(k, 2), (),
                                   minval=-3.1, maxval=3.1))
    rot = maths.quat_to_mat(maths.rpy_to_quat(jnp.array([0.0, 0.0, yaw])))
    eye, dirs = cam.camera_rays(pos, rot)
    got = jax.jit(lambda e, d: cam._ray_heightfield_t(e, d, h))(eye, dirs)
    ref = jax.jit(lambda e, d: dense_march(e, d, h))(eye, dirs)
    a = np.clip(np.where(np.isfinite(np.asarray(got)), got, 1000.0), 0.3, 10.0)
    b = np.clip(np.where(np.isfinite(np.asarray(ref)), ref, 1000.0), 0.3, 10.0)
    # identical hit set post-clip; hit depths agree to the bisection
    # bracket width (~1 mm)
    np.testing.assert_allclose(a, b, atol=5e-3)


def test_nonfinite_pose_terminates():
  """A diverged env (NaN base pose) must terminate instead of propagating
  NaN forever (NaN comparisons are False in every other done check; the
  reference kills on NaN instead, collector/base.py:68-70)."""
  from vision4leg_tpu.envs import tasks
  cfg = tasks.TaskConfig()
  ts = tasks.init_task_state(jnp.zeros(3), 1)
  nan_pos = jnp.array([jnp.nan, 0.0, 0.25])
  ok_quat = jnp.array([1.0, 0.0, 0.0, 0.0])
  done = jax.jit(tasks.done, static_argnums=0)
  assert bool(done(cfg, ts, nan_pos, ok_quat, jnp.array(False)))
  nan_quat = jnp.array([jnp.nan] * 4)
  assert bool(done(cfg, ts, jnp.array([0., 0., 0.25]), nan_quat,
                   jnp.array(False)))
  # finite, healthy pose does not terminate
  assert not bool(done(cfg, ts, jnp.array([0., 0., 0.25]), ok_quat,
                       jnp.array(False)))


def test_mxu_bulk_lookup_matches_gather():
  """The bf16 hat-weight matmul lookup (TPU bulk path) must match the
  exact f32 4-corner gather to bf16 resolution (~3 cm worst case on
  +-3 m hill heights — far below the simulated RealSense noise), across
  terrains and random query points."""
  from vision4leg_tpu.envs import terrain as terr
  for gen in (terr.gen_hill, terr.gen_random_heightfield):
    ts = gen(jax.random.PRNGKey(5))
    xy = jax.random.uniform(jax.random.PRNGKey(6), (4096, 2),
                            minval=-12.0, maxval=12.0)
    try:
      terr.FORCE_MXU_BULK = False
      h, _ = terr.heightfield_fns(ts)
      exact = jax.jit(h)(xy)
      terr.FORCE_MXU_BULK = True
      h2, _ = terr.heightfield_fns(ts)
      approx = jax.jit(h2)(xy)
    finally:
      terr.FORCE_MXU_BULK = None
    err = np.abs(np.asarray(exact) - np.asarray(approx))
    assert err.max() < 0.04, err.max()
