"""Env-wrapper equivalents: curriculum schedule, RandoDir, NormRet,
RewardShift (reference: curriculum_wrapper_env.py, env_builder.py:110-156,
base_wrapper.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.envs import wrappers as W


def test_curriculum_schedule():
  """Cubic ramp 1000 -> 2000 over 10M frames (curriculum_wrapper_env.py:
  31-66): endpoints exact, midpoint at start + 0.5^3 * range."""
  n = 8
  assert int(W.curriculum_episode_length(jnp.asarray(0),
                                         num_parallel_envs=n)) == 1000
  assert int(W.curriculum_episode_length(jnp.asarray(10_000_000 // n),
                                         num_parallel_envs=n)) == 2000
  mid = int(W.curriculum_episode_length(jnp.asarray(5_000_000 // n),
                                        num_parallel_envs=n))
  assert mid == 1000 + int(0.125 * 1000), mid
  # clamps past the end
  assert int(W.curriculum_episode_length(jnp.asarray(20_000_000 // n),
                                         num_parallel_envs=n)) == 2000


def test_rando_dir():
  st, vec = W.rando_dir_reset(jax.random.PRNGKey(0))
  np.testing.assert_allclose(float(jnp.linalg.norm(vec)), 1.0, atol=1e-6)
  assert -np.pi / 2 <= float(st.angle) <= np.pi / 2
  # fixed direction without an update interval
  st2, vec2 = W.rando_dir_step(st, jax.random.PRNGKey(1), None)
  np.testing.assert_allclose(np.asarray(vec2), np.asarray(vec), atol=1e-7)
  # redraw exactly on the interval
  st3 = st
  changed = False
  for i in range(4):
    st3, v3 = W.rando_dir_step(st3, jax.random.fold_in(
        jax.random.PRNGKey(2), i), 2)
    if abs(float(st3.angle) - float(st.angle)) > 1e-6:
      changed = True
  assert changed


def test_env_random_dir_and_rotate_sensor():
  """random_dir prepends a unit (cos, sin) and steers the task's velocity
  reward; rotate_sensor widens the displacement history to 7 channels
  (env_builder.py:110-156, 232)."""
  from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
  cfg = EnvConfig(time_step_s=0.0025, num_action_repeat=4,
                  diagonal_act=True, clip_num=(0.05, 0.5, 0.5) * 4,
                  terrain_type="plane", settle_steps=20,
                  random_dir=True, dir_update_interval=2,
                  rotate_sensor=True, no_displacement=False)
  env = A1GymEnv(cfg)
  assert cfg.disp_channels == 7
  assert cfg.proprio_dim == 2 + 21 + 12 + 36

  @jax.jit
  def roll(key):
    st, obs = env.reset(key)
    def body(carry, _):
      st, _ = carry
      st, obs, rew, done, _ = env.step(st, jnp.zeros(env.cfg.action_dim))
      return (st, obs), (obs, st.dir_angle, st.task.target_vel_dir)
    (st, obs0), (obss, angles, dirs) = jax.lax.scan(
        body, (st, obs), None, length=6)
    return obs, obss, angles, dirs

  obs0, obss, angles, dirs = roll(jax.random.PRNGKey(3))
  assert obs0.shape == (env.obs_dim,)
  # (cos, sin) prefix is a unit vector on every step
  heads = np.asarray(obss[:, :2])
  np.testing.assert_allclose(np.linalg.norm(heads, axis=-1), 1.0, atol=1e-5)
  # direction redraws on the update interval ...
  assert len(np.unique(np.round(np.asarray(angles), 6))) > 1
  # ... and the task's target_vel_dir follows the drawn angle
  np.testing.assert_allclose(
      np.asarray(dirs),
      np.stack([np.cos(np.asarray(angles)), np.sin(np.asarray(angles))], -1),
      atol=1e-6)
  assert np.isfinite(np.asarray(obss)).all()


def test_reward_shift():
  r = jnp.asarray(2.0)
  assert float(W.reward_shift(r, 0.5, training=True)) == 1.0
  assert float(W.reward_shift(r, 0.5, training=False)) == 2.0


def test_norm_ret_scales_by_return_std():
  """After many steps of constant reward, the normalized reward must be
  approximately reward / std(discounted returns)."""
  E = 16
  st = W.init_norm_ret(E)
  key = jax.random.PRNGKey(0)
  rews = 1.0 + 0.1 * jax.random.normal(key, (200, E))

  @jax.jit
  def run(st, rews):
    def body(st, r):
      st, normed = W.norm_ret_step(st, r, jnp.zeros(E))
      return st, normed
    return jax.lax.scan(body, st, rews)

  st, normed = run(st, rews)
  # the running variance covers the ramp-up of the discounted return
  # (0 -> ~100), like the reference's Welford merge over all batches
  std = float(jnp.sqrt(st.ret_var + 1e-4))
  assert 1.0 < std < float(jnp.abs(st.ret).mean()), std
  assert np.isfinite(np.asarray(normed)).all()
  # normalized reward = raw / running return std
  np.testing.assert_allclose(float(normed[-1].mean()),
                             float(rews[-1].mean()) / std, rtol=1e-3)
  # dones reset the running return
  st2, _ = W.norm_ret_step(st, jnp.ones(E), jnp.ones(E))
  np.testing.assert_allclose(np.asarray(st2.ret), 0.0, atol=1e-6)


# --- trajectory-generator wrapper (trajectory_generator_wrapper_env.py) ---

def _tg_env():
  from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
  # minimal flat-plane env, raw 12-dim motor-angle action space
  return A1GymEnv(EnvConfig(motor_control_mode="POSITION",
                            time_step_s=0.0025, num_action_repeat=16,
                            diagonal_act=False))


def test_tg_wrapper_rejects_bad_generator():
  """Reference validates get_action/get_observation at construction and
  raises ValueError (trajectory_generator_wrapper_env.py:41-46)."""
  import pytest
  from vision4leg_tpu.envs.trajectory_generator import (
      TrajectoryGeneratorWrapper)
  with pytest.raises(ValueError):
    TrajectoryGeneratorWrapper(_tg_env(), object())


def test_tg_zero_signal_is_transparent():
  """With zero amplitudes and zero residual the wrapper must reproduce the
  bare env stepping INIT_MOTOR_ANGLES exactly (the generator emits the
  standing pose), and the obs must gain exactly the (cos, sin) phase tail."""
  from vision4leg_tpu.envs.trajectory_generator import (
      OpenloopGaitGenerator, TrajectoryGeneratorWrapper)
  from vision4leg_tpu.robots import a1_params as P

  env = _tg_env()
  tg = OpenloopGaitGenerator(swing_amplitude=0.0, extension_amplitude=0.0)
  wrapped = TrajectoryGeneratorWrapper(env, tg)
  assert wrapped.obs_dim == env.obs_dim + 2

  key = jax.random.PRNGKey(3)
  carry, obs_w = wrapped.reset(key)
  state_b, obs_b = env.reset(key)
  np.testing.assert_allclose(np.asarray(obs_w[:-2]), np.asarray(obs_b),
                             rtol=0, atol=0)

  zero_residual = jnp.zeros(12)
  init12 = jnp.asarray(P.INIT_MOTOR_ANGLES)
  step_w = jax.jit(wrapped.step)
  step_b = jax.jit(env.step)
  for _ in range(3):
    carry, obs_w, rew_w, done_w, _ = step_w(carry, zero_residual)
    state_b, obs_b, rew_b, done_b, _ = step_b(state_b, init12)
    np.testing.assert_allclose(np.asarray(obs_w[:-2]), np.asarray(obs_b),
                               rtol=0, atol=0)
    np.testing.assert_allclose(float(rew_w), float(rew_b), rtol=0, atol=0)


def test_tg_openloop_trot_phases_and_limits():
  """The open-loop signal advances phase at 2*pi*f*dt per step, keeps
  diagonal leg pairs in antiphase, and always emits in-limit motor
  angles even under extreme residuals."""
  from vision4leg_tpu.envs.trajectory_generator import (
      OpenloopGaitGenerator, TGState)
  from vision4leg_tpu.robots import a1_params as P

  tg = OpenloopGaitGenerator(frequency_hz=1.25, control_dt=0.04)
  st = tg.reset()
  st1, motor = tg.get_action(st, jnp.zeros(()), jnp.zeros(12))
  np.testing.assert_allclose(float(st1.phase),
                             2 * np.pi * 1.25 * 0.04, rtol=1e-6)
  # phase 0: zero swing everywhere -> standing pose
  np.testing.assert_allclose(np.asarray(motor),
                             np.asarray(P.INIT_MOTOR_ANGLES), atol=1e-6)
  # quarter cycle: FR/RL thighs swing forward, FL/RR are in the other
  # half (trot antiphase)
  quarter = TGState(phase=jnp.asarray(np.pi / 2))
  _, motor_q = tg.get_action(quarter, jnp.zeros(()), jnp.zeros(12))
  thigh = np.asarray(motor_q).reshape(4, 3)[:, 1] - 0.9
  assert thigh[0] > 0.0 and thigh[3] > 0.0          # FR, RL swing
  np.testing.assert_allclose(thigh[1], -thigh[0], atol=1e-6)  # FL mirrors
  # joint limits hold under a huge residual
  _, motor_big = tg.get_action(st, jnp.zeros(()), 100.0 * jnp.ones(12))
  assert np.all(np.asarray(motor_big) <= np.asarray(P.JOINT_UPPER) + 1e-6)
  _, motor_small = tg.get_action(st, jnp.zeros(()), -100.0 * jnp.ones(12))
  assert np.all(np.asarray(motor_small) >= np.asarray(P.JOINT_LOWER) - 1e-6)
