"""Golden tests for the MMDR delay machinery.

SURVEY.md section 4/7 calls out the frame-extract indexing as the subtlest
parity surface: these tests replay the reference's deque semantics
(locomotion_gym_env_with_rich_information.py:166-175, 318-336, 549-652) in
plain numpy and check the env's device ring-buffer logic against them.
"""
import collections

import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig


def make_env(**over):
  base = dict(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=16, add_last_action_input=True,
      no_displacement=True, diagonal_act=True, terrain_type="plane",
      get_image=True, depth_image=True, depth_norm=False,
      empty_image=False, settle_steps=50)
  base.update(over)
  return A1GymEnv(EnvConfig(**base))


class RefFrameMachinery:
  """The reference's deque + frame_idx state machine, transcribed."""

  def __init__(self, frame_extract, reset_frame_idx, each_step, fixed,
               rng):
    self.fe = frame_extract
    self.num_stored = 4 * frame_extract
    self.reset_frame_idx = reset_frame_idx
    self.each_step = each_step
    self.fixed = fixed
    self.rng = rng
    self.frames = collections.deque(maxlen=self.num_stored)
    self.frame_idx = [0, self.fe, 2 * self.fe, 3 * self.fe]

  def reset(self, frame):
    if self.reset_frame_idx and self.fe > 1:
      if self.fixed:
        self.frame_idx = [self.fe - 1, 2 * self.fe - 1, 3 * self.fe - 1,
                          4 * self.fe - 1]
      else:
        r = self.rng.randint(0, self.fe, 4)
        self.frame_idx = [r[0], r[1] + self.fe, r[2] + 2 * self.fe,
                          r[3] + 3 * self.fe]
    for _ in range(self.num_stored):
      self.frames.appendleft(frame)
    return self.gather()

  def step(self, frame):
    if self.each_step and self.fe > 1:
      self.frame_idx = ([self.rng.randint(1, self.fe)]
                        + [self.frame_idx[i] + self.fe for i in range(3)])
    self.frames.appendleft(frame)
    return self.gather()

  def gather(self):
    return np.stack([self.frames[i] for i in self.frame_idx])


def test_static_frame_gather_matches_reference():
  """frame_extract=4, no delay randomization: obs must contain frames
  [t, t-4, t-8, t-12] (deque indices [0, 4, 8, 12])."""
  ref = RefFrameMachinery(4, False, False, False, np.random.RandomState(0))
  obs0 = ref.reset(np.float32(0.0))
  seq = [obs0]
  for t in range(1, 20):
    seq.append(ref.step(np.float32(t)))
  # t=19: newest frame 19, gather = [19, 15, 11, 7]
  np.testing.assert_array_equal(seq[-1], [19.0, 15.0, 11.0, 7.0])


def test_fixed_delay_indices():
  ref = RefFrameMachinery(4, True, False, True, np.random.RandomState(0))
  ref.reset(np.float32(0.0))
  assert ref.frame_idx == [3, 7, 11, 15]


def test_each_step_indices_steady_state():
  """Per-step randomization: after >=4 steps the indices are
  [r_t, r_{t-1}+4, r_{t-2}+8, r_{t-3}+12], all < 16."""
  rng = np.random.RandomState(7)
  ref = RefFrameMachinery(4, True, True, False, rng)
  ref.reset(np.float32(0.0))
  for t in range(10):
    ref.step(np.float32(t))
    assert all(0 <= i < 16 for i in ref.frame_idx), ref.frame_idx
  assert 1 <= ref.frame_idx[0] < 4
  for k in (1, 2, 3):
    assert ref.frame_idx[k] - 4 * k < 4


def test_env_frame_ring_matches_reference_gather():
  """Drive the real env and check its image obs equals the reference deque
  gather of the frames the env itself captured."""
  env = make_env(frame_extract=4)

  @jax.jit
  def run(key):
    state, obs = env.reset(key)

    def body(state, _):
      act = jnp.zeros(6)
      state, obs, _, _, _ = env.step(state, act)
      return state, (state.frames[0], obs[-4 * 64 * 64:])

    state, (frames, img_obs) = jax.lax.scan(body, state, None, length=10)
    return state.frames, frames, img_obs, state.frame_idx

  ring, captured, img_obs, frame_idx = run(jax.random.PRNGKey(0))
  ring = np.asarray(ring)
  img = np.asarray(img_obs[-1]).reshape(4, 64, 64)
  # static mode: frame_idx = [0, 4, 8, 12]; obs frames = ring[idx]
  np.testing.assert_array_equal(np.asarray(frame_idx), [0, 4, 8, 12])
  for k, idx in enumerate([0, 4, 8, 12]):
    np.testing.assert_allclose(img[k], ring[idx], rtol=1e-6)


def test_proprio_latency_interpolation():
  """The robot observation ring must reproduce the reference's
  _GetDelayedObservation lerp (minitaur.py:1213-1234)."""
  from vision4leg_tpu.robots import a1
  from vision4leg_tpu.physics import engine
  from vision4leg_tpu.robots import a1_model

  model = a1_model.build(dt=0.01)
  phys = engine.zero_state(model)
  rs = a1.init_robot_state(model, phys)
  # fill history with distinct joint angles: hist[i] = i everywhere
  hist = jnp.tile(jnp.arange(a1.OBS_HIST_LEN, dtype=jnp.float32)[:, None],
                  (1, a1.OBS_HIST_DIM))
  rs = rs.replace(obs_hist=hist)
  dyn = a1.default_dynamics(model).replace(
      control_latency=jnp.asarray(0.025))  # 2.5 steps of 0.01
  q = jax.jit(a1.delayed_motor_angles, static_argnums=2)(rs, dyn, 0.01)
  # latency 2.5 steps: lerp between hist[2] (newer) and hist[3] (older)
  np.testing.assert_allclose(np.asarray(q), 2.5, atol=1e-5)
