"""Atari wrapper stack behavior tests against a synthetic ALE-like env.

ale-py is not installed here (no network), so the DeepMind wrapper stack
(collector/atari.py, ref torchrl/env/atari_wrapper.py) is verified on a
deterministic fake that exposes the surfaces the wrappers touch: RGB
frames, `ale.lives()`, `get_action_meanings()`, and a frame counter
embedded in pixel values so skipping/max-pooling/stacking are checkable
exactly.
"""
import numpy as np
import pytest

gymnasium = pytest.importorskip("gymnasium")

from vision4leg_tpu.collector import atari


class _FakeALE:
  def __init__(self, env):
    self._env = env

  def lives(self):
    return self._env._lives


class _FakeSpec:
  id = "FakeNoFrameskip-v4"


class FakeAtariEnv(gymnasium.Env):
  """210x160x3 frames whose R channel equals the step counter; 3 lives;
  a life is lost every 10 steps; game over after the last life."""
  observation_space = gymnasium.spaces.Box(0, 255, (210, 160, 3), np.uint8)
  action_space = gymnasium.spaces.Discrete(4)
  spec = _FakeSpec()

  def __init__(self):
    self._t = 0
    self._lives = 3
    self.ale = _FakeALE(self)
    self.fired = False

  def get_action_meanings(self):
    return ["NOOP", "FIRE", "UP", "DOWN"]

  def _obs(self):
    f = np.zeros((210, 160, 3), np.uint8)
    f[..., 0] = self._t % 256
    return f

  def reset(self, **kwargs):
    self._t = 0
    self._lives = 3
    return self._obs(), {}

  def step(self, action):
    if action == 1:
      self.fired = True
    self._t += 1
    life_lost = self._t % 10 == 0
    if life_lost:
      self._lives -= 1
    term = self._lives <= 0
    reward = 2.5 if action == 2 else -0.5
    return self._obs(), reward, term, False, {}


def test_max_and_skip_pools_last_two_frames():
  env = atari.MaxAndSkipEnv(FakeAtariEnv(), skip=4)
  env.env.reset()
  obs, total, *_ = env.step(0)
  # steps 1..4 executed; max of frames 3 and 4 = 4 in the R channel
  assert obs[0, 0, 0] == 4
  assert total == -0.5 * 4


def test_episodic_life_ends_on_life_loss_but_resumes():
  env = atari.EpisodicLifeEnv(FakeAtariEnv())
  env.reset()
  term = False
  steps = 0
  while not term:
    _, _, term, _, _ = env.step(0)
    steps += 1
  assert steps == 10              # first life lost at t=10
  assert not env.was_real_done
  obs, _ = env.reset()            # resumes with a no-op, no real reset
  assert obs[0, 0, 0] == 11       # frame counter kept running


def test_noop_reset_advances_random_noops():
  env = atari.NoopResetEnv(FakeAtariEnv(), noop_max=7)
  env.reset(seed=3)
  obs, _ = env.reset()
  assert 1 <= obs[0, 0, 0] <= 7


def test_warp_scale_clip_stack_shapes_and_values():
  env = atari.WarpFrame(FakeAtariEnv())
  obs, _ = env.reset()
  assert obs.shape == (84, 84, 1) and obs.dtype == np.uint8

  env = atari.ScaledFloatFrame(atari.WarpFrame(FakeAtariEnv()))
  obs, _ = env.reset()
  assert obs.dtype == np.float32 and obs.max() <= 1.0

  env = atari.ClipRewardEnv(FakeAtariEnv())
  env.reset()
  _, r, *_ = env.step(2)
  assert r == 1.0                 # sign(2.5)
  _, r, *_ = env.step(0)
  assert r == -1.0                # sign(-0.5)

  env = atari.FrameStack(atari.WarpFrame(FakeAtariEnv()), k=4)
  obs, _ = env.reset()
  assert obs.shape == (84, 84, 4)
  obs, *_ = env.step(0)
  assert obs.shape == (84, 84, 4)
  # newest frame (t=1) lands in the last channel
  assert obs[..., 3].max() >= obs[..., 0].max()


def test_wrap_deepmind_full_stack():
  env = atari.wrap_deepmind(FakeAtariEnv(), frame_stack=True, scale=True,
                            clip_rewards=True)
  obs, _ = env.reset(seed=0)
  assert obs.shape == (84, 84, 4) and obs.dtype == np.float32
  assert env.unwrapped.fired      # FireResetEnv pressed FIRE
  obs, r, term, trunc, _ = env.step(0)
  assert obs.shape == (84, 84, 4)
  assert r in (-1.0, 0.0, 1.0)
