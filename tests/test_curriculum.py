"""Curriculum episode-length wiring (VERDICT r1 item 8a).

EnvConfig.curriculum must actually change collection behavior: the cubic
1000->2000 ramp (curriculum_wrapper_env.py:27-92) feeds the collector's
surpass threshold as a traced scalar.  Verified at test scale by driving
the same compiled rollout with two different max_ep values and checking
the terminal pattern follows the cap.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.collector import rollout as rollout_lib
from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.models.actor_critic import StateActorCritic


def test_traced_max_ep_changes_episode_cuts_without_recompile():
  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, diagonal_act=True,
      terrain_type="plane", settle_steps=20))
  module = StateActorCritic(action_dim=6, hidden_shapes=(16, 16),
                            append_hidden_shapes=(16, 16))
  params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, env.obs_dim)))

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  rollout = jax.jit(rollout_lib.make_rollout_fn(
      env, apply_pi, apply_v, horizon=10, max_episode_frames=999,
      discount=0.99, proprio_dim=env.cfg.proprio_dim, obs_norm=False,
      action_low=env.action_low, action_high=env.action_high))
  cs0 = rollout_lib.init_collector(env, 4, jax.random.PRNGKey(1))

  # cap 3: every env must hit a terminal by step 3 (surpass), repeatedly
  _, traj3, _ = rollout(params, cs0, jnp.asarray(3, jnp.int32))
  term3 = np.asarray(traj3.terminals[:, :, 0])
  assert term3[2].all(), "all envs must surpass at ep_steps==3"
  # cap 8 from the SAME compiled fn: no forced terminal at step 3
  n_before = rollout._cache_size() if hasattr(rollout, "_cache_size") else None
  _, traj8, _ = rollout(params, cs0, jnp.asarray(8, jnp.int32))
  if n_before is not None:
    assert rollout._cache_size() == n_before, "max_ep retraced the program"
  term8 = np.asarray(traj8.terminals[:, :, 0])
  # an env only terminates early by falling; the surpass column moves to 8
  assert term8[7].all()
  assert term8[2].sum() <= term3[2].sum()


def test_curriculum_config_drives_agent_cap():
  """EnvConfig.curriculum=True is consumed (not silently ignored): the
  agent computes the reference ramp (num_parallel_envs=8 as the builder
  passes, env_builder.py:350-354)."""
  from vision4leg_tpu.algo.agent import PPOAgent
  from vision4leg_tpu.algo.ppo import PPOConfig

  env, meta = get_env("A1MoveGround", {
      "obs_norm": True,
      "env_build": {"motor_control_mode": "POSITION",
                    "time_step_s": 0.0025, "num_action_repeat": 4,
                    "diagonal_act": True,
                    "clip_num": [0.05, 0.5, 0.5] * 4,
                    "terrain_type": "plane", "curriculum": True}})

  class _NullLogger:
    work_dir = "/tmp/v4l_curric"
    def add_epoch_info(self, *a, **k): pass
    def log(self, *a, **k): pass

  module = StateActorCritic(action_dim=6, hidden_shapes=(16, 16),
                            append_hidden_shapes=(16, 16))
  cfg = PPOConfig(plr=1e-3, vlr=1e-3, opt_epochs=1, batch_size=8,
                  epoch_frames=16, max_episode_frames=999, num_epochs=1)
  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4,
                   seed=0, logger=_NullLogger(), save_dir="/tmp/v4l_curric",
                   obs_norm=True, env_time_limit=meta["horizon"])
  assert agent.curriculum
  agent.total_frames = 0
  assert int(agent._curriculum_episode_cap()) == 1000
  # halfway through the ramp (per-env steps * 8 = 5M of 10M): 1000+1000*t^3
  agent.total_frames = 4 * (5_000_000 // 8)
  assert int(agent._curriculum_episode_cap()) == 1000 + int(1000 * 0.5**3)
  agent.total_frames = 4 * 10_000_000
  assert int(agent._curriculum_episode_cap()) == 2000


def test_rew_norm_rejected_not_ignored():
  import pytest
  with pytest.raises(NotImplementedError):
    get_env("A1MoveGround", {"rew_norm": {}, "env_build": {
        "motor_control_mode": "POSITION", "terrain_type": "plane"}})


def test_reward_scale_scales_training_rewards():
  """RewardShift semantics (base_wrapper.py:32-41): the collector's
  rewards and episode returns scale by reward_scale during training."""
  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, diagonal_act=True,
      terrain_type="plane", settle_steps=20))
  module = StateActorCritic(action_dim=6, hidden_shapes=(16, 16),
                            append_hidden_shapes=(16, 16))
  params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, env.obs_dim)))

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  def build(scale):
    return jax.jit(rollout_lib.make_rollout_fn(
        env, apply_pi, apply_v, horizon=5, max_episode_frames=999,
        discount=0.99, proprio_dim=env.cfg.proprio_dim, obs_norm=False,
        action_low=env.action_low, action_high=env.action_high,
        reward_scale=scale))

  cs0 = rollout_lib.init_collector(env, 3, jax.random.PRNGKey(1))
  _, t1, _ = build(1.0)(params, cs0)
  _, t2, _ = build(2.0)(params, cs0)
  np.testing.assert_allclose(np.asarray(t2.rewards),
                             2.0 * np.asarray(t1.rewards), rtol=1e-6)
