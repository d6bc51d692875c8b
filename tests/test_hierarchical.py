"""End-to-end hierarchical collector test (VERDICT r1 item 8d).

Reference: torchrl/collector/on_policy_hierarchical.py:11-95 — a 1-dim
high-level policy commands a heading; a frozen low-level policy walks;
PPO trains the high level on the env reward.  Here the two-level act
path runs inside the fused rollout scan
(collector/hierarchical.py make_hierarchical_rollout_fn) and one full
PPO epoch must execute and move the high-level parameters.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.algo.ppo import PPOConfig, PPOLearner
from vision4leg_tpu.collector import hierarchical, rollout as rollout_lib
from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
from vision4leg_tpu.models.actor_critic import StateActorCritic

NUM_ENVS = 4
HORIZON = 8


def test_hierarchical_ppo_epoch():
  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, add_last_action_input=True,
      no_displacement=True, diagonal_act=True, terrain_type="plane",
      settle_steps=20))
  proprio = env.cfg.proprio_dim

  # frozen low level: motor policy on the RandoDir layout
  # [cos, sin, proprio] (env_builder.py:110-156)
  low = StateActorCritic(action_dim=6, hidden_shapes=(32, 32),
                         append_hidden_shapes=(32, 32))
  low_params = low.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, proprio + 2)))

  def apply_low_pi(p, x):
    return low.apply(p, x, method=low.pi)

  # high level: 1-dim heading action over the full obs
  high = StateActorCritic(action_dim=1, hidden_shapes=(32, 32),
                          append_hidden_shapes=(32, 32))
  high_params = high.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, env.obs_dim)))

  def apply_high_pi(p, x):
    return high.apply(p, x, method=high.pi)

  def apply_high_v(p, x):
    return high.apply(p, x, method=high.v)

  rollout = hierarchical.make_hierarchical_rollout_fn(
      env, apply_high_pi, apply_high_v, apply_low_pi, low_params,
      horizon=HORIZON, max_episode_frames=6, discount=0.99,
      proprio_dim=proprio, obs_norm=True)
  cs = rollout_lib.init_collector(env, NUM_ENVS, jax.random.PRNGKey(2))
  cs, traj, last_value = jax.jit(rollout)(high_params, cs)

  # the buffer sees HIGH-level actions (on_policy_hierarchical.py:56-67)
  assert traj.acts.shape == (HORIZON, NUM_ENVS, 1)
  assert traj.means.shape == (HORIZON, NUM_ENVS, 1)
  assert np.isfinite(np.asarray(traj.log_probs)).all()
  assert np.isfinite(np.asarray(traj.rewards)).all()

  cfg = PPOConfig(plr=1e-3, vlr=1e-3, opt_epochs=1, batch_size=16,
                  epoch_frames=HORIZON * NUM_ENVS, max_episode_frames=6,
                  num_epochs=2)
  learner = PPOLearner(cfg, apply_high_pi, apply_high_v, high_params)
  ts = learner.init_state(high_params)
  ts2, metrics = jax.jit(learner.update_per_epoch)(
      ts, traj, last_value, jax.random.PRNGKey(3))
  assert np.isfinite(float(metrics["Training/policy_loss"]))
  assert np.isfinite(float(metrics["Training/vf_loss"]))
  # high-level params moved
  before = jax.tree.leaves(ts.params)
  after = jax.tree.leaves(ts2.params)
  assert any(not np.allclose(np.asarray(b), np.asarray(a))
             for b, a in zip(before, after))
