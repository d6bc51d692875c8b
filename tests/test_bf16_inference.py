"""Reduced-precision collection forward (make_rollout_fn inference_dtype).

bf16 policy inference must produce finite, f32-typed behavior stats that
track the f32 forward closely (the MXU perf lever), while the stored
trajectory dtypes stay f32 so the PPO update is unchanged.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.collector import rollout as rollout_lib
from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
from vision4leg_tpu.models.actor_critic import StateActorCritic


def test_bf16_rollout_matches_f32_closely():
  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, diagonal_act=True,
      terrain_type="plane", settle_steps=20))
  module = StateActorCritic(action_dim=6, hidden_shapes=(32, 32),
                            append_hidden_shapes=(32, 32))
  params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, env.obs_dim)))

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  def build(dtype):
    return jax.jit(rollout_lib.make_rollout_fn(
        env, apply_pi, apply_v, horizon=6, max_episode_frames=999,
        discount=0.99, proprio_dim=env.cfg.proprio_dim, obs_norm=True,
        action_low=env.action_low, action_high=env.action_high,
        inference_dtype=dtype))

  cs0 = rollout_lib.init_collector(env, 4, jax.random.PRNGKey(1))
  _, t32, lv32 = build(None)(params, cs0)
  _, t16, lv16 = build(jnp.bfloat16)(params, cs0)

  # stored behavior stats stay f32 and finite
  for x in (t16.obs, t16.acts, t16.log_probs, t16.values, t16.means,
            t16.stds):
    assert x.dtype == jnp.float32
    assert np.isfinite(np.asarray(x)).all()

  # the bf16 forward tracks f32: means within bf16 resolution of the
  # activations (the envs diverge over steps as sampled actions differ,
  # so compare only the FIRST step, which shares identical inputs)
  m32, m16 = np.asarray(t32.means[0]), np.asarray(t16.means[0])
  scale = np.maximum(np.abs(m32), 0.05)
  assert np.max(np.abs(m32 - m16) / scale) < 0.08, (
      np.max(np.abs(m32 - m16) / scale))
  v32, v16 = np.asarray(t32.values[0]), np.asarray(t16.values[0])
  assert np.max(np.abs(v32 - v16) / np.maximum(np.abs(v32), 0.05)) < 0.08
