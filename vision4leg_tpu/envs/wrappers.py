"""Functional env-wrapper equivalents that live above A1GymEnv.

Reference wrappers not already folded into the env/collector:
  * CurriculumWrapperEnv (curriculum_wrapper_env.py:27-92): episode length
    ramped 1000 -> 2000 over 10M steps with a cubic schedule.
  * RandoDirWrapper (env_builder.py:110-156): random target direction for
    mount/hill terrains, prepended (cos, sin) observation.
  * RewardShift (base_wrapper.py:32-41): train-time reward scaling.
  * NormRet (base_wrapper.py:125-148): running return normalization.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


def curriculum_episode_length(total_steps: jnp.ndarray,
                              episode_length_start: int = 1000,
                              episode_length_end: int = 2000,
                              curriculum_steps: int = 10_000_000,
                              num_parallel_envs: int = 8) -> jnp.ndarray:
  """Cubic ramp of the episode length (curriculum_wrapper_env.py:31-66)."""
  frac = jnp.clip(
      total_steps.astype(jnp.float32) * num_parallel_envs
      / curriculum_steps, 0.0, 1.0)
  ramp = frac ** 3
  return (episode_length_start
          + ramp * (episode_length_end - episode_length_start)).astype(
              jnp.int32)


@struct.dataclass
class RandoDirState:
  angle: jnp.ndarray        # ()
  step_count: jnp.ndarray   # () int32


def rando_dir_reset(key: jax.Array) -> Tuple[RandoDirState, jnp.ndarray]:
  """New random target direction in [-pi/2, pi/2] (env_builder.py:145-156)."""
  angle = jax.random.uniform(key, (), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
  vec = jnp.array([jnp.cos(angle), jnp.sin(angle)])
  return RandoDirState(angle=angle, step_count=jnp.zeros((), jnp.int32)), vec


def rando_dir_step(state: RandoDirState, key: jax.Array,
                   dir_update_interval: int | None
                   ) -> Tuple[RandoDirState, jnp.ndarray]:
  """Optionally re-draw the direction every `dir_update_interval` steps;
  returns the (cos, sin) vector to prepend to the observation and to use
  as the task's target_vel_dir."""
  count = state.step_count + 1
  if dir_update_interval is None:
    angle = state.angle
  else:
    redraw = (count % dir_update_interval) == 0
    new_angle = jax.random.uniform(key, (), minval=-jnp.pi / 2,
                                   maxval=jnp.pi / 2)
    angle = jnp.where(redraw, new_angle, state.angle)
  vec = jnp.array([jnp.cos(angle), jnp.sin(angle)])
  return RandoDirState(angle=angle, step_count=count), vec


def reward_shift(reward: jnp.ndarray, reward_scale: float,
                 training: bool) -> jnp.ndarray:
  """RewardShift: scale rewards during training only (=1 in all shipped
  configs)."""
  return reward * reward_scale if training else reward


@struct.dataclass
class NormRetState:
  ret: jnp.ndarray       # (E,) running discounted return
  ret_mean: jnp.ndarray  # ()
  ret_var: jnp.ndarray   # ()
  count: jnp.ndarray     # ()


def init_norm_ret(num_envs: int) -> NormRetState:
  return NormRetState(ret=jnp.zeros(num_envs), ret_mean=jnp.zeros(()),
                      ret_var=jnp.ones(()), count=jnp.asarray(1e-4))


def norm_ret_step(state: NormRetState, rewards: jnp.ndarray,
                  dones: jnp.ndarray, discount: float = 0.99,
                  epsilon: float = 1e-4):
  """base_wrapper.py:125-148: normalize rewards by the std of the running
  discounted return."""
  ret = state.ret * discount + rewards
  b_mean = ret.mean()
  b_var = ret.var()
  b_count = rewards.shape[0]
  delta = b_mean - state.ret_mean
  tot = state.count + b_count
  new_mean = state.ret_mean + delta * b_count / tot
  m2 = (state.ret_var * state.count + b_var * b_count
        + delta**2 * state.count * b_count / tot)
  new_var = m2 / tot
  normed = rewards / jnp.sqrt(new_var + epsilon)
  ret = ret * (1.0 - dones)
  return (NormRetState(ret=ret, ret_mean=new_mean, ret_var=new_var,
                       count=tot), normed)
