"""Trajectory-generator wrapper: a built-in gait signal under the policy.

Reference: `vision4leg/envs/env_wrappers/trajectory_generator_wrapper_env.py`
(TrajectoryGeneratorWrapperEnv, :23-92) — a LocomotionGymEnv wrapper whose
generator transforms the NN action (`get_action(time_since_reset, action)`)
and may modify/extend the observation (`get_observation(obs)`); typical
generators are PMTG and open-loop signals.  The reference validates the
interface at construction and raises ValueError otherwise (:41-46).

TPU-native shape: the generator is pure — its state lives in the wrapper
carry, `get_action` maps (tg_state, time, policy_action) -> (tg_state,
motor_action), and everything composes with `A1GymEnv`'s jittable
reset/step so the wrapped env still vmaps/scans.  Time-since-reset is
derived from the env's step counter (the reference reads
`robot.GetTimeSinceReset()`, minitaur.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vision4leg_tpu.robots import a1_params as P


@struct.dataclass
class TGState:
  """Open-loop generator state: gait phase in [0, 2*pi)."""
  phase: jnp.ndarray  # () f32


class OpenloopGaitGenerator:
  """Open-loop sinusoidal trot signal with residual policy actions.

  The "openloop signals" family the reference wrapper names (:33): the
  generator emits a trot-phased motor-angle pattern around the standing
  pose and the policy acts as a residual on top (PMTG-style).  The phase
  advances by `2*pi*frequency_hz*control_dt` per env step and is exposed
  to the policy as (cos, sin) appended to the observation.
  """

  # two extra observation channels: (cos phase, sin phase)
  extra_obs_dim = 2

  def __init__(self, frequency_hz: float = 1.25,
               swing_amplitude: float = 0.2,
               extension_amplitude: float = 0.4,
               control_dt: float = 0.025):
    self.frequency_hz = frequency_hz
    self.swing_amplitude = swing_amplitude
    self.extension_amplitude = extension_amplitude
    self.control_dt = control_dt
    # trot: diagonal pairs (FR, RL) in phase, (FL, RR) in antiphase,
    # reference leg order FR FL RR RL (a1.py MOTOR_NAMES)
    self._leg_phase_offset = jnp.array([0.0, jnp.pi, jnp.pi, 0.0])

  def reset(self) -> TGState:
    return TGState(phase=jnp.zeros(()))

  def get_action(self, tg_state: TGState, time_since_reset: jnp.ndarray,
                 action: jnp.ndarray) -> Tuple[TGState, jnp.ndarray]:
    """(tg_state, t, policy residual 12) -> (tg_state', motor angles 12)."""
    del time_since_reset  # phase is integrated in tg_state (same cadence)
    leg_phase = tg_state.phase + self._leg_phase_offset          # (4,)
    swing = self.swing_amplitude * jnp.sin(leg_phase)            # thigh
    # lift the leg only in the swing half of the cycle (sin > 0)
    lift = self.extension_amplitude * jnp.maximum(
        jnp.sin(leg_phase), 0.0)                                 # knee flex
    open_loop = jnp.stack(
        [jnp.zeros(4), swing, lift], axis=1).reshape(12)         # hip,up,low
    motor = P.INIT_MOTOR_ANGLES + open_loop + action
    motor = jnp.clip(motor, P.JOINT_LOWER, P.JOINT_UPPER)
    new_phase = jnp.mod(
        tg_state.phase + 2.0 * jnp.pi * self.frequency_hz * self.control_dt,
        2.0 * jnp.pi)
    return TGState(phase=new_phase), motor

  def get_observation(self, tg_state: TGState,
                      obs: jnp.ndarray) -> jnp.ndarray:
    phase_obs = jnp.array([jnp.cos(tg_state.phase),
                           jnp.sin(tg_state.phase)])
    return jnp.concatenate([obs, phase_obs])


class TrajectoryGeneratorWrapper:
  """Compose `A1GymEnv` with a trajectory generator, reference-style.

  Mirrors TrajectoryGeneratorWrapperEnv semantics: the generator is
  validated for `get_action`/`get_observation` at construction
  (ValueError otherwise, :41-46), reset on env reset (:66-69), applied
  to every action before the env sees it (:87-89), and given the chance
  to modify every observation (:61-62, :91).  State threads through the
  (env_state, tg_state) carry so the wrapped env stays jittable.
  """

  def __init__(self, env, trajectory_generator):
    if (not hasattr(trajectory_generator, "get_action")
        or not hasattr(trajectory_generator, "get_observation")):
      raise ValueError(
          "The controller does not have the necessary interface(s) "
          "implemented.")
    self.env = env
    self.tg = trajectory_generator

  @property
  def obs_dim(self) -> int:
    return self.env.obs_dim + getattr(self.tg, "extra_obs_dim", 0)

  def reset(self, key: jax.Array):
    tg_state = self.tg.reset()
    env_state, obs = self.env.reset(key)
    return (env_state, tg_state), self.tg.get_observation(tg_state, obs)

  def step(self, carry, action: jnp.ndarray):
    env_state, tg_state = carry
    cfg = self.env.cfg
    time_since_reset = (env_state.step_counter.astype(jnp.float32)
                        * cfg.time_step_s * cfg.num_action_repeat)
    tg_state, motor_action = self.tg.get_action(tg_state, time_since_reset,
                                                action)
    env_state, obs, rew, done, info = self.env.step(env_state, motor_action)
    return ((env_state, tg_state), self.tg.get_observation(tg_state, obs),
            rew, done, info)
