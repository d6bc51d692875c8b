"""A1 robot simulation layer: PD motor model, observation-latency ring
buffer, action repeat — the TPU-native equivalent of
`vision4leg/robots/minitaur.py` + `a1.py` + `laikago_motor.py`.

Reference behaviors reproduced (file:line cite into /root/reference):
  * `Minitaur.Step` (minitaur.py:276-286): action filter -> repeat x
    {ProcessAction (lerp) -> ApplyAction -> stepSimulation ->
    ReceiveObservation}.
  * `LaikagoMotorModel.convert_to_torque` (laikago_motor.py:107-180):
    tau = -kp (q - q_des) - kd qd, scaled by per-motor strength ratios,
    optionally clipped to torque limits.
  * latency emulation (minitaur.py:1192-1234): an observation-history
    deque written every substep; sensor reads linearly interpolate the
    entry `control_latency` seconds in the past.  Here the deque is a
    fixed-size device ring buffer so the whole loop stays inside XLA.
  * motor angle/velocity observations with optional Gaussian noise
    (minitaur.py:1247-1252; zero by default, SENSOR_NOISE_STDDEV=0).

The motor PD uses the *true* (pd_latency = 0) joint state, matching the
reference default (A1 passes no pd_latency; minitaur defaults it to 0).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from vision4leg_tpu.physics import engine, maths
from vision4leg_tpu.physics.model import Model
from vision4leg_tpu.robots import a1_params as P

# observation-history record: [q(12), qd(12), quat_wxyz(4), omega_world(3)]
OBS_HIST_DIM = 31
OBS_HIST_LEN = 20  # covers max control latency 0.04 s / 0.0025 s + blend


@struct.dataclass
class DynamicsParams:
  """Per-episode randomized dynamics (ref: controllable_env_randomizer_
  from_config.py + controllable_env_randomizer_config.py:9-26)."""
  kp: jnp.ndarray              # (12,) PD position gain
  kd: jnp.ndarray              # (12,) PD velocity gain
  strength_ratios: jnp.ndarray  # (12,) motor strength multiplier
  motor_friction: jnp.ndarray  # () viscous damping Nm s/rad
  joint_friction: jnp.ndarray  # () Coulomb torque Nm
  control_latency: jnp.ndarray  # () seconds
  lateral_friction: jnp.ndarray  # () ground friction coefficient
  mass_scale: jnp.ndarray      # (B,) per-body mass multiplier
  inertia_scale: jnp.ndarray   # (B,) per-body inertia multiplier


def default_dynamics(model: Model) -> DynamicsParams:
  nb = model.nbody
  return DynamicsParams(
      kp=jnp.asarray(P.MOTOR_KP, jnp.float32),
      kd=jnp.asarray(P.MOTOR_KD, jnp.float32),
      strength_ratios=jnp.ones(12),
      motor_friction=jnp.zeros(()),
      joint_friction=jnp.zeros(()),
      control_latency=jnp.asarray(0.0),
      lateral_friction=jnp.asarray(1.0),
      mass_scale=jnp.ones(nb),
      inertia_scale=jnp.ones(nb),
  )


def apply_dynamics(model: Model, dyn: DynamicsParams) -> Model:
  """Return a per-episode model with randomized inertial/joint params."""
  return model.replace(
      mass=model.mass * dyn.mass_scale,
      inertia=model.inertia * dyn.inertia_scale[:, None, None],
      joint_damping=model.joint_damping + dyn.motor_friction,
      joint_friction=model.joint_friction + dyn.joint_friction,
  )


@struct.dataclass
class RobotState:
  phys: engine.PhysState
  obs_hist: jnp.ndarray        # (OBS_HIST_LEN, OBS_HIST_DIM), newest first
  observed_torques: jnp.ndarray  # (12,) last substep's PD torque
  last_robot_action: jnp.ndarray  # (12,) for action interpolation
  step_counter: jnp.ndarray    # () int32 substep counter


def _true_record(state: engine.PhysState) -> jnp.ndarray:
  return jnp.concatenate(
      [state.joint_q, state.joint_qd, state.quat, state.ang])


def init_robot_state(model: Model, phys: engine.PhysState) -> RobotState:
  rec = _true_record(phys)
  return RobotState(
      phys=phys,
      obs_hist=jnp.tile(rec[None], (OBS_HIST_LEN, 1)),
      observed_torques=jnp.zeros(12),
      last_robot_action=phys.joint_q,
      step_counter=jnp.zeros((), jnp.int32),
  )


def motor_torques(q: jnp.ndarray, qd: jnp.ndarray, commands: jnp.ndarray,
                  dyn: DynamicsParams) -> jnp.ndarray:
  """POSITION-mode PD (laikago_motor.py:169-179). No torque clip: the
  reference instantiates LaikagoMotorModel without torque_limits."""
  tau = -dyn.kp * (q - commands) - dyn.kd * qd
  return dyn.strength_ratios * tau


def substep(model: Model, rs: RobotState, command: jnp.ndarray,
            dyn: DynamicsParams, contact_fn) -> Tuple[RobotState, jnp.ndarray]:
  """ApplyAction + stepSimulation + ReceiveObservation (minitaur.py:255-274).

  Returns (new robot state, max contact penetration per collision point).
  """
  tau = motor_torques(rs.phys.joint_q, rs.phys.joint_qd, command, dyn)
  phys, penetration, _ = engine.step(model, rs.phys, tau, contact_fn)
  hist = jnp.concatenate([_true_record(phys)[None], rs.obs_hist[:-1]], axis=0)
  return rs.replace(
      phys=phys,
      obs_hist=hist,
      observed_torques=tau,
      step_counter=rs.step_counter + 1,
  ), penetration


def robot_step(model: Model, rs: RobotState, action: jnp.ndarray,
               dyn: DynamicsParams, contact_fn, action_repeat: int,
               interpolate: bool = False):
  """`Minitaur.Step` (minitaur.py:276-286): action_repeat substeps.

  When `interpolate`, the command linearly ramps from the previous action
  to the new one over the repeat window (`ProcessAction`, minitaur.py
  enable_action_interpolation path).
  """
  model_d = apply_dynamics(model, dyn)
  prev = rs.last_robot_action

  def body(rs, i):
    if interpolate:
      lerp = (i.astype(jnp.float32) + 1.0) / action_repeat
      cmd = prev + lerp * (action - prev)
    else:
      cmd = action
    rs, pen = substep(model_d, rs, cmd, dyn, contact_fn)
    return rs, pen

  rs, pens = jax.lax.scan(body, rs, jnp.arange(action_repeat))
  rs = rs.replace(last_robot_action=action)
  # contact flags over the whole window (any substep), per collision point
  contact_any = jnp.max(pens, axis=0) > 0.0
  return rs, contact_any


# ---------------------------------------------------------------------------
# Delayed / noisy sensor reads (ref minitaur.py:1192-1252)
# ---------------------------------------------------------------------------

def _delayed_record(rs: RobotState, latency: jnp.ndarray,
                    dt: float) -> jnp.ndarray:
  """Linear interpolation into the observation ring (minitaur.py:1213-1234)."""
  steps = latency / dt
  n = jnp.clip(jnp.floor(steps).astype(jnp.int32), 0, OBS_HIST_LEN - 2)
  alpha = jnp.clip(steps - n.astype(jnp.float32), 0.0, 1.0)
  older = rs.obs_hist[n + 1]
  newer = rs.obs_hist[n]
  rec = (1.0 - alpha) * newer + alpha * older
  # quaternions need renormalization after lerp
  quat = rec[24:28]
  quat = quat / jnp.maximum(jnp.linalg.norm(quat), 1e-8)
  return rec.at[24:28].set(quat)


def delayed_motor_angles(rs: RobotState, dyn: DynamicsParams,
                         dt: float) -> jnp.ndarray:
  return _delayed_record(rs, dyn.control_latency, dt)[0:12]


def delayed_motor_velocities(rs: RobotState, dyn: DynamicsParams,
                             dt: float) -> jnp.ndarray:
  return _delayed_record(rs, dyn.control_latency, dt)[12:24]


def delayed_rpy_and_rate(rs: RobotState, dyn: DynamicsParams,
                         dt: float) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """(roll, pitch, yaw) and body-frame angular rate, both delayed.

  GetBaseRollPitchYawRate rotates the world angular velocity into the local
  frame (minitaur.py GetTrueBaseRollPitchYawRate).
  """
  rec = _delayed_record(rs, dyn.control_latency, dt)
  quat = rec[24:28]
  omega_w = rec[28:31]
  rpy = maths.quat_to_rpy(quat)
  drpy = maths.quat_rotate_inv(quat, omega_w)
  return rpy, drpy
