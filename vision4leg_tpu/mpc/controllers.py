"""Model-based locomotion controller stack, fully jittable.

Reference: mpc_controller/{openloop_gait_generator, com_velocity_estimator,
raibert_swing_leg_controller, torque_stance_leg_controller,
locomotion_controller}.py — recomposed as pure functions over a
`ControllerState` pytree so the whole MPC control loop lives inside the
jitted environment step (batched across envs; the reference runs one
Python/C++ controller per env process).

Leg states use the reference encoding (gait_generator_lib.LegState):
0=SWING, 1=STANCE, 2=EARLY_CONTACT, 3=LOSE_CONTACT.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vision4leg_tpu.mpc import leg_kinematics as lk
from vision4leg_tpu.mpc.convex_mpc import (
    CanonicalScaling, MpcConfig, WarmState, compute_contact_forces,
    compute_contact_forces_warm)
from vision4leg_tpu.robots import a1_params as P

SWING, STANCE, EARLY_CONTACT, LOSE_CONTACT = 0, 1, 2, 3

# trotting gait defaults (locomotion_gym_mpc_env..._STANCE_DURATION_SECONDS
# etc. and locomotion_controller_example.py)
STANCE_DURATION = 0.3
DUTY_FACTOR = 0.6
INIT_PHASE = (0.9, 0.0, 0.0, 0.9)            # FR, FL, RR, RL
INIT_LEG_STATE = (SWING, STANCE, STANCE, SWING)
MPC_BODY_HEIGHT = float(P.MPC_BODY_HEIGHT)   # 0.24
FOOT_CLEARANCE = 0.01
KP_RAIBERT = 0.03                            # raibert _KP
VEL_WINDOW = 20                              # com_velocity_estimator window


class GaitConfig(NamedTuple):
  stance_duration: tuple = (STANCE_DURATION,) * 4
  duty_factor: tuple = (DUTY_FACTOR,) * 4
  initial_leg_phase: tuple = INIT_PHASE
  initial_leg_state: tuple = INIT_LEG_STATE
  contact_detection_phase_threshold: float = 0.1


@struct.dataclass
class ControllerState:
  leg_state: jnp.ndarray                 # (4,) int32 actual state
  desired_leg_state: jnp.ndarray         # (4,) int32
  normalized_phase: jnp.ndarray          # (4,)
  swing_start_foot_pos: jnp.ndarray      # (4, 3) base frame
  vel_window: jnp.ndarray                # (VEL_WINDOW, 3) base-vel history
  vel_count: jnp.ndarray                 # () int32
  swing_joint_angles: jnp.ndarray        # (12,) persisted swing targets
  # warm-started QP state (convex_mpc.WarmState) or None when the cold
  # per-tick solve is used
  qp_warm: WarmState | None = None


def init_controller_state(foot_positions: jnp.ndarray,
                          joint_q: jnp.ndarray,
                          qp_warm: WarmState | None = None
                          ) -> ControllerState:
  return ControllerState(
      leg_state=jnp.asarray(INIT_LEG_STATE, jnp.int32),
      desired_leg_state=jnp.asarray(INIT_LEG_STATE, jnp.int32),
      normalized_phase=jnp.zeros(4),
      swing_start_foot_pos=foot_positions,
      vel_window=jnp.zeros((VEL_WINDOW, 3)),
      vel_count=jnp.zeros((), jnp.int32),
      swing_joint_angles=joint_q,
      qp_warm=qp_warm,
  )


def gait_update(cfg: GaitConfig, cs: ControllerState, current_time,
                foot_contacts) -> ControllerState:
  """OpenloopGaitGenerator.update (openloop_gait_generator.py:118-192)."""
  sd = jnp.asarray(cfg.stance_duration)
  df = jnp.asarray(cfg.duty_factor)
  init_phase = jnp.asarray(cfg.initial_leg_phase)
  init_state = jnp.asarray(cfg.initial_leg_state, jnp.int32)
  next_state = jnp.where(init_state == SWING, STANCE, SWING)
  # fraction of the full cycle spent in the initial state
  init_ratio = jnp.where(init_state == SWING, 1.0 - df, df)

  full_cycle = sd / df
  aug_time = current_time + init_phase * full_cycle
  phase_full = jnp.mod(aug_time, full_cycle) / full_cycle

  in_initial = phase_full < init_ratio
  desired = jnp.where(in_initial, init_state, next_state)
  norm_phase = jnp.where(
      in_initial, phase_full / init_ratio,
      (phase_full - init_ratio) / (1.0 - init_ratio))

  # contact-driven corrections (early/lost contact)
  contacts = foot_contacts.astype(jnp.bool_)
  leg_state = desired
  early = ((desired == SWING)
           & (norm_phase > cfg.contact_detection_phase_threshold)
           & contacts)
  lost = ((desired == STANCE)
          & (norm_phase > cfg.contact_detection_phase_threshold)
          & (~contacts))
  leg_state = jnp.where(early, EARLY_CONTACT, leg_state)
  leg_state = jnp.where(lost, LOSE_CONTACT, leg_state)
  return cs.replace(leg_state=leg_state, desired_leg_state=desired,
                    normalized_phase=norm_phase)


def estimator_update(cs: ControllerState, base_vel_body) -> ControllerState:
  """COMVelocityEstimator (com_velocity_estimator.py:82-139): moving-window
  average of the body-frame base velocity."""
  win = jnp.concatenate([base_vel_body[None], cs.vel_window[:-1]], axis=0)
  return cs.replace(vel_window=win,
                    vel_count=jnp.minimum(cs.vel_count + 1, VEL_WINDOW))


def com_velocity_body(cs: ControllerState) -> jnp.ndarray:
  n = jnp.maximum(cs.vel_count, 1).astype(jnp.float32)
  mask = (jnp.arange(VEL_WINDOW) < cs.vel_count)[:, None]
  return jnp.sum(cs.vel_window * mask, axis=0) / n


def _gen_parabola(phase, start, mid, end):
  """raibert_swing_leg_controller.py:31-55."""
  mid_phase = 0.5
  d1 = mid - start
  d2 = end - start
  d3 = mid_phase**2 - mid_phase
  a = (d1 - d2 * mid_phase) / d3
  b = (d2 * mid_phase**2 - d1) / d3
  return a * phase**2 + b * phase + start


def _swing_foot_trajectory(phase, start_pos, end_pos):
  """raibert_swing_leg_controller.py:57-91."""
  phase = jnp.where(phase <= 0.5,
                    0.8 * jnp.sin(phase * jnp.pi),
                    0.8 + (phase - 0.5) * 0.4)
  x = (1 - phase) * start_pos[0] + phase * end_pos[0]
  y = (1 - phase) * start_pos[1] + phase * end_pos[1]
  mid = jnp.maximum(end_pos[2], start_pos[2]) + 0.1
  z = _gen_parabola(phase, start_pos[2], mid, end_pos[2])
  return jnp.stack([x, y, z])


def swing_action(cs: ControllerState, gait_cfg: GaitConfig, yaw_rate,
                 desired_speed, desired_twisting_speed,
                 foot_positions) -> tuple[ControllerState, jnp.ndarray]:
  """RaibertSwingLegController.get_action (:167-213) -> per-joint desired
  angles (12,) and a mask of which joints are swing-controlled.

  Also performs the phase-switch bookkeeping of update() (:148-166).
  """
  # detect stance->swing switches: remember liftoff foot position
  new_swing = (cs.desired_leg_state == SWING)
  started = new_swing & (cs.normalized_phase < 0.05)
  start_pos = jnp.where(started[:, None], foot_positions,
                        cs.swing_start_foot_pos)

  com_vel = com_velocity_body(cs)
  com_vel = com_vel.at[2].set(0.0)
  hips = jnp.asarray(lk.HIP_ORIGINS)
  sd = jnp.asarray(gait_cfg.stance_duration)

  desired_height = jnp.array([0.0, 0.0, MPC_BODY_HEIGHT - FOOT_CLEARANCE])

  def per_leg(leg):
    hip = hips[leg]
    twisting = jnp.array([-hip[1], hip[0], 0.0])
    hip_h_vel = com_vel + yaw_rate * twisting
    target_hip_vel = desired_speed + desired_twisting_speed * twisting
    target = (hip_h_vel * sd[leg] / 2
              - KP_RAIBERT * (target_hip_vel - hip_h_vel)) \
        - desired_height + jnp.array([hip[0], hip[1], 0.0])
    foot_pos = _swing_foot_trajectory(cs.normalized_phase[leg],
                                      start_pos[leg], target)
    return lk.foot_ik_hip_frame(foot_pos - hip, float(lk.SIDE_SIGN[leg]))

  angles = jnp.concatenate([per_leg(leg) for leg in range(4)])
  # persist swing targets (the reference keeps last swing angles for legs
  # that just transitioned)
  swing_mask = jnp.repeat(new_swing, 3)
  joint_angles = jnp.where(swing_mask, angles, cs.swing_joint_angles)
  cs = cs.replace(swing_start_foot_pos=start_pos,
                  swing_joint_angles=joint_angles)
  return cs, joint_angles


def stance_action(mpc_cfg: MpcConfig, cs: ControllerState, rpy, rpy_rate,
                  foot_positions, joint_q, desired_speed,
                  desired_twisting_speed, friction: float = 0.45):
  """TorqueStanceLegController.get_action (:119-185) -> joint torques (12,)
  for stance legs (zeros elsewhere are masked by the caller)."""
  contact_state = ((cs.desired_leg_state == STANCE)
                   | (cs.desired_leg_state == EARLY_CONTACT)).astype(
                       jnp.int32)
  com_vel = com_velocity_body(cs)
  rpy_yawless = rpy.at[2].set(0.0)
  forces = compute_contact_forces(
      mpc_cfg,
      jnp.zeros(1),                       # com_position: estimate from feet
      com_vel,
      rpy_yawless,
      rpy_rate,
      contact_state,
      foot_positions,
      jnp.full(4, friction),
      jnp.array([0.0, 0.0, MPC_BODY_HEIGHT]),
      jnp.concatenate([desired_speed[:2], jnp.zeros(1)]),
      jnp.zeros(3),
      jnp.array([0.0, 0.0, desired_twisting_speed]),
  )                                        # (4, 3), robot-applied
  jacs = lk.all_leg_jacobians(joint_q)
  # tau = f^T J per leg (minitaur.py:726-737 MapContactForceToJointTorques)
  torques = jnp.einsum("lj,lji->li", forces, jacs)   # (4, 3)
  return torques.reshape(-1), contact_state


def stance_action_warm(mpc_cfg: MpcConfig, canon: CanonicalScaling,
                       cs: ControllerState, rpy, rpy_rate, foot_positions,
                       joint_q, desired_speed, desired_twisting_speed,
                       friction: float = 0.45):
  """stance_action on the warm-started per-tick QP path (the training
  env's hot loop): carried ADMM iterates + Newton-Schulz-tracked KKT
  inverse replace the per-tick factorization — see convex_mpc.py's
  warm-path block comment.  Returns (torques, contact_state, cs') with
  the updated warm state threaded through the ControllerState."""
  contact_state = ((cs.desired_leg_state == STANCE)
                   | (cs.desired_leg_state == EARLY_CONTACT)).astype(
                       jnp.int32)
  com_vel = com_velocity_body(cs)
  rpy_yawless = rpy.at[2].set(0.0)
  forces, warm = compute_contact_forces_warm(
      mpc_cfg, canon, cs.qp_warm,
      jnp.zeros(1),
      com_vel,
      rpy_yawless,
      rpy_rate,
      contact_state,
      foot_positions,
      jnp.full(4, friction),
      jnp.array([0.0, 0.0, MPC_BODY_HEIGHT]),
      jnp.concatenate([desired_speed[:2], jnp.zeros(1)]),
      jnp.zeros(3),
      jnp.array([0.0, 0.0, desired_twisting_speed]),
      warm_iters=mpc_cfg.warm_iters, ns_iters=mpc_cfg.ns_iters,
  )
  jacs = lk.all_leg_jacobians(joint_q)
  torques = jnp.einsum("lj,lji->li", forces, jacs)
  return torques.reshape(-1), contact_state, cs.replace(qp_warm=warm)
