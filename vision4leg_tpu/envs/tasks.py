"""Locomotion tasks: reward + termination, as pure functions.

Reference: vision4leg/envs/env_wrappers/move_forward_task.py (MoveForwardTask)
and goal_task.py (GoalTask).  Reward math reproduced exactly:

  reward = move_forward_coeff * along_vel_reward
           + energy_weight(-0.005) * dot(tau, tau) * time_step
           - orientation_penalty * |quat - init_quat|^2
           + alive_reward (+ fall_reward if done) (+ subgoal bonuses)

with along_vel_reward = target_vel^2 - (clip(v_along) - target_vel)^2
  - other_direction_penalty * |v_perp|^2 - z_penalty * v_z^2
(move_forward_task.py:193-227), velocities measured by base-position finite
differences over the control step.

Termination (move_forward_task.py:94-134): height < height_fall_coeff, or
rot-matrix z-axis z-component < 0.6, or (check_contact) any non-foot contact
while speed <= 0.05.

GoalTask (goal_task.py): adds progress-toward-goal distance reward with
coefficient goal_coeff.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from flax import struct

from vision4leg_tpu.physics import maths


@struct.dataclass
class TaskState:
  last_base_pos: jnp.ndarray      # (3,)
  current_base_pos: jnp.ndarray   # (3,)
  subgoal_trackers: jnp.ndarray   # (S,) 1.0 = still active
  target_vel_dir: jnp.ndarray     # (2,)


class TaskConfig(NamedTuple):
  """Static task parameters (env_builder.py:266-294 wiring)."""
  goal: bool = False
  z_constrain: bool = False
  move_forward_coeff: float = 1.0
  other_direction_penalty: float = 0.0
  z_penalty: float = 0.0
  orientation_penalty: float = 0.0
  time_step_s: float = 0.0025
  num_action_repeat: int = 16
  height_fall_coeff: float = 0.2
  alive_reward: float = 0.1
  fall_reward: float = 0.0
  target_vel: float = 1.0
  check_contact: bool = False
  subgoal_reward: float | None = None
  goal_coeff: float = 10.0
  energy_weight: float = -0.005
  subgoal_radius: float = 0.2


def init_task_state(base_pos: jnp.ndarray, num_subgoals: int) -> TaskState:
  return TaskState(
      last_base_pos=base_pos,
      current_base_pos=base_pos,
      subgoal_trackers=jnp.ones(num_subgoals),
      target_vel_dir=jnp.array([1.0, 0.0]),
  )


def update(ts: TaskState, base_pos: jnp.ndarray) -> TaskState:
  """MoveForwardTask.update (move_forward_task.py:89-92)."""
  return ts.replace(last_base_pos=ts.current_base_pos,
                    current_base_pos=base_pos)


def done(cfg: TaskConfig, ts: TaskState, base_pos: jnp.ndarray,
         quat_wxyz: jnp.ndarray, nonfoot_contact: jnp.ndarray) -> jnp.ndarray:
  """Termination check (move_forward_task.py:94-134)."""
  rot_mat = maths.quat_to_mat(quat_wxyz)
  rot_fall = rot_mat[2, 2] < 0.6
  height_fall = base_pos[2] < cfg.height_fall_coeff
  # NaN-robust: comparisons with NaN are False, so a diverged env would
  # otherwise never terminate and its NaNs would propagate through the
  # rollout (the reference kills on NaN instead: collector/base.py:68-70,
  # minitaur.py:418-429); here it terminates and partial-resets
  height_fall = height_fall | ~jnp.isfinite(base_pos).all() \
      | ~jnp.isfinite(quat_wxyz).all()
  if cfg.z_constrain:
    height_fall = height_fall | (base_pos[2] > 0.8)
  d = jnp.array(False)
  if cfg.check_contact:
    dt = cfg.time_step_s * cfg.num_action_repeat
    speed = jnp.linalg.norm(
        (ts.current_base_pos - ts.last_base_pos) / dt)
    d = nonfoot_contact & (speed <= 0.05)
  return height_fall | rot_fall | d


def reward(cfg: TaskConfig, ts: TaskState, quat_xyzw: jnp.ndarray,
           motor_torques: jnp.ndarray, is_done: jnp.ndarray,
           subgoal_centers: jnp.ndarray,
           goal_pos: jnp.ndarray):
  """Reward (move_forward_task.py:136-187 / goal_task.py:136-200).

  quat_xyzw: base orientation in pybullet order (the orientation penalty
  compares against init quat [0,0,0,1], move_forward_task.py:65,229-240).

  Returns (reward, new_subgoal_trackers).
  """
  dt = cfg.time_step_s * cfg.num_action_repeat
  vel = (ts.current_base_pos - ts.last_base_pos) / dt
  xy_speed = vel[:2]
  along = jnp.dot(xy_speed, ts.target_vel_dir)
  per = xy_speed - along * ts.target_vel_dir
  along = jnp.minimum(along, cfg.target_vel)
  along_reward = cfg.target_vel ** 2 - (along - cfg.target_vel) ** 2
  forward_reward = (along_reward
                    - cfg.other_direction_penalty * jnp.sum(per * per)
                    - cfg.z_penalty * vel[2] ** 2)

  energy_reward = jnp.dot(motor_torques, motor_torques) * cfg.time_step_s
  init_q = jnp.array([0.0, 0.0, 0.0, 1.0])
  orientation_reward = jnp.sum((init_q - quat_xyzw) ** 2)

  r = (forward_reward * cfg.move_forward_coeff
       + energy_reward * cfg.energy_weight
       - cfg.orientation_penalty * orientation_reward
       + cfg.alive_reward)

  if cfg.goal:
    # goal_task.py:160-178: reward progress toward the goal position
    last_d = jnp.linalg.norm(ts.last_base_pos[:2] - goal_pos[:2])
    cur_d = jnp.linalg.norm(ts.current_base_pos[:2] - goal_pos[:2])
    r = r + cfg.goal_coeff * (last_d - cur_d) / dt

  r = r + jnp.where(is_done, cfg.fall_reward, 0.0)

  trackers = ts.subgoal_trackers
  if cfg.subgoal_reward is not None:
    dis = jnp.linalg.norm(
        subgoal_centers - ts.current_base_pos[:2][None], axis=1)
    hit = (dis < cfg.subgoal_radius) * trackers
    r = r + cfg.subgoal_reward * jnp.sum(hit)
    trackers = trackers * (1.0 - hit)
  return r, trackers
