"""A1MoveGroundMPC: RL environment whose action is a high-level velocity
command executed by the on-device convex-MPC locomotion controller.

Reference: vision4leg/envs/locomotion_gym_mpc_env_with_rich_information.py
  * action = (lin_speed, ang_speed), lin clipped to >= -0.05 (:480-484)
  * each env step runs `policy_freq` controller ticks of
    {gait/estimator update -> swing PD + stance MPC torques ->
     robot.Step(action_repeat substeps)} (:486-489)
  * observation = sorted {com_vel (world), imu rpy} + raw_img frames
    (:574-588), or image-only when vision_only
  * task = MoveForward/Goal with num_action_repeat * policy_freq scaling
    (env_builder.py:420-455)

Everything — including the condensed-QP MPC solve (mpc/convex_mpc.py) —
is jitted and vmapped over parallel environments: batched model-predictive
control on the TPU, vs. the reference's one C++ QP per env process.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vision4leg_tpu.envs import camera as cam
from vision4leg_tpu.envs import tasks, terrain as terr
from vision4leg_tpu.envs.env import EnvConfig, EnvState, A1GymEnv
from vision4leg_tpu.mpc import controllers as ctrl
from vision4leg_tpu.mpc import convex_mpc
from vision4leg_tpu.mpc import leg_kinematics as lk
from vision4leg_tpu.mpc.convex_mpc import MpcConfig
from vision4leg_tpu.physics import engine, maths
from vision4leg_tpu.robots import a1, a1_params as P

MPC_WEIGHTS = (5, 5, 0.2, 0, 0, 10, 0., 0., 1., 1., 1., 0., 0)


@dataclasses.dataclass(frozen=True)
class MpcEnvConfig(EnvConfig):
  policy_freq: int = 10
  vision_only: bool = False

  @property
  def action_dim(self) -> int:
    return 2

  @property
  def proprio_dim(self) -> int:
    return 0 if self.vision_only else 6  # com_vel(3) + rpy(3)


@struct.dataclass
class MpcEnvState:
  robot: a1.RobotState
  dyn: a1.DynamicsParams
  terrain: terr.TerrainState
  task: tasks.TaskState
  controller: ctrl.ControllerState
  current_time: jnp.ndarray      # () controller clock (s)
  last_action: jnp.ndarray       # (2,)
  last_base_pos: jnp.ndarray
  frames: jnp.ndarray
  frame_idx: jnp.ndarray
  interp_delay: jnp.ndarray
  step_counter: jnp.ndarray
  key: jax.Array


class A1MPCGymEnv:
  """Functional MPC env; reuses A1GymEnv's terrain/camera plumbing."""

  def __init__(self, cfg: MpcEnvConfig):
    from vision4leg_tpu.robots import a1_model
    self.cfg = cfg
    self.model = a1_model.build(dt=cfg.time_step_s / cfg.substeps)
    self._flat = cfg.terrain_type in terr.FLAT_TERRAINS
    self._gen_terrain = terr.TERRAIN_GENERATORS[cfg.terrain_type]
    init = np.array(terr.INIT_POSITION[cfg.terrain_type], np.float32)
    self._init_pos = jnp.asarray(init)
    clip = np.asarray(cfg.clip_num if cfg.clip_num is not None
                      else (0.3, 0.4), np.float32)
    self.action_low = jnp.asarray(-clip)
    self.action_high = jnp.asarray(clip)
    self.mpc_cfg = MpcConfig(
        mass=float(P.MPC_BODY_MASS),
        inertia=tuple(float(x) for x in P.MPC_BODY_INERTIA),
        qp_weights=MPC_WEIGHTS,
        horizon=10, timestep=0.025, alpha=1e-5, admm_iters=40)
    # frozen Ruiz scaling + canonical KKT inverse for the warm-started
    # per-tick QP (convex_mpc.py warm-path block comment; the cold
    # factorization was 89% of the env step on the v5e chip)
    self.mpc_canon = convex_mpc.canonical_constants(self.mpc_cfg)
    self.gait_cfg = ctrl.GaitConfig()

  @property
  def obs_dim(self) -> int:
    return self.cfg.proprio_dim + self.cfg.image_dim

  def _contact_fn(self, terrain, dyn, base_xy=None):
    return A1GymEnv._contact_fn(self, terrain, dyn, base_xy)

  _pruned_boxes = A1GymEnv._pruned_boxes
  _pruned_spheres = A1GymEnv._pruned_spheres
  NEAR_BOXES = A1GymEnv.NEAR_BOXES
  kernel_capable = A1GymEnv.kernel_capable
  mesh = None

  # ------------------------------------------------------------------
  def reset(self, key: jax.Array) -> Tuple[MpcEnvState, jnp.ndarray]:
    cfg = self.cfg
    k_ter, k_pos, k_frame, k_interp, k_state = jax.random.split(key, 5)
    terrain = self._gen_terrain(k_ter)
    dyn = a1.default_dynamics(self.model)

    pos = self._init_pos
    if cfg.random_init_range > 0:
      jitter = jax.random.uniform(k_pos, (2,), minval=-cfg.random_init_range,
                                  maxval=cfg.random_init_range)
      pos = pos.at[:2].add(jitter)

    phys = engine.zero_state(self.model).replace(
        pos=pos, joint_q=jnp.asarray(P.INIT_MOTOR_ANGLES, jnp.float32))
    rs = a1.init_robot_state(self.model, phys)
    contact_fn = self._contact_fn(terrain, dyn)
    model_d = a1.apply_dynamics(self.model, dyn)
    cmd = jnp.asarray(P.INIT_MOTOR_ANGLES, jnp.float32)

    def settle(rs, _):
      rs, _ = a1.substep(model_d, rs, cmd, dyn, contact_fn)
      return rs, None

    rs, _ = jax.lax.scan(settle, rs, None,
                         length=cfg.settle_steps * cfg.substeps)
    rs = a1.init_robot_state(self.model, rs.phys)

    feet = lk.foot_positions_base_frame(rs.phys.joint_q)
    controller = ctrl.init_controller_state(
        feet, rs.phys.joint_q,
        qp_warm=convex_mpc.init_warm_state(self.mpc_canon))

    frame_idx = jnp.arange(4, dtype=jnp.int32) * cfg.frame_extract
    state = MpcEnvState(
        robot=rs, dyn=dyn, terrain=terrain,
        task=tasks.init_task_state(rs.phys.pos, terr.NUM_SUBGOALS),
        controller=controller,
        current_time=jnp.zeros(()),
        last_action=jnp.zeros(2),
        last_base_pos=rs.phys.pos,
        frames=(jnp.zeros((cfg.num_stored_frames, 64, 64))
                if cfg.get_image else jnp.zeros((1, 1, 1))),
        frame_idx=frame_idx,
        interp_delay=jnp.zeros((), jnp.int32),
        step_counter=jnp.zeros((), jnp.int32),
        key=k_state,
    )
    if cfg.get_image:
      state = A1GymEnv._capture_frame(self, state, reset=True)
    return state, self._observation(state)

  def _capture_frame(self, state, reset):
    return A1GymEnv._capture_frame(self, state, reset)

  def _image_obs(self, state):
    return A1GymEnv._image_obs(self, state)

  def _observation(self, state: MpcEnvState) -> jnp.ndarray:
    cfg = self.cfg
    parts = []
    if not cfg.vision_only:
      # sorted keys: "com_vel" < "imu" (:581-588); com_vel is the estimator's
      # world-frame value; imu is rpy
      com_vel_body = ctrl.com_velocity_body(state.controller)
      rpy = maths.quat_to_rpy(state.robot.phys.quat)
      com_vel_world = maths.quat_rotate(state.robot.phys.quat, com_vel_body)
      parts.append(com_vel_world)
      parts.append(rpy)
    if cfg.get_image:
      parts.append(self._image_obs(state))
    return jnp.concatenate(parts).astype(jnp.float32)

  # ------------------------------------------------------------------
  def _controller_tick(self, state: MpcEnvState, lin_speed, ang_speed,
                       contact_fn):
    """One controller update + robot.Step(action_repeat substeps)."""
    cfg = self.cfg
    rs = state.robot
    cs = state.controller

    # foot contacts from the physics (GetFootContacts)
    kin = engine.fwd_kinematics(self.model, rs.phys)
    cpos, cvel, _ = engine.contact_points_world(self.model, rs.phys, kin)
    _, pen = contact_fn(cpos, cvel, self.model.cp_radius)
    foot_contacts = (jnp.max(pen[:4], axis=-1) > 0.0)

    cs = ctrl.gait_update(self.gait_cfg, cs, state.current_time,
                          foot_contacts)
    # estimator: base velocity in body frame
    vel_body = maths.quat_rotate_inv(rs.phys.quat, rs.phys.lin)
    cs = ctrl.estimator_update(cs, vel_body)

    rpy = maths.quat_to_rpy(rs.phys.quat)
    rpy_rate = maths.quat_rotate_inv(rs.phys.quat, rs.phys.ang)
    feet = lk.foot_positions_base_frame(rs.phys.joint_q)

    desired_speed = jnp.concatenate([lin_speed[:2], jnp.zeros(1)])
    cs, swing_q = ctrl.swing_action(cs, self.gait_cfg, rpy_rate[2],
                                    desired_speed, ang_speed, feet)
    stance_tau, contact_state, cs = ctrl.stance_action_warm(
        self.mpc_cfg, self.mpc_canon, cs, rpy, rpy_rate, feet,
        rs.phys.joint_q, desired_speed, ang_speed)

    # hybrid command: swing joints PD to swing_q, stance joints feedforward
    stance_mask = jnp.repeat(contact_state.astype(jnp.float32), 3)

    def substep_body(rs, _):
      pd_tau = a1.motor_torques(rs.phys.joint_q, rs.phys.joint_qd, swing_q,
                                state.dyn)
      tau = (1.0 - stance_mask) * pd_tau + stance_mask * stance_tau
      phys, pen2, _ = engine.step(
          a1.apply_dynamics(self.model, state.dyn), rs.phys, tau, contact_fn)
      hist = jnp.concatenate(
          [a1._true_record(phys)[None], rs.obs_hist[:-1]], axis=0)
      return rs.replace(phys=phys, obs_hist=hist, observed_torques=tau,
                        step_counter=rs.step_counter + 1), None

    rs, _ = jax.lax.scan(substep_body, rs, None,
                         length=cfg.num_action_repeat * cfg.substeps)
    new_time = state.current_time + cfg.num_action_repeat * cfg.time_step_s
    return state.replace(robot=rs, controller=cs, current_time=new_time)

  def step(self, state: MpcEnvState, action: jnp.ndarray):
    cfg = self.cfg
    action = jnp.clip(action, self.action_low, self.action_high)
    key, k_frame = jax.random.split(state.key)
    state = state.replace(key=key, last_action=action,
                          last_base_pos=state.robot.phys.pos)

    lin = jnp.concatenate([action[0:1], jnp.zeros(2)])
    lin = jnp.maximum(lin, -0.05)          # :483 clip
    ang = action[1]

    contact_fn = self._contact_fn(state.terrain, state.dyn,
                                  base_xy=state.robot.phys.pos[:2])

    # refresh the warm solver's KKT inverse ONCE per env step (exact LU
    # from the step-start pose); the per-tick Newton-Schulz then only
    # tracks intra-step drift — see convex_mpc.py warm-path comment
    rpy0 = maths.quat_to_rpy(state.robot.phys.quat)
    feet0 = lk.foot_positions_base_frame(state.robot.phys.joint_q)
    kinv = convex_mpc.kkt_inverse(self.mpc_cfg, self.mpc_canon,
                                  rpy0.at[2].set(0.0), feet0)
    state = state.replace(controller=state.controller.replace(
        qp_warm=state.controller.qp_warm._replace(kinv=kinv)))

    def tick(state, _):
      return self._controller_tick(state, lin, ang, contact_fn), None

    state, _ = jax.lax.scan(tick, state, None, length=cfg.policy_freq)

    task_state = tasks.update(state.task, state.robot.phys.pos)
    # non-foot contact check at the end
    kin = engine.fwd_kinematics(self.model, state.robot.phys)
    cpos, cvel, _ = engine.contact_points_world(self.model, state.robot.phys,
                                                kin)
    _, pen = contact_fn(cpos, cvel, self.model.cp_radius)
    nonfoot = (jnp.any((pen[..., 0] > 0) & (self.model.cp_is_foot < 0.5))
               | jnp.any(pen[..., 1] > 0))

    task_cfg = tasks.TaskConfig(
        goal=cfg.goal, z_constrain=cfg.z_constrain,
        other_direction_penalty=cfg.other_direction_penalty,
        z_penalty=cfg.z_penalty, time_step_s=cfg.time_step_s,
        num_action_repeat=cfg.num_action_repeat * cfg.policy_freq,
        alive_reward=cfg.alive_reward, fall_reward=cfg.fall_reward,
        target_vel=cfg.target_vel, check_contact=cfg.check_contact,
        subgoal_reward=cfg.subgoal_reward, goal_coeff=cfg.goal_coeff)
    is_done = tasks.done(task_cfg, task_state, state.robot.phys.pos,
                         state.robot.phys.quat, nonfoot)
    quat_xyzw = maths.wxyz_to_xyzw(state.robot.phys.quat)
    rew, trackers = tasks.reward(
        task_cfg, task_state, quat_xyzw, state.robot.observed_torques,
        is_done, state.terrain.subgoals, state.terrain.goal_pos)
    # NaN kill-switch, TPU-native form of the reference collector's
    # guard (torchrl/collector/base.py:68-70 asserts and dies on NaN;
    # under jit we terminate + sanitize instead): a diverged physics or
    # controller state ends the episode with the fall penalty and a
    # finite reward, so one bad env cannot poison the PPO update buffer.
    # tasks.done already fires on nonfinite pos/quat; the reward can
    # still be NaN through observed_torques before the reset lands.
    is_done = is_done | ~jnp.isfinite(rew)
    rew = jnp.where(jnp.isfinite(rew), rew,
                    jnp.asarray(cfg.fall_reward, rew.dtype))
    state = state.replace(
        task=task_state.replace(subgoal_trackers=trackers),
        step_counter=state.step_counter + 1)

    if cfg.get_image:
      do_capture = (state.step_counter % cfg.get_image_interval) == 0
      captured = self._capture_frame(state, reset=False)
      state = jax.tree.map(lambda n, o: jnp.where(do_capture, n, o),
                           captured, state)
    # same kill-switch for the observation: a NaN obs in the trajectory
    # buffer reaches the PPO update's log-prob and poisons the params
    # even though the env itself resets next step
    obs = self._observation(state)
    obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
    return state, obs, rew, is_done, {}

  # ------------------------------------------------------------------
  def step_batch(self, states: MpcEnvState, actions: jnp.ndarray):
    """Batched MPC env step (leading env axis on every leaf).

    Semantically equivalent to jax.vmap(self.step) — the rollout
    collector calls this instead so each tick's action-repeat physics
    window runs as ONE Pallas TPU kernel over all envs
    (ops/physics_kernel.py hybrid mode: stance legs apply the MPC
    feedforward torque, swing legs track the Raibert targets under PD)
    instead of ~300 tiny vmapped XLA ops per substep.  The controller
    stack (gait/estimator/swing/warm-QP stance) stays vmapped XLA
    between windows.  Non-flat terrains fall back to the vmapped
    per-env step.  Parity: tests/test_mpc.py::
    test_mpc_step_batch_matches_vmap_step."""
    from vision4leg_tpu.ops import physics_kernel
    cfg = self.cfg
    if not self.kernel_capable:
      return jax.vmap(self.step)(states, actions)

    E = actions.shape[0]
    acts = jnp.clip(actions, self.action_low, self.action_high)
    keys = jax.vmap(lambda k: jax.random.split(k))(states.key)
    states = states.replace(key=keys[:, 0], last_action=acts,
                            last_base_pos=states.robot.phys.pos)
    lin = jnp.maximum(
        jnp.pad(acts[:, :1], ((0, 0), (0, 2))), -0.05)       # (E, 3) :483
    ang = acts[:, 1]

    boxes = jax.vmap(self._pruned_boxes)(states.terrain.boxes,
                                         states.robot.phys.pos[:, :2])
    spheres = states.terrain.obstacle_spheres
    if spheres is None:
      spheres = jnp.zeros((E, 0, 5))
    else:
      spheres = jax.vmap(self._pruned_spheres)(
          spheres, states.robot.phys.pos[:, :2])
    fric_ground = states.dyn.lateral_friction * cfg.fric_coeff[0]
    fric_box = states.dyn.lateral_friction

    # per-step exact KKT inverse refresh (see step())
    rpy0 = jax.vmap(maths.quat_to_rpy)(states.robot.phys.quat)
    feet0 = jax.vmap(lk.foot_positions_base_frame)(states.robot.phys.joint_q)
    kinv = jax.vmap(lambda r, f: convex_mpc.kkt_inverse(
        self.mpc_cfg, self.mpc_canon, r.at[2].set(0.0), f))(rpy0, feet0)
    cs0 = states.controller.replace(
        qp_warm=states.controller.qp_warm._replace(kinv=kinv))

    # start-of-step contact read (the first tick's gait input; later
    # ticks reuse the window's post-state penetration, which IS the
    # next tick's start-of-tick world)
    def _pen_now(rs, terrain, dyn):
      kin = engine.fwd_kinematics(self.model, rs.phys)
      cpos, cvel, _ = engine.contact_points_world(self.model, rs.phys, kin)
      cfn = self._contact_fn(terrain, dyn, base_xy=rs.phys.pos[:2])
      _, pen = cfn(cpos, cvel, self.model.cp_radius)
      return pen
    pen0 = jax.vmap(_pen_now)(states.robot, states.terrain, states.dyn)

    sharded = self.mesh is not None and len(self.mesh.devices.flat) > 1
    n_sub = cfg.num_action_repeat * cfg.substeps

    def window(rs_in, cmd_in, dyn_in, b_in, s_in, fg_in, fb_in, tff, tmk):
      return physics_kernel.robot_window_pallas(
          self.model, rs_in, cmd_in, dyn_in, b_in, s_in, fg_in, fb_in,
          n_sub, False, force_kernel=sharded, tau_ff=tff, tau_mask=tmk)

    if sharded:
      from jax.experimental.shard_map import shard_map
      from jax.sharding import PartitionSpec as PS
      axis = self.mesh.axis_names[0]
      spec = PS(axis)
      window = shard_map(
          window, mesh=self.mesh,
          in_specs=(jax.tree.map(lambda _: spec, states.robot), spec,
                    jax.tree.map(lambda _: spec, states.dyn),
                    spec, spec, spec, spec, spec, spec),
          out_specs=(jax.tree.map(lambda _: spec, states.robot), spec),
          check_rep=False)

    def tick(carry, _):
      rs, cs, t, pen = carry
      foot_contacts = jnp.max(pen[:, :4], axis=-1) > 0.0      # (E, 4)
      cs = jax.vmap(lambda c, t_, fc: ctrl.gait_update(
          self.gait_cfg, c, t_, fc))(cs, t, foot_contacts)
      vel_body = jax.vmap(maths.quat_rotate_inv)(rs.phys.quat, rs.phys.lin)
      cs = jax.vmap(ctrl.estimator_update)(cs, vel_body)
      rpy = jax.vmap(maths.quat_to_rpy)(rs.phys.quat)
      rpy_rate = jax.vmap(maths.quat_rotate_inv)(rs.phys.quat, rs.phys.ang)
      feet = jax.vmap(lk.foot_positions_base_frame)(rs.phys.joint_q)
      cs, swing_q = jax.vmap(
          lambda c, yr, l, a, f: ctrl.swing_action(
              c, self.gait_cfg, yr, l, a, f))(
          cs, rpy_rate[:, 2], lin, ang, feet)
      stance_tau, contact_state, cs = jax.vmap(
          lambda c, r, rr, f, q, l, a: ctrl.stance_action_warm(
              self.mpc_cfg, self.mpc_canon, c, r, rr, f, q, l, a))(
          cs, rpy, rpy_rate, feet, rs.phys.joint_q, lin, ang)
      stance_mask = jnp.repeat(contact_state.astype(jnp.float32), 3,
                               axis=-1)                       # (E, 12)
      rs, pen = window(rs, swing_q, states.dyn, boxes, spheres,
                       fric_ground, fric_box, stance_tau, stance_mask)
      return (rs, cs, t + cfg.num_action_repeat * cfg.time_step_s,
              pen), None

    (rs, cs, t, pen), _ = jax.lax.scan(
        tick, (states.robot, cs0, states.current_time, pen0), None,
        length=cfg.policy_freq)
    states = states.replace(robot=rs, controller=cs, current_time=t)

    task_state = jax.vmap(tasks.update)(states.task, rs.phys.pos)
    nonfoot = (jnp.any((pen[..., 0] > 0)
                       & (self.model.cp_is_foot < 0.5)[None], axis=-1)
               | jnp.any(pen[..., 1] > 0, axis=-1))
    task_cfg = tasks.TaskConfig(
        goal=cfg.goal, z_constrain=cfg.z_constrain,
        other_direction_penalty=cfg.other_direction_penalty,
        z_penalty=cfg.z_penalty, time_step_s=cfg.time_step_s,
        num_action_repeat=cfg.num_action_repeat * cfg.policy_freq,
        alive_reward=cfg.alive_reward, fall_reward=cfg.fall_reward,
        target_vel=cfg.target_vel, check_contact=cfg.check_contact,
        subgoal_reward=cfg.subgoal_reward, goal_coeff=cfg.goal_coeff)
    is_done = jax.vmap(lambda ts_, p, q, nf: tasks.done(
        task_cfg, ts_, p, q, nf))(task_state, rs.phys.pos, rs.phys.quat,
                                  nonfoot)
    quat_xyzw = jax.vmap(maths.wxyz_to_xyzw)(rs.phys.quat)
    rew, trackers = jax.vmap(
        lambda ts_, qx, tq, d, sg, gp: tasks.reward(
            task_cfg, ts_, qx, tq, d, sg, gp))(
        task_state, quat_xyzw, rs.observed_torques, is_done,
        states.terrain.subgoals, states.terrain.goal_pos)
    is_done = is_done | ~jnp.isfinite(rew)
    rew = jnp.where(jnp.isfinite(rew), rew,
                    jnp.asarray(cfg.fall_reward, rew.dtype))
    states = states.replace(
        task=task_state.replace(subgoal_trackers=trackers),
        step_counter=states.step_counter + 1)

    if cfg.get_image:
      do_capture = (states.step_counter % cfg.get_image_interval) == 0
      captured = jax.vmap(lambda s: self._capture_frame(s, reset=False))(
          states)
      states = jax.tree.map(
          lambda n, o: jnp.where(
              do_capture.reshape((-1,) + (1,) * (n.ndim - 1)), n, o)
          if n.ndim else jnp.where(do_capture, n, o),
          captured, states)
    obs = jax.vmap(self._observation)(states)
    obs = jnp.where(jnp.isfinite(obs), obs, 0.0)
    return states, obs, rew, is_done, {}
