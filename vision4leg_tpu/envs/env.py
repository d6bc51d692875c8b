"""A1MoveGround environment as pure JAX reset/step functions.

TPU-native rewrite of `LocomotionGymEnv`
(vision4leg/envs/locomotion_gym_env_with_rich_information.py) plus the
wrappers `env_builder.build_a1_ground_env` stacks inside the builder
(ActionRestrain clip, DiagonalAction expansion — env_builder.py:40-107).

Everything — physics, sensors, terrain randomization, the depth camera and
the MMDR frame-delay machinery — is device state; `reset` and `step` are
jittable and vmapped over thousands of environments by the collector.

Step pipeline (reference step(), :409-456):
  1. record last_action; 2. randomize_step (moving obstacles);
  3. robot.Step (action_repeat PD substeps); 4. sensors on_step;
  5. task.update; 6. reward; 7. done; 8. observation assembly (sorted
  sensor-name dict flattening, env_utils.py:27-50 + the raw_img frame
  ring buffer with frame_extract indexing, :549-652).

Observation layout (flattened in sorted-key order):
  [GoalPos(6)?] [HSW(BaseDisplacement)(9)?] [HSW(IMU)(12)]
  [HSW(LastAction)(36)?] [HSW(MotorAngle)(36)] [raw_img(4*64*64)?]
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vision4leg_tpu.envs import camera as cam
from vision4leg_tpu.envs import dynamics_rando, tasks, terrain as terr
from vision4leg_tpu.ops import physics_kernel
from vision4leg_tpu.physics import contact, engine, maths
from vision4leg_tpu.robots import a1, a1_model, a1_params as P
from vision4leg_tpu.robots import action_filter


@dataclasses.dataclass(frozen=True)
class EnvConfig:
  """Static env configuration: mirrors `build_a1_ground_env` kwargs
  (env_builder.py:159-203) so the reference JSON `env_build` section maps
  1:1 onto this."""
  motor_control_mode: str = "POSITION"
  z_constrain: bool = False
  other_direction_penalty: float = 0.0
  z_penalty: float = 0.0
  clip_num: Optional[tuple] = None
  diagonal_act: bool = False
  num_action_repeat: int = 10
  time_step_s: float = 0.001
  add_last_action_input: bool = False
  enable_action_interpolation: bool = False
  enable_action_filter: bool = False
  domain_randomization: bool = False
  get_image: bool = False
  depth_image: bool = False
  depth_norm: bool = False
  grayscale: bool = True
  rgbd: bool = False
  fric_coeff: tuple = (0.8, 0.1, 0.1)
  terrain_type: str = "plane"
  alive_reward: float = 0.1
  fall_reward: float = 0.0
  target_vel: float = 1.0
  random_init_range: float = 0.0
  check_contact: bool = False
  frame_extract: int = 1
  goal: bool = False
  subgoal: bool = False
  goal_coeff: float = 10.0
  subgoal_reward: Optional[float] = None
  no_displacement: bool = False
  get_image_interval: int = 1
  reset_frame_idx: bool = False
  reset_frame_idx_each_step: bool = False
  random_shape: bool = False
  moving: bool = False
  curriculum: bool = False
  interpolation: bool = False
  fixed_delay_observation: bool = False
  empty_image: bool = False
  # RandoDirWrapper (env_builder.py:110-156, 346-348): random target
  # direction in [-pi/2, pi/2], (cos, sin) prepended to the observation
  random_dir: bool = False
  dir_update_interval: Optional[int] = None
  # BaseDisplacementAndRotateSensor instead of BaseDisplacementSensor
  # (env_builder.py:232): displacement + base-quaternion delta (7 ch)
  rotate_sensor: bool = False
  # accepted for config parity; rendering is headless here (the viewers
  # dump the on-device depth stream to mp4 instead of pybullet's logger)
  record_video: bool = False
  # engine knobs (not in the reference: PyBullet internals)
  settle_steps: int = 400
  substeps: int = 1

  def __post_init__(self):
    # mount/hill force contact checking (env_builder.py:263-264)
    if self.terrain_type in ("mount", "random_hill"):
      object.__setattr__(self, "check_contact", True)

  @property
  def action_dim(self) -> int:
    return 6 if self.diagonal_act else 12

  @property
  def num_stored_frames(self) -> int:
    return 4 * self.frame_extract

  @property
  def disp_channels(self) -> int:
    return 7 if self.rotate_sensor else 3

  @property
  def proprio_dim(self) -> int:
    d = 12 + 36  # IMU hist + MotorAngle hist
    if self.random_dir:
      d += 2     # RandoDirWrapper (cos, sin) prefix
    if self.goal:
      d += 6
    if not self.no_displacement:
      d += 3 * self.disp_channels
    if self.add_last_action_input:
      d += 36
    return d

  @property
  def image_dim(self) -> int:
    return 4 * 64 * 64 if self.get_image else 0

  @property
  def obs_dim(self) -> int:
    return self.proprio_dim + self.image_dim


@struct.dataclass
class EnvState:
  robot: a1.RobotState
  dyn: a1.DynamicsParams
  terrain: terr.TerrainState
  task: tasks.TaskState
  motor_hist: jnp.ndarray        # (3, 12) newest first
  imu_hist: jnp.ndarray          # (3, 4)
  disp_hist: jnp.ndarray         # (3, 3) or (3, 7) with rotate_sensor
  last_action_hist: jnp.ndarray  # (3, 12)
  last_action: jnp.ndarray       # (12,)
  last_base_pos: jnp.ndarray     # (3,) for displacement sensor
  last_base_quat: jnp.ndarray    # (4,) xyzw, for rotate_sensor delta
  dir_angle: jnp.ndarray         # () RandoDir target angle
  dir_count: jnp.ndarray         # () int32 RandoDir observation counter
  filter_state: action_filter.FilterState  # Butterworth action filter
  frames: jnp.ndarray            # (num_stored, 64, 64) or (1, 1, 1)
  frame_idx: jnp.ndarray         # (4,) int32
  interp_delay: jnp.ndarray      # () int32
  step_counter: jnp.ndarray      # () int32
  key: jax.Array


class A1GymEnv:
  """Functional environment. Methods are pure; wrap them in jit/vmap."""

  def __init__(self, cfg: EnvConfig):
    if cfg.motor_control_mode != "POSITION":
      raise NotImplementedError("only POSITION control for the RL env "
                                "(matches all shipped configs)")
    self.cfg = cfg
    self.model = a1_model.build(dt=cfg.time_step_s / cfg.substeps)
    self._flat = cfg.terrain_type in terr.FLAT_TERRAINS
    self._gen_terrain = terr.TERRAIN_GENERATORS[cfg.terrain_type]
    init = np.array(terr.INIT_POSITION[cfg.terrain_type], np.float32)
    self._init_pos = jnp.asarray(init)
    # action bounds: ActionRestrain around INIT_MOTOR_ANGLES
    # (env_builder.py:40-56), else raw joint limits
    if cfg.enable_action_filter:
      # sampling at the control rate (minitaur.py:1445-1448)
      self._filter_coeffs = action_filter.make_coeffs(
          1.0 / (cfg.time_step_s * cfg.num_action_repeat))
    if cfg.clip_num is not None:
      clip = np.asarray(cfg.clip_num, np.float32)
      self._act_lb12 = jnp.asarray(P.INIT_MOTOR_ANGLES - clip)
      self._act_ub12 = jnp.asarray(P.INIT_MOTOR_ANGLES + clip)
    else:
      self._act_lb12 = jnp.asarray(P.JOINT_LOWER)
      self._act_ub12 = jnp.asarray(P.JOINT_UPPER)
    # settle eagerly so the template cache is concrete before any tracing
    self._template = None
    self.settled_template()

  # --- public action space (after DiagonalAction, env_builder.py:95-107) ---
  @property
  def action_low(self) -> jnp.ndarray:
    return self._act_lb12[: self.cfg.action_dim]

  @property
  def action_high(self) -> jnp.ndarray:
    return self._act_ub12[: self.cfg.action_dim]

  @property
  def obs_dim(self) -> int:
    return self.cfg.obs_dim

  # contacts are only possible against nearby obstacles; pruning to the
  # NEAR_BOXES closest (by axis-aligned surface distance, so the long
  # fence walls are handled correctly) cuts the per-substep contact cost
  # ~6x on the 52-box corridor terrains
  NEAR_BOXES = 8

  def _pruned_boxes(self, boxes: jnp.ndarray,
                    base_xy: jnp.ndarray) -> jnp.ndarray:
    if boxes.shape[0] <= self.NEAR_BOXES:
      return boxes
    dx = jnp.maximum(jnp.abs(base_xy[0] - boxes[:, 0]) - boxes[:, 3], 0.0)
    dy = jnp.maximum(jnp.abs(base_xy[1] - boxes[:, 1]) - boxes[:, 4], 0.0)
    d = dx * dx + dy * dy + jnp.where(boxes[:, 7] > 0.5, 0.0, 1e9)
    _, idx = jax.lax.top_k(-d, self.NEAR_BOXES)
    return boxes[idx]

  def _pruned_spheres(self, spheres: jnp.ndarray,
                      base_xy: jnp.ndarray) -> jnp.ndarray:
    """Nearest-K sphere obstacles by surface distance (same rationale as
    _pruned_boxes)."""
    if spheres.shape[0] <= self.NEAR_BOXES:
      return spheres
    d = (jnp.linalg.norm(base_xy[None] - spheres[:, :2], axis=-1)
         - spheres[:, 3] + jnp.where(spheres[:, 4] > 0.5, 0.0, 1e9))
    _, idx = jax.lax.top_k(-d, self.NEAR_BOXES)
    return spheres[idx]

  # ------------------------------------------------------------------
  def _contact_fn(self, state_terrain, dyn, base_xy=None):
    h_fn, n_fn = terr.height_fns(state_terrain, self._flat)
    boxes = state_terrain.boxes
    if base_xy is not None:
      boxes = self._pruned_boxes(boxes, base_xy)
    # PyBullet multiplies the two bodies' lateral frictions: ground
    # fric_coeff[0] (env :400-405) x randomized foot friction [0.5, 1.25]
    return contact.make_terrain_contact_fn(
        h_fn, n_fn, boxes=boxes, spheres=state_terrain.obstacle_spheres,
        friction=dyn.lateral_friction * self.cfg.fric_coeff[0],
        box_friction=dyn.lateral_friction)

  def _expand_action(self, action: jnp.ndarray) -> jnp.ndarray:
    """DiagonalAction (env_builder.py:102-107) + ActionRestrain clip."""
    if self.cfg.diagonal_act:
      right, left = jnp.split(action, 2)
      action = jnp.concatenate([right, left, left, right])
    return jnp.clip(action, self._act_lb12, self._act_ub12)

  def settled_template(self) -> a1.RobotState:
    """Settle the robot to contact equilibrium on flat ground ONCE (the
    reference's 2 s standing reset, a1.py:232-247).  Cached and reused by
    in-rollout resets: re-settling inside the compiled rollout would cost
    `settle_steps` substeps per reset per env — 25x the per-step physics."""
    if getattr(self, "_template", None) is not None:
      return self._template
    dyn = a1.default_dynamics(self.model)
    flat = terr.gen_plane(jax.random.PRNGKey(0))
    h_fn, n_fn = terr.flat_height_fn(flat)
    contact_fn = contact.make_terrain_contact_fn(
        h_fn, n_fn, boxes=flat.boxes,
        friction=dyn.lateral_friction * self.cfg.fric_coeff[0])
    model_d = a1.apply_dynamics(self.model, dyn)
    cmd = jnp.asarray(P.INIT_MOTOR_ANGLES, jnp.float32)
    phys = engine.zero_state(self.model).replace(
        pos=jnp.array([0.0, 0.0, 0.32]), joint_q=cmd)
    rs = a1.init_robot_state(self.model, phys)

    @jax.jit
    def settle(rs):
      def body(rs, _):
        rs, _ = a1.substep(model_d, rs, cmd, dyn, contact_fn)
        return rs, None
      rs, _ = jax.lax.scan(
          body, rs, None, length=self.cfg.settle_steps * self.cfg.substeps)
      return a1.init_robot_state(self.model, rs.phys)

    # materialize on host: the cache must hold CONCRETE arrays — if the
    # first call happened under an outer trace, jit-inlining would leak
    # tracers into the cache (observed as UnexpectedTracerError)
    self._template = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                  settle(rs))
    return self._template

  # ------------------------------------------------------------------
  def reset(self, key: jax.Array) -> Tuple[EnvState, jnp.ndarray]:
    cfg = self.cfg
    (k_ter, k_dyn, k_pos, k_frame, k_interp, k_dir,
     k_state) = jax.random.split(key, 7)

    terrain = self._gen_terrain(k_ter)
    dyn = dynamics_rando.maybe_sample(
        self.model, k_dyn, cfg.domain_randomization,
        cfg.fixed_delay_observation)

    pos = self._init_pos
    if cfg.random_init_range > 0:
      jitter = jax.random.uniform(
          k_pos, (2,), minval=-cfg.random_init_range,
          maxval=cfg.random_init_range)
      pos = pos.at[:2].add(jitter)

    # place the pre-settled standing pose at the (jittered) init position,
    # adjusted for local terrain height
    template = self.settled_template()
    h_fn, _ = terr.height_fns(terrain, self._flat)
    ground_z = h_fn(pos[None, :2])[0]
    pos = jnp.array([pos[0], pos[1], template.phys.pos[2] + ground_z])
    phys = template.phys.replace(pos=pos)
    rs = a1.init_robot_state(self.model, phys)
    cmd = jnp.asarray(P.INIT_MOTOR_ANGLES, jnp.float32)

    # MMDR frame indices (reset, :318-336)
    if cfg.reset_frame_idx and cfg.frame_extract > 1:
      if cfg.fixed_delay_observation:
        frame_idx = jnp.asarray(
            [cfg.frame_extract - 1, 2 * cfg.frame_extract - 1,
             3 * cfg.frame_extract - 1, 4 * cfg.frame_extract - 1],
            jnp.int32)
      else:
        r = jax.random.randint(k_frame, (4,), 0, cfg.frame_extract)
        frame_idx = r + jnp.arange(4, dtype=jnp.int32) * cfg.frame_extract
    else:
      frame_idx = jnp.arange(4, dtype=jnp.int32) * cfg.frame_extract
    interp_delay = (
        jax.random.randint(k_interp, (), 0, cfg.frame_extract)
        if cfg.interpolation else jnp.zeros((), jnp.int32))

    base_pos = rs.phys.pos
    task_state = tasks.init_task_state(base_pos, terr.NUM_SUBGOALS)
    # RandoDirWrapper.reset (env_builder.py:145-156): redraw in
    # [-pi/2, pi/2] and point the task's velocity reward along it
    dir_angle = (
        jax.random.uniform(k_dir, (), minval=-jnp.pi / 2, maxval=jnp.pi / 2)
        if cfg.random_dir else jnp.zeros(()))
    if cfg.random_dir:
      task_state = task_state.replace(
          target_vel_dir=jnp.array([jnp.cos(dir_angle), jnp.sin(dir_angle)]))
    state = EnvState(
        robot=rs,
        dyn=dyn,
        terrain=terrain,
        task=task_state,
        motor_hist=jnp.zeros((3, 12)),
        imu_hist=jnp.zeros((3, 4)),
        disp_hist=jnp.zeros((3, cfg.disp_channels)),
        last_action_hist=jnp.zeros((3, 12)),
        last_action=cmd,
        last_base_pos=base_pos,
        last_base_quat=maths.wxyz_to_xyzw(rs.phys.quat),
        dir_angle=dir_angle,
        # the reset observation is RandoDir count 1 (observation() runs
        # once inside reset, env_builder.py:127-133)
        dir_count=jnp.ones((), jnp.int32),
        filter_state=action_filter.init_state(12, cmd),
        frames=(jnp.zeros((cfg.num_stored_frames, 64, 64))
                if cfg.get_image else jnp.zeros((1, 1, 1))),
        frame_idx=frame_idx,
        interp_delay=interp_delay,
        step_counter=jnp.zeros((), jnp.int32),
        key=k_state,
    )
    # sensors on_reset: fill histories with the initial reading
    m, imu, disp = self._sensor_readings(state)
    state = state.replace(
        motor_hist=jnp.tile(m[None], (3, 1)),
        imu_hist=jnp.tile(imu[None], (3, 1)),
        disp_hist=jnp.tile(disp[None], (3, 1)),
        last_action_hist=jnp.tile(cmd[None], (3, 1)),
    )
    if cfg.get_image:
      state = self._capture_frame(state, reset=True)
    return state, self._observation(state)

  # ------------------------------------------------------------------
  def _sensor_readings(self, state: EnvState):
    """Current (delayed) sensor values (robot_sensors.py semantics)."""
    dt = self.model.dt
    rs, dyn = state.robot, state.dyn
    motor = a1.delayed_motor_angles(rs, dyn, dt)
    rpy, drpy = a1.delayed_rpy_and_rate(rs, dyn, dt)
    imu = jnp.array([rpy[0], rpy[1], drpy[0], drpy[1]])  # R P dR dP
    disp = rs.phys.pos - state.last_base_pos  # world frame (default)
    if self.cfg.rotate_sensor:
      # BaseDisplacementAndRotateSensor (robot_sensors.py:283-337):
      # displacement + base-quaternion delta (xyzw)
      dquat = maths.wxyz_to_xyzw(rs.phys.quat) - state.last_base_quat
      disp = jnp.concatenate([disp, dquat])
    return motor, imu, disp

  def _capture_frame(self, state: EnvState, reset: bool) -> EnvState:
    cfg = self.cfg
    key, k_blind = jax.random.split(state.key)
    state = state.replace(key=key)
    if cfg.empty_image:
      depth = jnp.zeros((64, 64))
    else:
      kin_R = maths.quat_to_mat(state.robot.phys.quat)
      h_fn, _ = terr.height_fns(state.terrain, self._flat)
      depth = cam.render_depth(
          state.robot.phys.pos, kin_R, state.terrain, h_fn, self._flat,
          show_subgoals=cfg.subgoal_reward is not None,
          max_boxes=terr.RENDER_BOX_CAPS.get(cfg.terrain_type,
                                             cam.MAX_RENDER_BOXES),
          # without the 10 m preprocess clip (depth_image=False, unused
          # by shipped configs), march to the true 20 m far plane
          far_t=10.5 if cfg.depth_image else 20.0)
      if cfg.depth_image:
        depth = cam.preprocess_depth(depth, k_blind, blind_spots=True)
    if reset:
      frames = jnp.tile(depth[None], (cfg.num_stored_frames, 1, 1))
    else:
      frames = jnp.concatenate([depth[None], state.frames[:-1]], axis=0)
    return state.replace(frames=frames)

  def _image_obs(self, state: EnvState) -> jnp.ndarray:
    """Frame-extract gather (+ optional interpolation averaging,
    :639-652) and depth normalization (:653-654)."""
    cfg = self.cfg
    if cfg.interpolation:
      def avg(idx):
        # average frames idx .. idx+interp_delay (interpolation mode)
        offs = jnp.arange(cfg.frame_extract)
        mask = offs <= state.interp_delay
        sel = state.frames[jnp.clip(idx + offs, 0,
                                    cfg.num_stored_frames - 1)]
        return (jnp.sum(sel * mask[:, None, None], axis=0)
                / (state.interp_delay + 1))
      img = jax.vmap(avg)(state.frame_idx)
    else:
      img = state.frames[state.frame_idx]
    img = img.reshape(-1)
    if cfg.depth_norm and cfg.depth_image:
      img = (img - 1.25) / 0.425
    return img

  def _observation(self, state: EnvState) -> jnp.ndarray:
    """Flatten the sensor dict in sorted-name order (env_utils.py:27-50)."""
    cfg = self.cfg
    parts = []
    if cfg.random_dir:  # RandoDirWrapper prefix (env_builder.py:140-142)
      parts.append(jnp.array([jnp.cos(state.dir_angle),
                              jnp.sin(state.dir_angle)]))
    if cfg.goal:  # "GoalPos" sensor (environment_sensors.py:78+)
      parts.append(state.robot.phys.pos)
      parts.append(state.terrain.goal_pos)
    if not cfg.no_displacement:  # "HistoricSensorWrapper(BaseDisplacement)"
      parts.append(state.disp_hist.reshape(-1))
    parts.append(state.imu_hist.reshape(-1))      # "...(IMU)"
    if cfg.add_last_action_input:                 # "...(LastAction)"
      parts.append(state.last_action_hist.reshape(-1))
    parts.append(state.motor_hist.reshape(-1))    # "...(MotorAngle)"
    if cfg.get_image:                             # "raw_img"
      parts.append(self._image_obs(state))
    return jnp.concatenate(parts).astype(jnp.float32)

  # ------------------------------------------------------------------
  def _step_pre(self, state: EnvState, action: jnp.ndarray):
    """Everything before the physics window: action filter/expand, key
    split, moving-obstacle update.  Returns (state, act12, terrain,
    k_frame) so the window itself can be swapped for the batched Pallas
    kernel (step_batch)."""
    cfg = self.cfg
    act12 = self._expand_action(action)
    if cfg.enable_action_filter:  # minitaur.Step:277-279 _FilterAction
      fstate, act12 = action_filter.apply(self._filter_coeffs,
                                          state.filter_state, act12)
      state = state.replace(filter_state=fstate)
    key, k_move, k_frame = jax.random.split(state.key, 3)
    state = state.replace(key=key, last_action=act12,
                          last_base_pos=state.robot.phys.pos,
                          last_base_quat=maths.wxyz_to_xyzw(
                              state.robot.phys.quat))

    terrain = state.terrain
    if cfg.moving:  # randomize_step (a1_randomizer_ground.py:411-443)
      terrain = terr.moving_blocks_step(
          terrain, state.step_counter, k_move, terr.NUM_SPARSE_BLOCKS)
    return state, act12, terrain, k_frame

  def step(self, state: EnvState,
           action: jnp.ndarray) -> Tuple[EnvState, jnp.ndarray, jnp.ndarray,
                                         jnp.ndarray, dict]:
    cfg = self.cfg
    state, act12, terrain, k_frame = self._step_pre(state, action)

    contact_fn = self._contact_fn(terrain, state.dyn,
                                  base_xy=state.robot.phys.pos[:2])
    rs, _ = a1.robot_step(
        self.model, state.robot, act12, state.dyn, contact_fn,
        action_repeat=cfg.num_action_repeat * cfg.substeps,
        interpolate=cfg.enable_action_interpolation)

    # contact state at the end of the window (pybullet getContactPoints
    # reads the post-step world)
    kin = engine.fwd_kinematics(self.model, rs.phys)
    cpos, cvel, _ = engine.contact_points_world(self.model, rs.phys, kin)
    _, pen = contact_fn(cpos, cvel, self.model.cp_radius)
    return self._step_post(state, rs, terrain, act12, k_frame, pen)

  def _step_post(self, state: EnvState, rs, terrain, act12, k_frame, pen):
    """Everything after the physics window: contact classification,
    sensors, task reward/termination, image capture, observation."""
    cfg = self.cfg
    ground_pen, box_pen = pen[..., 0], pen[..., 1]
    nonfoot_ground = jnp.any((ground_pen > 0)
                             & (self.model.cp_is_foot < 0.5))
    any_box = jnp.any(box_pen > 0)
    nonfoot_contact = nonfoot_ground | any_box

    state = state.replace(robot=rs, terrain=terrain)

    # sensors on_step + task update
    task_state = tasks.update(state.task, rs.phys.pos)
    m, imu, disp = self._sensor_readings(state)
    state = state.replace(
        task=task_state,
        motor_hist=jnp.concatenate([m[None], state.motor_hist[:-1]]),
        imu_hist=jnp.concatenate([imu[None], state.imu_hist[:-1]]),
        disp_hist=jnp.concatenate([disp[None], state.disp_hist[:-1]]),
        last_action_hist=jnp.concatenate(
            [act12[None], state.last_action_hist[:-1]]),
    )

    task_cfg = self._task_cfg()
    is_done = tasks.done(task_cfg, task_state, rs.phys.pos,
                         rs.phys.quat, nonfoot_contact)
    quat_xyzw = maths.wxyz_to_xyzw(rs.phys.quat)
    rew, trackers = tasks.reward(
        task_cfg, task_state, quat_xyzw, rs.observed_torques, is_done,
        state.terrain.subgoals, state.terrain.goal_pos)
    state = state.replace(
        task=task_state.replace(subgoal_trackers=trackers),
        step_counter=state.step_counter + 1,
    )

    if cfg.random_dir and cfg.dir_update_interval is not None:
      # RandoDirWrapper.observation (env_builder.py:127-142): every
      # dir_update_interval observations, redraw the target direction;
      # it steers the NEXT step's velocity reward and this step's obs
      key, k_dir = jax.random.split(state.key)
      count = state.dir_count + 1
      redraw = (count % cfg.dir_update_interval) == 0
      new_angle = jax.random.uniform(k_dir, (), minval=-jnp.pi / 2,
                                     maxval=jnp.pi / 2)
      angle = jnp.where(redraw, new_angle, state.dir_angle)
      state = state.replace(
          key=key, dir_count=count, dir_angle=angle,
          task=state.task.replace(target_vel_dir=jnp.array(
              [jnp.cos(angle), jnp.sin(angle)])))

    if cfg.get_image:
      do_capture = (state.step_counter % cfg.get_image_interval) == 0
      if cfg.reset_frame_idx_each_step and cfg.frame_extract > 1:
        # per-step random visual delay (:549-554)
        new_head = jax.random.randint(k_frame, (), 1, cfg.frame_extract)
        shifted = jnp.concatenate(
            [new_head[None],
             state.frame_idx[:3] + cfg.frame_extract]).astype(jnp.int32)
        frame_idx = jnp.where(do_capture, shifted, state.frame_idx)
        state = state.replace(frame_idx=frame_idx)
      captured = self._capture_frame(state, reset=False)
      state = jax.tree.map(
          lambda new, old: jnp.where(do_capture, new, old),
          captured, state)

    obs = self._observation(state)
    info = {"subgoals_hit": jnp.sum(1.0 - trackers)}
    return state, obs, rew, is_done, info

  # ------------------------------------------------------------------
  @property
  def kernel_capable(self) -> bool:
    """True when the batched Pallas physics window can replace the
    per-env robot_step: flat ground at z=0 with box and/or sphere
    obstacles (the kernel's contact model)."""
    return self._flat

  # set by the agent when training over a multi-chip mesh: the physics
  # window then runs one Pallas kernel PER SHARD via shard_map (GSPMD
  # cannot partition a pallas_call by itself)
  mesh = None

  def step_batch(self, states: EnvState, actions: jnp.ndarray):
    """Batched env step (leading env axis on every leaf).

    Semantically identical to jax.vmap(self.step) — the rollout collector
    calls this instead so the action-repeat physics window can run as ONE
    Pallas TPU kernel over all envs (ops/physics_kernel.py) rather than
    ~300 tiny vmapped XLA ops per substep.  Non-flat terrains fall back
    to the vmapped per-env step.
    """
    if not self.kernel_capable:
      return jax.vmap(self.step)(states, actions)
    cfg = self.cfg
    states, act12, terrains, k_frames = jax.vmap(self._step_pre)(
        states, actions)
    boxes = jax.vmap(self._pruned_boxes)(
        terrains.boxes, states.robot.phys.pos[:, :2])
    spheres = terrains.obstacle_spheres
    if spheres is None:
      spheres = jnp.zeros((boxes.shape[0], 0, 5))
    else:
      spheres = jax.vmap(self._pruned_spheres)(
          spheres, states.robot.phys.pos[:, :2])
    fric_ground = states.dyn.lateral_friction * cfg.fric_coeff[0]
    fric_box = states.dyn.lateral_friction

    sharded = self.mesh is not None and len(self.mesh.devices.flat) > 1

    def window(rs_in, act_in, dyn_in, boxes_in, sph_in, fg_in, fb_in):
      return physics_kernel.robot_window_pallas(
          self.model, rs_in, act_in, dyn_in, boxes_in, sph_in, fg_in,
          fb_in, cfg.num_action_repeat * cfg.substeps,
          cfg.enable_action_interpolation, force_kernel=sharded)

    if sharded:
      from jax.experimental.shard_map import shard_map
      from jax.sharding import PartitionSpec as PS
      axis = self.mesh.axis_names[0]
      spec = PS(axis)
      window = shard_map(
          window, mesh=self.mesh,
          in_specs=(jax.tree.map(lambda _: spec, states.robot),
                    spec,
                    jax.tree.map(lambda _: spec, states.dyn),
                    spec, spec, spec, spec),
          out_specs=(jax.tree.map(lambda _: spec, states.robot), spec),
          check_rep=False)

    rs, pen = window(states.robot, act12, states.dyn, boxes, spheres,
                     fric_ground, fric_box)
    return jax.vmap(self._step_post)(states, rs, terrains, act12,
                                     k_frames, pen)

  def _task_cfg(self) -> tasks.TaskConfig:
    cfg = self.cfg
    return tasks.TaskConfig(
        goal=cfg.goal,
        z_constrain=cfg.z_constrain,
        other_direction_penalty=cfg.other_direction_penalty,
        z_penalty=cfg.z_penalty,
        time_step_s=cfg.time_step_s,
        num_action_repeat=cfg.num_action_repeat,
        height_fall_coeff=0.2,  # env_builder.py:272,287
        alive_reward=cfg.alive_reward,
        fall_reward=cfg.fall_reward,
        target_vel=cfg.target_vel,
        check_contact=cfg.check_contact,
        subgoal_reward=cfg.subgoal_reward,
        goal_coeff=cfg.goal_coeff,
    )


def extra_sensor_readings(state: EnvState, model, dt: float):
  """Optional sensors beyond the shipped configs (robot_sensors.py):
  MotorVelSensor (:97), BasePositionSensor (:466), PoseSensor (:493),
  BaseDisplacementAndRotateSensor (:283, displacement + xyzw quat)."""
  rs, dyn = state.robot, state.dyn
  vel = a1.delayed_motor_velocities(rs, dyn, dt)
  base_pos = rs.phys.pos
  quat_xyzw = maths.wxyz_to_xyzw(rs.phys.quat)
  pose = jnp.concatenate([base_pos, maths.quat_to_rpy(rs.phys.quat)])
  disp = rs.phys.pos - state.last_base_pos
  disp_rot = jnp.concatenate([disp, quat_xyzw])
  return {
      "MotorVel": vel,
      "BasePosition": base_pos,
      "Pose": pose,
      "BaseDisplacementAndRotate": disp_rot,
  }
