"""Convex-MPC locomotion demo: trot gait tracking a piecewise speed profile.

TPU-native equivalent of the reference's
mpc_controller/locomotion_controller_example.py: the same trot gait
(stance 0.3 s, duty 0.6, phases [0.9, 0, 0, 0.9]) and the same demo speed
profile — stand, turn left, forward, turn right, sidestep, stand — with
the controller ticking at 50 Hz over 1 kHz physics, all inside one jitted
lax.scan program.

`--robot` selects the MPC parameter set (a1 | laikago | spirit40, from
mpc/robot_params.py).  Only the A1 has an articulated JAX model (the
reference loads the other URDFs from pybullet_data, which is not shipped),
so non-A1 parameter sets drive the MPC/gait math on the A1 body — useful
for controller-level comparisons, labeled clearly in the output.

Usage:
  python starter/locomotion_controller_example.py --max_time 20
  V4L_TPU_PLATFORM=cpu python starter/locomotion_controller_example.py
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("V4L_TPU_PLATFORM"):
  import jax
  jax.config.update("jax_platforms", os.environ["V4L_TPU_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.envs.mpc_env import A1MPCGymEnv, MpcEnvConfig
from vision4leg_tpu.mpc import robot_params
from vision4leg_tpu.physics import maths


def speed_profile(t, multiplier):
  """Piecewise-constant demo profile (locomotion_controller_example.py:
  79-99): hold, yaw left, forward, yaw right, sidestep, hold, yaw."""
  vx = 0.6 * multiplier
  vy = 0.2 * multiplier
  wz = 0.8 * multiplier
  points = jnp.array([
      [0.0, 0.0, 0.0, 0.0],
      [0.0, 0.0, 0.0, wz],
      [vx, 0.0, 0.0, 0.0],
      [0.0, 0.0, 0.0, -wz],
      [0.0, -vy, 0.0, 0.0],
      [0.0, 0.0, 0.0, 0.0],
      [0.0, 0.0, 0.0, wz],
  ])
  idx = jnp.clip((t / 5.0).astype(jnp.int32), 0, points.shape[0] - 1)
  sp = points[idx]
  return sp[:3], sp[3]


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--robot", default="a1",
                  choices=sorted(robot_params.ROBOTS))
  ap.add_argument("--max_time", type=float, default=20.0)
  args = ap.parse_args()
  rp = robot_params.ROBOTS[args.robot]
  if args.robot != "a1":
    print(f"note: articulated body is the A1; '{args.robot}' supplies the "
          "MPC mass/inertia/height/gait targets only "
          "(its URDF lives in pybullet_data, not shipped)")

  # 1 kHz physics, controller tick every 5 substeps (200 Hz) — the same
  # rates the MPC walking integration test validates
  cfg = MpcEnvConfig(
      motor_control_mode="POSITION", clip_num=(0.3, 0.4),
      time_step_s=0.001, num_action_repeat=5, policy_freq=4,
      terrain_type="plane", target_vel=0.3, check_contact=False,
      settle_steps=300, alive_reward=0.1)
  env = A1MPCGymEnv(cfg)
  if args.robot != "a1":
    env.mpc_cfg = env.mpc_cfg._replace(
        mass=rp.body_mass, inertia=tuple(rp.body_inertia))

  ticks = int(args.max_time / (cfg.num_action_repeat * cfg.time_step_s))

  @jax.jit
  def run(key):
    state, _ = env.reset(key)

    def tick(state, _):
      lin, ang = speed_profile(state.current_time, rp.velocity_multiplier)
      contact_fn = env._contact_fn(state.terrain, state.dyn,
                                   base_xy=state.robot.phys.pos[:2])
      state = env._controller_tick(state, lin, ang, contact_fn)
      rpy = maths.quat_to_rpy(state.robot.phys.quat)
      vel_body = maths.quat_rotate_inv(state.robot.phys.quat,
                                       state.robot.phys.lin)
      return state, (state.current_time, state.robot.phys.pos, rpy,
                     vel_body, lin, ang)

    state, traj = jax.lax.scan(tick, state, None, length=ticks)
    return traj

  t0 = time.time()
  ts, pos, rpy, vel, lin_cmd, ang_cmd = map(np.asarray,
                                            run(jax.random.PRNGKey(0)))
  wall = time.time() - t0
  upright = np.all(np.abs(rpy[:, :2]) < 0.5) and np.all(pos[:, 2] > 0.12)
  # report tracking per 5 s profile segment
  print(f"robot={args.robot}  sim {ts[-1]:.1f}s in {wall:.1f}s wall "
        f"({ts[-1] / wall:.1f}x realtime)  upright={bool(upright)}")
  seg = (ts // 5.0).astype(int)
  for s in range(int(seg.max()) + 1):
    m = seg == s
    cmd_v = lin_cmd[m][-1]
    err = np.mean(np.linalg.norm(vel[m][:, :2] - cmd_v[:2], axis=1))
    print(f"  t=[{5 * s:4.1f},{5 * (s + 1):4.1f})s cmd v=({cmd_v[0]:+.2f},"
          f"{cmd_v[1]:+.2f}) wz={ang_cmd[m][-1]:+.2f}  "
          f"mean|v err|={err:.3f} m/s  z={pos[m][:, 2].mean():.3f} m")
  if not upright:
    print("FAIL: robot fell")
    sys.exit(1)


if __name__ == "__main__":
  main()
