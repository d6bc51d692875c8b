"""Deploy a trained LocoTransformer to the real A1.

Reference: a1_hardware/execute_locotransformer.py:17-111 — builds the
policy from params.json + the training obs-normalizer + the best snapshot,
warms up the history buffers, then runs the Executor at 25 Hz.

  python -m vision4leg_tpu.hardware.execute_locotransformer \
      --config <json> --log_dir ./log --id <id> --seed 0 [--seconds 30] \
      [--fake-robot]   # dry-run without hardware
"""
from __future__ import annotations

import argparse
import os.path as osp

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--config", required=True)
  p.add_argument("--log_dir", default="./log")
  p.add_argument("--id", required=True)
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--snap", default="best")
  p.add_argument("--seconds", type=float, default=30.0)
  p.add_argument("--control_freq", type=float, default=25.0)
  p.add_argument("--fake-robot", action="store_true",
                 help="loopback dry run without the UDP link / camera")
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  from flax import serialization

  from starter.ppo_locotransformer import build_module
  from vision4leg_tpu.envs.get_env import get_env
  from vision4leg_tpu.hardware.executor import Executor, RobotController
  from vision4leg_tpu.hardware.policy_wrapper import PolicyWrapper
  from vision4leg_tpu.hardware.realsense import (A1RealSense, FakeCamera,
                                                 HAS_REALSENSE)
  from vision4leg_tpu.utils.args import get_params

  params = get_params(args.config)
  env, meta = get_env(params["env_name"], params["env"])
  work_dir = osp.join(args.log_dir, args.id, params["env_name"],
                      str(args.seed))
  model_dir = osp.join(work_dir, "model")
  with open(osp.join(model_dir, f"model_pf_{args.snap}.flax"), "rb") as f:
    raw = f.read()
  nz = np.load(osp.join(model_dir, f"_obs_normalizer_{args.snap}.npz"))

  module = build_module(env, params)
  init = module.init(jax.random.PRNGKey(0), jnp.zeros((1, env.obs_dim)))
  model_params = serialization.from_bytes(init, raw)

  @jax.jit
  def policy(obs):
    (mean, _, _), _ = module.apply(model_params, obs[None])
    return mean[0]

  build = params["env"]["env_build"]
  wrapper = PolicyWrapper(
      policy_fn=lambda o: np.asarray(policy(jnp.asarray(o))),
      obs_normalizer_mean=nz["mean"], obs_normalizer_var=nz["var"],
      frame_extract=build.get("frame_extract", 1),
      get_image_interval=build.get("get_image_interval", 1),
      clip_num=tuple(build.get("clip_num", (0.05, 0.5, 0.5) * 4)))

  if args.fake_robot:
    class _FakeRI:
      def ReceiveObservation(self):
        from vision4leg_tpu.hardware.robot_interface import (IMUState,
                                                             LowState,
                                                             MotorStateArray)
        from vision4leg_tpu.robots import a1_params as P
        return LowState(
            motorState=MotorStateArray(
                q=np.asarray(P.INIT_MOTOR_ANGLES, np.float32),
                dq=np.zeros(12, np.float32),
                tauEst=np.zeros(12, np.float32)),
            imu=IMUState(quaternion=np.array([1, 0, 0, 0], np.float32),
                         gyroscope=np.zeros(3, np.float32),
                         accelerometer=np.array([0, 0, 9.8], np.float32),
                         rpy=np.zeros(3, np.float32)),
            footForce=np.zeros(4, np.float32), tick=0.0)

      def SendCommand(self, cmd):
        pass

    ri = _FakeRI()
    camera = FakeCamera()
  else:
    from vision4leg_tpu.hardware.robot_interface import RobotInterface
    ri = RobotInterface()
    camera = A1RealSense() if HAS_REALSENSE else FakeCamera()

  rc = RobotController(ri)
  executor = Executor(wrapper, rc, camera=camera,
                      control_freq=args.control_freq)
  executor.execute(args.seconds)


if __name__ == "__main__":
  main()
