"""Random-action environment smoke viewer (reference: starter/env_viewer.py
:54-88 + the speed probe in env_builder.py:542-556).

Rolls random actions, prints reward statistics and env-steps/sec, and can
dump depth frames to a video (the TPU-native replacement for the GUI).

  python starter/env_viewer.py --config config/rl/static/locotransformer/thin-goal.json \
      --video /tmp/env.mp4
"""
import argparse
import os
import sys
import os.path as osp
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

if os.environ.get("V4L_TPU_PLATFORM"):
  import jax
  jax.config.update("jax_platforms", os.environ["V4L_TPU_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.utils.args import get_params


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--config", type=str, required=True)
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--steps", type=int, default=200)
  p.add_argument("--video", type=str, default=None,
                 help="write the depth camera stream to an mp4")
  args = p.parse_args()

  params = get_params(args.config)
  env, meta = get_env(params["env_name"], params["env"])
  key = jax.random.PRNGKey(args.seed)

  @jax.jit
  def rollout(key):
    state, obs = env.reset(key)

    def body(carry, k):
      state = carry
      a = jax.random.uniform(k, (env.cfg.action_dim,),
                             minval=env.action_low, maxval=env.action_high)
      state, obs, rew, done, _ = env.step(state, a)
      frame = (state.frames[0] if env.cfg.get_image
               else jnp.zeros((64, 64)))
      return state, (rew, done, state.robot.phys.pos, frame)

    keys = jax.random.split(key, args.steps)
    state, (rews, dones, pos, frames) = jax.lax.scan(body, state, keys)
    return rews, dones, pos, frames

  t0 = time.time()
  rews, dones, pos, frames = jax.block_until_ready(rollout(key))
  compile_time = time.time() - t0
  t0 = time.time()
  rews, dones, pos, frames = jax.block_until_ready(
      rollout(jax.random.fold_in(key, 1)))
  dt = time.time() - t0

  rews, dones, pos = np.asarray(rews), np.asarray(dones), np.asarray(pos)
  print(f"steps/sec: {args.steps / dt:.1f} (compile {compile_time:.1f}s)")
  print(f"reward mean {rews.mean():.4f} min {rews.min():.4f} "
        f"max {rews.max():.4f}")
  print(f"episode done fraction: {dones.mean():.3f}")
  print(f"final base position: {pos[-1].round(3)}")

  if args.video and env.cfg.get_image:
    import cv2
    frames = np.asarray(frames)
    lo, hi = frames.min(), frames.max()
    vid = cv2.VideoWriter(args.video, cv2.VideoWriter_fourcc(*"mp4v"),
                          25, (64, 64), isColor=False)
    for f in frames:
      vid.write(((f - lo) / max(hi - lo, 1e-6) * 255).astype(np.uint8))
    vid.release()
    print(f"wrote {args.video}")


if __name__ == "__main__":
  main()
