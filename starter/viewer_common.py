"""Shared policy-replay machinery for the viewer scripts.

The reference ships one viewer per starter (starter/*_viewer.py), each
loading params.json + obs-normalizer + model_pf snapshot, rebuilding the
policy net and rolling it out with rendering.  Here the shared loop lives
in run_viewer(build_module); each viewer script passes the build_module
of the starter that produced the run, mirroring the reference's pairing.
Rendering is headless: the on-device depth stream can be dumped to mp4.
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

if os.environ.get("V4L_TPU_PLATFORM"):
  import jax
  jax.config.update("jax_platforms", os.environ["V4L_TPU_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from vision4leg_tpu.data import normalizer as norm
from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.utils.args import get_params


def load_policy_bundle(work_dir, snap="best"):
  """Load (params_bytes, normalizer_state) from a training run dir."""
  model_dir = osp.join(work_dir, "model")
  with open(osp.join(model_dir, f"model_pf_{snap}.flax"), "rb") as f:
    raw = f.read()
  nz = np.load(osp.join(model_dir, f"_obs_normalizer_{snap}.npz"))
  nstate = norm.NormalizerState(
      mean=jnp.asarray(nz["mean"]), var=jnp.asarray(nz["var"]),
      count=jnp.asarray(nz["count"]))
  return raw, nstate


def run_viewer(build_module):
  p = argparse.ArgumentParser()
  p.add_argument("--config", type=str, required=True)
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--log_dir", type=str, default="./log")
  p.add_argument("--id", type=str, required=True)
  p.add_argument("--snap", type=str, default="best")
  p.add_argument("--episodes", type=int, default=2)
  p.add_argument("--video", type=str, default=None)
  args = p.parse_args()

  params = get_params(args.config)
  env, meta = get_env(params["env_name"], params["env"])
  work_dir = osp.join(args.log_dir, args.id, params["env_name"],
                      str(args.seed))
  raw, nstate = load_policy_bundle(work_dir, args.snap)

  module = build_module(env, params)
  init_params = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, env.obs_dim)))
  model_params = serialization.from_bytes(init_params, raw)

  lo, hi = env.action_low, env.action_high
  horizon = params["collector"].get("max_episode_frames", 999)

  @jax.jit
  def episode(key):
    state, raw_obs = env.reset(key)

    def body(carry, _):
      state, raw_obs, ret, done_seen = carry
      obs = (norm.filt_with_img_tail(nstate, raw_obs, env.cfg.proprio_dim)
             if meta["obs_norm"] else raw_obs)
      (mean, _, _), _ = module.apply(model_params, obs[None])
      act = jnp.tanh(mean[0])
      act = lo + (act + 1.0) * 0.5 * (hi - lo)
      state, raw_obs, rew, done, _ = env.step(state, act)
      ret = ret + rew * (1.0 - done_seen)
      done_seen = jnp.maximum(done_seen, done.astype(jnp.float32))
      frame = (state.frames[0] if env.cfg.get_image else jnp.zeros((64, 64)))
      return (state, raw_obs, ret, done_seen), frame

    init = (state, raw_obs, jnp.zeros(()), jnp.zeros(()))
    (state, _, ret, done_seen), frames = jax.lax.scan(
        body, init, None, length=horizon)
    return ret, state.robot.phys.pos, frames

  rets = []
  frames_all = []
  for ep in range(args.episodes):
    ret, pos, frames = episode(jax.random.PRNGKey(args.seed * 1000 + ep))
    rets.append(float(ret))
    frames_all.append(np.asarray(frames))
    print(f"episode {ep}: return {float(ret):.2f} "
          f"final pos {np.asarray(pos).round(2)}")
  print(f"mean return: {np.mean(rets):.2f}")

  if args.video and env.cfg.get_image:
    import cv2
    frames = np.concatenate(frames_all, axis=0)
    lo_, hi_ = frames.min(), frames.max()
    vid = cv2.VideoWriter(args.video, cv2.VideoWriter_fourcc(*"mp4v"),
                          25, (64, 64), isColor=False)
    for f in frames:
      vid.write(((f - lo_) / max(hi_ - lo_, 1e-6) * 255).astype(np.uint8))
    vid.release()
    print(f"wrote {args.video}")
