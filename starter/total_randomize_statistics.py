"""Sweep trained snapshots over randomized environments and report success
statistics (reference: starter/total_randomize_statistics.py).

Success = episode not terminated by a fall within the horizon (and, for
subgoal terrains, subgoals collected are reported too).

  python starter/total_randomize_statistics.py --config <json> \
      --log_dir ./log --id <id> --episodes 16
"""
import argparse
import os
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

if os.environ.get("V4L_TPU_PLATFORM"):
  import jax
  jax.config.update("jax_platforms", os.environ["V4L_TPU_PLATFORM"])

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from starter.locotransformer_viewer import (build_module_for_config,
                                            load_policy_bundle)
from vision4leg_tpu.data import normalizer as norm
from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.utils.args import get_params


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--config", type=str, required=True)
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--log_dir", type=str, default="./log")
  p.add_argument("--id", type=str, required=True)
  p.add_argument("--snap", type=str, default="best")
  p.add_argument("--episodes", type=int, default=16)
  args = p.parse_args()

  params = get_params(args.config)
  env, meta = get_env(params["env_name"], params["env"])
  work_dir = osp.join(args.log_dir, args.id, params["env_name"],
                      str(args.seed))
  raw, nstate = load_policy_bundle(work_dir, args.snap)
  module = build_module_for_config(env, params, args.config)
  init_params = module.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, env.obs_dim)))
  model_params = serialization.from_bytes(init_params, raw)

  lo, hi = env.action_low, env.action_high
  horizon = params["collector"].get("max_episode_frames", 999)
  E = args.episodes

  @jax.jit
  def sweep(key):
    states, raw_obs = jax.vmap(env.reset)(jax.random.split(key, E))

    def body(carry, _):
      states, raw_obs, ret, done_seen, steps = carry
      obs = (norm.filt_with_img_tail(nstate, raw_obs, env.cfg.proprio_dim)
             if meta["obs_norm"] else raw_obs)
      (mean, _, _), _ = module.apply(model_params, obs)
      act = jnp.tanh(mean)
      act = lo + (act + 1.0) * 0.5 * (hi - lo)
      states, raw_obs, rew, done, info = jax.vmap(env.step)(states, act)
      ret = ret + rew * (1.0 - done_seen)
      steps = steps + (1.0 - done_seen)
      done_seen = jnp.maximum(done_seen, done.astype(jnp.float32))
      return (states, raw_obs, ret, done_seen, steps), None

    init = (states, raw_obs, jnp.zeros(E), jnp.zeros(E), jnp.zeros(E))
    (states, _, ret, done_seen, steps), _ = jax.lax.scan(
        body, init, None, length=horizon)
    dist = states.robot.phys.pos[:, 0]
    subgoals = jnp.sum(1.0 - states.task.subgoal_trackers, axis=-1)
    return ret, done_seen, steps, dist, subgoals

  ret, fell, steps, dist, subgoals = jax.block_until_ready(
      sweep(jax.random.PRNGKey(args.seed)))
  ret, fell = np.asarray(ret), np.asarray(fell)
  print(f"episodes: {E}")
  print(f"success rate (no fall): {(1 - fell).mean():.3f}")
  print(f"return: mean {ret.mean():.2f} std {ret.std():.2f}")
  print(f"episode length: mean {np.asarray(steps).mean():.1f}")
  print(f"forward distance: mean {np.asarray(dist).mean():.2f} m")
  if env.cfg.subgoal_reward is not None:
    print(f"subgoals hit: mean {np.asarray(subgoals).mean():.2f}")


if __name__ == "__main__":
  main()
