"""Behavioral trace of a trained snapshot: WHERE does the policy die?

The viewer scripts (starter/*_viewer.py) replay a snapshot and print
returns; this tool additionally records the per-step base trajectory of
E vmapped deterministic episodes and summarizes the failure mode — the
evidence VERDICT r3 #6 asks for on chair_desk ("where does it get
stuck?").  For a corridor task the interesting numbers are the x-reach
distribution (how far down the obstacle field the robot gets), the
termination cause (fall vs timeout, via episode length + final height),
and the stall point (last x at which forward progress was still being
made).

  python tools/trace_policy.py --config config/rl/challenge/\
locotransformer/chair_desk.json --log_dir runs --id chair_desk_10M_r3b \
      --seed 0 [--snap best] [--episodes 8] [--platform cpu] [--npz out]

Runs on CPU by default (replay needs no TPU; --platform axon for chip).
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--config", type=str, required=True)
  p.add_argument("--seed", type=int, default=0)
  p.add_argument("--log_dir", type=str, default="runs")
  p.add_argument("--id", type=str, required=True)
  p.add_argument("--snap", type=str, default="best")
  p.add_argument("--episodes", type=int, default=8)
  p.add_argument("--platform", type=str, default="cpu")
  p.add_argument("--npz", type=str, default=None)
  args = p.parse_args()

  if args.platform:
    jax.config.update("jax_platforms", args.platform)

  import jax.numpy as jnp
  import numpy as np
  from flax import serialization

  from starter.locotransformer_viewer import build_module_for_config
  from starter.viewer_common import load_policy_bundle
  from vision4leg_tpu.data import normalizer as norm
  from vision4leg_tpu.envs.get_env import get_env
  from vision4leg_tpu.utils.args import get_params

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

  def episode(key):
    state, raw_obs = env.reset(key)

    def body(carry, _):
      state, raw_obs, done_seen = carry
      obs = (norm.filt_with_img_tail(nstate, raw_obs, env.cfg.proprio_dim)
             if meta["obs_norm"] else raw_obs)
      (mean, _, _), _ = module.apply(model_params, obs[None])
      act = jnp.tanh(mean[0])
      act = lo + (act + 1.0) * 0.5 * (hi - lo)
      nstate_, nobs, rew, done, _ = env.step(state, act)
      # freeze the carried state once done (per-step trace stays at the
      # death pose instead of replaying a reset)
      alive = 1.0 - done_seen
      state = jax.tree.map(
          lambda new, old: jnp.where(alive > 0, new, old), nstate_, state)
      raw_obs = jnp.where(alive > 0, nobs, raw_obs)
      done_seen = jnp.maximum(done_seen, done.astype(jnp.float32))
      out = (state.robot.phys.pos, rew * alive, done_seen)
      return (state, raw_obs, done_seen), out

    init = (state, raw_obs, jnp.zeros(()))
    _, (pos, rew, done_seen) = jax.lax.scan(body, init, None,
                                            length=horizon)
    return pos, rew, done_seen

  keys = jax.random.split(jax.random.PRNGKey(args.seed * 1000 + 7),
                          args.episodes)
  pos, rew, done_seen = jax.jit(jax.vmap(episode))(keys)
  pos = np.asarray(pos)            # (E, T, 3)
  rew = np.asarray(rew)            # (E, T)
  done_seen = np.asarray(done_seen)  # (E, T) cumulative-done flag

  T = pos.shape[1]
  ep_len = np.where(done_seen[:, -1] > 0,
                    done_seen.argmax(axis=1) + 1, T)
  rets = rew.sum(axis=1)
  print(f"{args.id}/{args.snap}: {args.episodes} episodes, horizon {T}")
  print(f"returns: mean {rets.mean():.1f}  min {rets.min():.1f}  "
        f"max {rets.max():.1f}")
  for e in range(args.episodes):
    L = int(ep_len[e])
    p_end = pos[e, L - 1]
    fell = done_seen[e, -1] > 0
    # stall point = LAST step at which x still advanced >1 cm over the
    # following 50 steps (scanning backward from the episode end, so a
    # policy that takes >50 steps to get moving — standing up, settling —
    # is not reported as stalled at the spawn point)
    x = pos[e, :L, 0]
    stall = 0
    for t in range(max(L - 51, 0), -1, -1):
      if x[min(t + 50, L - 1)] - x[t] >= 0.01:
        stall = min(t + 50, L - 1)
        break
    print(f"  ep{e}: len {L:4d} ({'fall' if fell else 'timeout'})  "
          f"final x={p_end[0]:6.2f} y={p_end[1]:5.2f} z={p_end[2]:.2f}  "
          f"x-max {x.max():6.2f}  stall@x={x[stall]:.2f} (t={stall})")
  print(f"x-reach: mean {pos[np.arange(len(ep_len)), ep_len - 1, 0].mean():.2f}"
        f"  best {pos[:, :, 0].max():.2f}")
  if args.npz:
    np.savez(args.npz, pos=pos, rew=rew, done=done_seen, ep_len=ep_len)
    print(f"wrote {args.npz}")


if __name__ == "__main__":
  main()
