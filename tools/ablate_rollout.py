"""Rollout phase ablation on the real TPU: times the jitted rollout with
components disabled to attribute the per-epoch cost (camera raycast,
physics window, policy forward).

  python tools/ablate_rollout.py            # thin-goal, 1024 envs
"""
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import dataclasses
import jax

from vision4leg_tpu.algo.agent import PPOAgent
from vision4leg_tpu.algo.ppo import PPOConfig
from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.models.actor_critic import LocoTransformerActorCritic


class _NullLogger:
  work_dir = "/tmp/v4l_ablate"
  def add_epoch_info(self, *a, **k): pass
  def log(self, *a, **k): pass


def time_rollout(env, meta, params_json, num_envs=1024, n=3,
                 stub_reset=False):
  if stub_reset:
    # replace the partial-reset path's env.reset with a captured constant:
    # the rollout's do_resets (terrain gen + settle + first camera frame
    # for ALL envs, then masked in) runs on ~64% of steps at 1024 envs x
    # 999-step episodes — this variant times the rollout with that work
    # reduced to a select, isolating the reset-path cost
    s0, o0 = jax.jit(env.reset)(jax.random.PRNGKey(0))
    env.reset = lambda key: (s0, o0)
  module = LocoTransformerActorCritic(
      action_dim=env.cfg.action_dim,
      state_input_shape=env.cfg.proprio_dim,
      visual_input_shape=(4, 64, 64),
      encoder_hidden_shapes=(256, 256),
      transformer_params=((1, 256), (1, 256)),
      append_hidden_shapes=(256, 256))
  cfg = PPOConfig(batch_size=1024, epoch_frames=16384,
                  max_episode_frames=999, num_epochs=10)
  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=num_envs,
                   seed=0, logger=_NullLogger(), save_dir="/tmp/v4l_ablate",
                   obs_norm=meta["obs_norm"])
  ts, cs = agent.train_state, agent.collector_state
  # _rollout_jit donates cs, so thread it instead of reusing the initial
  # state (identical timing; the content drift is irrelevant here)
  for _ in range(3):
    cs, traj, lv = agent._rollout_jit(ts.params, cs)
    jax.block_until_ready(lv)
  t0 = time.time()
  for _ in range(n):
    cs, traj, lv = agent._rollout_jit(ts.params, cs)
    jax.block_until_ready(lv)
  return (time.time() - t0) / n


def main():
  cfg_path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                      "config/rl/static/locotransformer/thin-goal.json")
  params = json.load(open(cfg_path))
  variants = {
      "full": {},
      "empty_image (no raycast)": {"empty_image": True},
      "no blind spots/preproc": {"depth_image": False},
      "image_interval=2": {"get_image_interval": 2},
      # physics-share probe: 4 substeps instead of 16 — the delta x 4/3
      # approximates the full physics-window cost (different task
      # semantics; timing only)
      "action_repeat=4": {"num_action_repeat": 4},
      # physics + raycast both out: what's left is policy forward +
      # sensors/obs assembly/bookkeeping
      "empty_image + action_repeat=4": {"empty_image": True,
                                        "num_action_repeat": 4},
      "stub reset (reset-path cost)": {"__stub_reset__": True},
  }
  base = None
  for name, over in variants.items():
    p = json.loads(json.dumps(params))
    over = dict(over)
    stub = over.pop("__stub_reset__", False)
    p["env"]["env_build"].update(over)
    env, meta = get_env(p["env_name"], p["env"])
    dt = time_rollout(env, meta, p, stub_reset=stub,
                      num_envs=int(os.environ.get("V4L_ABLATE_ENVS",
                                                  "1024")))
    if base is None:
      base = dt
    print(f"{name:28s} rollout {dt*1000:7.1f} ms/epoch "
          f"(delta {1000*(base-dt):+7.1f} ms)", flush=True)


if __name__ == "__main__":
  main()
