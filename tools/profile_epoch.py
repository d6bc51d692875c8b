"""Profile one steady-state thin-goal train epoch on the TPU and print
the top ops by device time (parsed from the jax.profiler xplane).

  python tools/profile_epoch.py [--epochs-warm 12]
"""
import json
import os.path as osp
import re
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax
jax.config.update("jax_compilation_cache_dir",
                  osp.expanduser("~/.cache/jax_v4l"))

from vision4leg_tpu.algo.agent import PPOAgent
from vision4leg_tpu.algo.ppo import PPOConfig
from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.models.actor_critic import LocoTransformerActorCritic


class _NullLogger:
  work_dir = "/tmp/v4l_prof"
  def add_epoch_info(self, *a, **k): pass
  def log(self, *a, **k): pass


def main():
  warm = int(sys.argv[sys.argv.index("--epochs-warm") + 1]) \
      if "--epochs-warm" in sys.argv else 12
  root = osp.dirname(osp.dirname(osp.abspath(__file__)))
  params = json.load(open(osp.join(
      root, "config/rl/static/locotransformer/thin-goal.json")))
  env, meta = get_env(params["env_name"], params["env"])
  module = LocoTransformerActorCritic(
      action_dim=env.cfg.action_dim, state_input_shape=env.cfg.proprio_dim,
      visual_input_shape=(4, 64, 64), encoder_hidden_shapes=(256, 256),
      transformer_params=((1, 256), (1, 256)),
      append_hidden_shapes=(256, 256))
  cfg = PPOConfig(batch_size=1024, epoch_frames=16384,
                  max_episode_frames=999, num_epochs=100, opt_epochs=3)
  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=1024,
                   seed=0, logger=_NullLogger(), save_dir="/tmp/v4l_prof",
                   obs_norm=meta["obs_norm"])
  ts, cs = agent.train_state, agent.collector_state
  key = jax.random.PRNGKey(0)
  # warm into steady state (episodes desync, resets fire most steps)
  for w in range(warm):
    ts, cs, m = agent._train_epoch(ts, cs, jax.random.fold_in(key, w))
    jax.block_until_ready(m["Training/policy_loss"])
  t0 = time.time()
  with jax.profiler.trace("/tmp/v4l_prof_trace"):
    ts, cs, m = agent._train_epoch(ts, cs, jax.random.fold_in(key, 999))
    jax.block_until_ready(m["Training/policy_loss"])
  print(f"epoch wall: {time.time()-t0:.3f}s", flush=True)

  import glob
  from tensorflow.tsl.profiler.protobuf import xplane_pb2
  path = sorted(glob.glob(
      "/tmp/v4l_prof_trace/**/*.xplane.pb", recursive=True))[-1]
  xs = xplane_pb2.XSpace()
  xs.ParseFromString(open(path, "rb").read())
  for plane in xs.planes:
    if "TPU" not in plane.name:
      continue
    tot = {}
    for line in plane.lines:
      for ev in line.events:
        name = plane.event_metadata[ev.metadata_id].name
        tot[name] = tot.get(name, 0) + ev.duration_ps
    items = sorted(tot.items(), key=lambda kv: -kv[1])
    # skip the enclosing jit wrappers
    shown = 0
    print(f"== {plane.name}")
    for k, v in items:
      if re.match(r"jit__?lambda|jit_train|jit_rollout|jit_update", k):
        continue
      print(f"  {v/1e9:9.3f} ms  {k[:110]}")
      shown += 1
      if shown >= 25:
        break


if __name__ == "__main__":
  main()
