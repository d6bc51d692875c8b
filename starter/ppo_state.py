"""Proprio-only PPO on A1MoveGround (reference: starter/ppo_state.py).

Network: GaussianContPolicyBasicBias + Net value head with a shared MLP
base (ppo_state.py:93-104 `vf.base = pf.base`).

Usage (same CLI as the reference):
  python starter/ppo_state.py --config config/rl/static/state-only-baseline.json \
      --seed 0 --log_dir ./log --id state_baseline
"""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.common import run_experiment
from vision4leg_tpu.models.actor_critic import StateActorCritic


def build_module(env, params):
  net = params.get("net", {})
  return StateActorCritic(
      action_dim=env.cfg.action_dim,
      hidden_shapes=tuple(net.get("hidden_shapes", (256, 256))),
      append_hidden_shapes=tuple(net.get("append_hidden_shapes", (256, 256))),
      **params.get("policy", {}),
  )


if __name__ == "__main__":
  run_experiment(build_module)
