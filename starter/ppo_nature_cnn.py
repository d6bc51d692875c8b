"""Depth-CNN baseline PPO on A1MoveGround (reference: starter/
ppo_nature_cnn.py, diff vs locotransformer at :81-96).

Network: shared NatureFuseEncoder (Nature CNN on depth + proprio MLP,
concatenated) with separate MLP heads.
"""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.common import run_experiment
from vision4leg_tpu.models.actor_critic import NatureFuseActorCritic


def build_module(env, params):
  enc = params.get("encoder", {})
  net = params.get("net", {})
  channels = 16 if env.cfg.rgbd else 4
  return NatureFuseActorCritic(
      action_dim=env.cfg.action_dim,
      state_input_shape=env.cfg.proprio_dim,
      visual_input_shape=(channels, 64, 64),
      encoder_hidden_shapes=tuple(enc.get("hidden_shapes", (256, 256))),
      visual_dim=enc.get("visual_dim", 256),
      append_hidden_shapes=tuple(net.get("append_hidden_shapes",
                                         (256, 256))),
      **params.get("policy", {}),
  )


if __name__ == "__main__":
  run_experiment(build_module)
