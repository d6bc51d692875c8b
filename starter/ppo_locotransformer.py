"""LocoTransformer PPO on A1MoveGround (reference: starter/
ppo_locotransformer.py:27-121).

Network: shared LocoTransformerEncoder tokenizer feeding separate
transformer stacks for the Gaussian policy and the value head.

Usage (same CLI as the reference):
  python starter/ppo_locotransformer.py \
      --config config/rl/static/locotransformer/thin-goal.json \
      --seed 0 --log_dir ./log --id thin_goal
"""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.common import run_experiment
from vision4leg_tpu.models.actor_critic import LocoTransformerActorCritic


def image_channels(env):
  """env.image_channels: 4 depth frames (rgbd would be 16)."""
  c = env.cfg
  if c.rgbd:
    return 16
  return 4


def build_module(env, params):
  enc = params.get("encoder", {})
  net = params.get("net", {})
  return LocoTransformerActorCritic(
      action_dim=env.cfg.action_dim,
      state_input_shape=env.cfg.proprio_dim,
      visual_input_shape=(image_channels(env), 64, 64),
      encoder_hidden_shapes=tuple(enc.get("hidden_shapes", (256, 256))),
      transformer_params=tuple(
          tuple(p) for p in net.get("transformer_params",
                                    ((1, 256), (1, 256)))),
      append_hidden_shapes=tuple(net.get("append_hidden_shapes",
                                         (256, 256))),
      max_pool=net.get("max_pool", False),
      **params.get("policy", {}),
  )


if __name__ == "__main__":
  run_experiment(build_module)
