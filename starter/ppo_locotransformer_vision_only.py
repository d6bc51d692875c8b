"""Vision-only LocoTransformer PPO (reference: starter/
ppo_locotransformer_vision_only.py: TransformerEncoder +
GaussianContPolicyTransformer / Transformer vf — proprio ignored)."""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.common import run_experiment
from vision4leg_tpu.models.actor_critic import VisionOnlyTransformerActorCritic


def build_module(env, params):
  enc = params.get("encoder", {})
  net = params.get("net", {})
  channels = 16 if env.cfg.rgbd else 4
  return VisionOnlyTransformerActorCritic(
      action_dim=env.cfg.action_dim,
      state_input_shape=env.cfg.proprio_dim,
      visual_input_shape=(channels, 64, 64),
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
