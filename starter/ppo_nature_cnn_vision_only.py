"""Vision-only Nature-CNN PPO (reference: starter/
ppo_nature_cnn_vision_only.py: VisualNet heads over a shared
NatureEncoder — proprio ignored)."""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.common import run_experiment
from vision4leg_tpu.models.actor_critic import VisualNetActorCritic


def build_module(env, params):
  enc = params.get("encoder", {})
  net = params.get("net", {})
  channels = 16 if env.cfg.rgbd else 4
  return VisualNetActorCritic(
      action_dim=env.cfg.action_dim,
      state_input_shape=env.cfg.proprio_dim,
      visual_input_shape=(channels, 64, 64),
      visual_dim=enc.get("visual_dim", 256),
      append_hidden_shapes=tuple(net.get("append_hidden_shapes",
                                         (256, 256))),
      **params.get("policy", {}),
  )


if __name__ == "__main__":
  run_experiment(build_module)
