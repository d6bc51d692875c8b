"""Replay a trained LocoTransformer snapshot (reference: starter/
locotransformer_viewer.py:70-120): load params.json + obs-normalizer +
model_pf_best, rebuild the policy, roll deterministically (eval_act =
mean action) and report episode statistics; optionally dump the depth
stream to a video (the headless replacement for GUI rendering).

  python starter/locotransformer_viewer.py --config <json> \
      --log_dir ./log --id <id> --seed 0 [--snap best] [--video out.mp4]
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.viewer_common import load_policy_bundle, run_viewer  # noqa: F401


def build_module_for_config(env, params, config_path):
  """Pick the actor-critic matching the starter that produced the run
  (kept for total_randomize_statistics, which sweeps mixed runs)."""
  del config_path
  if not env.cfg.get_image:
    from starter.ppo_state import build_module
  else:
    from starter.ppo_locotransformer import build_module
  return build_module(env, params)


def _build_module(env, params):
  return build_module_for_config(env, params, None)


if __name__ == "__main__":
  run_viewer(_build_module)
