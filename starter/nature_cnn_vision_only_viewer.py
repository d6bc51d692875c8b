"""Replay a trained ppo_nature_cnn_vision_only snapshot (reference: starter/nature_cnn_vision_only_viewer.py): rebuild the
policy from params.json + obs-normalizer + model_pf snapshot and roll it
deterministically; see viewer_common.run_viewer for flags."""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.viewer_common import run_viewer
from starter.ppo_nature_cnn_vision_only import build_module

if __name__ == "__main__":
  run_viewer(build_module)
