"""Sim-to-sim transfer variant of the Nature-CNN baseline (reference:
starter/ppo_nature_cnn_sim2sim.py): identical network wiring to
ppo_nature_cnn; the transfer comes from the config (a different terrain /
randomization regime for the eval environment)."""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.common import run_experiment
from starter.ppo_nature_cnn import build_module


if __name__ == "__main__":
  run_experiment(build_module)
