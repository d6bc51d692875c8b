"""Sim-to-sim transfer variant of the Nature-CNN baseline (reference:
starter/ppo_nature_cnn_sim2sim.py): identical network wiring to
ppo_nature_cnn, but EVALUATION runs on a transfer env rebuilt from a
modified copy of the config (reference :43-60):

  * reset_frame_idx_each_step = True (re-randomize the MMDR frame pick
    every step instead of per episode);
  * horizon 2000 (twice the training episode budget);
  * a get_image_interval > 1 training env evals as the frame_extract
    equivalent (and interval 1 + extract 1 becomes frame_extract 4);
  * curriculum / interpolation / fixed_delay_observation disabled.

The train env's obs normalizer is shared with the eval env, as in the
reference (`eval_env._obs_normalizer = env._obs_normalizer`).
"""
import sys
import os.path as osp

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from starter.common import run_experiment
from starter.ppo_nature_cnn import build_module


def sim2sim_eval_params(env_params):
  """The reference's eval-env mutation (ppo_nature_cnn_sim2sim.py:43-56)."""
  build = env_params["env_build"]
  build["reset_frame_idx_each_step"] = True
  env_params["horizon"] = 2000
  if build.get("get_image_interval", 1) > 1:
    build["frame_extract"] = build["get_image_interval"]
    build["get_image_interval"] = 1
  elif (build.get("get_image_interval", 1) == 1
        and build.get("frame_extract", 1) == 1):
    build["frame_extract"] = 4
  if "curriculum" in build:
    build["curriculum"] = False
  if "interpolation" in build:
    build["interpolation"] = False
  if "fixed_delay_observation" in build:
    build["fixed_delay_observation"] = False
  return env_params


if __name__ == "__main__":
  run_experiment(build_module, eval_params_transform=sim2sim_eval_params)
