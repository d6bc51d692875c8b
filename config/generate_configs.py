"""Generate the experiment config tree.

Reproduces the reference's config schema and axes (README.md:66-90):
  config/rl/{static,moving,challenge}/{method}/{terrain}.json
  config/{mpc,mpc_vision_only}/{baseline,locotransformer}/{terrain}.json
The generated files are byte-compatible with the reference schema so the
same `--config` paths work across both frameworks.

Run: python config/generate_configs.py
"""
from __future__ import annotations

import json
import os
import os.path as osp

ROOT = osp.dirname(osp.abspath(__file__))


def base_rl_config():
  return {
      "env_name": "A1MoveGround",
      "env": {
          "reward_scale": 1,
          "obs_norm": True,
          "horizon": 1000,
          "env_build": {
              "z_constrain": False,
              "motor_control_mode": "POSITION",
              "other_direction_penalty": 0,
              "z_penalty": 1,
              "clip_num": [0.05, 0.5, 0.5] * 4,
              "time_step_s": 0.0025,
              "num_action_repeat": 16,
              "add_last_action_input": True,
              "no_displacement": True,
              "diagonal_act": True,
              "get_image": True,
              "depth_image": True,
              "depth_norm": True,
              "rgbd": False,
              "grayscale": False,
              "alive_reward": -0.05,
              "fall_reward": -20,
              "fric_coeff": [1, 0.01, 0.01],
              "target_vel": 1.0,
              "random_init_range": 1.0,
              "domain_randomization": True,
              "enable_action_interpolation": False,
              "enable_action_filter": False,
              "terrain_type": "random_blocks_sparse",
              "frame_extract": 1,
              "get_image_interval": 1,
          },
      },
      "replay_buffer": {"size": 16384, "time_limit_filter": True},
      "policy": {},
      "encoder": {"hidden_shapes": [256, 256], "visual_dim": 256},
      "net": {
          "transformer_params": [[1, 256], [1, 256]],
          "append_hidden_shapes": [256, 256],
      },
      "collector": {
          "epoch_frames": 16384,
          "max_episode_frames": 999,
          "eval_episodes": 2,
      },
      "general_setting": {
          "discount": 0.99,
          "num_epochs": 1500,
          "batch_size": 1024,
          "gae": True,
          "save_interval": 100,
          "eval_interval": 10,
      },
      "ppo": {
          "plr": 1e-4,
          "vlr": 1e-4,
          "clip_para": 0.2,
          "opt_epochs": 3,
          "tau": 0.95,
          "shuffle": True,
          "entropy_coeff": 0.005,
      },
  }


TERRAINS = {
    "thin": {"terrain_type": "random_blocks_sparse"},
    "thin-goal": {"terrain_type": "random_blocks_sparse_with_subgoal",
                  "subgoal_reward": 100},
    "thin-heightfield":
        {"terrain_type": "random_blocks_sparse_and_heightfield"},
    "thin-random-shape": {"terrain_type": "random_blocks_sparse",
                          "random_shape": True},
    "thin-wide": {"terrain_type": "random_blocks_sparse_thin_wide"},
}

CHALLENGES = {
    "mountain": {"terrain_type": "mount", "goal": True},
    "hill": {"terrain_type": "random_hill"},
    "stairs": {"terrain_type": "stairs", "goal": True},
    "chair_desk": {"terrain_type": "random_chair_desk"},
}

METHODS = {
    "naive_baseline": {},
    "locotransformer": {},
    "frame_extract4": {"frame_extract": 4, "reset_frame_idx": True,
                       "fixed_delay_observation": False,
                       "get_image_interval": None},
    "frame_extract4_fixed_delay": {"frame_extract": 4,
                                   "reset_frame_idx": True,
                                   "fixed_delay_observation": True,
                                   "get_image_interval": None},
    "frame_extract4_random_delay": {"frame_extract": 4,
                                    "reset_frame_idx": True,
                                    "get_image_interval": None},
    "frame_extract4_interpolation": {"frame_extract": 4,
                                     "interpolation": True,
                                     "get_image_interval": None},
    "locotransformer_random_delay": {"frame_extract": 4,
                                     "reset_frame_idx": True},
}


def apply(build, mods):
  for k, v in mods.items():
    if v is None:
      build.pop(k, None)
    else:
      build[k] = v


def write(path, cfg):
  os.makedirs(osp.dirname(path), exist_ok=True)
  with open(path, "w") as f:
    json.dump(cfg, f, indent=4)
    f.write("\n")


def main():
  # rl/static + rl/moving
  for group, moving in (("static", False), ("moving", True)):
    methods = METHODS if group == "static" else {
        k: v for k, v in METHODS.items()
        if k in ("naive_baseline", "locotransformer", "frame_extract4",
                 "frame_extract4_random_delay",
                 "locotransformer_random_delay")}
    for method, m_mods in methods.items():
      for terrain, t_mods in TERRAINS.items():
        cfg = base_rl_config()
        build = cfg["env"]["env_build"]
        apply(build, t_mods)
        apply(build, m_mods)
        if moving:
          build["moving"] = True
        write(osp.join(ROOT, "rl", group, method, terrain + ".json"), cfg)

  # rl/challenge
  for method in ("baseline", "locotransformer"):
    for name, t_mods in CHALLENGES.items():
      cfg = base_rl_config()
      build = cfg["env"]["env_build"]
      build.pop("subgoal_reward", None)
      apply(build, t_mods)
      write(osp.join(ROOT, "rl", "challenge", method, name + ".json"), cfg)

  # rl/static/state-only-baseline
  cfg = base_rl_config()
  build = cfg["env"]["env_build"]
  build.update({"get_image": False, "depth_image": False,
                "depth_norm": False,
                "terrain_type": "random_blocks_sparse_and_heightfield"})
  cfg["encoder"] = {"hidden_shapes": [256, 256]}
  cfg["net"] = {"append_hidden_shapes": [256, 256],
                "hidden_shapes": [256, 256]}
  write(osp.join(ROOT, "rl", "static", "state-only-baseline.json"), cfg)

  # mpc + mpc_vision_only
  for group, vision_only in (("mpc", False), ("mpc_vision_only", True)):
    for method in ("baseline", "locotransformer"):
      for terrain, t_mods in TERRAINS.items():
        cfg = base_rl_config()
        cfg["env_name"] = "A1MoveGroundMPC"
        build = cfg["env"]["env_build"]
        apply(build, t_mods)
        for k in ("add_last_action_input", "diagonal_act",
                  "no_displacement"):
          build.pop(k)
        build.update({
            "check_contact": True,
            "clip_num": [0.3, 0.4],
            "domain_randomization": False,
            "num_action_repeat": 5,
            "policy_freq": 20,
            "target_vel": 0.3,
            "time_step_s": 0.001,
        })
        if vision_only:
          build["vision_only"] = True
        cfg["collector"]["epoch_frames"] = 8192
        cfg["replay_buffer"]["size"] = 8192
        cfg["general_setting"]["batch_size"] = 512
        write(osp.join(ROOT, group, method, terrain + ".json"), cfg)


if __name__ == "__main__":
  main()
