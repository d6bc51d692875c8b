"""Environment construction from the reference JSON config schema.

Mirrors vision4leg/get_env.py + vision4leg/env_dict.py: `env_name`
("A1MoveGround") + the `env` section of a config JSON build an environment.
The wrapper stack of the reference (RewardShift -> TimeLimit -> NormAct ->
NormObs(WithImg), get_env.py:70-130) is realized functionally: NormAct +
obs normalization live in the jitted collector, TimeLimit in the rollout
step bookkeeping, reward_scale here.
"""
from __future__ import annotations

from typing import Tuple

from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig

# env_dict.py:11-24
TIMELIMIT = {"A1MoveGround": 1000, "A1MoveGroundMPC": 1000}

# keys of build_a1_ground_env that map directly onto EnvConfig fields
_DIRECT_KEYS = {
    "motor_control_mode", "z_constrain", "other_direction_penalty",
    "z_penalty", "diagonal_act", "num_action_repeat", "time_step_s",
    "add_last_action_input", "enable_action_interpolation",
    "enable_action_filter", "domain_randomization", "get_image",
    "depth_image", "depth_norm", "grayscale", "rgbd", "terrain_type",
    "alive_reward", "fall_reward", "target_vel", "random_init_range",
    "check_contact", "frame_extract", "goal", "subgoal", "goal_coeff",
    "subgoal_reward", "no_displacement", "get_image_interval",
    "reset_frame_idx", "reset_frame_idx_each_step", "random_shape",
    "moving", "curriculum", "interpolation", "fixed_delay_observation",
    "empty_image", "random_dir", "dir_update_interval", "rotate_sensor",
    "record_video",
}


def env_config_from_build_params(env_build: dict) -> EnvConfig:
  kwargs = {}
  for k, v in env_build.items():
    if k in _DIRECT_KEYS:
      kwargs[k] = v
    elif k == "clip_num":
      kwargs["clip_num"] = tuple(v) if v is not None else None
    elif k == "fric_coeff":
      kwargs["fric_coeff"] = tuple(v)
    else:
      raise KeyError(f"unknown env_build key: {k}")
  return EnvConfig(**kwargs)


def get_env(env_name: str, env_params: dict):
  """Returns (env, meta) where meta carries reward_scale / obs_norm /
  horizon for the collector layer (get_env.py:70-130 wrapper semantics)."""
  env_build = dict(env_params.get("env_build", {}))
  if "rew_norm" in env_params:
    # NormRet (base_wrapper.py:125-148) is implemented and tested
    # (envs/wrappers.py norm_ret_step) but not plumbed into the rollout;
    # no shipped config uses it — reject rather than silently ignore
    raise NotImplementedError(
        "rew_norm: running-return normalization is not wired into the "
        "collector (wrappers.norm_ret_step exists; no shipped config "
        "sets rew_norm)")
  meta = {
      "reward_scale": env_params.get("reward_scale", 1.0),
      "obs_norm": env_params.get("obs_norm", False),
      "horizon": env_params.get("horizon", TIMELIMIT.get(env_name, 1000)),
  }
  if env_name == "A1MoveGround":
    cfg = env_config_from_build_params(env_build)
    return A1GymEnv(cfg), meta
  if env_name == "A1MoveGroundMPC":
    from vision4leg_tpu.envs.mpc_env import A1MPCGymEnv, MpcEnvConfig
    policy_freq = env_build.pop("policy_freq", 10)
    vision_only = env_build.pop("vision_only", False)
    clip = env_build.pop("clip_num", None)
    base = env_config_from_build_params(env_build)
    import dataclasses
    cfg = MpcEnvConfig(
        **{f.name: getattr(base, f.name)
           for f in dataclasses.fields(base)},
        policy_freq=policy_freq, vision_only=vision_only)
    cfg = dataclasses.replace(
        cfg, clip_num=tuple(clip) if clip is not None else None)
    return A1MPCGymEnv(cfg), meta
  raise NotImplementedError(f"unknown env {env_name}")
