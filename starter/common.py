"""Shared experiment wiring for starter scripts.

Mirrors the reference starters' structure (starter/ppo_*.py): parse args +
JSON config, build env / networks / collector / PPO, call train().  The
env count is `--num_envs` (TPU-native: envs are vmapped device state), with
`--vec_env_nums` kept as the fallback for reference-CLI parity.
"""
from __future__ import annotations

import os
import os.path as osp
import random

import numpy as np

# This host pins JAX_PLATFORMS=axon and re-asserts it during jax import;
# honor an explicit platform override through the config API instead.
if os.environ.get("V4L_TPU_PLATFORM"):
  import jax
  jax.config.update("jax_platforms", os.environ["V4L_TPU_PLATFORM"])
  if os.environ.get("V4L_TPU_CPU_DEVICES"):
    jax.config.update("jax_num_cpu_devices",
                      int(os.environ["V4L_TPU_CPU_DEVICES"]))

# persistent compilation cache: compiles run REMOTELY over the axon
# tunnel (PALLAS_AXON_REMOTE_COMPILE=1) and long compiles occasionally
# drop with UNAVAILABLE; caching makes retries resume past already-built
# programs instead of recompiling from scratch
import jax  # noqa: E402
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_v4l"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from vision4leg_tpu.algo.agent import PPOAgent
from vision4leg_tpu.algo.ppo import PPOConfig
from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.utils.args import get_args, get_params
from vision4leg_tpu.utils.logger import Logger


def run_experiment(build_module, eval_params_transform=None):
  """build_module(env, params) -> flax actor-critic module.

  eval_params_transform(env_params) -> env_params: when given, evaluation
  runs on a SEPARATE env built from the transformed copy of params["env"]
  (sim-to-sim transfer, reference ppo_nature_cnn_sim2sim.py:43-60); the
  train env's obs normalizer is shared, as in the reference.
  """
  args = get_args()
  params = get_params(args.config)

  env, meta = get_env(params["env_name"], params["env"])

  eval_env = eval_horizon = None
  if eval_params_transform is not None:
    import copy
    eval_env_params = eval_params_transform(copy.deepcopy(params["env"]))
    eval_env, eval_meta = get_env(params["env_name"], eval_env_params)
    eval_horizon = eval_meta["horizon"]

  num_envs = args.num_envs or max(args.vec_env_nums, 1)

  random.seed(args.seed)
  np.random.seed(args.seed)

  experiment_name = (osp.split(osp.splitext(args.config)[0])[-1]
                     if args.id is None else args.id)
  # --resume wins over --overwrite: a retry loop that passes both (fresh
  # start if no checkpoint, continue if there is one) must never rmtree
  # the very checkpoint it is about to restore.
  logger = Logger(experiment_name, params["env_name"], args.seed, params,
                  args.log_dir, args.overwrite and not args.resume)

  module = build_module(env, params)

  gs = params["general_setting"]
  ppo = params["ppo"]
  cfg = PPOConfig(
      plr=ppo["plr"], vlr=ppo["vlr"], clip_para=ppo.get("clip_para", 0.2),
      opt_epochs=ppo.get("opt_epochs", 10),
      clipped_value_loss=ppo.get("clipped_value_loss", False),
      entropy_coeff=ppo.get("entropy_coeff", 0.001),
      discount=gs.get("discount", 0.99),
      tau=ppo.get("tau", 0.95),
      gae=gs.get("gae", True),
      shuffle=ppo.get("shuffle", True),
      batch_size=gs.get("batch_size", 1024),
      num_epochs=args.num_epochs or gs.get("num_epochs", 1500),
      epoch_frames=params["collector"].get("epoch_frames", 16384),
      max_episode_frames=params["collector"].get("max_episode_frames", 999),
      time_limit_filter=params["replay_buffer"].get("time_limit_filter",
                                                    True),
  )

  # Data parallelism is automatic on multi-chip hosts (SURVEY.md 2.6:
  # the env axis is the reference's only parallel axis): shard envs over
  # a jax.sharding.Mesh of all local devices and let GSPMD insert the
  # gradient all-reduces over ICI.  V4L_MESH=0 opts out; single-chip
  # hosts (this one) are unaffected.
  mesh = None
  n_dev = jax.device_count()
  if (n_dev > 1 and os.environ.get("V4L_MESH", "1") != "0"):
    if num_envs % n_dev == 0:
      from vision4leg_tpu.parallel.mesh import make_mesh
      mesh = make_mesh()
      logger.log(f"env axis sharded over {n_dev}-device mesh")
    else:
      logger.log(f"V4L_MESH skipped: num_envs={num_envs} not divisible "
                 f"by {n_dev} devices")

  # V4L_BF16_COLLECT=1: run the collection-policy forward in bfloat16
  # (the PPO update stays f32) — the MXU inference lever bench.py exposes
  # as V4L_BENCH_BF16, here for full training runs so its effect on
  # learning can be measured (PARITY.md horizon/bf16 evidence runs).
  inference_dtype = None
  if os.environ.get("V4L_BF16_COLLECT", "") not in ("", "0"):
    import jax.numpy as jnp
    inference_dtype = jnp.bfloat16
    logger.log("bfloat16 collection forward enabled (V4L_BF16_COLLECT)")

  agent = PPOAgent(
      env=env, ac_module=module, cfg=cfg, num_envs=num_envs,
      seed=args.seed, logger=logger, mesh=mesh,
      inference_dtype=inference_dtype,
      save_dir=osp.join(logger.work_dir, "model"),
      eval_interval=gs.get("eval_interval", 10),
      save_interval=gs.get("save_interval", 100),
      # the reference evaluates eval_episodes (=2) episodes per eval pass;
      # extra vmapped eval envs are ~free on device, and a wider sample
      # makes Eval_Rewards_Average / best-snapshot selection far less
      # noisy.  V4L_STRICT_EVAL=1 restores the reference's exact episode
      # count for protocol-identical eval logs (PARITY.md deviation note).
      num_eval_envs=(params["collector"].get("eval_episodes", 2)
                     if os.environ.get("V4L_STRICT_EVAL", "") not in
                     ("", "0")
                     else max(8, params["collector"].get("eval_episodes",
                                                         2))),
      obs_norm=meta["obs_norm"],
      env_time_limit=meta["horizon"],
      reward_scale=meta["reward_scale"],
      eval_env=eval_env, eval_horizon=eval_horizon,
  )
  agent.train(resume=args.resume)
  return agent
