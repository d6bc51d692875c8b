"""End-to-end `PPOAgent.train()` at tiny scale.

The epoch loop (rl_algo.py:111-167 semantics: per-epoch metric logging,
eval-interval branch, best-snapshot selection, checkpoint cadence) was
previously exercised only by the starter-CLI smoke; this pins it in the
unit suite — including the batched one-transfer metric fetch and the
donated-buffer rebinding across epochs.
"""
import csv
import os
import os.path as osp

import numpy as np

from vision4leg_tpu.algo.agent import PPOAgent
from vision4leg_tpu.algo.ppo import PPOConfig
from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.models.actor_critic import StateActorCritic
from vision4leg_tpu.utils.logger import Logger


def test_train_loop_end_to_end(tmp_path):
  env, meta = get_env("A1MoveGround", {
      "obs_norm": True,
      "env_build": {"motor_control_mode": "POSITION",
                    "time_step_s": 0.0025, "num_action_repeat": 4,
                    "diagonal_act": True,
                    "clip_num": [0.05, 0.5, 0.5] * 4,
                    "terrain_type": "plane"}})
  module = StateActorCritic(action_dim=6, hidden_shapes=(16, 16),
                            append_hidden_shapes=(16, 16))
  cfg = PPOConfig(plr=1e-3, vlr=1e-3, opt_epochs=1, batch_size=8,
                  epoch_frames=32, max_episode_frames=999, num_epochs=4)
  logger = Logger("exp", "A1MoveGround", 0, {"p": 1}, str(tmp_path))
  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4,
                   seed=0, logger=logger, save_dir=osp.join(logger.work_dir, "model"),
                   obs_norm=True,
                   env_time_limit=20,      # short eval scan
                   eval_interval=2, save_interval=2, num_eval_envs=2)
  agent.train()

  with open(logger.csv_file_path, newline="") as f:
    rows = list(csv.DictReader(f))
  assert [r["EPOCH"] for r in rows] == ["0", "1", "2", "3"]

  # every logged scalar is finite (the one-transfer stacked fetch
  # round-trips all of them through a single f32 vector)
  for r in rows:
    for k, v in r.items():
      if v not in ("", None):
        assert np.isfinite(float(v)), (k, v)

  # update metrics and diagnostics flow through
  assert float(rows[0]["diagnostics/nonfinite_obs"]) == 0.0
  assert "Training/policy_loss" in rows[0]

  # eval branch ran on epochs 2 and 4 (1-indexed interval), and the CSV
  # realignment backfills the eval columns for the earlier epochs
  assert rows[1]["Eval_Rewards_Average"] not in ("", None)
  assert rows[3]["Eval_Rewards_Average"] not in ("", None)

  # best snapshot + checkpoint cadence
  assert os.path.exists(osp.join(logger.work_dir, "model", "model_pf_best.flax"))
  assert os.path.exists(os.path.join(osp.join(logger.work_dir, "model"), "checkpoint"))

  # resume path: restore_checkpoint picks up after the last saved epoch
  agent2 = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4,
                    seed=0, logger=logger, save_dir=osp.join(logger.work_dir, "model"),
                    obs_norm=True, env_time_limit=20,
                    eval_interval=2, save_interval=2, num_eval_envs=2)
  nxt = agent2.restore_checkpoint()
  assert nxt == 4  # checkpoint written at epoch 3 (0-indexed), resume at 4


def test_donation_fallback_paths(monkeypatch):
  """Both donation regimes build working epoch programs.

  The axon TPU tunnel cannot report buffer pointers, so
  `_unalias_donated` cannot dedup CSE-aliased jit outputs and donating
  the collector state fails the whole dispatch (INVALID_ARGUMENT) —
  `_donation_usable()` therefore disables donate_argnums there.  Pin
  that each forced regime (V4L_DONATE=0/1) trains an epoch and agrees
  on the resulting loss; on backends that ignore donation (CPU) the two
  programs are numerically identical.
  """
  import jax

  import vision4leg_tpu.algo.agent as agent_mod

  env, meta = get_env("A1MoveGround", {
      "obs_norm": True,
      "env_build": {"motor_control_mode": "POSITION",
                    "time_step_s": 0.0025, "num_action_repeat": 4,
                    "diagonal_act": True,
                    "clip_num": [0.05, 0.5, 0.5] * 4,
                    "terrain_type": "plane"}})
  module = StateActorCritic(action_dim=6, hidden_shapes=(16, 16),
                            append_hidden_shapes=(16, 16))
  cfg = PPOConfig(plr=1e-3, vlr=1e-3, opt_epochs=1, batch_size=8,
                  epoch_frames=32, max_episode_frames=999, num_epochs=1)

  class _Null:
    work_dir = "/tmp/v4l_donation_test"
    def add_epoch_info(self, *a, **k): pass
    def add_update_info(self, *a, **k): pass
    def log(self, *a, **k): pass

  losses = {}
  for donate in ("0", "1"):
    monkeypatch.setenv("V4L_DONATE", donate)
    monkeypatch.setattr(agent_mod, "_DONATION_USABLE", None)
    agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4,
                     seed=0, logger=_Null(), save_dir=_Null.work_dir,
                     obs_norm=True, env_time_limit=20,
                     eval_interval=10, save_interval=10, num_eval_envs=2)
    assert agent_mod._donation_usable() is (donate == "1")
    ts, cs, m = agent._train_epoch(agent.train_state,
                                   agent.collector_state,
                                   jax.random.PRNGKey(7))
    losses[donate] = float(m["Training/policy_loss"])
    assert np.isfinite(losses[donate])
  monkeypatch.setattr(agent_mod, "_DONATION_USABLE", None)
  assert losses["0"] == losses["1"]


def test_sim2sim_eval_env(tmp_path):
  """Sim-to-sim transfer evaluation (reference ppo_nature_cnn_sim2sim.py:
  43-60): the agent collects on the train env but evaluates on a SEPARATE
  env built from mutated env params (here: a different episode budget via
  eval_horizon and per-step MMDR frame re-randomization), sharing the
  train normalizer.  Pins the eval_env plumbing + the starter's params
  transform."""
  import jax

  from starter.ppo_nature_cnn_sim2sim import sim2sim_eval_params

  env_params = {
      "obs_norm": True,
      "horizon": 999,
      "env_build": {"motor_control_mode": "POSITION",
                    "time_step_s": 0.0025, "num_action_repeat": 4,
                    "diagonal_act": True,
                    "clip_num": [0.05, 0.5, 0.5] * 4,
                    "get_image_interval": 1, "frame_extract": 1,
                    "curriculum": False,
                    "terrain_type": "plane"}}
  import copy
  env, meta = get_env("A1MoveGround", copy.deepcopy(env_params))
  ev = sim2sim_eval_params(copy.deepcopy(env_params))
  # the reference transform: interval 1 + extract 1 -> frame_extract 4,
  # per-step frame reset, horizon 2000, curriculum off
  assert ev["env_build"]["frame_extract"] == 4
  assert ev["env_build"]["reset_frame_idx_each_step"] is True
  assert ev["horizon"] == 2000
  assert ev["env_build"]["curriculum"] is False
  eval_env, eval_meta = get_env("A1MoveGround", ev)
  assert eval_env.obs_dim == env.obs_dim  # same policy must run on both

  module = StateActorCritic(action_dim=6, hidden_shapes=(16, 16),
                            append_hidden_shapes=(16, 16))
  cfg = PPOConfig(plr=1e-3, vlr=1e-3, opt_epochs=1, batch_size=8,
                  epoch_frames=32, max_episode_frames=999, num_epochs=2)
  logger = Logger("exp", "A1MoveGround", 0, {"p": 1}, str(tmp_path))
  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4,
                   seed=0, logger=logger,
                   save_dir=osp.join(logger.work_dir, "model"),
                   obs_norm=True, env_time_limit=20,
                   eval_interval=1, save_interval=2, num_eval_envs=2,
                   eval_env=eval_env, eval_horizon=12)
  rets, steps = agent._eval(agent.train_state.params,
                            agent.collector_state.normalizer,
                            jax.random.PRNGKey(0))
  assert rets.shape == (2,)
  assert float(steps.max()) <= 12  # the eval scan runs at eval_horizon


def test_vision_only_epoch_zero_proprio(tmp_path):
  """Vision-only MPC envs have proprio_dim == 0, so the obs normalizer
  tracks a ZERO-SIZE vector — the per-epoch telemetry's normalizer-drift
  max has no identity there (caught live by the round-4 vision-only
  training run's smoke: 'zero-size array to reduction operation max').
  Pins one full train epoch on a vision-only env."""
  import json

  params = json.load(open(osp.join(
      osp.dirname(osp.dirname(osp.abspath(__file__))),
      "config/mpc_vision_only/locotransformer/thin.json")))
  params["env"]["env_build"]["terrain_type"] = "plane"
  env, meta = get_env(params["env_name"], params["env"])
  assert env.cfg.proprio_dim == 0

  from starter.ppo_locotransformer_vision_only import build_module
  module = build_module(env, params)
  cfg = PPOConfig(plr=1e-3, vlr=1e-3, opt_epochs=1, batch_size=8,
                  epoch_frames=16, max_episode_frames=8, num_epochs=1)
  logger = Logger("exp", params["env_name"], 0, {"p": 1}, str(tmp_path))
  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=2,
                   seed=0, logger=logger,
                   save_dir=osp.join(logger.work_dir, "model"),
                   obs_norm=meta["obs_norm"], env_time_limit=8,
                   eval_interval=100, save_interval=100, num_eval_envs=2)
  import jax
  ts, cs, metrics = agent._train_epoch(agent.train_state,
                                       agent.collector_state,
                                       jax.random.PRNGKey(0))
  assert float(metrics["diagnostics/obs_norm_var_max"]) == 0.0
  assert np.isfinite(float(metrics["Training/policy_loss"]))


def test_time_based_checkpoint(tmp_path, monkeypatch):
  """The wall-clock resume-point floor (agent.py train loop): with a
  save_interval far beyond the run length but V4L_CKPT_SECS tiny, every
  epoch past the first writes a full checkpoint — bounding kill+resume
  replay loss under chip contention to ckpt_secs of wall-clock instead
  of save_interval epochs.  Numbered snapshot files must stay on the
  epoch schedule (none here)."""
  monkeypatch.setenv("V4L_CKPT_SECS", "0.001")
  env, meta = get_env("A1MoveGround", {
      "obs_norm": True,
      "env_build": {"motor_control_mode": "POSITION",
                    "time_step_s": 0.0025, "num_action_repeat": 4,
                    "diagonal_act": True,
                    "clip_num": [0.05, 0.5, 0.5] * 4,
                    "terrain_type": "plane"}})
  module = StateActorCritic(action_dim=6, hidden_shapes=(16, 16),
                            append_hidden_shapes=(16, 16))
  cfg = PPOConfig(plr=1e-3, vlr=1e-3, opt_epochs=1, batch_size=8,
                  epoch_frames=32, max_episode_frames=999, num_epochs=3)
  logger = Logger("exp", "A1MoveGround", 0, {"p": 1}, str(tmp_path))
  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4,
                   seed=0, logger=logger,
                   save_dir=osp.join(logger.work_dir, "model"),
                   obs_norm=True, env_time_limit=20,
                   eval_interval=10, save_interval=1000, num_eval_envs=2)
  agent.train()
  model_dir = osp.join(logger.work_dir, "model")
  assert os.path.exists(osp.join(model_dir, "checkpoint"))
  # no numbered epoch snapshots (save_interval never fired)
  assert not [f for f in os.listdir(model_dir)
              if f.startswith("model_pf_") and f[9:-5].isdigit()]
  # the checkpoint is a usable resume point at the last-written epoch
  agent2 = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4,
                    seed=0, logger=logger,
                    save_dir=osp.join(logger.work_dir, "model"),
                    obs_norm=True, env_time_limit=20,
                    eval_interval=10, save_interval=1000, num_eval_envs=2)
  assert agent2.restore_checkpoint() == 3


def test_ckpt_secs_disabled(tmp_path, monkeypatch):
  """V4L_CKPT_SECS=0 disables the time trigger (ckpt_secs -> inf)."""
  monkeypatch.setenv("V4L_CKPT_SECS", "0")
  env, meta = get_env("A1MoveGround", {
      "obs_norm": True,
      "env_build": {"motor_control_mode": "POSITION",
                    "time_step_s": 0.0025, "num_action_repeat": 4,
                    "diagonal_act": True,
                    "clip_num": [0.05, 0.5, 0.5] * 4,
                    "terrain_type": "plane"}})
  module = StateActorCritic(action_dim=6, hidden_shapes=(16, 16),
                            append_hidden_shapes=(16, 16))
  cfg = PPOConfig(plr=1e-3, vlr=1e-3, opt_epochs=1, batch_size=8,
                  epoch_frames=32, max_episode_frames=999, num_epochs=1)
  logger = Logger("exp", "A1MoveGround", 0, {"p": 1}, str(tmp_path))
  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4,
                   seed=0, logger=logger,
                   save_dir=osp.join(logger.work_dir, "model"),
                   obs_norm=True, env_time_limit=20)
  assert agent.ckpt_secs == np.inf
