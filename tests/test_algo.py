"""Algorithm math tests: GAE vs a hand-rolled reference implementation,
normalizer Welford math, PPO/A2C/VMPO/TRPO update smoke on a toy problem,
off-policy learners smoke."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vision4leg_tpu.algo.a2c import A2CConfig, A2CLearner
from vision4leg_tpu.algo.off_policy.learners import (DQNLearner,
                                                     OffPolicyConfig,
                                                     TD3Learner,
                                                     TwinSACQLearner)
from vision4leg_tpu.algo.ppo import PPOConfig, PPOLearner
from vision4leg_tpu.algo.trpo import TRPOConfig, TRPOLearner
from vision4leg_tpu.algo.vmpo import VMPOConfig, VMPOLearner
from vision4leg_tpu.collector.rollout import Transition
from vision4leg_tpu.data import gae as gae_lib
from vision4leg_tpu.data import normalizer as norm
from vision4leg_tpu.models.actor_critic import StateActorCritic


def ref_gae(rewards, values, terminals, time_limits, last_value, gamma, tau,
            tl_filter):
  """Direct transcription of the reference loop semantics
  (replay_buffers/on_policy.py:17-45) in numpy."""
  T, E = rewards.shape
  vals = np.concatenate([values, last_value[None]], 0)
  A = np.zeros(E)
  advs = np.zeros((T, E))
  rets = np.zeros((T, E))
  for t in reversed(range(T)):
    delta = rewards[t] + (1 - terminals[t]) * gamma * vals[t + 1] - vals[t]
    A = delta + (1 - terminals[t]) * gamma * tau * A
    if tl_filter:
      A = A * (1 - time_limits[t])
    advs[t] = A
    rets[t] = A + vals[t]
  return advs, rets


def test_gae_matches_reference_semantics():
  rng = np.random.RandomState(0)
  T, E = 40, 3
  rewards = rng.randn(T, E).astype(np.float32)
  values = rng.randn(T, E).astype(np.float32)
  terminals = (rng.rand(T, E) < 0.1).astype(np.float32)
  time_limits = (rng.rand(T, E) < 0.05).astype(np.float32)
  last_value = rng.randn(E).astype(np.float32)

  for tl_filter in (True, False):
    advs, rets = jax.jit(gae_lib.gae, static_argnums=(5, 6, 7))(
        jnp.asarray(rewards), jnp.asarray(values), jnp.asarray(terminals),
        jnp.asarray(time_limits), jnp.asarray(last_value), 0.99, 0.95,
        tl_filter)
    r_advs, r_rets = ref_gae(rewards, values, terminals, time_limits,
                             last_value, 0.99, 0.95, tl_filter)
    np.testing.assert_allclose(np.array(advs), r_advs, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.array(rets), r_rets, rtol=2e-4, atol=1e-5)


def test_normalizer_matches_baselines_math():
  """Welford merge must equal direct full-data statistics."""
  rng = np.random.RandomState(1)
  data = rng.randn(100, 7).astype(np.float32) * 3 + 2
  state = norm.init_normalizer(7)
  upd = jax.jit(norm.update)
  for i in range(10):
    state = upd(state, jnp.asarray(data[i * 10: (i + 1) * 10]))
  np.testing.assert_allclose(np.array(state.mean), data.mean(0), atol=1e-3)
  np.testing.assert_allclose(np.array(state.var), data.var(0), atol=1e-2)


def _toy_traj(key, T=16, E=4, D=10, A=3):
  ks = jax.random.split(key, 8)
  std = jnp.full((T, E, A), 0.3)
  return Transition(
      obs=jax.random.normal(ks[0], (T, E, D)),
      acts=jax.random.normal(ks[1], (T, E, A)) * 0.3,
      log_probs=jax.random.normal(ks[2], (T, E, 1)) * 0.1 - 1.0,
      values=jax.random.normal(ks[3], (T, E, 1)),
      rewards=jax.random.normal(ks[4], (T, E, 1)),
      terminals=jnp.zeros((T, E, 1), bool),
      time_limits=jnp.zeros((T, E, 1), bool),
      means=jax.random.normal(ks[5], (T, E, A)) * 0.1,
      stds=std,
  )


def _make(learner_cls, cfg_cls, **kw):
  module = StateActorCritic(action_dim=3, hidden_shapes=(32,),
                            append_hidden_shapes=(32,))
  params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  cfg = cfg_cls(batch_size=16, epoch_frames=64, num_epochs=10,
                opt_epochs=2, **kw)
  learner = learner_cls(cfg, apply_pi, apply_v, params)
  return learner, learner.init_state(params)


def _run_epoch(learner, ts):
  traj = _toy_traj(jax.random.PRNGKey(1))
  last_value = jnp.zeros(4)

  @jax.jit
  def go(ts):
    return learner.update_per_epoch(ts, traj, last_value,
                                    jax.random.PRNGKey(2))

  ts2, metrics = go(ts)
  for k, v in metrics.items():
    assert np.isfinite(float(v)), f"{k} not finite"
  # params actually changed
  p0 = jax.tree_util.tree_leaves(ts.params)[0]
  p1 = jax.tree_util.tree_leaves(ts2.params)[0]
  assert not np.allclose(np.array(p0), np.array(p1))
  return ts2, metrics


def test_ppo_update():
  learner, ts = _make(PPOLearner, PPOConfig)
  _, metrics = _run_epoch(learner, ts)
  assert "ratio/max" in metrics


def test_a2c_update():
  learner, ts = _make(A2CLearner, A2CConfig)
  _run_epoch(learner, ts)


def test_vmpo_update():
  learner, ts = _make(VMPOLearner, VMPOConfig)
  ts2, metrics = _run_epoch(learner, ts)
  assert float(ts2.extras["duals"]["eta"]) >= 1e-8
  assert float(ts2.extras["duals"]["alpha"]) >= 1e-8


def test_trpo_update():
  learner, ts = _make(TRPOLearner, TRPOConfig, v_opt_times=2)
  ts2, metrics = _run_epoch(learner, ts)
  # trust region: KL after the step should be bounded near max_kl
  assert float(metrics["Training/kl_after"]) < 10 * learner.cfg.max_kl


def test_ppo_linear_lr_decay():
  """The masked Adam schedule must decay linearly by epoch."""
  learner, ts = _make(PPOLearner, PPOConfig)
  traj = _toy_traj(jax.random.PRNGKey(1))
  last_value = jnp.zeros(4)

  @jax.jit
  def go(ts):
    return learner.update_per_epoch(ts, traj, last_value,
                                    jax.random.PRNGKey(2))[0]

  for _ in range(3):
    ts = go(ts)
  assert int(ts.epoch) == 3


# ---------------------------------------------------------------------------
# off-policy
# ---------------------------------------------------------------------------

def test_twin_sac_q_update():
  from vision4leg_tpu.models.off_policy_nets import (QNet,
                                                     TanhGaussianPolicy)
  D, A, B = 10, 3, 16
  pf = TanhGaussianPolicy(action_dim=A, hidden_shapes=(32,))
  qf = QNet(hidden_shapes=(32,))
  k = jax.random.PRNGKey(0)
  pf_p = pf.init(k, jnp.zeros((1, D)))
  q1_p = qf.init(jax.random.fold_in(k, 1), jnp.zeros((1, D)),
                 jnp.zeros((1, A)))
  q2_p = qf.init(jax.random.fold_in(k, 2), jnp.zeros((1, D)),
                 jnp.zeros((1, A)))
  learner = TwinSACQLearner(OffPolicyConfig(), pf.apply, qf.apply, A)
  state = learner.init_state(pf_p, q1_p, q2_p)
  batch = {
      "obs": jax.random.normal(k, (B, D)),
      "acts": jnp.clip(jax.random.normal(k, (B, A)), -1, 1),
      "next_obs": jax.random.normal(jax.random.fold_in(k, 3), (B, D)),
      "rewards": jax.random.normal(jax.random.fold_in(k, 4), (B, 1)),
      "terminals": jnp.zeros((B, 1)),
  }
  state2, metrics = jax.jit(learner.update)(state, batch,
                                            jax.random.PRNGKey(5))
  for key, v in metrics.items():
    assert np.isfinite(float(v)), key
  assert int(state2.update_count) == 1


def test_td3_update():
  from vision4leg_tpu.models.off_policy_nets import DetTanhPolicy, QNet
  D, A, B = 10, 3, 16
  pf = DetTanhPolicy(action_dim=A, hidden_shapes=(32,))
  qf = QNet(hidden_shapes=(32,))
  k = jax.random.PRNGKey(0)
  pf_p = pf.init(k, jnp.zeros((1, D)))
  q1_p = qf.init(jax.random.fold_in(k, 1), jnp.zeros((1, D)),
                 jnp.zeros((1, A)))
  q2_p = qf.init(jax.random.fold_in(k, 2), jnp.zeros((1, D)),
                 jnp.zeros((1, A)))
  learner = TD3Learner(OffPolicyConfig(), pf.apply, qf.apply)
  state = learner.init_state(pf_p, q1_p, q2_p)
  batch = {
      "obs": jax.random.normal(k, (B, D)),
      "acts": jnp.clip(jax.random.normal(k, (B, A)), -1, 1),
      "next_obs": jax.random.normal(jax.random.fold_in(k, 3), (B, D)),
      "rewards": jax.random.normal(jax.random.fold_in(k, 4), (B, 1)),
      "terminals": jnp.zeros((B, 1)),
  }
  state2, metrics = jax.jit(learner.update)(state, batch,
                                            jax.random.PRNGKey(5))
  for key, v in metrics.items():
    assert np.isfinite(float(v)), key


def test_dqn_variants():
  from vision4leg_tpu.models.off_policy_nets import (BootstrappedQNet,
                                                     DiscreteQNet)
  D, A, B = 8, 4, 16
  k = jax.random.PRNGKey(0)
  batch = {
      "obs": jax.random.normal(k, (B, D)),
      "acts": jax.random.randint(jax.random.fold_in(k, 1), (B,), 0, A),
      "next_obs": jax.random.normal(jax.random.fold_in(k, 2), (B, D)),
      "rewards": jax.random.normal(jax.random.fold_in(k, 3), (B, 1)),
      "terminals": jnp.zeros((B, 1)),
  }
  for mode, net in (
      ("dqn", DiscreteQNet(num_actions=A, hidden_shapes=(32,))),
      ("qrdqn", DiscreteQNet(num_actions=A, hidden_shapes=(32,),
                             num_quantiles=32)),
      ("bootstrapped", BootstrappedQNet(num_actions=A, num_heads=5,
                                        hidden_shapes=(32,))),
  ):
    qp = net.init(k, jnp.zeros((1, D)))
    learner = DQNLearner(OffPolicyConfig(), net.apply, mode=mode)
    state = learner.init_state(qp)
    state2, metrics = jax.jit(learner.update)(state, batch,
                                              jax.random.PRNGKey(5))
    assert np.isfinite(float(metrics["Training/qf_loss"])), mode


def test_replay_buffer():
  from vision4leg_tpu.data import replay
  rb = replay.init_replay(32, {"obs": jnp.zeros(4), "acts": jnp.zeros(2)})
  add = jax.jit(replay.add_batch)
  for i in range(5):
    rb = add(rb, {"obs": jnp.full((10, 4), i, jnp.float32),
                  "acts": jnp.full((10, 2), i, jnp.float32)})
  assert int(rb.size) == 32
  batch = jax.jit(replay.sample, static_argnums=2)(
      rb, jax.random.PRNGKey(0), 16)
  assert batch["obs"].shape == (16, 4)


def test_host_collector_pendulum():
  """Generic-gym entry: collect from gymnasium Pendulum with batched device
  inference and train a PPO step on it (torchrl get_env parity)."""
  import pytest
  gymnasium = pytest.importorskip("gymnasium")
  from vision4leg_tpu.collector.host import (HostOnPolicyCollector,
                                             make_vec_env)

  env = make_vec_env("Pendulum-v1", 4, asynchronous=False)
  module = StateActorCritic(action_dim=1, hidden_shapes=(32,),
                            append_hidden_shapes=(32,))
  params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  coll = HostOnPolicyCollector(env, apply_pi, apply_v,
                               max_episode_frames=50)
  traj, last_v = coll.collect(params, horizon=20)
  assert traj.obs.shape == (20, 4, 3)
  assert np.all(np.isfinite(np.asarray(traj.obs)))

  cfg = PPOConfig(batch_size=8, epoch_frames=80, num_epochs=5,
                  opt_epochs=1, max_episode_frames=50)
  learner = PPOLearner(cfg, apply_pi, apply_v, params)
  ts = learner.init_state(params)
  ts, metrics = jax.jit(learner.update_per_epoch)(
      ts, traj, last_v, jax.random.PRNGKey(1))
  assert np.isfinite(float(metrics["Training/policy_loss"]))


def test_checkpoint_roundtrip_box_terrain(tmp_path):
  """save_checkpoint/restore_checkpoint must roundtrip on a box terrain —
  its TerrainState carries zero-size leaves (obstacle_spheres (0,5)),
  which orbax refuses unless padded (this exact failure killed a training
  run at the first save_interval)."""
  import numpy as np
  from vision4leg_tpu.algo.agent import PPOAgent
  from vision4leg_tpu.algo.ppo import PPOConfig
  from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
  from vision4leg_tpu.models.actor_critic import StateActorCritic

  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, add_last_action_input=True,
      no_displacement=True, diagonal_act=True, alive_reward=-0.05,
      terrain_type="random_blocks_sparse_thin_wide", settle_steps=20))
  module = StateActorCritic(action_dim=6, hidden_shapes=(32,),
                            append_hidden_shapes=(32,))
  cfg = PPOConfig(plr=1e-4, vlr=1e-4, opt_epochs=1, batch_size=8,
                  epoch_frames=16, max_episode_frames=8, num_epochs=1)

  class _NullLogger:
    work_dir = str(tmp_path)
    def add_epoch_info(self, *a, **k): pass
    def log(self, *a, **k): pass

  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4, seed=0,
                   logger=_NullLogger(), save_dir=str(tmp_path),
                   obs_norm=True)
  assert agent.collector_state.env_states.terrain.obstacle_spheres.size == 0
  agent.save_checkpoint(epoch=3)

  agent2 = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4, seed=1,
                    logger=_NullLogger(), save_dir=str(tmp_path),
                    obs_norm=True)
  next_epoch = agent2.restore_checkpoint()
  assert next_epoch == 4
  np.testing.assert_array_equal(np.asarray(agent2.key),
                                np.asarray(agent.key))
  a = jax.tree.leaves(agent.train_state.params)
  b = jax.tree.leaves(agent2.train_state.params)
  for x, y in zip(a, b):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
  assert (agent2.collector_state.env_states.terrain.obstacle_spheres.shape
          == agent.collector_state.env_states.terrain.obstacle_spheres.shape)


def test_checkpoint_restore_predates_new_fields(tmp_path):
  """Checkpoints saved before a CollectorState field existed must still
  restore: the missing leaf keeps its template default instead of
  crashing orbax with a structure mismatch (e.g. r1 checkpoints predate
  finished_len_sum)."""
  import numpy as np
  import orbax.checkpoint as ocp
  from vision4leg_tpu.algo.agent import PPOAgent
  from vision4leg_tpu.algo.ppo import PPOConfig
  from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
  from vision4leg_tpu.models.actor_critic import StateActorCritic

  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, add_last_action_input=True,
      no_displacement=True, diagonal_act=True, alive_reward=-0.05,
      terrain_type="plane", settle_steps=20))
  module = StateActorCritic(action_dim=6, hidden_shapes=(32,),
                            append_hidden_shapes=(32,))
  cfg = PPOConfig(plr=1e-4, vlr=1e-4, opt_epochs=1, batch_size=8,
                  epoch_frames=16, max_episode_frames=8, num_epochs=1)

  class _NullLogger:
    work_dir = str(tmp_path)
    def add_epoch_info(self, *a, **k): pass
    def log(self, *a, **k): pass

  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4, seed=0,
                   logger=_NullLogger(), save_dir=str(tmp_path),
                   obs_norm=True)
  agent.save_checkpoint(epoch=5)

  # rewrite the stored tree as raw dicts WITHOUT finished_len_sum,
  # emulating a checkpoint from before the field existed
  import os.path as osp
  import shutil
  path_ck = osp.join(str(tmp_path), "checkpoint")
  with ocp.PyTreeCheckpointer() as ckptr:
    raw = ckptr.restore(path_ck)
  assert "finished_len_sum" in raw["collector_state"]
  del raw["collector_state"]["finished_len_sum"]
  shutil.rmtree(path_ck)
  with ocp.PyTreeCheckpointer() as ckptr:
    ckptr.save(path_ck, raw, force=True)

  agent2 = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4, seed=1,
                    logger=_NullLogger(), save_dir=str(tmp_path),
                    obs_norm=True)
  sentinel = np.asarray(agent2.collector_state.finished_len_sum).copy()
  next_epoch = agent2.restore_checkpoint()
  assert next_epoch == 6
  # restored leaves come from the old checkpoint...
  np.testing.assert_array_equal(np.asarray(agent2.key),
                                np.asarray(agent.key))
  for x, y in zip(jax.tree.leaves(agent.train_state.params),
                  jax.tree.leaves(agent2.train_state.params)):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
  # ...while the missing one keeps its template default
  np.testing.assert_array_equal(
      np.asarray(agent2.collector_state.finished_len_sum), sentinel)


def test_off_policy_agent_loop():
  """The timestep-driven off-policy loop (OffRLAlgo equivalent): pretrain
  fills the replay with random exploration, then each env step triggers
  learner updates from uniform samples; all state stays on device."""
  from vision4leg_tpu.algo.off_policy.agent import OffPolicyAgent
  from vision4leg_tpu.algo.off_policy.learners import (OffPolicyConfig,
                                                       TwinSACQLearner)
  from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
  from vision4leg_tpu.models.off_policy_nets import QNet, TanhGaussianPolicy

  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, add_last_action_input=True,
      no_displacement=True, diagonal_act=True, alive_reward=-0.05,
      terrain_type="plane", settle_steps=20))
  D, A = env.obs_dim, env.cfg.action_dim
  pf = TanhGaussianPolicy(action_dim=A, hidden_shapes=(32,),
                          append_hidden_shapes=())
  qf = QNet(hidden_shapes=(32,))
  k = jax.random.PRNGKey(0)
  pf_p = pf.init(k, jnp.zeros((1, D)))
  q1_p = qf.init(jax.random.fold_in(k, 1), jnp.zeros((1, D)),
                 jnp.zeros((1, A)))
  q2_p = qf.init(jax.random.fold_in(k, 2), jnp.zeros((1, D)),
                 jnp.zeros((1, A)))

  cfg = OffPolicyConfig(batch_size=16)
  learner = TwinSACQLearner(cfg, pf.apply, qf.apply, A)
  agent = OffPolicyAgent(env=env, learner=learner,
                         learner_state=learner.init_state(pf_p, q1_p, q2_p),
                         apply_pf=pf.apply, num_envs=4, replay_capacity=512,
                         seed=0, pretrain_frames=32, max_episode_frames=16)
  agent.pretrain()
  assert int(agent.collector_state.replay.size) == 32
  avg_rew, infos = agent.train_epoch(epoch_frames=32)
  assert np.isfinite(avg_rew)
  for key, v in infos.items():
    assert np.isfinite(v), key
  assert int(agent.learner_state.update_count) == 8
  # second epoch reuses the memoized jitted program (same step count)
  agent.train_epoch(epoch_frames=32)
  assert int(agent.learner_state.update_count) == 16
  assert list(agent._epoch_programs) == [8]


def test_warm_start_from_snapshot(tmp_path):
  """When the orbax checkpoint is gone but the best snapshot + log.csv
  survive (a fresh clone of a committed run), restore_checkpoint must
  warm-start: params + normalizer from the snapshot, epoch/frames/
  best_eval from the log — instead of silently restarting at epoch 0."""
  import numpy as np
  from vision4leg_tpu.algo.agent import PPOAgent
  from vision4leg_tpu.algo.ppo import PPOConfig
  from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
  from vision4leg_tpu.models.actor_critic import StateActorCritic

  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, add_last_action_input=True,
      no_displacement=True, diagonal_act=True, alive_reward=-0.05,
      terrain_type="plane", settle_steps=20))
  module = StateActorCritic(action_dim=6, hidden_shapes=(32,),
                            append_hidden_shapes=(32,))
  cfg = PPOConfig(plr=1e-4, vlr=1e-4, opt_epochs=1, batch_size=8,
                  epoch_frames=16, max_episode_frames=8, num_epochs=1)

  work_dir = tmp_path / "run"
  save_dir = work_dir / "model"
  save_dir.mkdir(parents=True)

  class _NullLogger:
    def add_epoch_info(self, *a, **k): pass
    def log(self, *a, **k): pass
  _NullLogger.work_dir = str(work_dir)

  agent = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4, seed=0,
                   logger=_NullLogger(), save_dir=str(save_dir),
                   obs_norm=True)
  # make the saved state distinguishable from a fresh init
  nrm = agent.collector_state.normalizer
  agent.collector_state = agent.collector_state.replace(
      normalizer=nrm.replace(mean=nrm.mean + 3.5, count=nrm.count + 100.0))
  agent.snapshot("best")
  with open(work_dir / "log.csv", "w") as f:
    f.write("EPOCH,Total Frames,Eval_Rewards_Average\n")
    f.write("0,16,\n1,32,12.5\n2,48,7.0\n")

  agent2 = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4, seed=1,
                    logger=_NullLogger(), save_dir=str(save_dir),
                    obs_norm=True)
  next_epoch = agent2.restore_checkpoint()
  assert next_epoch == 3
  assert agent2.total_frames == 48
  assert agent2.best_eval == 12.5
  for x, y in zip(jax.tree.leaves(agent.train_state.params),
                  jax.tree.leaves(agent2.train_state.params)):
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
  np.testing.assert_allclose(
      np.asarray(agent2.collector_state.normalizer.mean),
      np.asarray(agent.collector_state.normalizer.mean))
  np.testing.assert_allclose(
      float(agent2.collector_state.normalizer.count),
      float(agent.collector_state.normalizer.count))

  # and with neither checkpoint nor snapshot artifacts: a plain 0
  agent3 = PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=4, seed=2,
                    logger=_NullLogger(), save_dir=str(tmp_path / "empty"),
                    obs_norm=True)
  assert agent3.restore_checkpoint() == 0


def test_degenerate_horizon_warning(tmp_path):
  """T = epoch_frames/num_envs < 64 must warn loudly (PARITY.md horizon
  ablation: T=16 oscillates +255 -> -548; T>=64 is the stable regime),
  and T >= 64 must stay silent."""
  import warnings as _warnings
  from vision4leg_tpu.algo.agent import PPOAgent
  from vision4leg_tpu.algo.ppo import PPOConfig
  from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
  from vision4leg_tpu.models.actor_critic import StateActorCritic

  env = A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, add_last_action_input=True,
      no_displacement=True, diagonal_act=True, alive_reward=-0.05,
      terrain_type="plane", settle_steps=20))
  module = StateActorCritic(action_dim=6, hidden_shapes=(32,),
                            append_hidden_shapes=(32,))

  class _NullLogger:
    work_dir = str(tmp_path)
    def add_epoch_info(self, *a, **k): pass
    def log(self, *a, **k): pass

  def build(epoch_frames, num_envs):
    cfg = PPOConfig(plr=1e-4, vlr=1e-4, opt_epochs=1, batch_size=8,
                    epoch_frames=epoch_frames, max_episode_frames=8,
                    num_epochs=1)
    return PPOAgent(env=env, ac_module=module, cfg=cfg, num_envs=num_envs,
                    seed=0, logger=_NullLogger(), save_dir=str(tmp_path),
                    obs_norm=True)

  with pytest.warns(UserWarning, match="GAE horizon"):
    build(epoch_frames=64, num_envs=4)          # T = 16

  with _warnings.catch_warnings():
    _warnings.simplefilter("error")
    build(epoch_frames=256, num_envs=4)         # T = 64: silent
