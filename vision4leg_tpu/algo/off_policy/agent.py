"""Timestep-driven off-policy training loop (the OffRLAlgo machinery).

Reference: torchrl/algo/off_policy/off_rl_algo.py — pretrain frames of
random exploration, then per-timestep {step env -> push to replay ->
`opt_times` gradient updates on uniform replay samples} with soft/hard
target updates.  Here the whole epoch (env steps + replay writes +
updates) compiles into one jitted lax.scan over device state; the replay
ring lives in HBM (data/replay.py).

The reference exports this stack but its papers train PPO only
(SURVEY.md 2.1) — provided for capability parity and usable with any
learner from algo/off_policy/learners.py.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from vision4leg_tpu.data import replay as replay_lib


@struct.dataclass
class OffPolicyCollectorState:
  env_states: object
  raw_obs: jnp.ndarray
  ep_steps: jnp.ndarray
  replay: replay_lib.ReplayBuffer
  key: jax.Array
  total_frames: jnp.ndarray


class OffPolicyAgent:
  """Minimal TPU-native OffRLAlgo: batched envs + device replay + any
  off-policy learner (TwinSACQ/TD3/DDPG/SAC)."""

  def __init__(self, env, learner, learner_state, apply_pf: Callable,
               num_envs: int, replay_capacity: int, seed: int,
               pretrain_frames: int = 1000, max_episode_frames: int = 999,
               updates_per_step: int = 1):
    self.env = env
    self.learner = learner
    self.apply_pf = apply_pf
    self.num_envs = num_envs
    self.pretrain_frames = pretrain_frames
    self.max_episode_frames = max_episode_frames
    self.updates_per_step = updates_per_step
    self.learner_state = learner_state

    key = jax.random.PRNGKey(seed)
    self.key, k_reset, k_cs = jax.random.split(key, 3)
    env_states, raw_obs = jax.jit(jax.vmap(env.reset))(
        jax.random.split(k_reset, num_envs))
    example = {
        "obs": raw_obs[0],
        "acts": jnp.zeros((env.cfg.action_dim,)),
        "rewards": jnp.zeros((1,)),
        "next_obs": raw_obs[0],
        "terminals": jnp.zeros((1,)),
    }
    self.collector_state = OffPolicyCollectorState(
        env_states=env_states, raw_obs=raw_obs,
        ep_steps=jnp.zeros((num_envs,), jnp.int32),
        replay=replay_lib.init_replay(replay_capacity, example),
        key=k_cs, total_frames=jnp.zeros((), jnp.int32))

    self._lo = env.action_low
    self._hi = env.action_high
    # jitted epoch programs memoized by step count: a fresh jax.jit
    # closure per train_epoch call would retrace (and without a warm
    # persistent cache, recompile) the whole epoch scan every epoch
    self._epoch_programs: dict = {}
    # one-transfer scalar fetch for the epoch metrics (see PPOAgent)
    self._stack_scalars = jax.jit(lambda xs: jnp.stack(
        [jnp.reshape(x, ()).astype(jnp.float32) for x in xs]))

  # ------------------------------------------------------------------
  def _env_step(self, cs, params, key, random_actions: bool):
    """One batched env transition; returns (new cs-pieces, replay batch)."""
    k_act, k_reset = jax.random.split(key)
    if random_actions:
      act = jax.random.uniform(k_act,
                               (self.num_envs, self.env.cfg.action_dim),
                               minval=-1.0, maxval=1.0)
    else:
      mean, std, _ = self.apply_pf(params, cs.raw_obs)
      act = jnp.tanh(mean + std * jax.random.normal(k_act, mean.shape))
    env_act = self._lo + (act + 1.0) * 0.5 * (self._hi - self._lo)

    if hasattr(self.env, "step_batch"):
      env_states, next_obs, rew, done, _ = self.env.step_batch(
          cs.env_states, env_act)
    else:
      env_states, next_obs, rew, done, _ = jax.vmap(self.env.step)(
          cs.env_states, env_act)
    ep_steps = cs.ep_steps + 1
    surpass = ep_steps >= self.max_episode_frames
    terminal = done | surpass
    batch = {"obs": cs.raw_obs, "acts": act, "rewards": rew[:, None],
             "next_obs": next_obs,
             # time-limit terminations do not mark terminal for the
             # bootstrap (off_rl_algo.py time_limit handling)
             "terminals": done.astype(jnp.float32)[:, None]}

    def do_resets(op):
      env_states, next_obs = op
      reset_states, reset_obs = jax.vmap(self.env.reset)(
          jax.random.split(k_reset, self.num_envs))
      def sel(a, b):
        t = terminal.reshape(terminal.shape + (1,) * (a.ndim - 1))
        return jnp.where(t, a, b)
      return (jax.tree.map(sel, reset_states, env_states),
              sel(reset_obs, next_obs))

    env_states, next_obs = jax.lax.cond(
        jnp.any(terminal), do_resets, lambda op: op, (env_states, next_obs))
    ep_steps = jnp.where(terminal, 0, ep_steps)
    return env_states, next_obs, ep_steps, batch

  # ------------------------------------------------------------------
  def pretrain(self):
    """Random-exploration warmup filling the replay (off_rl_algo.py
    pretrain)."""
    steps = max(1, self.pretrain_frames // self.num_envs)

    @jax.jit
    def run(cs, key):
      def body(carry, _):
        cs, key = carry
        key, k = jax.random.split(key)
        env_states, next_obs, ep_steps, batch = self._env_step(
            cs, None, k, random_actions=True)
        cs = cs.replace(env_states=env_states, raw_obs=next_obs,
                        ep_steps=ep_steps,
                        replay=replay_lib.add_batch(cs.replay, batch),
                        total_frames=cs.total_frames + self.num_envs)
        return (cs, key), None
      (cs, _), _ = jax.lax.scan(body, (cs, key), None, length=steps)
      return cs

    self.key, k = jax.random.split(self.key)
    self.collector_state = run(self.collector_state, k)

  # ------------------------------------------------------------------
  def train_epoch(self, epoch_frames: int):
    """Collect epoch_frames with the current policy, updating the learner
    `updates_per_step` times per env timestep (update_per_timestep)."""
    steps = max(1, epoch_frames // self.num_envs)
    run = self._epoch_programs.get(steps)
    if run is None:
      run = self._epoch_programs[steps] = self._build_epoch_program(steps)

    self.key, k = jax.random.split(self.key)
    self.collector_state, self.learner_state, avg_rew, infos = run(
        self.collector_state, self.learner_state, k)
    leaves, treedef = jax.tree.flatten(infos)
    stacked = self._stack_scalars([avg_rew] + leaves)
    vals = np.asarray(stacked)
    return float(vals[0]), jax.tree.unflatten(
        treedef, [float(v) for v in vals[1:]])

  def _build_epoch_program(self, steps: int):
    @jax.jit
    def run(cs, ls, key):
      def body(carry, _):
        cs, ls, key = carry
        key, k_step, k_upd = jax.random.split(key, 3)
        env_states, next_obs, ep_steps, batch = self._env_step(
            cs, ls.params["pf"], k_step, random_actions=False)
        replay = replay_lib.add_batch(cs.replay, batch)
        cs = cs.replace(env_states=env_states, raw_obs=next_obs,
                        ep_steps=ep_steps, replay=replay,
                        total_frames=cs.total_frames + self.num_envs)

        def one_update(carry2, k):
          ls, = carry2
          sample = replay_lib.sample(replay, k,
                                     self.learner.cfg.batch_size)
          ls, info = self.learner.update(ls, sample, k)
          return (ls,), info

        (ls,), infos = jax.lax.scan(
            one_update, (ls,),
            jax.random.split(k_upd, self.updates_per_step))
        return (cs, ls, key), (jnp.mean(batch["rewards"]), infos)


      (cs, ls, _), (rews, infos) = jax.lax.scan(
          body, (cs, ls, key), None, length=steps)
      return cs, ls, jnp.mean(rews), jax.tree.map(jnp.mean, infos)

    return run
