"""Fully-jitted on-device rollout collector.

Replaces the reference's data plane — `SubProcVecEnv` worker processes +
per-step host<->GPU tensor ping-pong (`torchrl/env/subproc_vecenv.py`,
`torchrl/collector/on_policy.py:90-152`) — with a single `lax.scan` over
vmapped environments living in TPU memory.  One compiled program produces an
entire epoch of (obs, action, logp, value, reward, terminal, time_limit)
tensors; nothing crosses the host boundary during collection.

Collection semantics preserved from VecOnPolicyCollector.take_actions:
  * policy explores (samples) from Normal(mean, std), value evaluated on
    the normalized obs,
  * at `done or step >= max_episode_frames`: terminal := done | surpass,
    reward += discount * V(next_obs) * surpass (time-limit bootstrap,
    on_policy.py:128-143), then partial reset,
  * `time_limit` flag recorded for the GAE filter,
  * the obs normalizer updates online during training collection
    (NormObs.observation, base_wrapper.py:119-123).
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from vision4leg_tpu.data import normalizer as norm


class Transition(NamedTuple):
  obs: jnp.ndarray          # (T, E, D) normalized obs fed to the policy
  acts: jnp.ndarray         # (T, E, A) raw policy output (pre-NormAct)
  log_probs: jnp.ndarray    # (T, E, 1)
  values: jnp.ndarray       # (T, E, 1)
  rewards: jnp.ndarray      # (T, E, 1)
  terminals: jnp.ndarray    # (T, E, 1) bool
  time_limits: jnp.ndarray  # (T, E, 1) bool
  # behavior-policy distribution at collection time — the frozen `target_pf`
  # of PPO/VMPO/TRPO is a copy made before any update (ppo.py:34), so its
  # outputs equal these
  means: jnp.ndarray        # (T, E, A)
  stds: jnp.ndarray         # (T, E, A)


@struct.dataclass
class CollectorState:
  env_states: Any            # vmapped EnvState
  raw_obs: jnp.ndarray       # (E, D) current raw obs
  ep_steps: jnp.ndarray      # (E,) int32 steps since reset
  ep_return: jnp.ndarray     # (E,) running episode reward
  normalizer: norm.NormalizerState
  finished_returns_sum: jnp.ndarray  # () sum of finished-episode returns
  finished_count: jnp.ndarray        # () number of finished episodes
  finished_len_sum: jnp.ndarray      # () sum of finished-episode lengths
  key: jax.Array


def init_collector(env, num_envs: int, key: jax.Array) -> CollectorState:
  k_reset, k_state = jax.random.split(key)
  env_states, raw_obs = jax.vmap(env.reset)(
      jax.random.split(k_reset, num_envs))
  return CollectorState(
      env_states=env_states,
      raw_obs=raw_obs,
      ep_steps=jnp.zeros(num_envs, jnp.int32),
      ep_return=jnp.zeros(num_envs),
      # NormObsWithImg normalizes only the proprio head (get_env.py:41-67)
      normalizer=norm.init_normalizer(env.cfg.proprio_dim),
      finished_returns_sum=jnp.zeros(()),
      finished_count=jnp.zeros(()),
      finished_len_sum=jnp.zeros(()),
      key=k_state,
  )


def make_rollout_fn(env, apply_pi: Callable, apply_v: Callable,
                    horizon: int, max_episode_frames: int, discount: float,
                    proprio_dim: int, obs_norm: bool = True,
                    update_normalizer: bool = True,
                    action_low=None, action_high=None,
                    env_time_limit: int = 1000,
                    reward_scale: float = 1.0,
                    apply_pi_v: Callable = None,
                    act_fn: Callable = None,
                    inference_dtype=None):
  """Build `rollout(params, collector_state, max_ep) -> (state, Transition,
  last_v)`.

  apply_pi(params, obs) -> (mean, std, logstd); apply_v(params, obs) -> (B,1).
  action_low/high: env action bounds for the NormAct tanh mapping
  (continuous_wrapper.py:19-22).
  reward_scale: RewardShift's train-time reward scaling (base_wrapper.py:
  32-41); =1 in all shipped configs.  Applied before episode bookkeeping,
  matching the wrapper sitting below the collector.
  max_ep: traced per-call episode-length cap (the collector `surpass`
  threshold).  Static in normal training (cfg.max_episode_frames); the
  curriculum schedule (curriculum_wrapper_env.py:27-92) ramps it
  1000 -> 2000 over 10M per-env steps without recompiling.
  act_fn: optional action-path override,
  `act_fn(params, obs, key) -> (act, logp, env_act, mean, std)` — the
  hierarchical collector (on_policy_hierarchical.py:17-95) swaps in a
  high-level policy whose action a frozen low-level policy translates to
  motor commands; the stored (act, logp, mean, std) train the HIGH level.
  inference_dtype: optional reduced precision (jnp.bfloat16) for the
  COLLECTION policy/value forward only — params and obs cast down at the
  apply boundary, (mean, std, value) cast back to f32 so sampling,
  log-prob, and the stored behavior stats stay f32 and self-consistent.
  The MXU runs bf16 matmuls 2-4x faster than f32; the PPO update still
  recomputes log-probs in f32, so the first-minibatch ratio deviates
  from 1 by the tiny collection-precision gap (clip-covered).  Off by
  default; parity tests and shipped configs use f32.
  """

  def normalize(nstate, raw):
    if not obs_norm:
      return raw
    return norm.filt_with_img_tail(nstate, raw, proprio_dim)

  if inference_dtype is not None:
    _pi, _v, _pi_v = apply_pi, apply_v, apply_pi_v

    def _cast_params(p):
      return jax.tree.map(
          lambda x: x.astype(inference_dtype)
          if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    def _f32(t):
      return jax.tree.map(lambda x: x.astype(jnp.float32), t)

    def apply_pi(p, x):  # noqa: F811 — reduced-precision shadows
      return _f32(_pi(p, x.astype(inference_dtype)))

    def apply_v(p, x):  # noqa: F811
      return _f32(_v(p, x.astype(inference_dtype)))

    if _pi_v is not None:
      def apply_pi_v(p, x):  # noqa: F811
        return _f32(_pi_v(p, x.astype(inference_dtype)))

  def step_fn(carry, _):
    params, max_ep, cs = carry
    key, k_act = jax.random.split(cs.key)

    nstate = cs.normalizer
    if obs_norm and update_normalizer:
      # NormObs updates on every observation during training collection
      nstate = norm.update(nstate, cs.raw_obs[..., :proprio_dim])
    obs = normalize(nstate, cs.raw_obs)

    if act_fn is not None:
      act, log_prob, env_act, mean, std = act_fn(params, obs, k_act)
      value = apply_v(params, obs)
    elif apply_pi_v is not None:
      # fused policy+value: shared encoder computed once per step
      (mean, std, _), value = apply_pi_v(params, obs)
    else:
      mean, std, _ = apply_pi(params, obs)
      value = apply_v(params, obs)
    if act_fn is None:
      noise = jax.random.normal(k_act, mean.shape)
      act = mean + std * noise
      log_prob = jnp.sum(
          -0.5 * (noise**2) - jnp.log(std) - 0.5 * jnp.log(2 * jnp.pi),
          axis=-1, keepdims=True)

      # NormAct: tanh + affine rescale into env action bounds
      env_act = jnp.tanh(act)
      env_act = action_low + (env_act + 1.0) * 0.5 * (action_high
                                                      - action_low)

    # step_batch lets the env run the action-repeat physics window as one
    # Pallas kernel over all envs (ops/physics_kernel.py) instead of
    # vmapped per-env XLA; envs without it get the plain vmap
    if hasattr(env, "step_batch"):
      env_states, next_raw, rew, done, _ = env.step_batch(
          cs.env_states, env_act)
    else:
      env_states, next_raw, rew, done, _ = jax.vmap(env.step)(
          cs.env_states, env_act)
    rew = rew * reward_scale
    ep_steps = cs.ep_steps + 1
    # gym TimeLimit at the env horizon (get_env.py:79-84): done=True with
    # info['time_limit']; with the shipped configs (horizon 1000 >
    # max_episode_frames 999) the collector surpass below always fires first
    tl_done = ep_steps >= env_time_limit
    done = done | tl_done
    surpass = ep_steps >= max_ep
    terminal = done | surpass

    # episode-return bookkeeping uses the post-RewardShift reward but NOT
    # the bootstrap modification (the wrapper sits below the collector;
    # train_rew accumulates before the bootstrap, on_policy.py:124-141)
    ep_return = cs.ep_return + rew

    # time-limit value bootstrap folded into rewards (on_policy.py:128-143);
    # the extra value forward only runs on steps where some env actually
    # hits max_episode_frames (rare with 999-step episodes)
    def bootstrap(rew):
      next_obs_n = normalize(nstate, next_raw)
      last_value = apply_v(params, next_obs_n)[..., 0]
      return rew + discount * last_value * surpass

    rew = jax.lax.cond(jnp.any(surpass), bootstrap, lambda r: r, rew)
    fin_sum = cs.finished_returns_sum + jnp.sum(ep_return * terminal)
    fin_cnt = cs.finished_count + jnp.sum(terminal)
    fin_len = cs.finished_len_sum + jnp.sum(
        ep_steps.astype(jnp.float32) * terminal)

    # partial reset of finished envs; the whole reset path (terrain gen,
    # template placement, first camera frame) only runs on steps where at
    # least one env terminated (most steps: none, with 999-step episodes)
    key, k_reset = jax.random.split(key)

    def sel(a, b):
      t = terminal.reshape(terminal.shape + (1,) * (a.ndim - 1))
      return jnp.where(t, a, b)

    def do_resets(operand):
      env_states, next_raw = operand
      reset_states, reset_obs = jax.vmap(env.reset)(
          jax.random.split(k_reset, done.shape[0]))
      return (jax.tree.map(sel, reset_states, env_states),
              sel(reset_obs, next_raw))

    env_states, next_raw = jax.lax.cond(
        jnp.any(terminal), do_resets, lambda op: op,
        (env_states, next_raw))
    ep_steps = jnp.where(terminal, 0, ep_steps)
    ep_return = jnp.where(terminal, 0.0, ep_return)

    new_cs = cs.replace(
        env_states=env_states, raw_obs=next_raw, ep_steps=ep_steps,
        ep_return=ep_return, normalizer=nstate,
        finished_returns_sum=fin_sum, finished_count=fin_cnt,
        finished_len_sum=fin_len, key=key)
    tr = Transition(
        obs=obs, acts=act, log_probs=log_prob, values=value,
        rewards=rew[..., None], terminals=terminal[..., None],
        time_limits=tl_done[..., None], means=mean, stds=std)
    return (params, max_ep, new_cs), tr

  def rollout(params, cs: CollectorState, max_ep=None):
    if max_ep is None:
      max_ep = jnp.asarray(max_episode_frames, jnp.int32)
    if inference_dtype is not None:
      # one down-cast of the weights per epoch, reused by every step
      params = _cast_params(params)
    (params, _, cs), traj = jax.lax.scan(step_fn, (params, max_ep, cs),
                                         None, length=horizon)
    # bootstrap value for GAE: V(current obs) * (1 - terminal_last)
    obs = normalize(cs.normalizer, cs.raw_obs)
    last_value = apply_v(params, obs)[..., 0]
    last_value = last_value * (1.0 - traj.terminals[-1, :, 0])
    return cs, traj, last_value

  return rollout
