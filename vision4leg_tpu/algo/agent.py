"""Training agent: the epoch-driven train loop.

Reference: torchrl/algo/rl_algo.py:97-168 (RLAlgo.train): per epoch —
collect -> update -> (interval) eval -> snapshot, tracking
Explore/Train/Eval wall-times, Running_Average_Rewards, and best-model
checkpointing.  Here "collect" and "update" fuse into one jitted
train_epoch program on the TPU; eval is a second jitted program.
"""
from __future__ import annotations

import inspect
import os
import os.path as osp
import time
import warnings
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from vision4leg_tpu.algo.ppo import PPOConfig, PPOLearner, PPOTrainState
from vision4leg_tpu.collector import rollout as rollout_lib
from vision4leg_tpu.data import normalizer as norm


def _unalias_donated(donated, protected=()):
  """Copy repeated buffers so every leaf of a to-be-donated pytree is
  backed by a unique buffer.

  XLA CSE can hand back two identical jit outputs sharing ONE buffer
  (e.g. two all-zero episode counters in the freshly-initialized
  collector state); donating such a tree fails at dispatch with
  "Attempt to donate the same buffer twice".  `protected` leaves
  (non-donated args of the same call) are seeded first so a donated
  leaf aliasing one of them is copied rather than donated out from
  under it.  Multi-shard arrays are skipped (no stable buffer pointer);
  the sharded path is exercised by tests/test_multichip.py.
  """
  seen = set()
  for p in jax.tree.leaves(protected):
    try:
      seen.add(p.unsafe_buffer_pointer())
    except Exception:  # noqa: BLE001 — non-array / multi-shard leaf
      pass

  def fix(x):
    try:
      ptr = x.unsafe_buffer_pointer()
    except Exception:  # noqa: BLE001
      return x
    if ptr in seen:
      # force a real computation: identity slices (x[...]) and
      # jax.device_put alias the original buffer on CPU; an add cannot
      return x + jnp.zeros((), x.dtype)
    seen.add(ptr)
    return x

  return jax.tree.map(fix, donated)


_DONATION_USABLE = None


def _donation_usable() -> bool:
  """Whether buffer donation can be used safely on this backend.

  Donation requires `_unalias_donated` to copy CSE-aliased jit outputs
  first (XLA hands back ONE buffer for two identical outputs, e.g.
  `last_base_pos`/`current_base_pos` at reset), and that dedup needs
  `unsafe_buffer_pointer()`.  On remote-buffer backends (the axon TPU
  tunnel) the pointer call raises for every array, aliases go
  undetected, and executing a jit that donates an aliased leaf fails
  the whole dispatch with `INVALID_ARGUMENT: TPU backend error` —
  poisoning the donated inputs.  Probe pointer introspection once per
  process; `V4L_DONATE=0/1` overrides.
  """
  global _DONATION_USABLE
  if _DONATION_USABLE is None:
    override = os.environ.get("V4L_DONATE", "")
    if override in ("0", "1"):
      _DONATION_USABLE = override == "1"
    else:
      try:
        jax.device_put(jnp.zeros((1,))).unsafe_buffer_pointer()
        _DONATION_USABLE = True
      except Exception:  # noqa: BLE001 — remote buffers: no pointers
        _DONATION_USABLE = False
  return _DONATION_USABLE


def _pad_zero_size(x):
  """Orbax cannot serialize zero-size arrays; pad the first zero axis to 1."""
  if hasattr(x, "shape") and hasattr(x, "size") and x.size == 0:
    shape = tuple(max(s, 1) for s in x.shape)
    return jnp.zeros(shape, x.dtype)
  return x


def _unpad_zero_size(saved, template):
  """Inverse of _pad_zero_size using the template's true shape."""
  if (hasattr(template, "shape") and hasattr(template, "size")
      and template.size == 0):
    return jnp.zeros(template.shape, template.dtype)
  return saved


class PPOAgent:
  def __init__(self, env, ac_module, cfg: PPOConfig, num_envs: int,
               seed: int, logger, save_dir: str,
               eval_interval: int = 10, save_interval: int = 100,
               num_eval_envs: int = 2, obs_norm: bool = True,
               env_time_limit: int = 1000, reward_scale: float = 1.0,
               inference_dtype=None, mesh=None,
               fused_attention: Optional[bool] = None,
               eval_env=None, eval_horizon: Optional[int] = None):
    # eval_env: evaluate on a DIFFERENT env than the one collected from
    # (sim-to-sim transfer, reference starter/ppo_nature_cnn_sim2sim.py:
    # 43-60 builds an eval env with modified env_build + horizon 2000 and
    # shares the train env's obs normalizer).  Defaults to the train env.
    self.env = env
    self.module = ac_module
    self.cfg = cfg
    self.num_envs = num_envs
    self.num_eval_envs = num_eval_envs
    self.logger = logger
    self.save_dir = save_dir
    self.eval_interval = eval_interval
    self.save_interval = save_interval
    # wall-clock floor between full resume checkpoints (see train());
    # V4L_CKPT_SECS<=0 (or a malformed value) disables the time-based
    # trigger rather than crashing agent construction / checkpointing
    # every epoch
    try:
      _ckpt_secs = float(os.environ.get("V4L_CKPT_SECS", "300"))
    except ValueError:
      _ckpt_secs = 300.0
    self.ckpt_secs = _ckpt_secs if _ckpt_secs > 0 else np.inf
    self.obs_norm = obs_norm
    self.mesh = mesh
    if mesh is not None and hasattr(env, "mesh"):
      # the env's batched physics window shard_maps its Pallas kernel
      # over this mesh (one kernel per shard; see envs/env.py step_batch)
      env.mesh = mesh
    os.makedirs(save_dir, exist_ok=True)

    key = jax.random.PRNGKey(seed)
    self.key, k_init, k_coll = jax.random.split(key, 3)

    dummy_obs = jnp.zeros((1, env.obs_dim))
    params = ac_module.init(k_init, dummy_obs)

    # Fused Pallas attention for the no-gradient collection forward:
    # default OFF since round 4.  History: the layer microbenched 2.45x
    # vs the flax layer in isolation (runs/attention_bench.json) and was
    # defaulted on in r2 — but the round-4 interleaved EPOCH-level A/B on
    # the idle chip (4 measurements, fused/flax alternating) showed the
    # flax path is the faster FULL PROGRAM at the shipped rollout shape:
    # flax 48,502 / 47,430 vs fused 45,595 / 45,509 env-steps/s (~+6%%
    # flax).  The microbench win doesn't survive composition: the Pallas
    # call is an opaque fusion boundary inside the 16-step scan body, so
    # XLA can no longer fuse the attention chain with its surrounding
    # layernorm/MLP elementwise ops, and at 17 tokens the extra HBM
    # round-trips outweigh the in-kernel saving.  The layer stays
    # available (fused_attention=True / V4L_BENCH_FUSED_ATTN=1) and its
    # kernel remains golden-tested.  V4L_FUSED_UPDATE (update-path
    # opt-in) was already closed as a net loss in r3: the custom_vjp
    # backward is a recompute-based XLA VJP (the fused Pallas backward
    # measured 0.09x and was retired — see ops/attention.py
    # fused_transformer_layer_ad).
    if fused_attention is None:
      fused_attention = False
    self.fused_attention = fused_attention
    fused_update = (fused_attention and
                    os.environ.get("V4L_FUSED_UPDATE", "") not in ("", "0")
                    and "fused" in inspect.signature(ac_module.pi).parameters)

    def apply_pi(p, x):
      if fused_update:
        return ac_module.apply(p, x, fused=True, method=ac_module.pi)
      return ac_module.apply(p, x, method=ac_module.pi)

    def apply_v(p, x):
      if fused_update:
        return ac_module.apply(p, x, fused=True, method=ac_module.v)
      return ac_module.apply(p, x, method=ac_module.v)

    apply_pi_v = None
    if hasattr(ac_module, "pi_v"):
      accepts_fused = "fused" in inspect.signature(ac_module.pi_v).parameters

      def apply_pi_v(p, x):
        if accepts_fused:
          return ac_module.apply(p, x, fused=fused_attention,
                                 method=ac_module.pi_v)
        return ac_module.apply(p, x, method=ac_module.pi_v)

    self.apply_pi, self.apply_v = apply_pi, apply_v
    self.learner = PPOLearner(cfg, apply_pi, apply_v, params)
    self.train_state = self.learner.init_state(params)

    horizon = cfg.epoch_frames // num_envs
    self.horizon = horizon
    if horizon < 64:
      # PARITY.md horizon ablation: GAE(tau=0.95) truncated below T=64
      # routes nearly all credit through V-bootstraps; transient V-fit
      # error then poisons every advantage.  thin_goal at T=16 swings
      # +255 -> -548 in adjacent evals where T=64 holds a stable policy
      # (worst late eval -10.6).  The reference's own regime is 16 envs
      # x T~1000.
      warnings.warn(
          f"derived GAE horizon T = epoch_frames/num_envs = "
          f"{cfg.epoch_frames}/{num_envs} = {horizon} < 64: policy-level "
          f"oscillation is expected (see PARITY.md horizon ablation). "
          f"Use --num_envs <= {cfg.epoch_frames // 64} for T >= 64.",
          stacklevel=2)
    # CurriculumWrapperEnv (curriculum_wrapper_env.py:27-92): episode
    # length ramped 1000 -> 2000 by a cubic schedule; the builder passes
    # num_parallel_envs=8 (env_builder.py:350-354) so the effective ramp
    # length is ceil(10M/8) = 1.25M per-env steps — see
    # _curriculum_episode_cap.  The ramped cap feeds the collector's
    # surpass threshold as a traced scalar each epoch (no recompilation).
    self.curriculum = bool(getattr(env.cfg, "curriculum", False))
    self._curric = (1000, 2000, 10_000_000)
    if self.curriculum:
      env_time_limit = max(env_time_limit, self._curric[1])
    act_low, act_high = env.action_low, env.action_high
    self.rollout = rollout_lib.make_rollout_fn(
        env, apply_pi, apply_v, horizon, cfg.max_episode_frames,
        cfg.discount, env.cfg.proprio_dim, obs_norm=obs_norm,
        update_normalizer=True, action_low=act_low, action_high=act_high,
        env_time_limit=env_time_limit, reward_scale=reward_scale,
        apply_pi_v=apply_pi_v, inference_dtype=inference_dtype)
    self.collector_state = rollout_lib.init_collector(env, num_envs, k_coll)
    if mesh is not None:
      # engage data parallelism at construction: env axis sharded over
      # the mesh, params replicated — GSPMD inserts the gradient
      # all-reduces (SURVEY.md 2.6).  Idempotent if a caller re-places.
      self._shard_over_mesh()

    # deterministic eval rollout (collector/base.py:235-288: eval_act=mean,
    # frozen normalizer), optionally on a transfer eval env
    ev_env = eval_env if eval_env is not None else env
    ev_len = eval_horizon if eval_horizon is not None \
        else cfg.max_episode_frames

    def eval_rollout(params, normalizer, key):
      ks = jax.random.split(key, num_eval_envs)
      states, raw = jax.vmap(ev_env.reset)(ks)

      def step(carry, _):
        states, raw, ret, done_seen, steps = carry
        obs = (norm.filt_with_img_tail(normalizer, raw,
                                       ev_env.cfg.proprio_dim)
               if obs_norm else raw)
        mean, _, _ = apply_pi(params, obs)
        env_act = jnp.tanh(mean)
        env_act = act_low + (env_act + 1.0) * 0.5 * (act_high - act_low)
        states, raw, rew, done, _ = jax.vmap(ev_env.step)(states, env_act)
        ret = ret + rew * (1.0 - done_seen)
        steps = steps + (1.0 - done_seen)
        done_seen = jnp.maximum(done_seen, done.astype(jnp.float32))
        return (states, raw, ret, done_seen, steps), None

      init = (states, raw, jnp.zeros(num_eval_envs),
              jnp.zeros(num_eval_envs), jnp.zeros(num_eval_envs))
      (states, raw, ret, done_seen, steps), _ = jax.lax.scan(
          step, init, None, length=ev_len)
      return ret, steps

    # two jitted phases (explore / train), mirroring the reference's
    # Explore_Time / Train___Time accounting (rl_algo.py:111-156) and
    # keeping each XLA program simpler than one fused mega-program.
    # Buffer donation: the collector state (env states + frame rings,
    # ~hundreds of MB at 1024 envs) aliases straight into the updated
    # state, and the trajectory (~1 GB of obs at 1024x16 thin-goal) is
    # scratch after its last minibatch read — without donation XLA must
    # hold input and output copies of both, which is what pushed the
    # 512-env heightfield config over HBM.  Callers must treat donated
    # args as consumed (rebind, never reuse).  Donation is skipped when
    # the backend cannot dedup CSE-aliased jit outputs (_donation_usable).
    if _donation_usable():
      _rollout_exec = jax.jit(self.rollout, donate_argnums=(1,))
      _update_exec = jax.jit(self.learner.update_per_epoch,
                             donate_argnums=(0, 1))

      def _rollout_jit(params, cs, max_ep=None):
        return _rollout_exec(params, _unalias_donated(cs), max_ep)

      def _update_jit(ts, traj, last_value, key):
        ts, traj = _unalias_donated((ts, traj), protected=(last_value,))
        return _update_exec(ts, traj, last_value, key)
    else:
      _rollout_jit = jax.jit(self.rollout)
      _update_jit = jax.jit(self.learner.update_per_epoch)

    self._rollout_jit = _rollout_jit
    self._update_jit = _update_jit
    # batched scalar fetch for the epoch log (see train()): jitted so the
    # whole gather is one device dispatch + one ~100-byte transfer
    self._stack_scalars = jax.jit(lambda xs: jnp.stack(
        [jnp.reshape(x, ()).astype(jnp.float32) for x in xs]))

    # per-epoch telemetry in ONE jitted dispatch: eager, each jnp
    # primitive below is its own remote dispatch on the tunneled TPU
    # backend (~10 per epoch of pure latency).
    #   - trajectory stats + the NaN guard (BaseCollector's per-step obs
    #     check, collector/base.py) logged as metrics instead of raising
    #     inside compiled code;
    #   - eval-collapse telemetry (VERDICT r1 item 7): obs-normalizer
    #     drift per epoch — a late-training reward crash with a moving
    #     normalizer implicates obs-stat drift; a stable one points at
    #     the policy/entropy schedule.
    @jax.jit
    def _epoch_metrics(traj, nrm):
      return {
          "Training/avg_reward": traj.rewards.mean(),
          "diagnostics/nonfinite_obs": jnp.sum(
              ~jnp.isfinite(traj.obs)).astype(jnp.float32),
          "diagnostics/nonfinite_reward": jnp.sum(
              ~jnp.isfinite(traj.rewards)).astype(jnp.float32),
          "diagnostics/terminal_rate": traj.terminals.mean(),
          "diagnostics/obs_norm_mean_l2": jnp.linalg.norm(nrm.mean),
          # vision-only envs have proprio_dim == 0, so the normalizer
          # tracks a zero-size vector — max() has no identity there
          "diagnostics/obs_norm_var_max": (
              jnp.max(nrm.var) if nrm.var.size else jnp.zeros(())),
      }

    def train_epoch(ts: PPOTrainState, cs, key, max_ep=None):
      cs, traj, last_value = self._rollout_jit(ts.params, cs, max_ep)
      # traj-derived metrics are dispatched BEFORE the update, whose jit
      # donates traj (reading a donated buffer afterwards is an error on
      # backends that implement donation)
      metrics = _epoch_metrics(traj, cs.normalizer)
      ts, up_metrics = self._update_jit(ts, traj, last_value, key)
      metrics.update(up_metrics)
      return ts, cs, metrics

    self._train_epoch = train_epoch
    self._eval = jax.jit(eval_rollout)

    self.best_eval = -np.inf
    self.total_frames = 0

  # ------------------------------------------------------------------
  def _shard_over_mesh(self):
    """Place training state on the data-parallel mesh: collector leaves
    with a leading env axis sharded, everything else replicated."""
    from vision4leg_tpu.parallel import mesh as mesh_lib
    self.collector_state = mesh_lib.shard_collector_state(
        self.mesh, self.collector_state)
    self.train_state = jax.device_put(self.train_state,
                                      mesh_lib.replicated(self.mesh))

  def save_checkpoint(self, epoch: int):
    """Full training checkpoint: params + BOTH optimizer states + duals +
    collector (normalizer, env states, RNG) — a true resume point.  The
    reference only saves model weights (rl_algo.py:84-95, no resume path);
    this is the superset SURVEY.md 5 calls for."""
    import shutil
    import orbax.checkpoint as ocp
    path = osp.join(osp.abspath(self.save_dir), "checkpoint")
    ckpt = {"train_state": self.train_state,
            "collector_state": self.collector_state,
            "key": self.key,
            "epoch": epoch,
            "best_eval": self.best_eval,
            "total_frames": self.total_frames}
    # orbax refuses zero-size arrays (e.g. terrain.obstacle_spheres (E,0,5)
    # on box-only terrains): pad them to 1 along the zero axis on save and
    # slice them back on restore using the template's shape
    ckpt = jax.tree.map(_pad_zero_size, ckpt)
    # Crash-safe overwrite: save(force=True) rmtree's the existing
    # checkpoint BEFORE writing, so a SIGKILL mid-save (the queue's
    # stall-killer under chip contention) would leave NO valid resume
    # point.  Instead write to a sibling dir (orbax itself finalizes via
    # tmp+rename, so `new` only exists when complete), then swap with two
    # atomic renames; restore_checkpoint picks up `checkpoint_new` /
    # `checkpoint_old` if the crash lands between them.
    new, old = path + "_new", path + "_old"
    for stale in (new, old):
      if osp.exists(stale):
        shutil.rmtree(stale)
    with ocp.PyTreeCheckpointer() as ckptr:
      ckptr.save(new, ckpt)
    if osp.exists(path):
      os.rename(path, old)
    os.rename(new, path)
    if osp.exists(old):
      shutil.rmtree(old)

  def _warm_start_from_snapshot(self) -> int:
    """Fallback resume when the orbax checkpoint is gone but the best
    snapshot + log.csv survived — e.g. a fresh clone of a committed run
    (full checkpoints are too large to commit; snapshots are not).

    Restores params + obs normalizer from model_pf_best.flax and picks
    epoch / total_frames / best_eval back up from log.csv.  Optimizer
    state and env states restart fresh, so this is a warm start, not a
    bit-exact resume; the caller logs it as such.  best_eval is restored
    to the log's max so the surviving best snapshot is never overwritten
    by a worse post-resume eval."""
    pf = osp.join(self.save_dir, "model_pf_best.flax")
    nz = osp.join(self.save_dir, "_obs_normalizer_best.npz")
    log_csv = osp.join(osp.dirname(osp.abspath(self.save_dir)), "log.csv")
    if not (osp.exists(pf) and osp.exists(nz) and osp.exists(log_csv)):
      return 0
    with open(log_csv) as f:
      header = f.readline().rstrip("\n").split(",")
      if "EPOCH" not in header or "Total Frames" not in header:
        return 0
      i_ep = header.index("EPOCH")
      i_fr = header.index("Total Frames")
      i_ev = (header.index("Eval_Rewards_Average")
              if "Eval_Rewards_Average" in header else None)
      last_epoch, total_frames, best = -1, 0, -np.inf
      for line in f:
        row = line.rstrip("\n").split(",")
        try:
          last_epoch = int(float(row[i_ep]))
          total_frames = int(float(row[i_fr]))
        except (ValueError, IndexError):
          continue
        if i_ev is not None and i_ev < len(row) and row[i_ev]:
          try:
            best = max(best, float(row[i_ev]))
          except ValueError:
            pass
    if last_epoch < 0:
      return 0
    with open(pf, "rb") as f:
      params = serialization.from_bytes(self.train_state.params, f.read())
    self.train_state = self.train_state.replace(params=params)
    d = np.load(nz)
    cs = self.collector_state
    self.collector_state = cs.replace(normalizer=cs.normalizer.replace(
        mean=jnp.asarray(d["mean"]), var=jnp.asarray(d["var"]),
        count=jnp.asarray(d["count"])))
    self.total_frames = total_frames
    if np.isfinite(best):
      self.best_eval = float(best)
    if self.mesh is not None:
      self._shard_over_mesh()
    self.logger.log(
        f"warm start from best snapshot: epoch {last_epoch + 1}, "
        f"{total_frames} frames, best_eval {self.best_eval:.1f} "
        "(no full checkpoint found; optimizer/env state reinitialized)")
    return last_epoch + 1

  def restore_checkpoint(self) -> int:
    """Restore a full checkpoint if present; returns the next epoch.
    Falls back to a snapshot warm start when no checkpoint exists."""
    import orbax.checkpoint as ocp
    path = osp.join(osp.abspath(self.save_dir), "checkpoint")
    if not osp.exists(path):
      # a crash between save_checkpoint's two renames leaves the complete
      # checkpoint under _new (or the previous one under _old)
      for alt in (path + "_new", path + "_old"):
        if osp.exists(alt):
          os.rename(alt, path)
          break
    if not osp.exists(path):
      return self._warm_start_from_snapshot()
    template = {"train_state": self.train_state,
                "collector_state": self.collector_state,
                "key": self.key,
                "epoch": 0,
                "best_eval": self.best_eval,
                "total_frames": self.total_frames}
    with ocp.PyTreeCheckpointer() as ckptr:
      try:
        ckpt = ckptr.restore(path, item=jax.tree.map(_pad_zero_size,
                                                     template))
      except ValueError:
        # Structure mismatch: the checkpoint predates a CollectorState
        # field (e.g. finished_len_sum).  Restore the raw stored tree and
        # graft it onto the template by path, keeping template defaults
        # for leaves the old checkpoint lacks.
        raw = ckptr.restore(path)

        def _lookup(path_entries, default):
          node = raw
          for p in path_entries:
            key = getattr(p, "key", None)
            if key is None:
              key = getattr(p, "name", getattr(p, "idx", None))
            if isinstance(node, dict) and key in node:
              node = node[key]
            else:
              return default           # leaf absent in the old checkpoint
          return default if isinstance(node, dict) else node

        def _graft(p, leaf):
          val = _lookup(p, leaf)
          if val is leaf:
            return leaf
          return jnp.asarray(val, getattr(leaf, "dtype", None))

        ckpt = jax.tree_util.tree_map_with_path(
            _graft, jax.tree.map(_pad_zero_size, template))
    ckpt = jax.tree.map(_unpad_zero_size, ckpt, template)
    self.train_state = ckpt["train_state"]
    self.collector_state = ckpt["collector_state"]
    self.key = ckpt["key"]
    self.best_eval = ckpt["best_eval"]
    self.total_frames = ckpt["total_frames"]
    if self.mesh is not None:
      # orbax restores host-local arrays; re-place on the mesh so the
      # resumed epochs run the same sharded program as before the crash
      self._shard_over_mesh()
    return int(ckpt["epoch"]) + 1

  def _curriculum_episode_cap(self):
    """Per-epoch episode-length cap from the curriculum ramp, or None.

    curriculum_wrapper_env.py:82-92 (cubic ramp on per-env step count).
    Note the reference's shipped wrapper ORDER makes its ramp inert — the
    static gym TimeLimit(1000) sits outside the curriculum wrapper and
    its collector surpass cuts at max_episode_frames anyway; here the
    ramp drives the collector cap directly, which is what the wrapper
    intends."""
    if not self.curriculum:
      return None
    from vision4leg_tpu.envs import wrappers
    start, end, total = self._curric
    # each env instance counts its own steps, and the builder passes
    # num_parallel_envs=8 (env_builder.py:350-354), which divides the
    # ramp length by 8
    per_env_steps = jnp.asarray(self.total_frames // self.num_envs)
    return wrappers.curriculum_episode_length(
        per_env_steps, episode_length_start=start, episode_length_end=end,
        curriculum_steps=total, num_parallel_envs=8)

  def snapshot(self, suffix: str):
    """Save params + normalizer (rl_algo.py:84-95 naming scheme)."""
    path = osp.join(self.save_dir, f"model_pf_{suffix}.flax")
    with open(path, "wb") as f:
      f.write(serialization.to_bytes(self.train_state.params))
    nrm = self.collector_state.normalizer
    np.savez(osp.join(self.save_dir, f"_obs_normalizer_{suffix}.npz"),
             mean=np.asarray(nrm.mean), var=np.asarray(nrm.var),
             count=np.asarray(nrm.count))

  def train(self, resume: bool = False):
    cfg = self.cfg
    start = time.time()
    start_epoch = self.restore_checkpoint() if resume else 0
    if start_epoch:
      self.logger.log(f"resumed from checkpoint at epoch {start_epoch}")
      # drop stale log.csv rows from the crashed segment past the
      # checkpoint so the resumed run doesn't append duplicate epochs
      if hasattr(self.logger, "truncate_epochs_from"):
        self.logger.truncate_epochs_from(start_epoch)
    # the whole run's RNG schedule in ONE dispatch + ONE transfer: an
    # eager jax.random.split costs ~36 ms of tunnel latency per epoch on
    # the axon backend (22 s over a 611-epoch run).  self.key stays
    # fixed across train(), so a resumed run at epoch N re-derives the
    # identical schedule from the checkpointed key.
    key_sched = np.asarray(jax.jit(
        lambda k: jax.random.split(k, (cfg.num_epochs, 2)))(self.key))
    last_ckpt = time.time()
    for epoch in range(start_epoch, cfg.num_epochs):
      t0 = time.time()
      k_up, k_ev = key_sched[epoch, 0], key_sched[epoch, 1]
      max_ep = self._curriculum_episode_cap()
      self.train_state, self.collector_state, metrics = self._train_epoch(
          self.train_state, self.collector_state, k_up, max_ep)
      # ONE device dispatch + ONE device->host transfer for all epoch
      # scalars: each `float(np.asarray(x))` is a separate round-trip,
      # and on the tunneled TPU backend ~25 of them per epoch is pure
      # latency (the transferred payload is ~100 bytes total).  The
      # stacking itself is jitted (eager ops would each pay their own
      # remote dispatch), and fetching it doubles as the epoch
      # synchronization point (a per-leaf block_until_ready would again
      # be one await per scalar).
      cs = self.collector_state
      keys = list(metrics)
      stacked = np.asarray(self._stack_scalars(
          [metrics[k] for k in keys]
          + [cs.finished_count, cs.finished_returns_sum,
             cs.finished_len_sum]))
      train_time = time.time() - t0
      self.total_frames += cfg.epoch_frames
      infos = dict(zip(keys, map(float, stacked[:-3])))
      fin = float(stacked[-3])
      if fin > 0:
        infos["Running_Average_Rewards"] = float(stacked[-2]) / fin
        infos["Running_Average_Eplen"] = float(stacked[-1]) / fin
      self.collector_state = cs.replace(
          finished_returns_sum=jnp.zeros(()),
          finished_count=jnp.zeros(()),
          finished_len_sum=jnp.zeros(()))
      infos["Train___Time"] = train_time

      if (epoch + 1) % self.eval_interval == 0:
        t0 = time.time()
        rets, steps = self._eval(self.train_state.params,
                                 self.collector_state.normalizer, k_ev)
        rets = np.asarray(rets)
        infos["Eval_Rewards_Average"] = float(rets.mean())
        infos["Eval____Time"] = time.time() - t0
        if rets.mean() > self.best_eval:
          self.best_eval = float(rets.mean())
          self.snapshot("best")

      if (epoch + 1) % self.save_interval == 0:
        self.snapshot(str(epoch + 1))
        self.save_checkpoint(epoch)
        last_ckpt = time.time()
      elif time.time() - last_ckpt >= self.ckpt_secs:
        # Wall-clock checkpoint floor: under external chip contention an
        # epoch can take minutes, so a kill+resume cycle that only has
        # save_interval-boundary checkpoints replays up to save_interval
        # epochs of work.  A time-based resume point (no snapshot files —
        # those stay on the epoch schedule) bounds the replay loss to
        # ckpt_secs of wall-clock instead.
        self.save_checkpoint(epoch)
        last_ckpt = time.time()

      self.logger.add_epoch_info(epoch, self.total_frames,
                                 time.time() - start, infos)
    self.snapshot("finish")
