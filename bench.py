"""Benchmark: env-steps/sec for LocoTransformer PPO (collect + update).

This is BASELINE.json's north-star metric.  It times the fused jitted
train-epoch program (on-device physics rollout + depth raycasting + PPO
update) on the real TPU and prints ONE JSON line.

`vs_baseline` denominator (MEASURED, r2): the reference publishes no
numbers (BASELINE.md) and pybullet cannot be installed here (no network —
runs/pybullet_install_attempt.log), so tools/measure_reference.py runs
the reference's OWN torchrl learner (LocoTransformer pf/vf explore+value
per collect step, full PPO.update_per_epoch, thin-goal hyperparameters)
on this host and measures a strict lower bound on its epoch wall-clock:
1662.2 s/epoch => <= 9.9 env-steps/s (runs/reference_baseline.json, best
of two runs; torch 2.13 CPU — this host has 1 core and no CUDA GPU,
physics/render/IPC excluded, so the true same-host number is lower
still).

`vs_gpu_estimate` keeps the r1 comparison point: ~3000 env-steps/s for
the reference stack on the GPU hardware it assumes (per-process smoke
probe ~300-600 steps/s x 16 workers, env_builder.py:542-556).
"""
import atexit
import json
import os
import signal
import sys
import time

REFERENCE_MEASURED_STEPS_PER_SEC = 9.9     # same host, measured (see above)
REFERENCE_GPU_ESTIMATE_STEPS_PER_SEC = 3000.0

# --- total wall-clock bound + die-loudly machinery (r4 postmortem:
# BENCH_r04 was rc=124/parsed=null because the device-probe wait (up to
# 900 s), contended re-measurements and 3x120 s contention retries summed
# past the driver's timeout and the SIGTERM killed us before the JSON
# line ever printed.  Now: every sleep/retry is budgeted against one
# deadline, and SIGTERM/SIGINT/atexit print the best result seen so far
# (honestly flagged "contended"/"warmup") instead of dying silent.) ---
_DEADLINE = time.time() + float(os.environ.get("V4L_BENCH_DEADLINE_S", "1200"))
_BEST: dict = {}          # best-so-far result payload (mutated in place)
_EMITTED = False


def _remaining() -> float:
  return _DEADLINE - time.time()


def _emit(final: bool = False) -> None:
  """Print the ONE JSON line, exactly once, best-result-so-far."""
  global _EMITTED
  if _EMITTED:
    return
  _EMITTED = True
  if not _BEST:
    _BEST.update({
        "metric": "locotransformer_ppo_env_steps_per_sec",
        "value": None,
        "unit": "env-steps/s (collect+update, thin-goal)",
        "error": "killed before any measurement completed "
                 "(device probe / compile did not finish in budget)",
    })
  if not final:
    _BEST["killed_early"] = True
  line = json.dumps(_BEST)
  try:
    print(line, flush=True)
  except OSError:
    # stdout pipe already torn down (driver killed the whole group):
    # leave the line where a post-mortem can find it instead of letting
    # BrokenPipeError unwind through the signal handler
    try:
      with open("/tmp/v4l_bench_last.json", "w") as f:
        f.write(line + "\n")
    except OSError:
      pass


def _on_term(signum, frame):  # noqa: ARG001
  _emit()
  os._exit(0)


signal.signal(signal.SIGTERM, _on_term)
signal.signal(signal.SIGINT, _on_term)
atexit.register(_emit)

# allow local CPU runs for debugging: V4L_TPU_PLATFORM=cpu python bench.py
if os.environ.get("V4L_TPU_PLATFORM"):
  import jax
  jax.config.update("jax_platforms", os.environ["V4L_TPU_PLATFORM"])

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_v4l"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from vision4leg_tpu.algo.agent import PPOAgent
from vision4leg_tpu.algo.ppo import PPOConfig
from vision4leg_tpu.envs.get_env import get_env
from vision4leg_tpu.models.actor_critic import LocoTransformerActorCritic
from vision4leg_tpu.utils.args import get_params


class _NullLogger:
  work_dir = "/tmp/v4l_bench"
  def add_epoch_info(self, *a, **k): pass
  def add_update_info(self, *a, **k): pass
  def log(self, *a, **k): pass


def _wait_for_device(max_wait_s: float) -> None:
  """Block until the TPU tunnel answers a real device computation.

  The axon relay flaps: its TCP port can accept while every backend init
  returns UNAVAILABLE, or device calls can hang outright (observed
  2026-08-17, ~2 h outage).  Probing in a SUBPROCESS lets a hung init be
  timed out; an in-process hang inside PJRT is not interruptible.  On
  persistent failure, exit with a message that distinguishes infra-down
  from a broken benchmark.
  """
  import subprocess
  probe = ("import jax, jax.numpy as jnp; "
           "assert float(jnp.arange(8.0).sum()) == 28.0")
  # the probe wait may not eat the whole bench budget: leave >=300 s for
  # compile + measurement, whatever V4L_BENCH_TUNNEL_WAIT_S says
  deadline = min(time.time() + max_wait_s, _DEADLINE - 300.0)
  attempt = 0
  while True:
    attempt += 1
    try:
      r = subprocess.run([sys.executable, "-c", probe],
                         timeout=max(30, min(180, _remaining() - 120)),
                         capture_output=True)
      if r.returncode == 0:
        if attempt > 1:
          print(f"device probe ok after {attempt} attempts",
                file=sys.stderr)
        return
    except subprocess.TimeoutExpired:
      pass
    if time.time() > deadline:
      _BEST.update({
          "metric": "locotransformer_ppo_env_steps_per_sec",
          "value": None,
          "unit": "env-steps/s (collect+update, thin-goal)",
          "error": "TPU tunnel unreachable (device probe failed) — "
                   "infrastructure outage, not a framework failure",
      })
      _emit(final=True)
      raise SystemExit(1)
    print(f"device probe failed (attempt {attempt}); retrying...",
          file=sys.stderr)
    time.sleep(min(60, max(5, _remaining() - 330)))


def main():
  if not os.environ.get("V4L_TPU_PLATFORM"):  # real-TPU runs only
    _wait_for_device(float(os.environ.get("V4L_BENCH_TUNNEL_WAIT_S",
                                          "900")))
  cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "config/rl/static/locotransformer/thin-goal.json")
  params = get_params(cfg_path)
  env, meta = get_env(params["env_name"], params["env"])

  num_envs = int(os.environ.get("V4L_BENCH_ENVS", "1024"))
  epoch_frames = params["collector"]["epoch_frames"]

  module = LocoTransformerActorCritic(
      action_dim=env.cfg.action_dim,
      state_input_shape=env.cfg.proprio_dim,
      visual_input_shape=(4, 64, 64),
      encoder_hidden_shapes=tuple(params["encoder"]["hidden_shapes"]),
      transformer_params=tuple(
          tuple(p) for p in params["net"]["transformer_params"]),
      append_hidden_shapes=tuple(params["net"]["append_hidden_shapes"]),
  )
  gs, ppo = params["general_setting"], params["ppo"]
  cfg = PPOConfig(
      plr=ppo["plr"], vlr=ppo["vlr"], clip_para=ppo["clip_para"],
      opt_epochs=ppo["opt_epochs"], entropy_coeff=ppo["entropy_coeff"],
      discount=gs["discount"], tau=ppo["tau"],
      batch_size=gs["batch_size"], num_epochs=gs["num_epochs"],
      epoch_frames=epoch_frames,
      max_episode_frames=params["collector"]["max_episode_frames"])

  # V4L_BENCH_BF16=1: collection-policy forward in bfloat16 (the PPO
  # update stays f32) — see make_rollout_fn(inference_dtype).  "0"/""
  # mean off so an explicit V4L_BENCH_BF16=0 really is the f32 baseline.
  use_bf16 = os.environ.get("V4L_BENCH_BF16", "") not in ("", "0")
  inf_dtype = jnp.bfloat16 if use_bf16 else None
  # V4L_BENCH_FUSED_ATTN: "0" forces the flax layer, "1" forces the
  # Pallas fused layer, unset = agent default (flax since the round-4
  # epoch-level A/B — see agent.py fused_attention)
  fused_env = os.environ.get("V4L_BENCH_FUSED_ATTN", "")
  fused_attn = None if fused_env == "" else fused_env != "0"

  # Build + warm up, stepping the env count down on HBM exhaustion (a
  # concurrent training job may hold most of the chip when the driver
  # runs this); 16384 frames/epoch regardless, so only the T/E split —
  # not the measured work — changes.
  key = jax.random.PRNGKey(0)

  def _record(steps_per_sec, contended, warmup, idle_ref, hbm_shared):
    """Fold a measurement into the best-so-far payload (emitted on kill)."""
    if _BEST.get("value") is not None and steps_per_sec <= _BEST["value"]:
      return
    _BEST.update({
        "metric": "locotransformer_ppo_env_steps_per_sec",
        "value": round(steps_per_sec, 1),
        "unit": "env-steps/s (collect+update, thin-goal)",
        "bf16_collection": use_bf16,
        "fused_attention": agent.fused_attention,
        "contended": bool(contended or hbm_shared),
        "warmup_only": warmup,
        "idle_reference": idle_ref,
        "num_envs": num_envs,
        "vs_baseline": round(
            steps_per_sec / REFERENCE_MEASURED_STEPS_PER_SEC, 2),
        "vs_gpu_estimate": round(
            steps_per_sec / REFERENCE_GPU_ESTIMATE_STEPS_PER_SEC, 2),
        "baseline_note": "vs_baseline: measured same-host reference learner "
                         "upper bound 9.9 steps/s (runs/reference_baseline"
                         ".json, torch CPU, 1 core); vs_gpu_estimate: the "
                         "reference on its assumed GPU (~3000 steps/s)",
    })
    _BEST.pop("error", None)

  while True:
    try:
      agent = PPOAgent(env=env, ac_module=module, cfg=cfg,
                       num_envs=num_envs, seed=0, logger=_NullLogger(),
                       save_dir="/tmp/v4l_bench", obs_norm=meta["obs_norm"],
                       inference_dtype=inf_dtype,
                       fused_attention=fused_attn)
      # warm up: compile + the first couple of executions after
      # compilation run several times slower on this backend (executable
      # paging); measure steady state only.  The last warmup epoch is
      # timed and recorded as a provisional ("warmup_only") result so a
      # kill during the real measurement still emits a number.
      ts, cs = agent.train_state, agent.collector_state
      for w in range(3):
        tw = time.time()
        ts, cs, m = agent._train_epoch(ts, cs,
                                       jax.random.fold_in(key, 1000 + w))
        jax.block_until_ready(m["Training/policy_loss"])
        tw = time.time() - tw
      break
    except Exception as e:  # noqa: BLE001 — step down only on OOM
      if "RESOURCE_EXHAUSTED" not in str(e) or num_envs <= 128:
        raise
      num_envs //= 2
      print(f"HBM exhausted; retrying at {num_envs} envs", file=sys.stderr)

  n_epochs = int(os.environ.get("V4L_BENCH_EPOCHS", "3"))

  def measure():
    nonlocal ts, cs
    t0 = time.time()
    t_roll = 0.0
    m = None
    for i in range(n_epochs):
      t1 = time.time()
      cs, traj, last_value = agent._rollout_jit(ts.params, cs)
      jax.block_until_ready(last_value)
      t_roll += time.time() - t1
      ts, m = agent._update_jit(ts, traj, last_value,
                                jax.random.fold_in(key, i))
    jax.block_until_ready(m)
    dt = time.time() - t0
    print(f"phase timing: rollout {t_roll/n_epochs:.2f}s/epoch, "
          f"update {(dt - t_roll)/n_epochs:.2f}s/epoch", file=sys.stderr)
    return n_epochs * epoch_frames / dt

  # --- contention detection (r2 postmortem: BENCH_r02 recorded 10.3k
  # steps/s because a training job from runs/run_queue_r2k.sh still held
  # the single chip when the driver ran this — 4.8x below the framework's
  # demonstrated 49k).  Compare against the committed idle-chip reference
  # (runs/bench_idle_reference.json); if >35% below it, another process is
  # time-slicing the chip: retry after a pause, and if it never clears,
  # emit a machine-readable "contended": true so the number is not read
  # as a framework regression. ---
  idle_ref = None
  ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "runs", "bench_idle_reference.json")
  try:
    with open(ref_path) as f:
      ref = json.load(f)
    if int(ref.get("num_envs", 0)) == num_envs:
      idle_ref = float(ref["steps_per_sec"])
  except Exception:
    pass
  hbm_shared = num_envs < int(os.environ.get("V4L_BENCH_ENVS", "1024"))

  # provisional number from the timed warmup epoch — flagged warmup_only
  # (post-compile executions run slow on this backend, so it understates)
  warm_sps = epoch_frames / tw
  _record(warm_sps, contended=(idle_ref is not None
                               and warm_sps < 0.65 * idle_ref),
          warmup=True, idle_ref=idle_ref, hbm_shared=hbm_shared)

  contended = False
  retries = int(os.environ.get("V4L_BENCH_RETRIES", "3"))
  measure_cost = max(3 * tw, 10.0)  # estimate until measured once
  for attempt in range(retries + 1):
    t_m = time.time()
    steps_per_sec = measure()
    measure_cost = time.time() - t_m
    is_low = idle_ref is not None and steps_per_sec < 0.65 * idle_ref
    _record(steps_per_sec, contended=is_low, warmup=False,
            idle_ref=idle_ref, hbm_shared=hbm_shared)
    if not is_low:
      break
    contended = True
    # retry only if the 120 s pause + another measurement fit the budget
    if attempt < retries and _remaining() > 120 + measure_cost + 30:
      print(f"bench: {steps_per_sec:.0f} steps/s is <65% of the idle-chip "
            f"reference {idle_ref:.0f} — chip likely contended; retrying "
            f"in 120s ({attempt + 1}/{retries})", file=sys.stderr)
      time.sleep(120)
      contended = False
    else:
      if attempt < retries:
        print("bench: contended but no budget left for a retry "
              f"({_remaining():.0f}s remaining); emitting best-so-far",
              file=sys.stderr)
      break
  _emit(final=True)


if __name__ == "__main__":
  main()
