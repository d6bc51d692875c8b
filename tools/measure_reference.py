"""Measure the reference stack's per-epoch cost on THIS host (torch CPU).

BASELINE.md requires a *measured* reference number instead of the
hardcoded 3000 env-steps/s estimate.  The full reference collect loop
cannot run here: pybullet is not installed and the host has no network
(`pip install pybullet` fails with pypi.org NameResolutionError — see
runs/pybullet_install_attempt.log).  What CAN be measured is everything
except PyBullet physics + EGL rendering, using the reference's own code
(`/root/reference/torchrl`) on the torch 2.13 CPU build that is
installed:

  (a) the per-collect-step policy work: `pf.explore(obs)` + `vf(obs)`
      at batch = vec_env_nums, run epoch_frames/vec_env_nums times
      (reference collector: torchrl/collector/on_policy.py:90-104), and
  (b) one full `PPO.update_per_epoch()` — GAE post-processing + 3 opt
      epochs x 16 minibatches of 1024 on the real LocoTransformer
      (torchrl/algo/on_policy/ppo.py:28-39), with the thin-goal.json
      hyperparameters.

The sum is a strict LOWER bound on the reference's epoch wall-clock on
this host (physics + rendering + IPC add on top), so
`epoch_frames / measured_time` is an UPPER bound on the reference's
env-steps/s here, and `ours / that` is a conservative lower bound on
the speedup.  Reference shapes: obs = 84 proprio + 4x64x64 depth
(thin-goal, frame_extract=4), act = 6.

Prints one JSON line and writes runs/reference_baseline.json.
"""
import json
import os
import sys
import time
import types

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "runs", "reference_baseline.json")

# The reference imports `gym`; this image ships gymnasium only.  Shim it —
# the reference only touches gym.spaces.Box in the paths we drive.
import gymnasium
sys.modules.setdefault("gym", gymnasium)
sys.path.insert(0, REF)

import numpy as np
import torch

import torchrl.networks as networks
import torchrl.policies as policies
from torchrl.algo import PPO
from torchrl.replay_buffers.on_policy import OnPolicyReplayBuffer
from torchrl.utils import get_params


class _NullLogger:
  def add_update_info(self, *a, **k): pass
  def add_epoch_info(self, *a, **k): pass


class _FakeEnv:
  """Just enough surface for RLAlgo.__init__ (rl_algo.py:33-35)."""
  action_space = gymnasium.spaces.Box(low=-1.0, high=1.0, shape=(6,))


class _FakeCollector:
  def __init__(self, epoch_frames):
    self.epoch_frames = epoch_frames
  @property
  def funcs(self):
    return {}


def main():
  torch.manual_seed(0)
  np.random.seed(0)

  params = get_params(os.path.join(
      REF, "config/rl/static/locotransformer/thin-goal.json"))
  vec_env_nums = int(os.environ.get("REF_VEC_ENVS", "16"))
  epoch_frames = params["replay_buffer"]["size"]          # 16384
  gs, ppo_p = params["general_setting"], params["ppo"]

  channels, proprio = 4, 84                               # thin-goal shapes
  obs_dim = proprio + channels * 64 * 64
  act_dim = 6

  params["net"]["base_type"] = networks.MLPBase
  encoder = networks.LocoTransformerEncoder(
      in_channels=channels, state_input_dim=proprio, **params["encoder"])
  pf = policies.GaussianContPolicyLocoTransformer(
      encoder=encoder, state_input_shape=proprio,
      visual_input_shape=(channels, 64, 64), output_shape=act_dim,
      **params["net"], **params["policy"])
  vf = networks.LocoTransformer(
      encoder=encoder, state_input_shape=proprio,
      visual_input_shape=(channels, 64, 64), output_shape=1,
      **params["net"])

  # ---- (a) collection-side policy work --------------------------------
  steps_per_epoch = epoch_frames // vec_env_nums          # 1024 fwd passes
  obs = torch.randn(vec_env_nums, obs_dim)
  with torch.no_grad():                                   # collector runs no-grad
    for _ in range(3):                                    # warmup
      pf.explore(obs); vf(obs)
    n_timed = 32
    t0 = time.time()
    for _ in range(n_timed):
      out = pf.explore(obs)
      _ = vf(obs)
    per_step = (time.time() - t0) / n_timed
  collect_policy_time = per_step * steps_per_epoch

  # ---- (b) one full PPO.update_per_epoch ------------------------------
  buf = OnPolicyReplayBuffer(
      env_nums=vec_env_nums,
      max_replay_buffer_size=epoch_frames,
      time_limit_filter=params["replay_buffer"]["time_limit_filter"])
  for _ in range(steps_per_epoch):
    buf.add_sample({
        "obs": np.random.randn(vec_env_nums, obs_dim).astype(np.float32),
        "next_obs": np.random.randn(vec_env_nums, obs_dim).astype(np.float32),
        "acts": np.random.randn(vec_env_nums, act_dim).astype(np.float32),
        "values": np.random.randn(vec_env_nums, 1).astype(np.float32),
        "rewards": np.random.randn(vec_env_nums, 1).astype(np.float32),
        "terminals": np.zeros((vec_env_nums, 1), dtype=bool),
        "time_limits": np.zeros((vec_env_nums, 1), dtype=bool),
    })

  agent = PPO(
      pf=pf, vf=vf,
      clip_para=ppo_p["clip_para"], opt_epochs=ppo_p["opt_epochs"],
      plr=ppo_p["plr"], vlr=ppo_p["vlr"],
      entropy_coeff=ppo_p["entropy_coeff"], tau=ppo_p["tau"],
      gae=gs["gae"], shuffle=ppo_p["shuffle"],
      env=_FakeEnv(), replay_buffer=buf,
      collector=_FakeCollector(epoch_frames), logger=_NullLogger(),
      discount=gs["discount"], batch_size=gs["batch_size"],
      num_epochs=gs["num_epochs"], device="cpu",
      save_dir="/tmp/ref_measure")
  agent.current_epoch = 0

  t0 = time.time()
  agent.update_per_epoch()
  update_time = time.time() - t0

  epoch_time_lower_bound = collect_policy_time + update_time
  steps_per_sec_upper_bound = epoch_frames / epoch_time_lower_bound

  result = {
      "host": "this host, torch CPU (reference assumes CUDA; no GPU here)",
      "torch": torch.__version__,
      "vec_env_nums": vec_env_nums,
      "epoch_frames": epoch_frames,
      "collect_policy_time_s": round(collect_policy_time, 2),
      "update_time_s": round(update_time, 2),
      "epoch_time_lower_bound_s": round(epoch_time_lower_bound, 2),
      "ref_steps_per_sec_upper_bound": round(steps_per_sec_upper_bound, 1),
      "excluded": "pybullet physics + EGL depth render + IPC (pybullet "
                  "uninstallable: no network)",
  }
  os.makedirs(os.path.dirname(OUT), exist_ok=True)
  with open(OUT, "w") as f:
    json.dump(result, f, indent=2)
  print(json.dumps(result))


if __name__ == "__main__":
  main()
