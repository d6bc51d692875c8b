"""Sweep the full 89-file config tree: every JSON must build an env and
the matching actor-critic module without error.

The JSON schema is the reference's compatibility surface (params.json is
re-read verbatim at eval/deploy time, torchrl/utils/args.py:50-53 +
starter/ppo_locotransformer.py:27); this guards the whole tree, not just
the configs exercised by training runs.
"""
import glob
import json
import os.path as osp
import sys

import jax
import pytest

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, ROOT)

from vision4leg_tpu.envs.get_env import get_env  # noqa: E402

CONFIGS = sorted(glob.glob(osp.join(ROOT, "config/**/*.json"),
                           recursive=True))
CONFIGS = [c for c in CONFIGS if "generate" not in c]


def _build_module(env, params, path):
  """Pick the starter module family the config belongs to (README.md's
  config->starter pairing: locotransformer* dirs -> ppo_locotransformer,
  naive_baseline/frame_extract4* -> ppo_nature_cnn, state-only -> state;
  *_vision_only trees -> the vision-only variants)."""
  if "state-only" in path:
    from starter.ppo_state import build_module
  elif "mpc_vision_only" in path:
    if "locotransformer" in osp.basename(osp.dirname(path)):
      from starter.ppo_locotransformer_vision_only import build_module
    else:
      from starter.ppo_nature_cnn_vision_only import build_module
  elif "locotransformer" in osp.basename(osp.dirname(path)):
    from starter.ppo_locotransformer import build_module
  else:
    from starter.ppo_nature_cnn import build_module
  return build_module(env, params)


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[osp.relpath(c, ROOT) for c in CONFIGS])
def test_config_builds(path):
  params = json.load(open(path))
  env, meta = get_env(params["env_name"], params["env"])
  assert env.obs_dim > 0   # vision-only MPC envs have proprio_dim == 0
  assert meta["horizon"] > 0
  module = _build_module(env, params, path)
  assert module is not None


def test_one_config_per_family_inits():
  """One representative config per family additionally initializes its
  model parameters against the env's real observation shape."""
  reps = [
      "config/rl/static/state-only-baseline.json",
      "config/rl/static/naive_baseline/thin-goal.json",
      "config/rl/static/locotransformer/thin-goal.json",
      "config/rl/moving/locotransformer_random_delay/thin-goal.json",
      "config/rl/challenge/locotransformer/hill.json",
      "config/mpc/locotransformer/thin-goal.json",
      "config/mpc_vision_only/baseline/thin-goal.json",
  ]
  import jax.numpy as jnp
  for rel in reps:
    path = osp.join(ROOT, rel)
    params = json.load(open(path))
    env, _ = get_env(params["env_name"], params["env"])
    module = _build_module(env, params, path)
    obs_dim = env.obs_dim
    p = module.init(jax.random.PRNGKey(0), jnp.zeros((1, obs_dim)))
    (mean, std, _), value = module.apply(p, jnp.zeros((2, obs_dim)))
    assert mean.shape == (2, env.cfg.action_dim), rel
    assert value.shape[0] == 2, rel
