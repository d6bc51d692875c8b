"""GOLDEN parity against the REAL reference torch code at /root/reference.

Unlike tests/test_ppo_torch_parity.py (which pins the update math against a
builder-written torch twin), these tests import the reference's own modules
(`torchrl.networks.nets.LocoTransformer` nets.py:909-1038,
`GaussianContPolicyLocoTransformer` continuous_policy.py:478,
`torchrl.algo.PPO.update_per_epoch` algo/on_policy/ppo.py:28-161,
`OnPolicyReplayBuffer.generalized_advantage_estimation` + `one_iteration`
replay_buffers/on_policy.py:17-93) and drive them directly:

  * forward parity: flax params transplanted into the real reference
    networks (LocoTransformer pf/vf, Net/GaussianContPolicyBasicBias,
    NatureFuseEncoder + ImpalaEncoderProjNet) produce the same mean / std /
    logstd / value on random observations;
  * update parity: the real `PPO.update_per_epoch` (real buffer GAE, real
    minibatch iteration, real dual-Adam/grad-clip/adv-norm update) and the
    repo's jitted PPOLearner, started from identical transplanted weights
    and identical synthetic trajectories, land on the same parameters.

Import recipe proven by tools/measure_reference.py:41-53 — gymnasium shims
`gym`, no pybullet needed for the torchrl import surface driven here.
"""
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
if not os.path.isdir(os.path.join(REF, "torchrl")):
  pytest.skip("reference checkout not available", allow_module_level=True)

import gymnasium  # noqa: E402

sys.modules.setdefault("gym", gymnasium)
# APPEND (never insert at 0): the reference tree also has a `starter/`
# package, and putting REF ahead of the repo root made any later test in
# the same process import the REFERENCE's starter scripts instead of the
# repo's (test_configs broke this way).  `torchrl`/`vision4leg` exist only
# in the reference, so end-of-path resolution is sufficient for them.
if REF not in sys.path:
  sys.path.append(REF)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import torchrl.networks as ref_networks  # noqa: E402
import torchrl.policies as ref_policies  # noqa: E402
from torchrl.algo import PPO as RefPPO  # noqa: E402
from torchrl.replay_buffers.on_policy import OnPolicyReplayBuffer  # noqa: E402

from vision4leg_tpu.algo.ppo import PPOConfig, PPOLearner  # noqa: E402
from vision4leg_tpu.collector.rollout import Transition  # noqa: E402
from vision4leg_tpu.models.actor_critic import (  # noqa: E402
    LocoTransformerActorCritic, NatureFuseActorCritic, StateActorCritic)

PROPRIO, CH, ADIM = 20, 4, 6
OBS_DIM = PROPRIO + CH * 64 * 64


# ---------------------------------------------------------------------------
# flax -> torch weight transplant helpers
# ---------------------------------------------------------------------------
def _t(x):
  return torch.tensor(np.asarray(x, np.float32))


def _lin(dst: torch.nn.Linear, p):
  with torch.no_grad():
    dst.weight.copy_(_t(p["kernel"]).T)
    dst.bias.copy_(_t(p["bias"]))


def _conv(dst: torch.nn.Conv2d, p):
  # flax Conv kernel (H, W, In, Out) -> torch (Out, In, H, W)
  with torch.no_grad():
    dst.weight.copy_(_t(p["kernel"]).permute(3, 2, 0, 1))
    dst.bias.copy_(_t(p["bias"]))


def _ln(dst: torch.nn.LayerNorm, p):
  with torch.no_grad():
    dst.weight.copy_(_t(p["scale"]))
    dst.bias.copy_(_t(p["bias"]))


def _attn_layer(dst, p):
  """flax MultiHeadDotProductAttention(num_heads=1) + post-norm FFN ->
  torch nn.TransformerEncoderLayer (the reference's layer, dropout=0)."""
  a = p["MultiHeadDotProductAttention_0"]
  d = int(np.asarray(a["out"]["bias"]).shape[0])
  wq = _t(a["query"]["kernel"]).reshape(d, d)   # (in, out)
  wk = _t(a["key"]["kernel"]).reshape(d, d)
  wv = _t(a["value"]["kernel"]).reshape(d, d)
  with torch.no_grad():
    dst.self_attn.in_proj_weight.copy_(
        torch.cat([wq.T, wk.T, wv.T], dim=0))
    dst.self_attn.in_proj_bias.copy_(torch.cat([
        _t(a["query"]["bias"]).reshape(-1),
        _t(a["key"]["bias"]).reshape(-1),
        _t(a["value"]["bias"]).reshape(-1)]))
    dst.self_attn.out_proj.weight.copy_(
        _t(a["out"]["kernel"]).reshape(d, d).T)
    dst.self_attn.out_proj.bias.copy_(_t(a["out"]["bias"]))
  _lin(dst.linear1, p["Dense_0"])
  _lin(dst.linear2, p["Dense_1"])
  _ln(dst.norm1, p["LayerNorm_0"])
  _ln(dst.norm2, p["LayerNorm_1"])


def _load_nature(dst, p):
  """flax NatureEncoder -> reference NatureEncoder (base.py:304-343)."""
  _conv(dst.layers[0], p["Conv_0"])
  _conv(dst.layers[2], p["Conv_1"])
  _conv(dst.layers[4], p["Conv_2"])


def _load_loco_encoder(enc, p):
  """flax LocoTransformerEncoder params -> reference LocoTransformerEncoder
  (base.py:497-627), depth-only wiring (in_channels=4)."""
  _load_nature(enc.depth_visual_base, p["NatureEncoder_0"])
  _conv(enc.depth_up_conv, p["Conv_0"])
  _lin(enc.base.seq_fcs[0], p["MLPBase_0"]["Dense_0"])
  _lin(enc.base.seq_fcs[2], p["MLPBase_0"]["Dense_1"])
  _lin(enc.state_projector.projection[0], p["RLProjection_0"]["Dense_0"])


def _load_loco_net(net, params, layers_prefix, mlp_key):
  """Transformer stack + append-MLP of a reference LocoTransformer."""
  for i, tl in enumerate(net.visual_append_layers):
    _attn_layer(tl, params[f"{layers_prefix}_{i}"])
  fcs = [m for m in net.visual_seq_append_fcs
         if isinstance(m, torch.nn.Linear)]
  for i, fc in enumerate(fcs):
    _lin(fc, params[mlp_key][f"Dense_{i}"])


def _build_ref_loco_pair(params):
  """Reference pf/vf with the repo's flax params transplanted in.

  Mirrors starter/ppo_locotransformer.py:79-101: one encoder object shared
  by policy and value networks."""
  p = params["params"]
  encoder = ref_networks.LocoTransformerEncoder(
      in_channels=CH, state_input_dim=PROPRIO, hidden_shapes=[256, 256],
      token_dim=64)
  pf = ref_policies.GaussianContPolicyLocoTransformer(
      encoder=encoder, state_input_shape=PROPRIO,
      visual_input_shape=(CH, 64, 64), output_shape=ADIM,
      transformer_params=[[1, 256], [1, 256]],
      append_hidden_shapes=[256, 256], base_type=ref_networks.MLPBase)
  vf = ref_networks.LocoTransformer(
      encoder=encoder, state_input_shape=PROPRIO,
      visual_input_shape=(CH, 64, 64), output_shape=1,
      transformer_params=[[1, 256], [1, 256]],
      append_hidden_shapes=[256, 256], base_type=ref_networks.MLPBase)
  _load_loco_encoder(encoder, p["encoder"])
  _load_loco_net(pf, p, "pf_layers", "pf_mlp")
  _load_loco_net(vf, p, "vf_layers", "vf_mlp")
  with torch.no_grad():
    pf.logstd.copy_(_t(p["head"]["logstd"]))
  return pf, vf


def _flax_loco():
  module = LocoTransformerActorCritic(
      action_dim=ADIM, state_input_shape=PROPRIO,
      visual_input_shape=(CH, 64, 64), encoder_hidden_shapes=(256, 256),
      transformer_params=((1, 256), (1, 256)),
      append_hidden_shapes=(256, 256))
  params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, OBS_DIM)))
  return module, params


def _rand_obs(key, shape):
  return jax.random.normal(key, shape, jnp.float32)


# ---------------------------------------------------------------------------
# forward parity
# ---------------------------------------------------------------------------
def test_export_twin_matches_reference_policy():
  """Deployment export twin vs the REAL reference policy (VERDICT r2:
  export parity was previously only flax <-> builder-written twin, so a
  shared misreading of the reference could pass).  Transplant one set
  of flax params BOTH into the reference's own
  GaussianContPolicyLocoTransformer (continuous_policy.py:478) and into
  the export twin (hardware/export.py flax_to_torch_policy, the ONNX
  deployment path) and assert the two torch networks produce the same
  mean action."""
  from vision4leg_tpu.hardware.export import flax_to_torch_policy

  module, params = _flax_loco()
  pf, _ = _build_ref_loco_pair(params)
  pf.eval()
  twin = flax_to_torch_policy(module, params)
  twin.eval()

  obs_t = torch.tensor(np.asarray(_rand_obs(jax.random.PRNGKey(7),
                                            (5, OBS_DIM))))
  with torch.no_grad():
    mean_ref, _, _ = pf(obs_t)
    mean_twin = twin(obs_t)
  np.testing.assert_allclose(mean_twin.numpy(), mean_ref.numpy(),
                             atol=2e-4, rtol=1e-3)


def test_locotransformer_forward_matches_reference():
  module, params = _flax_loco()
  pf, vf = _build_ref_loco_pair(params)
  pf.eval(), vf.eval()

  obs = _rand_obs(jax.random.PRNGKey(1), (5, OBS_DIM))
  mean_j, std_j, logstd_j = module.apply(params, obs, method=module.pi)
  v_j = module.apply(params, obs, method=module.v)

  obs_t = torch.tensor(np.asarray(obs))
  with torch.no_grad():
    mean_t, std_t, logstd_t = pf(obs_t)
    v_t = vf(obs_t)

  np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-4)
  np.testing.assert_allclose(np.asarray(std_j), std_t.numpy(), atol=1e-5)
  np.testing.assert_allclose(np.asarray(logstd_j),
                             logstd_t.numpy(), atol=1e-6)
  np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=1e-4)


def _build_ref_state_pair(params, obs_dim, hidden=(64, 64), append=(32, 32)):
  """Reference GaussianContPolicyBasicBias + Net with a shared MLPBase
  (starter/ppo_state.py:93-104), flax params transplanted in."""
  p = params["params"]
  pf = ref_policies.GaussianContPolicyBasicBias(
      input_shape=obs_dim, output_shape=ADIM,
      base_type=ref_networks.MLPBase, hidden_shapes=list(hidden),
      append_hidden_shapes=list(append))
  vf = ref_networks.Net(
      input_shape=obs_dim, output_shape=1, base_type=ref_networks.MLPBase,
      hidden_shapes=list(hidden), append_hidden_shapes=list(append))
  vf.base = pf.base  # the reference's shared trunk
  for i in range(len(hidden)):
    _lin(pf.base.seq_fcs[2 * i], p["base"][f"Dense_{i}"])
  for i in range(len(append) + 1):
    _lin(pf.seq_append_fcs[2 * i], p["pf_mlp"][f"Dense_{i}"])
    _lin(vf.seq_append_fcs[2 * i], p["vf_mlp"][f"Dense_{i}"])
  with torch.no_grad():
    pf.logstd.copy_(_t(p["head"]["logstd"]))
  return pf, vf


def test_state_policy_forward_matches_reference():
  """ppo_state wiring: GaussianContPolicyBasicBias + Net with a shared
  MLPBase (starter/ppo_state.py:93-104)."""
  obs_dim = 33
  module = StateActorCritic(action_dim=ADIM, hidden_shapes=(64, 64),
                            append_hidden_shapes=(32, 32))
  params = module.init(jax.random.PRNGKey(2), jnp.zeros((1, obs_dim)))
  pf, vf = _build_ref_state_pair(params, obs_dim)

  obs = _rand_obs(jax.random.PRNGKey(3), (7, obs_dim))
  mean_j, std_j, _ = module.apply(params, obs, method=module.pi)
  v_j = module.apply(params, obs, method=module.v)
  obs_t = torch.tensor(np.asarray(obs))
  with torch.no_grad():
    mean_t, std_t, _ = pf(obs_t)
    v_t = vf(obs_t)
  np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-5)
  np.testing.assert_allclose(np.asarray(std_j), std_t.numpy(), atol=1e-6)
  np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=1e-5)


def test_naturefuse_forward_matches_reference():
  """ppo_nature_cnn wiring: NatureFuseEncoder shared by
  GaussianContPolicyImpalaEncoderProj + ImpalaEncoderProjNet
  (starter/ppo_nature_cnn.py:81-103; the 'Impala' names are historical —
  they consume any encoder returning (visual_out, state_out))."""
  module = NatureFuseActorCritic(
      action_dim=ADIM, state_input_shape=PROPRIO,
      visual_input_shape=(CH, 64, 64), encoder_hidden_shapes=(64, 64),
      visual_dim=128, append_hidden_shapes=(64, 64))
  params = module.init(jax.random.PRNGKey(4), jnp.zeros((1, OBS_DIM)))
  p = params["params"]

  encoder = ref_networks.NatureFuseEncoder(
      in_channels=CH, state_input_dim=PROPRIO, visual_dim=128,
      hidden_shapes=[64, 64])
  pf = ref_policies.GaussianContPolicyImpalaEncoderProj(
      encoder=encoder, state_input_shape=PROPRIO,
      visual_input_shape=(CH, 64, 64), output_shape=ADIM,
      append_hidden_shapes=[64, 64], base_type=ref_networks.MLPBase)
  vf = ref_networks.ImpalaEncoderProjNet(
      encoder=encoder, state_input_shape=PROPRIO,
      visual_input_shape=(CH, 64, 64), output_shape=1,
      append_hidden_shapes=[64, 64], base_type=ref_networks.MLPBase)
  pe = p["encoder"]
  _load_nature(encoder.visual_base, pe["NatureEncoder_0"])
  _lin(encoder.visual_projector.projection[0],
       pe["RLProjection_0"]["Dense_0"])
  _lin(encoder.base.seq_fcs[0], pe["MLPBase_0"]["Dense_0"])
  _lin(encoder.base.seq_fcs[2], pe["MLPBase_0"]["Dense_1"])
  for i in range(3):
    _lin(pf.seq_append_fcs[2 * i], p["pf_mlp"][f"Dense_{i}"])
    _lin(vf.seq_append_fcs[2 * i], p["vf_mlp"][f"Dense_{i}"])
  with torch.no_grad():
    pf.logstd.copy_(_t(p["head"]["logstd"]))

  obs = _rand_obs(jax.random.PRNGKey(5), (4, OBS_DIM))
  mean_j, std_j, _ = module.apply(params, obs, method=module.pi)
  v_j = module.apply(params, obs, method=module.v)
  obs_t = torch.tensor(np.asarray(obs))
  with torch.no_grad():
    mean_t, std_t, _ = pf(obs_t)
    v_t = vf(obs_t)
  np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-4)
  np.testing.assert_allclose(np.asarray(std_j), std_t.numpy(), atol=1e-6)
  np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=1e-4)


@pytest.mark.parametrize("channels", [4, 16], ids=["depth", "rgbd"])
def test_vision_only_transformer_forward_matches_reference(channels):
  """ppo_locotransformer_vision_only wiring: the reference's vision-only
  TransformerEncoder (base.py:388-496, NO proprio token) +
  Transformer/GaussianContPolicyTransformer (nets.py:784-908,
  continuous_policy.py:461), including the reference's exact pooling
  slices: out[0:1+per_modal] for the first pool (which on the RGBD
  32-token stream overlaps one rgb token) and out[per_modal:2*per_modal]
  for the second, with depth-then-rgb token order (base.py:488-493)."""
  from vision4leg_tpu.models.actor_critic import (
      VisionOnlyTransformerActorCritic)

  obs_dim = channels * 64 * 64
  module = VisionOnlyTransformerActorCritic(
      action_dim=ADIM, state_input_shape=0,
      visual_input_shape=(channels, 64, 64),
      transformer_params=((1, 256), (1, 256)),
      append_hidden_shapes=(256, 256))
  params = module.init(jax.random.PRNGKey(6), jnp.zeros((1, obs_dim)))
  p = params["params"]

  encoder = ref_networks.TransformerEncoder(in_channels=channels,
                                            token_dim=64)
  pf = ref_policies.GaussianContPolicyTransformer(
      encoder=encoder, visual_input_shape=(channels, 64, 64),
      output_shape=ADIM, transformer_params=[[1, 256], [1, 256]],
      append_hidden_shapes=[256, 256])
  vf = ref_networks.Transformer(
      encoder=encoder, visual_input_shape=(channels, 64, 64),
      output_shape=1, transformer_params=[[1, 256], [1, 256]],
      append_hidden_shapes=[256, 256])

  pe = p["encoder"]
  if channels == 4:
    _load_nature(encoder.depth_visual_base, pe["NatureEncoder_0"])
    _conv(encoder.depth_up_conv, pe["Conv_0"])
  else:
    # flax creation order is rgb-first (matching the reference ctor,
    # base.py:402-418); the OUTPUT token order is depth,rgb
    _load_nature(encoder.rgb_visual_base, pe["NatureEncoder_0"])
    _conv(encoder.rgb_up_conv, pe["Conv_0"])
    _load_nature(encoder.depth_visual_base, pe["NatureEncoder_1"])
    _conv(encoder.depth_up_conv, pe["Conv_1"])
  _load_loco_net(pf, p, "pf_layers", "pf_mlp")
  _load_loco_net(vf, p, "vf_layers", "vf_mlp")
  with torch.no_grad():
    pf.logstd.copy_(_t(p["head"]["logstd"]))
  pf.eval(), vf.eval()

  obs = _rand_obs(jax.random.PRNGKey(7), (3, obs_dim))
  mean_j, std_j, _ = module.apply(params, obs, method=module.pi)
  v_j = module.apply(params, obs, method=module.v)
  obs_t = torch.tensor(np.asarray(obs))
  with torch.no_grad():
    mean_t, std_t, _ = pf(obs_t)
    v_t = vf(obs_t)
  np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-4)
  np.testing.assert_allclose(np.asarray(std_j), std_t.numpy(), atol=1e-6)
  np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=1e-4)


def _load_impala(dst, p):
  """flax ImpalaEncoder -> reference ImpalaEncoder (base.py:158-190):
  3 ImpalaBlocks of conv + maxpool + 2 residual blocks."""
  for bi, blk in enumerate([dst.block1, dst.block2, dst.block3]):
    _conv(blk.conv, p[f"Conv_{bi}"])
    for ri, res in enumerate([blk.res1, blk.res2]):
      rp = p[f"ImpalaResBlock_{2 * bi + ri}"]
      _conv(res.conv1, rp["Conv_0"])
      _conv(res.conv2, rp["Conv_1"])


def test_impala_fuse_residual_forward_matches_reference():
  """PPOAux's actor: GaussianContPolicyImpalaFuseResidual
  (continuous_policy.py:293 over nets.py:384-487 ImpalaFuseResidualActor
  + base.py:253 ImpalaFuseEncoder): actor output = fused(cat[visual,
  state]) + residual(state), with the Impala conv stack (whose torch
  MaxPool2d(3,2,padding=1) pads symmetrically — pinned here).  The aux
  path (forward_and_compute_aux_loss) is NOT golden-testable: it calls
  encoder.forward_with_sub_vec, which no reference encoder defines —
  uncallable dead code in the reference."""
  from vision4leg_tpu.models.actor_critic import ImpalaFuseResidualActorCritic

  proprio = 33
  obs_dim = proprio + CH * 64 * 64
  module = ImpalaFuseResidualActorCritic(
      action_dim=ADIM, state_input_shape=proprio,
      visual_input_shape=(CH, 64, 64), encoder_hidden_shapes=(32, 32),
      visual_dim=64, append_hidden_shapes=(32, 32))
  params = module.init(jax.random.PRNGKey(10), jnp.zeros((1, obs_dim)))
  p = params["params"]

  encoder = ref_networks.ImpalaFuseEncoder(
      in_channels=CH, state_input_dim=proprio, visual_dim=64,
      hidden_shapes=[32, 32])
  pf = ref_policies.GaussianContPolicyImpalaFuseResidual(
      encoder=encoder, state_input_shape=proprio,
      visual_input_shape=(CH, 64, 64), output_shape=ADIM,
      append_hidden_shapes=[32, 32])

  _load_impala(encoder.visual_base, p["visual_base"])
  _lin(encoder.visual_projector.projection[0], p["visual_proj"]["Dense_0"])
  _lin(encoder.base.seq_fcs[0], p["state_mlp"]["Dense_0"])
  _lin(encoder.base.seq_fcs[2], p["state_mlp"]["Dense_1"])
  for i in range(3):
    _lin(pf.visual_seq_append_fcs[2 * i], p["pf_fused"][f"Dense_{i}"])
    _lin(pf.seq_append_fcs[2 * i], p["pf_state"][f"Dense_{i}"])
  with torch.no_grad():
    pf.logstd.copy_(_t(p["head"]["logstd"]))
  pf.eval()

  obs = _rand_obs(jax.random.PRNGKey(11), (3, obs_dim))
  mean_j, std_j, _ = module.apply(params, obs, method=module.pi)
  obs_t = torch.tensor(np.asarray(obs))
  with torch.no_grad():
    mean_t, std_t, _ = pf(obs_t)
  np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-4)
  np.testing.assert_allclose(np.asarray(std_j), std_t.numpy(), atol=1e-6)


def test_visualnet_forward_matches_reference():
  """ppo_nature_cnn_vision_only wiring: GaussianContPolicyNatureEncoderProj
  + NatureEncoderProjNet over one shared raw NatureEncoder — no
  projection layer; the append MLPs consume the 1024-dim conv flatten
  directly (nets.py:133-191, starter/ppo_nature_cnn_vision_only.py)."""
  from vision4leg_tpu.models.actor_critic import VisualNetActorCritic

  obs_dim = CH * 64 * 64
  module = VisualNetActorCritic(
      action_dim=ADIM, state_input_shape=0,
      visual_input_shape=(CH, 64, 64), append_hidden_shapes=(64, 64))
  params = module.init(jax.random.PRNGKey(8), jnp.zeros((1, obs_dim)))
  p = params["params"]

  encoder = ref_networks.NatureEncoder(in_channels=CH)
  pf = ref_policies.GaussianContPolicyNatureEncoderProj(
      encoder=encoder, visual_input_shape=(CH, 64, 64), output_shape=ADIM,
      append_hidden_shapes=[64, 64])
  vf = ref_networks.NatureEncoderProjNet(
      encoder=encoder, visual_input_shape=(CH, 64, 64), output_shape=1,
      append_hidden_shapes=[64, 64])
  _load_nature(encoder, p["backbone"])
  for i in range(3):
    _lin(pf.seq_append_fcs[2 * i], p["pf_mlp"][f"Dense_{i}"])
    _lin(vf.seq_append_fcs[2 * i], p["vf_mlp"][f"Dense_{i}"])
  with torch.no_grad():
    pf.logstd.copy_(_t(p["head"]["logstd"]))
  pf.eval(), vf.eval()

  obs = _rand_obs(jax.random.PRNGKey(9), (4, obs_dim))
  mean_j, std_j, _ = module.apply(params, obs, method=module.pi)
  v_j = module.apply(params, obs, method=module.v)
  obs_t = torch.tensor(np.asarray(obs))
  with torch.no_grad():
    mean_t, std_t, _ = pf(obs_t)
    v_t = vf(obs_t)
  np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=1e-4)
  np.testing.assert_allclose(np.asarray(std_j), std_t.numpy(), atol=1e-6)
  np.testing.assert_allclose(np.asarray(v_j), v_t.numpy(), atol=1e-4)


# ---------------------------------------------------------------------------
# update parity: real PPO.update_per_epoch vs repo PPOLearner
# ---------------------------------------------------------------------------
class _NullLogger:
  def add_update_info(self, *a, **k):
    pass

  def add_epoch_info(self, *a, **k):
    pass


class _FakeEnv:
  action_space = gymnasium.spaces.Box(low=-1.0, high=1.0, shape=(ADIM,))


class _FakeCollector:
  def __init__(self, epoch_frames):
    self.epoch_frames = epoch_frames

  @property
  def funcs(self):
    return {}


@pytest.mark.parametrize("clipped_vf", [False, True],
                         ids=["mse_vf", "clipped_vf"])
def test_ppo_update_matches_real_reference(clipped_vf):
  """One epoch of the REAL torchrl PPO (GAE via the real buffer, real
  minibatch iteration, dual Adam eps=1e-5, grad clip 0.5, critic-then-actor
  on the shared encoder) vs the repo's jitted learner, from identical
  weights and trajectories.  shuffle=False on both sides so the minibatch
  order is defined by the code under test, not by RNG coupling.  Runs both
  value-loss forms: plain MSE and the reference's clipped form
  (ppo.py:105-113), the config-reachable lever for late-training V-fit
  swings (PARITY.md horizon ablation)."""
  T, E = 4, 2
  cfg = PPOConfig(plr=1e-3, vlr=1e-3, clip_para=0.2, entropy_coeff=0.005,
                  discount=0.99, tau=0.95, batch_size=2 * E,
                  epoch_frames=T * E, max_episode_frames=999,
                  opt_epochs=2, num_epochs=100, shuffle=False,
                  clipped_value_loss=clipped_vf)

  module, params = _flax_loco()
  pf, vf = _build_ref_loco_pair(params)

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  learner = PPOLearner(cfg, apply_pi, apply_v, params)
  ts = learner.init_state(params)

  ks = jax.random.split(jax.random.PRNGKey(11), 6)
  obs = _rand_obs(ks[0], (T, E, OBS_DIM))
  next_obs = _rand_obs(ks[1], (T, E, OBS_DIM))
  acts = jax.random.normal(ks[2], (T, E, ADIM))
  rewards = jax.random.normal(ks[3], (T, E, 1))
  terminals = (jax.random.uniform(ks[4], (T, E, 1)) < 0.2)
  time_limits = jnp.zeros((T, E, 1), bool).at[2, 1, 0].set(True)

  flat_obs = obs.reshape(-1, OBS_DIM)
  mean0, std0, _ = apply_pi(params, flat_obs)
  logp0 = jnp.sum(
      -0.5 * ((acts.reshape(-1, ADIM) - mean0) / std0) ** 2
      - jnp.log(std0) - 0.5 * jnp.log(2 * jnp.pi), -1, keepdims=True)
  values0 = apply_v(params, flat_obs)

  traj = Transition(
      obs=obs, acts=acts, log_probs=logp0.reshape(T, E, 1),
      values=values0.reshape(T, E, 1), rewards=rewards,
      terminals=terminals, time_limits=time_limits,
      means=mean0.reshape(T, E, ADIM), stds=std0.reshape(T, E, ADIM))
  # the reference bootstraps from vf(next_obs[-1]) * (1 - terminals[-1])
  # (on_rl_algo.py:23-32); feed the repo learner the matching value
  last_value = (apply_v(params, next_obs[-1])[:, 0]
                * (1.0 - terminals[-1, :, 0].astype(jnp.float32)))

  new_ts, _ = jax.jit(learner.update_per_epoch)(ts, traj, last_value,
                                                jax.random.PRNGKey(0))

  # ---- the real reference update ----
  buf = OnPolicyReplayBuffer(env_nums=E, max_replay_buffer_size=T * E,
                             time_limit_filter=True)
  obs_n, next_n = np.asarray(obs), np.asarray(next_obs)
  acts_n, rew_n = np.asarray(acts), np.asarray(rewards)
  term_n = np.asarray(terminals)
  tl_n = np.asarray(time_limits)
  vals_n = np.asarray(values0.reshape(T, E, 1))
  for t in range(T):
    buf.add_sample({
        "obs": obs_n[t], "next_obs": next_n[t], "acts": acts_n[t],
        "values": vals_n[t], "rewards": rew_n[t],
        "terminals": term_n[t], "time_limits": tl_n[t]})

  agent = RefPPO(
      pf=pf, vf=vf, clip_para=cfg.clip_para, opt_epochs=cfg.opt_epochs,
      plr=cfg.plr, vlr=cfg.vlr, entropy_coeff=cfg.entropy_coeff,
      tau=cfg.tau, gae=True, shuffle=False, env=_FakeEnv(),
      clipped_value_loss=clipped_vf,
      replay_buffer=buf, collector=_FakeCollector(T * E),
      logger=_NullLogger(), discount=cfg.discount,
      batch_size=cfg.batch_size, num_epochs=cfg.num_epochs, device="cpu",
      save_dir="/tmp/ref_golden")
  agent.current_epoch = 0
  agent.update_per_epoch()

  # ---- compare updated parameters through the same transplant mapping ----
  ref_pf_after, ref_vf_after = pf, vf
  got = new_ts.params["params"]
  pf_new, vf_new = _build_ref_loco_pair(new_ts.params)

  # atol rationale: 4 Adam steps at lr=1e-3 move params by ~4e-3; XLA-CPU
  # vs torch conv/matmul op-ordering noise feeds Adam's normalized update
  # direction, observed worst-case ~6e-5 (1.5% of one step) on logstd.
  def assert_close(a: torch.nn.Module, b: torch.nn.Module, what: str):
    sa, sb = a.state_dict(), b.state_dict()
    assert sa.keys() == sb.keys()
    for k in sa:
      np.testing.assert_allclose(
          sb[k].numpy(), sa[k].numpy(), atol=2e-4,
          err_msg=f"{what}:{k} diverged from the real reference update")

  assert_close(ref_pf_after, pf_new, "pf")
  assert_close(ref_vf_after, vf_new, "vf")
  # sanity: the update actually moved the weights
  base0 = np.asarray(params["params"]["pf_mlp"]["Dense_2"]["kernel"])
  base1 = np.asarray(got["pf_mlp"]["Dense_2"]["kernel"])
  assert np.abs(base1 - base0).max() > 1e-6

def _unshared_state_module():
  """A state pf/vf pair with SEPARATE trunks.  The reference's own A2C is
  UNUSABLE with its shipped shared-trunk wiring (ppo_state.py:103
  `vf.base = pf.base`): A2C.update builds the vf graph before
  pf_optimizer.step() mutates the shared base in place, so
  vf_loss.backward() raises RuntimeError (torch in-place version check) —
  pinned by test_a2c_reference_crashes_with_shared_trunk below.  Golden
  A2C parity therefore uses unshared trunks, where the reference update
  is well-defined."""
  import flax.linen as nn
  from vision4leg_tpu.models.actor_critic import MLPHead, _GaussianHead
  from vision4leg_tpu.models.base import MLPBase

  class _UnsharedStateAC(nn.Module):
    def setup(self):
      self.pf_base = MLPBase((64, 64))
      self.pf_mlp = MLPHead((32, 32), ADIM)
      self.head = _GaussianHead(ADIM, 0.125)
      self.vf_base = MLPBase((64, 64))
      self.vf_mlp = MLPHead((32, 32), 1)

    def pi(self, x):
      return self.head(self.pf_mlp(self.pf_base(x)))

    def v(self, x):
      return self.vf_mlp(self.vf_base(x))

    def __call__(self, x):
      return self.pi(x), self.v(x)

  return _UnsharedStateAC()


def _build_ref_state_pair_unshared(params, obs_dim):
  p = params["params"]
  pf = ref_policies.GaussianContPolicyBasicBias(
      input_shape=obs_dim, output_shape=ADIM,
      base_type=ref_networks.MLPBase, hidden_shapes=[64, 64],
      append_hidden_shapes=[32, 32])
  vf = ref_networks.Net(
      input_shape=obs_dim, output_shape=1, base_type=ref_networks.MLPBase,
      hidden_shapes=[64, 64], append_hidden_shapes=[32, 32])
  for i in range(2):
    _lin(pf.base.seq_fcs[2 * i], p["pf_base"][f"Dense_{i}"])
    _lin(vf.base.seq_fcs[2 * i], p["vf_base"][f"Dense_{i}"])
  for i in range(3):
    _lin(pf.seq_append_fcs[2 * i], p["pf_mlp"][f"Dense_{i}"])
    _lin(vf.seq_append_fcs[2 * i], p["vf_mlp"][f"Dense_{i}"])
  with torch.no_grad():
    pf.logstd.copy_(_t(p["head"]["logstd"]))
  return pf, vf


def _synthetic_epoch(obs_dim, module, params, apply_pi, apply_v, seed=13,
                     policy_acts=False):
  """policy_acts=True draws acts from the current policy (mean + std*eps)
  instead of a unit normal.  TRPO needs this: its surrogate works in
  PROBABILITY space (trpo.py:178-181 probs_new = exp(log_probs)), and
  off-policy unit-normal acts under the reference's tight std=0.125 init
  give logp ~ -190, so exp underflows to exactly 0.0 in f32 and the whole
  ratio term silently drops out of the reference's gradient — parity would
  then only pin the entropy term.  PPO/A2C work in log space and don't
  care."""
  T, E = 4, 2
  ks = jax.random.split(jax.random.PRNGKey(seed), 6)
  obs = _rand_obs(ks[0], (T, E, obs_dim))
  next_obs = _rand_obs(ks[1], (T, E, obs_dim))
  acts = jax.random.normal(ks[2], (T, E, ADIM))
  rewards = jax.random.normal(ks[3], (T, E, 1))
  terminals = (jax.random.uniform(ks[4], (T, E, 1)) < 0.2)
  time_limits = jnp.zeros((T, E, 1), bool).at[1, 0, 0].set(True)

  flat_obs = obs.reshape(-1, obs_dim)
  mean0, std0, _ = apply_pi(params, flat_obs)
  if policy_acts:
    acts = (mean0 + std0 * acts.reshape(-1, ADIM)).reshape(T, E, ADIM)
  logp0 = jnp.sum(
      -0.5 * ((acts.reshape(-1, ADIM) - mean0) / std0) ** 2
      - jnp.log(std0) - 0.5 * jnp.log(2 * jnp.pi), -1, keepdims=True)
  values0 = apply_v(params, flat_obs)

  traj = Transition(
      obs=obs, acts=acts, log_probs=logp0.reshape(T, E, 1),
      values=values0.reshape(T, E, 1), rewards=rewards,
      terminals=terminals, time_limits=time_limits,
      means=mean0.reshape(T, E, ADIM), stds=std0.reshape(T, E, ADIM))
  last_value = (apply_v(params, next_obs[-1])[:, 0]
                * (1.0 - terminals[-1, :, 0].astype(jnp.float32)))

  buf = OnPolicyReplayBuffer(env_nums=E, max_replay_buffer_size=T * E,
                             time_limit_filter=True)
  for t in range(T):
    buf.add_sample({
        "obs": np.asarray(obs)[t], "next_obs": np.asarray(next_obs)[t],
        "acts": np.asarray(acts)[t],
        "values": np.asarray(values0.reshape(T, E, 1))[t],
        "rewards": np.asarray(rewards)[t],
        "terminals": np.asarray(terminals)[t],
        "time_limits": np.asarray(time_limits)[t]})
  return T, E, traj, last_value, buf


def test_a2c_update_matches_real_reference():
  """One epoch of the REAL torchrl A2C (a2c.py:46-107: per-minibatch adv
  normalization, -logp*adv - ent_coeff*ent, vf MSE, dual Adam eps=1e-5,
  grad clip 0.5, pf-step-then-vf-step with BOTH gradients taken at the
  pre-update params) vs the repo's A2CLearner, from identical weights and
  trajectories.  Unshared pf/vf trunks — see _unshared_state_module."""
  from torchrl.algo import A2C as RefA2C
  from vision4leg_tpu.algo.a2c import A2CConfig, A2CLearner

  obs_dim = 9
  cfg = A2CConfig(plr=1e-3, vlr=1e-3, entropy_coeff=0.005, discount=0.99,
                  tau=0.95, batch_size=4, epoch_frames=8,
                  max_episode_frames=999, num_epochs=100, shuffle=False)

  module = _unshared_state_module()
  params = module.init(jax.random.PRNGKey(12), jnp.zeros((1, obs_dim)))
  pf, vf = _build_ref_state_pair_unshared(params, obs_dim)

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  learner = A2CLearner(cfg, apply_pi, apply_v, params)
  ts = learner.init_state(params)
  T, E, traj, last_value, buf = _synthetic_epoch(
      obs_dim, module, params, apply_pi, apply_v)

  new_ts, _ = jax.jit(learner.update_per_epoch)(ts, traj, last_value,
                                                jax.random.PRNGKey(0))

  agent = RefA2C(
      pf=pf, vf=vf, plr=cfg.plr, vlr=cfg.vlr,
      entropy_coeff=cfg.entropy_coeff, tau=cfg.tau, gae=True,
      shuffle=False, env=_FakeEnv(), replay_buffer=buf,
      collector=_FakeCollector(T * E), logger=_NullLogger(),
      discount=cfg.discount, batch_size=cfg.batch_size,
      num_epochs=cfg.num_epochs, device="cpu", save_dir="/tmp/ref_golden")
  agent.current_epoch = 0
  agent.update_per_epoch()

  pf_new, vf_new = _build_ref_state_pair_unshared(new_ts.params, obs_dim)
  for (a, b, what) in [(pf, pf_new, "pf"), (vf, vf_new, "vf")]:
    sa, sb = a.state_dict(), b.state_dict()
    assert sa.keys() == sb.keys()
    for k in sa:
      np.testing.assert_allclose(
          sb[k].numpy(), sa[k].numpy(), atol=2e-4,
          err_msg=f"{what}:{k} diverged from the real reference A2C update")


def test_a2c_reference_crashes_with_shared_trunk():
  """DISCOVERED while golden-testing: the reference's A2C cannot run with
  its own shipped shared-trunk wiring (ppo_state.py:103 vf.base=pf.base).
  A2C.update (a2c.py:77) builds the vf loss graph BEFORE
  pf_optimizer.step() mutates the shared base in place, so
  vf_loss.backward() raises torch's in-place version-check RuntimeError.
  (PPO is unaffected: update_critic finishes backward+step before
  update_actor builds its graph, ppo.py:94-123.)  The repo's A2C is a
  well-defined superset: both gradients are taken at the pre-update
  params, which is also exactly what the reference computes in the cases
  where it does run (unshared trunks — test above)."""
  from torchrl.algo import A2C as RefA2C

  obs_dim = 9
  module = StateActorCritic(action_dim=ADIM, hidden_shapes=(64, 64),
                            append_hidden_shapes=(32, 32))
  params = module.init(jax.random.PRNGKey(14), jnp.zeros((1, obs_dim)))
  pf, vf = _build_ref_state_pair(params, obs_dim)  # SHARED trunk

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  T, E, traj, last_value, buf = _synthetic_epoch(
      obs_dim, module, params, apply_pi, apply_v, seed=15)

  agent = RefA2C(
      pf=pf, vf=vf, plr=1e-3, vlr=1e-3, entropy_coeff=0.005, tau=0.95,
      gae=True, shuffle=False, env=_FakeEnv(), replay_buffer=buf,
      collector=_FakeCollector(T * E), logger=_NullLogger(),
      discount=0.99, batch_size=4, num_epochs=100, device="cpu",
      save_dir="/tmp/ref_golden")
  agent.current_epoch = 0
  with pytest.raises(RuntimeError, match="inplace"):
    agent.update_per_epoch()

def test_qnet_forward_matches_reference():
  """Off-policy critics (SAC/TD3/DDPG): the reference QNet (nets.py QNet:
  Net over concat(obs, action)) vs the repo QNet, weights transplanted."""
  from vision4leg_tpu.models.off_policy_nets import QNet

  obs_dim, act_dim = 11, ADIM
  module = QNet(hidden_shapes=(32, 32))
  obs = jnp.zeros((1, obs_dim))
  act = jnp.zeros((1, act_dim))
  params = module.init(jax.random.PRNGKey(16), obs, act)
  p = params["params"]

  ref = ref_networks.QNet(
      output_shape=1, base_type=ref_networks.MLPBase,
      input_shape=obs_dim + act_dim, hidden_shapes=[32, 32])
  _lin(ref.base.seq_fcs[0], p["MLPBase_0"]["Dense_0"])
  _lin(ref.base.seq_fcs[2], p["MLPBase_0"]["Dense_1"])
  _lin(ref.seq_append_fcs[0], p["Dense_0"])
  ref.eval()

  ks = jax.random.split(jax.random.PRNGKey(17), 2)
  obs = _rand_obs(ks[0], (7, obs_dim))
  act = jnp.tanh(_rand_obs(ks[1], (7, act_dim)))
  q_j = module.apply(params, obs, act)
  with torch.no_grad():
    q_t = ref((torch.tensor(np.asarray(obs)), torch.tensor(np.asarray(act))))
  np.testing.assert_allclose(np.asarray(q_j), q_t.numpy(), atol=1e-5)


def test_tanh_normal_log_prob_matches_reference():
  """TanhNormal.log_prob (distribution.py:39-50, RLKIT-style: Normal
  log-prob of the pre-tanh value minus log(1 - a^2 + 1e-6)) vs the repo's
  distributions.log_prob — both the given-pre_tanh and the
  reconstructed-arctanh paths."""
  from torchrl.policies.distribution import TanhNormal as RefTanhNormal
  from vision4leg_tpu.models import distributions as dist

  ks = jax.random.split(jax.random.PRNGKey(18), 3)
  mean = _rand_obs(ks[0], (5, ADIM))
  std = jnp.exp(_rand_obs(ks[1], (5, ADIM)) * 0.3)
  z = mean + std * _rand_obs(ks[2], (5, ADIM))
  a = jnp.tanh(z)

  lp_j = dist.log_prob(mean, std, a, z)
  ref = RefTanhNormal(torch.tensor(np.asarray(mean)),
                      torch.tensor(np.asarray(std)))
  lp_t = ref.log_prob(torch.tensor(np.asarray(a)),
                      pre_tanh_value=torch.tensor(np.asarray(z)))
  np.testing.assert_allclose(np.asarray(lp_j), lp_t.numpy(), atol=1e-5)
  # arctanh-reconstruction path (the reference's no-pre_tanh branch)
  lp_t2 = ref.log_prob(torch.tensor(np.asarray(a)))
  np.testing.assert_allclose(np.asarray(lp_j), lp_t2.numpy(), atol=2e-4)


def test_bootstrapped_net_reference_is_unconstructable():
  """DISCOVERED while extending golden coverage: the reference's
  BootstrappedNet can never be instantiated — its ctor passes
  `add_ln=add_ln ** kwargs` (nets.py BootstrappedNet.__init__, a missing
  comma), i.e. bool ** dict, which raises TypeError for every possible
  argument combination.  The repo's BootstrappedQNet is therefore built
  from the class's evident intent (shared base + head_num independent
  append MLPs), not from runnable reference behavior."""
  with pytest.raises(TypeError, match="unsupported operand"):
    ref_networks.BootstrappedNet(
        output_shape=3, base_type=ref_networks.MLPBase, input_shape=5,
        hidden_shapes=[8], head_num=2)

def test_trpo_update_matches_real_reference():
  """One epoch of the REAL torchrl TRPO (trpo.py:154-276: whole-buffer
  natural gradient — Fisher CG with damping 0.1, sqrt(2*max_kl/sHs) step,
  10-backtrack line search whose objective has NO entropy term even
  though the searched gradient does, then v_opt_times value sweeps with
  0.5*MSE/Adam eps=1e-5/clip 0.5) vs the repo's TRPOLearner, from
  identical weights and trajectories, with the reference's shared
  pf/vf trunk.  TRPO is deterministic given the batch, so this pins the
  full CG + trust-region + line-search pipeline."""
  from torchrl.algo import TRPO as RefTRPO
  from vision4leg_tpu.algo.trpo import TRPOConfig, TRPOLearner

  obs_dim = 9
  T, E = 4, 2
  cfg = TRPOConfig(plr=1e-3, vlr=1e-3, entropy_coeff=0.005, discount=0.99,
                   tau=0.95, batch_size=T * E, epoch_frames=T * E,
                   max_episode_frames=999, num_epochs=100, shuffle=False,
                   max_kl=0.01, cg_damping=0.1, cg_iters=10,
                   residual_tol=1e-10, v_opt_times=2)

  module = StateActorCritic(action_dim=ADIM, hidden_shapes=(64, 64),
                            append_hidden_shapes=(32, 32))
  params = module.init(jax.random.PRNGKey(20), jnp.zeros((1, obs_dim)))
  pf, vf = _build_ref_state_pair(params, obs_dim)

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  learner = TRPOLearner(cfg, apply_pi, apply_v, params)
  ts = learner.init_state(params)
  T_, E_, traj, last_value, buf = _synthetic_epoch(
      obs_dim, module, params, apply_pi, apply_v, seed=21, policy_acts=True)

  new_ts, _ = jax.jit(learner.update_per_epoch)(ts, traj, last_value,
                                                jax.random.PRNGKey(0))

  agent = RefTRPO(
      pf=pf, vf=vf, plr=cfg.plr, vlr=cfg.vlr,
      entropy_coeff=cfg.entropy_coeff, tau=cfg.tau, gae=True,
      shuffle=False, env=_FakeEnv(), replay_buffer=buf,
      collector=_FakeCollector(T * E), logger=_NullLogger(),
      discount=cfg.discount, batch_size=cfg.batch_size,
      num_epochs=cfg.num_epochs, device="cpu", save_dir="/tmp/ref_golden",
      max_kl=cfg.max_kl, cg_damping=cfg.cg_damping, cg_iters=cfg.cg_iters,
      residual_tol=cfg.residual_tol, v_opt_times=cfg.v_opt_times)
  agent.current_epoch = 0
  agent.continuous = True
  agent.update_per_epoch()

  pf_new, vf_new = _build_ref_state_pair(new_ts.params, obs_dim)
  # atol rationale: the natural-gradient step moves params by ~1e-2 (the
  # KL=0.01 trust region); torch runs the CG inner products in float64
  # where the jitted scan stays f32, so direction noise up to ~1e-4 of
  # the step survives.
  for (a, b, what) in [(pf, pf_new, "pf"), (vf, vf_new, "vf")]:
    sa, sb = a.state_dict(), b.state_dict()
    assert sa.keys() == sb.keys()
    for k in sa:
      np.testing.assert_allclose(
          sb[k].numpy(), sa[k].numpy(), atol=5e-4,
          err_msg=f"{what}:{k} diverged from the real reference TRPO update")


# ---------------------------------------------------------------------------
# off-policy golden parity: DDPG / DQN / TD3 / TwinSACQ vs the real torchrl
# ---------------------------------------------------------------------------
from vision4leg_tpu.algo.off_policy.learners import (  # noqa: E402
    DDPGLearner, DQNLearner, OffPolicyConfig, TD3Learner, TwinSACQLearner)
from vision4leg_tpu.models.off_policy_nets import (  # noqa: E402
    BootstrappedQNet, DetTanhPolicy, DiscreteQNet, QNet, TanhGaussianPolicy)

OFF_OBS, OFF_B = 11, 6
_OFF_CFG = OffPolicyConfig(plr=1e-3, qlr=1e-3, discount=0.99,
                           batch_size=OFF_B, tau=0.01)


def _load_ref_net(ref, p):
  """Transplant a repo MLPBase(h0, h1)+Dense head into a reference Net."""
  _lin(ref.base.seq_fcs[0], p["MLPBase_0"]["Dense_0"])
  _lin(ref.base.seq_fcs[2], p["MLPBase_0"]["Dense_1"])
  _lin(ref.seq_append_fcs[0], p["Dense_0"])
  return ref


def _ref_qnet(params, act_dim, hidden=(32, 32)):
  return _load_ref_net(
      ref_networks.QNet(output_shape=1, base_type=ref_networks.MLPBase,
                        input_shape=OFF_OBS + act_dim,
                        hidden_shapes=list(hidden)), params["params"])


def _off_batch(seed, act_dim=ADIM, discrete=False):
  ks = jax.random.split(jax.random.PRNGKey(seed), 5)
  obs = _rand_obs(ks[0], (OFF_B, OFF_OBS))
  next_obs = _rand_obs(ks[1], (OFF_B, OFF_OBS))
  if discrete:
    acts = jax.random.randint(ks[2], (OFF_B,), 0, act_dim)
  else:
    acts = jnp.tanh(_rand_obs(ks[2], (OFF_B, act_dim)))
  rewards = _rand_obs(ks[3], (OFF_B, 1))
  terminals = (jax.random.uniform(ks[4], (OFF_B, 1)) < 0.2).astype(
      jnp.float32)
  return {"obs": obs, "acts": acts, "next_obs": next_obs,
          "rewards": rewards, "terminals": terminals}


def _np_batch(batch, discrete=False):
  out = {k: np.asarray(v) for k, v in batch.items()}
  if discrete:
    out["acts"] = out["acts"][:, None].astype(np.float32)
  return out


def _assert_nets_close(ref_net, params, builder, what, atol=1e-5):
  rebuilt = builder(params)
  sa, sb = ref_net.state_dict(), rebuilt.state_dict()
  assert sa.keys() == sb.keys()
  for k in sa:
    np.testing.assert_allclose(
        sb[k].numpy(), sa[k].numpy(), atol=atol,
        err_msg=f"{what}:{k} diverged from the real reference update")


def test_ddpg_update_matches_real_reference():
  """Three updates of the REAL torchrl DDPG (ddpg.py:43-111: deterministic
  actor against the pre-update critic, MSE critic on the target-net
  bootstrap, dual Adam, soft target updates every step) vs the repo's
  DDPGLearner, from identical transplanted weights and batches.  Fully
  deterministic — no RNG bridging needed."""
  from torchrl.algo import DDPG as RefDDPG

  pf_mod = DetTanhPolicy(action_dim=ADIM, hidden_shapes=(32, 32))
  qf_mod = QNet(hidden_shapes=(32, 32))
  pf_params = pf_mod.init(jax.random.PRNGKey(30), jnp.zeros((1, OFF_OBS)))
  qf_params = qf_mod.init(jax.random.PRNGKey(31), jnp.zeros((1, OFF_OBS)),
                          jnp.zeros((1, ADIM)))

  def build_pf(p):
    return _load_ref_net(
        ref_policies.DetContPolicy(
            tanh_action=True, output_shape=ADIM,
            base_type=ref_networks.MLPBase, input_shape=OFF_OBS,
            hidden_shapes=[32, 32]), p["params"])

  pf_t, qf_t = build_pf(pf_params), _ref_qnet(qf_params, ADIM)
  agent = RefDDPG(
      pf=pf_t, qf=qf_t, plr=_OFF_CFG.plr, qlr=_OFF_CFG.qlr,
      tau=_OFF_CFG.tau, use_soft_update=True, env=_FakeEnv(),
      replay_buffer=None, collector=_FakeCollector(OFF_B),
      logger=_NullLogger(), discount=_OFF_CFG.discount,
      batch_size=OFF_B, num_epochs=10, device="cpu",
      save_dir="/tmp/ref_golden")

  learner = DDPGLearner(_OFF_CFG, pf_mod.apply, qf_mod.apply)
  state = learner.init_state(pf_params, qf_params)
  update = jax.jit(learner.update)
  for i in range(3):
    batch = _off_batch(40 + i)
    state, _ = update(state, batch, jax.random.PRNGKey(i))
    agent.update(_np_batch(batch))

  _assert_nets_close(pf_t, state.params["pf"], build_pf, "pf")
  _assert_nets_close(qf_t, state.params["qf"],
                     lambda p: _ref_qnet(p, ADIM), "qf")
  _assert_nets_close(agent.target_pf, state.target_params["pf"],
                     build_pf, "target_pf")
  _assert_nets_close(agent.target_qf, state.target_params["qf"],
                     lambda p: _ref_qnet(p, ADIM), "target_qf")


def test_dqn_update_matches_real_reference():
  """Three updates of the REAL torchrl DQN (dqn.py:38-66: gathered-Q MSE
  against the max-target bootstrap, Adam, soft target updates) vs the
  repo's DQNLearner.  Deterministic."""
  from torchrl.algo import DQN as RefDQN

  n_act = 4
  qf_mod = DiscreteQNet(num_actions=n_act, hidden_shapes=(32, 32))
  qf_params = qf_mod.init(jax.random.PRNGKey(33), jnp.zeros((1, OFF_OBS)))

  def build_qf(p):
    return _load_ref_net(
        ref_networks.Net(output_shape=n_act, base_type=ref_networks.MLPBase,
                         input_shape=OFF_OBS, hidden_shapes=[32, 32]),
        p["params"])

  qf_t = build_qf(qf_params)

  class _EpsPf:
    epsilon = 0.05

  class _DiscEnv:
    action_space = gymnasium.spaces.Discrete(n_act)

  agent = RefDQN(
      qf=qf_t, pf=_EpsPf(), qlr=_OFF_CFG.qlr, tau=_OFF_CFG.tau,
      use_soft_update=True, env=_DiscEnv(), replay_buffer=None,
      collector=_FakeCollector(OFF_B), logger=_NullLogger(),
      discount=_OFF_CFG.discount, batch_size=OFF_B, num_epochs=10,
      device="cpu", save_dir="/tmp/ref_golden")

  learner = DQNLearner(_OFF_CFG, qf_mod.apply, mode="dqn")
  state = learner.init_state(qf_params)
  update = jax.jit(learner.update)
  for i in range(3):
    batch = _off_batch(50 + i, act_dim=n_act, discrete=True)
    state, _ = update(state, batch, jax.random.PRNGKey(i))
    agent.update(_np_batch(batch, discrete=True))

  _assert_nets_close(qf_t, state.params["qf"], build_qf, "qf")
  _assert_nets_close(agent.target_qf, state.target_params["qf"],
                     build_qf, "target_qf")


def test_td3_update_matches_real_reference():
  """Four updates of the REAL torchrl TD3 (td3.py:57-154) vs the repo's
  TD3Learner.  The target-smoothing noise is bridged by monkeypatching the
  module-level Normal with the exact draws the repo makes
  (clip(norm_std * N(0,1), +-noise_clip) from the update key), so the test
  pins: twin-critic MSE, smoothed targets, the delay arithmetic
  (training_update_num increments BEFORE the `% delay` truthiness check,
  td3.py:58+124 — the first update steps the policy, the second skips),
  and that target networks only move inside the delayed policy branch
  (td3.py:143)."""
  import torchrl.algo.off_policy.td3 as ref_td3_mod
  from torchrl.algo import TD3 as RefTD3

  pf_mod = DetTanhPolicy(action_dim=ADIM, hidden_shapes=(32, 32))
  qf_mod = QNet(hidden_shapes=(32, 32))
  pf_params = pf_mod.init(jax.random.PRNGKey(34), jnp.zeros((1, OFF_OBS)))
  qf1_params = qf_mod.init(jax.random.PRNGKey(35), jnp.zeros((1, OFF_OBS)),
                           jnp.zeros((1, ADIM)))
  qf2_params = qf_mod.init(jax.random.PRNGKey(36), jnp.zeros((1, OFF_OBS)),
                           jnp.zeros((1, ADIM)))

  def build_pf(p):
    return _load_ref_net(
        ref_policies.DetContPolicy(
            tanh_action=True, output_shape=ADIM,
            base_type=ref_networks.MLPBase, input_shape=OFF_OBS,
            hidden_shapes=[32, 32]), p["params"])

  pf_t = build_pf(pf_params)
  qf1_t, qf2_t = _ref_qnet(qf1_params, ADIM), _ref_qnet(qf2_params, ADIM)

  agent = RefTD3(
      pf=pf_t, qf1=qf1_t, qf2=qf2_t, plr=_OFF_CFG.plr, qlr=_OFF_CFG.qlr,
      policy_update_delay=_OFF_CFG.policy_update_delay,
      norm_std_policy=_OFF_CFG.norm_std_policy,
      noise_clip=_OFF_CFG.noise_clip, tau=_OFF_CFG.tau,
      use_soft_update=True, env=_FakeEnv(), replay_buffer=None,
      collector=_FakeCollector(OFF_B), logger=_NullLogger(),
      discount=_OFF_CFG.discount, batch_size=OFF_B, num_epochs=10,
      device="cpu", save_dir="/tmp/ref_golden")

  learner = TD3Learner(_OFF_CFG, pf_mod.apply, qf_mod.apply)
  state = learner.init_state(pf_params, qf1_params, qf2_params)
  update = jax.jit(learner.update)

  class _FixedNoise:
    queue = []

    def __init__(self, loc, scale):
      pass

    def sample(self):
      return _FixedNoise.queue.pop(0)

  orig = ref_td3_mod.Normal
  ref_td3_mod.Normal = _FixedNoise
  try:
    for i in range(4):
      key = jax.random.PRNGKey(100 + i)
      batch = _off_batch(60 + i)
      # the repo draws raw N(0,1) * norm_std then clips; the reference's
      # Normal(0, norm_std).sample() IS that pre-clip noise
      eps = _OFF_CFG.norm_std_policy * jax.random.normal(
          key, (OFF_B, ADIM))
      _FixedNoise.queue.append(_t(eps))
      state, _ = update(state, batch, key)
      agent.update(_np_batch(batch))
  finally:
    ref_td3_mod.Normal = orig

  _assert_nets_close(pf_t, state.params["pf"], build_pf, "pf")
  for name, net in (("qf1", qf1_t), ("qf2", qf2_t)):
    _assert_nets_close(net, state.params[name],
                       lambda p: _ref_qnet(p, ADIM), name)
  _assert_nets_close(agent.target_pf, state.target_params["pf"],
                     build_pf, "target_pf")
  for name, net in (("qf1", agent.target_qf1), ("qf2", agent.target_qf2)):
    _assert_nets_close(net, state.target_params[name],
                       lambda p: _ref_qnet(p, ADIM), "target_" + name)


def test_twin_sac_q_update_matches_real_reference():
  """Three updates of the REAL torchrl TwinSACQ (twin_sac_q.py:84-215:
  tanh-Gaussian reparameterized actor, auto alpha tuned BEFORE the targets
  use it, twin-min bootstrap minus alpha*logp, mean/logstd L2 regs, soft
  target updates) vs the repo's TwinSACQLearner.  The two rsample draws per
  update (policy on obs, no-grad target on next_obs) are bridged by
  monkeypatching the distribution module's Normal so each standard-normal
  draw comes from the exact keys the repo splits."""
  import torchrl.policies.distribution as ref_dist_mod
  from torchrl.algo import TwinSACQ as RefTwinSACQ

  pf_mod = TanhGaussianPolicy(action_dim=ADIM, hidden_shapes=(32, 32))
  qf_mod = QNet(hidden_shapes=(32, 32))
  pf_params = pf_mod.init(jax.random.PRNGKey(37), jnp.zeros((1, OFF_OBS)))
  qf1_params = qf_mod.init(jax.random.PRNGKey(38), jnp.zeros((1, OFF_OBS)),
                           jnp.zeros((1, ADIM)))
  qf2_params = qf_mod.init(jax.random.PRNGKey(39), jnp.zeros((1, OFF_OBS)),
                           jnp.zeros((1, ADIM)))

  def build_pf(p):
    return _load_ref_net(
        ref_policies.GaussianContPolicy(
            tanh_action=True, output_shape=2 * ADIM,
            base_type=ref_networks.MLPBase, input_shape=OFF_OBS,
            hidden_shapes=[32, 32]), p["params"])

  pf_t = build_pf(pf_params)
  qf1_t, qf2_t = _ref_qnet(qf1_params, ADIM), _ref_qnet(qf2_params, ADIM)

  agent = RefTwinSACQ(
      pf=pf_t, qf1=qf1_t, qf2=qf2_t, plr=_OFF_CFG.plr, qlr=_OFF_CFG.qlr,
      automatic_entropy_tuning=True, tau=_OFF_CFG.tau,
      policy_std_reg_weight=_OFF_CFG.policy_std_reg_weight,
      policy_mean_reg_weight=_OFF_CFG.policy_mean_reg_weight,
      use_soft_update=True, env=_FakeEnv(), replay_buffer=None,
      collector=_FakeCollector(OFF_B), logger=_NullLogger(),
      discount=_OFF_CFG.discount, batch_size=OFF_B, num_epochs=10,
      device="cpu", save_dir="/tmp/ref_golden")

  learner = TwinSACQLearner(_OFF_CFG, pf_mod.apply, qf_mod.apply, ADIM)
  state = learner.init_state(pf_params, qf1_params, qf2_params)
  update = jax.jit(learner.update)

  class _RoutedNormal:
    """Standard-normal draws inside TanhNormal.rsample come from the
    queue; every other Normal (the log-prob one) stays real."""
    queue = []

    def __new__(cls, loc, scale):
      if (torch.is_tensor(loc) and torch.all(loc == 0)
          and torch.all(scale == 1)):
        inst = object.__new__(cls)
        return inst
      return torch.distributions.Normal(loc, scale)

    def sample(self):
      return _RoutedNormal.queue.pop(0)

  orig = ref_dist_mod.Normal
  ref_dist_mod.Normal = _RoutedNormal
  try:
    for i in range(3):
      key = jax.random.PRNGKey(200 + i)
      k1, k2 = jax.random.split(key)
      batch = _off_batch(70 + i)
      # explore(obs) draws first, the no-grad explore(next_obs) second
      _RoutedNormal.queue.extend([
          _t(jax.random.normal(k1, (OFF_B, ADIM))),
          _t(jax.random.normal(k2, (OFF_B, ADIM)))])
      state, _ = update(state, batch, key)
      agent.update(_np_batch(batch))
      assert not _RoutedNormal.queue, "reference drew fewer samples"
  finally:
    ref_dist_mod.Normal = orig

  np.testing.assert_allclose(
      float(state.extras["log_alpha"]), float(agent.log_alpha.item()),
      atol=1e-5, err_msg="log_alpha diverged")
  _assert_nets_close(pf_t, state.params["pf"], build_pf, "pf", atol=1e-4)
  for name, net in (("qf1", qf1_t), ("qf2", qf2_t)):
    _assert_nets_close(net, state.params[name],
                       lambda p: _ref_qnet(p, ADIM), name, atol=1e-4)
  for name, net in (("qf1", agent.target_qf1), ("qf2", agent.target_qf2)):
    _assert_nets_close(net, state.target_params[name],
                       lambda p: _ref_qnet(p, ADIM), "target_" + name,
                       atol=1e-4)


def test_reinforce_update_matches_real_reference():
  """One epoch of the REAL torchrl Reinforce (reinforce.py:34-76: gae=False
  discounted-return path through the real buffer, per-minibatch advantage
  normalization, -logp*adv - 0.001*ent, Adam with torch's DEFAULT eps=1e-8
  — unlike A2C/PPO it never passes eps — and grad clip 0.5, NO lr
  schedule, vf pinned to ZeroNet so last_value == 0) vs the repo's
  ReinforceLearner."""
  from torchrl.algo import Reinforce as RefReinforce
  from vision4leg_tpu.algo.a2c import A2CConfig, ReinforceLearner

  obs_dim = 9
  cfg = A2CConfig(plr=1e-3, entropy_coeff=0.001, discount=0.99,
                  batch_size=4, epoch_frames=8, max_episode_frames=999,
                  num_epochs=100, shuffle=False, adam_eps=1e-8)

  module = StateActorCritic(action_dim=ADIM, hidden_shapes=(64, 64),
                            append_hidden_shapes=(32, 32))
  params = module.init(jax.random.PRNGKey(44), jnp.zeros((1, obs_dim)))
  pf, _vf = _build_ref_state_pair(params, obs_dim)

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  learner = ReinforceLearner(cfg, apply_pi, apply_v, params)
  ts = learner.init_state(params)
  T, E, traj, _, buf = _synthetic_epoch(
      obs_dim, module, params, apply_pi, apply_v, seed=45)
  # the reference's vf is ZeroNet (reinforce.py:22) -> bootstrap from 0
  zero_last = jnp.zeros((E,))

  new_ts, _ = jax.jit(learner.update_per_epoch)(ts, traj, zero_last,
                                                jax.random.PRNGKey(0))

  agent = RefReinforce(
      pf=pf, plr=cfg.plr, entropy_coeff=cfg.entropy_coeff,
      shuffle=False, env=_FakeEnv(), replay_buffer=buf,
      collector=_FakeCollector(T * E), logger=_NullLogger(),
      discount=cfg.discount, batch_size=cfg.batch_size,
      num_epochs=cfg.num_epochs, device="cpu", save_dir="/tmp/ref_golden")
  agent.current_epoch = 0
  agent.gae = False
  agent.update_per_epoch()

  pf_new, _ = _build_ref_state_pair(new_ts.params, obs_dim)
  sa, sb = pf.state_dict(), pf_new.state_dict()
  for k in sa:
    np.testing.assert_allclose(
        sb[k].numpy(), sa[k].numpy(), atol=2e-5,
        err_msg=f"pf:{k} diverged from the real reference Reinforce update")


def test_vmpo_update_matches_real_reference():
  """One epoch of the REAL torchrl VMPO (v_mpo.py:44-184: per-epoch target
  copy, critic-then-actor per minibatch, top-half advantage filter via
  descending sort, softmax(adv/eta) weights, learnable eta/alpha duals on
  a joint Adam(eps=1e-5) step with min-1e-8 clamps, KL(new||target)
  penalty, grad clip 0.5 on pf only, NO lr schedule) vs the repo's
  VMPOLearner over 2 opt epochs."""
  from torchrl.algo import VMPO as RefVMPO
  from vision4leg_tpu.algo.vmpo import VMPOConfig, VMPOLearner

  obs_dim = 9
  cfg = VMPOConfig(plr=1e-3, vlr=1e-3, discount=0.99, tau=0.95,
                   batch_size=8, epoch_frames=8, max_episode_frames=999,
                   num_epochs=100, shuffle=False, opt_epochs=2,
                   eta_eps=0.02, alpha_eps=0.1)

  module = StateActorCritic(action_dim=ADIM, hidden_shapes=(64, 64),
                            append_hidden_shapes=(32, 32))
  params = module.init(jax.random.PRNGKey(46), jnp.zeros((1, obs_dim)))
  pf, vf = _build_ref_state_pair(params, obs_dim)

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  learner = VMPOLearner(cfg, apply_pi, apply_v, params)
  ts = learner.init_state(params)
  T, E, traj, last_value, buf = _synthetic_epoch(
      obs_dim, module, params, apply_pi, apply_v, seed=47)

  new_ts, _ = jax.jit(learner.update_per_epoch)(ts, traj, last_value,
                                                jax.random.PRNGKey(0))

  agent = RefVMPO(
      pf=pf, vf=vf, plr=cfg.plr, vlr=cfg.vlr, opt_epochs=cfg.opt_epochs,
      eta_eps=cfg.eta_eps, alpha_eps=cfg.alpha_eps,
      entropy_coeff=0.001, tau=cfg.tau, gae=True, shuffle=False,
      env=_FakeEnv(), replay_buffer=buf, collector=_FakeCollector(T * E),
      logger=_NullLogger(), discount=cfg.discount,
      batch_size=cfg.batch_size, num_epochs=cfg.num_epochs, device="cpu",
      save_dir="/tmp/ref_golden")
  agent.current_epoch = 0
  agent.update_per_epoch()

  np.testing.assert_allclose(float(new_ts.extras["duals"]["eta"]),
                             float(agent.eta.item()), atol=1e-5,
                             err_msg="eta dual diverged")
  np.testing.assert_allclose(float(new_ts.extras["duals"]["alpha"]),
                             float(agent.alpha.item()), atol=1e-5,
                             err_msg="alpha dual diverged")
  pf_new, vf_new = _build_ref_state_pair(new_ts.params, obs_dim)
  for (a, b, what) in [(pf, pf_new, "pf"), (vf, vf_new, "vf")]:
    sa, sb = a.state_dict(), b.state_dict()
    for k in sa:
      np.testing.assert_allclose(
          sb[k].numpy(), sa[k].numpy(), atol=2e-4,
          err_msg=f"{what}:{k} diverged from the real reference VMPO update")


# ---------------------------------------------------------------------------
# round-4 tail: SAC / TwinSAC (V-network variants), QRDQN, BootstrappedDQN,
# PPOAux — the last exported learners without reference-pinned updates
# ---------------------------------------------------------------------------
from vision4leg_tpu.algo.off_policy.learners import SACLearner  # noqa: E402


def _import_noassert(relpath, name):
  """Exec a reference module with `assert` statements stripped
  (compile(..., optimize=1)).  Needed because sac.py:132 / twin_sac.py:143
  contain `assert v_target == v_pred` — an ELEMENTWISE tensor comparison
  under `assert`, which raises RuntimeError for every batch size > 1
  (pinned by test_sac_reference_update_is_uncallable below).  Everything
  executed is still the reference's own code."""
  import types
  path = os.path.join(REF, relpath)
  with open(path) as f:
    src = f.read()
  code = compile(src, path, "exec", optimize=1)
  mod = types.ModuleType(name)
  mod.__package__ = "torchrl.algo.off_policy"
  mod.__file__ = path
  exec(code, mod.__dict__)
  return mod


def _sac_modules(seed):
  """Repo pf/qf(/qf2)/vf modules + params for the V-network SAC family."""
  pf_mod = TanhGaussianPolicy(action_dim=ADIM, hidden_shapes=(32, 32))
  qf_mod = QNet(hidden_shapes=(32, 32))
  vf_mod = DiscreteQNet(num_actions=1, hidden_shapes=(32, 32))
  k = jax.random.PRNGKey(seed)
  pf_p = pf_mod.init(k, jnp.zeros((1, OFF_OBS)))
  qf_p = qf_mod.init(jax.random.fold_in(k, 1), jnp.zeros((1, OFF_OBS)),
                     jnp.zeros((1, ADIM)))
  qf2_p = qf_mod.init(jax.random.fold_in(k, 2), jnp.zeros((1, OFF_OBS)),
                      jnp.zeros((1, ADIM)))
  vf_p = vf_mod.init(jax.random.fold_in(k, 3), jnp.zeros((1, OFF_OBS)))
  return pf_mod, qf_mod, vf_mod, pf_p, qf_p, qf2_p, vf_p


def _build_sac_pf(p):
  return _load_ref_net(
      ref_policies.GaussianContPolicy(
          tanh_action=True, output_shape=2 * ADIM,
          base_type=ref_networks.MLPBase, input_shape=OFF_OBS,
          hidden_shapes=[32, 32]), p["params"])


def _ref_vnet(params):
  return _load_ref_net(
      ref_networks.Net(output_shape=1, base_type=ref_networks.MLPBase,
                       input_shape=OFF_OBS, hidden_shapes=[32, 32]),
      params["params"])


def test_sac_reference_update_is_uncallable():
  """DISCOVERED while extending golden coverage: the reference's original
  SAC (and TwinSAC) can never run an update — sac.py:132 / twin_sac.py:143
  read `assert v_target == v_pred`, an elementwise comparison of two
  (B, 1) tensors whose truth value torch refuses to define for B > 1
  (and which would be trivially false at B == 1).  Like the A2C
  shared-trunk crash and the BootstrappedNet ctor, this is shipped dead
  code; the parity tests below drive the same module with the broken
  asserts compiled out."""
  from torchrl.algo import SAC as RefSAC

  _, _, _, pf_p, qf_p, _, vf_p = _sac_modules(101)
  agent = RefSAC(
      pf=_build_sac_pf(pf_p), qf=_ref_qnet(qf_p, ADIM),
      vf=_ref_vnet(vf_p), plr=1e-3, vlr=1e-3, qlr=1e-3,
      automatic_entropy_tuning=True, tau=0.01, use_soft_update=True,
      env=_FakeEnv(), replay_buffer=None, collector=_FakeCollector(OFF_B),
      logger=_NullLogger(), discount=0.99, batch_size=OFF_B,
      num_epochs=10, device="cpu", save_dir="/tmp/ref_golden")
  with pytest.raises(RuntimeError, match="Boolean value of Tensor"):
    agent.update(_np_batch(_off_batch(300)))


@pytest.mark.parametrize("twin", [False, True], ids=["sac", "twin_sac"])
def test_sac_update_matches_real_reference(twin):
  """Three updates of the REAL torchrl SAC / TwinSAC (sac.py:77-180,
  twin_sac.py:83-205: V target network, alpha tuned BEFORE the targets
  use it, Q bootstrap from target-V, V regressed on (min-)Q(s, a_new) -
  alpha*logp, reparameterized policy loss + mean/logstd L2 regs, soft
  target update on vf only) vs the repo's SACLearner, asserts compiled
  out (see test_sac_reference_update_is_uncallable).  The single rsample
  per update is bridged by routing the reference's standard-normal draw
  to the repo's exact key."""
  import torchrl.policies.distribution as ref_dist_mod

  mod_name = "twin_sac" if twin else "sac"
  ref_mod = _import_noassert(f"torchrl/algo/off_policy/{mod_name}.py",
                             f"_noassert_{mod_name}")
  RefCls = ref_mod.TwinSAC if twin else ref_mod.SAC

  pf_mod, qf_mod, vf_mod, pf_p, qf_p, qf2_p, vf_p = _sac_modules(
      111 if twin else 110)
  pf_t = _build_sac_pf(pf_p)
  vf_t = _ref_vnet(vf_p)
  common = dict(
      pf=pf_t, vf=vf_t, plr=_OFF_CFG.plr, vlr=_OFF_CFG.qlr,
      qlr=_OFF_CFG.qlr, automatic_entropy_tuning=True, tau=_OFF_CFG.tau,
      policy_std_reg_weight=_OFF_CFG.policy_std_reg_weight,
      policy_mean_reg_weight=_OFF_CFG.policy_mean_reg_weight,
      use_soft_update=True, env=_FakeEnv(), replay_buffer=None,
      collector=_FakeCollector(OFF_B), logger=_NullLogger(),
      discount=_OFF_CFG.discount, batch_size=OFF_B, num_epochs=10,
      device="cpu", save_dir="/tmp/ref_golden")
  if twin:
    qf1_t, qf2_t = _ref_qnet(qf_p, ADIM), _ref_qnet(qf2_p, ADIM)
    agent = RefCls(qf1=qf1_t, qf2=qf2_t, **common)
  else:
    qf1_t = _ref_qnet(qf_p, ADIM)
    agent = RefCls(qf=qf1_t, **common)

  learner = SACLearner(_OFF_CFG, pf_mod.apply, qf_mod.apply,
                       lambda p, o: vf_mod.apply(p, o), ADIM, twin=twin)
  state = learner.init_state(pf_p, qf_p, vf_p,
                             qf2_params=qf2_p if twin else None)
  update = jax.jit(learner.update)

  class _RoutedNormal:
    queue = []

    def __new__(cls, loc, scale):
      if (torch.is_tensor(loc) and torch.all(loc == 0)
          and torch.all(scale == 1)):
        return object.__new__(cls)
      return torch.distributions.Normal(loc, scale)

    def sample(self):
      return _RoutedNormal.queue.pop(0)

  orig = ref_dist_mod.Normal
  ref_dist_mod.Normal = _RoutedNormal
  try:
    for i in range(3):
      key = jax.random.PRNGKey(400 + i)
      batch = _off_batch(80 + i)
      # one rsample per reference update: pf.explore(obs)
      _RoutedNormal.queue.append(_t(jax.random.normal(key, (OFF_B, ADIM))))
      state, _ = update(state, batch, key)
      agent.update(_np_batch(batch))
      assert not _RoutedNormal.queue, "reference drew fewer samples"
  finally:
    ref_dist_mod.Normal = orig

  np.testing.assert_allclose(
      float(state.extras["log_alpha"]), float(agent.log_alpha.item()),
      atol=1e-5, err_msg="log_alpha diverged")
  _assert_nets_close(pf_t, state.params["pf"], _build_sac_pf, "pf",
                     atol=1e-4)
  _assert_nets_close(qf1_t, state.params["qf"],
                     lambda p: _ref_qnet(p, ADIM), "qf", atol=1e-4)
  if twin:
    _assert_nets_close(qf2_t, state.params["qf2"],
                       lambda p: _ref_qnet(p, ADIM), "qf2", atol=1e-4)
  _assert_nets_close(vf_t, state.params["vf"], _ref_vnet, "vf", atol=1e-4)
  _assert_nets_close(agent.target_vf, state.target_params["vf"],
                     _ref_vnet, "target_vf", atol=1e-4)


def test_qrdqn_update_matches_real_reference():
  """Three updates of the REAL torchrl QRDQN (qrdqn.py:23-75: quantile
  net viewed (B, A, Q), greedy action from the quantile MEAN of the
  target net, per-quantile Huber weighted by |tau - 1{diff<0}| with a
  FULL mean reduction, utils.py:5-9) vs the repo's DQNLearner in qrdqn
  mode.  Deterministic."""
  from torchrl.algo import QRDQN as RefQRDQN

  n_act, nq = 4, 8
  qf_mod = DiscreteQNet(num_actions=n_act, hidden_shapes=(32, 32),
                        num_quantiles=nq)
  qf_p = qf_mod.init(jax.random.PRNGKey(55), jnp.zeros((1, OFF_OBS)))

  def build_qf(p):
    return _load_ref_net(
        ref_networks.Net(output_shape=n_act * nq,
                         base_type=ref_networks.MLPBase,
                         input_shape=OFF_OBS, hidden_shapes=[32, 32]),
        p["params"])

  qf_t = build_qf(qf_p)

  class _EpsPf:
    epsilon = 0.05

  class _DiscEnv:
    action_space = gymnasium.spaces.Discrete(n_act)

  agent = RefQRDQN(
      qf=qf_t, pf=_EpsPf(), quantile_num=nq, qlr=_OFF_CFG.qlr,
      tau=_OFF_CFG.tau, use_soft_update=True, env=_DiscEnv(),
      replay_buffer=None, collector=_FakeCollector(OFF_B),
      logger=_NullLogger(), discount=_OFF_CFG.discount, batch_size=OFF_B,
      num_epochs=10, device="cpu", save_dir="/tmp/ref_golden")

  cfg = OffPolicyConfig(plr=1e-3, qlr=1e-3, discount=0.99,
                        batch_size=OFF_B, tau=0.01, num_quantiles=nq)
  learner = DQNLearner(cfg, qf_mod.apply, mode="qrdqn")
  state = learner.init_state(qf_p)
  update = jax.jit(learner.update)
  for i in range(3):
    batch = _off_batch(60 + i, act_dim=n_act, discrete=True)
    state, _ = update(state, batch, jax.random.PRNGKey(i))
    # unlike plain DQN (gather(-1, (B,1))), qrdqn.py:44 unsqueezes twice —
    # it expects flat (B,) actions
    agent.update(_np_batch(batch))

  _assert_nets_close(qf_t, state.params["qf"], build_qf, "qf")
  _assert_nets_close(agent.target_qf, state.target_params["qf"],
                     build_qf, "target_qf")


def test_bootstrapped_dqn_update_matches_real_reference():
  """Three updates of the REAL torchrl BootstrappedDQN update rule
  (bootstrapped_dqn.py:56-101: per-head gathered-Q MSE, multiplied by the
  Bernoulli bootstrap masks, summed over heads / head_num, batch-meaned)
  vs the repo's DQNLearner in bootstrapped mode.  The reference's own
  BootstrappedNet is unconstructable (pinned by
  test_bootstrapped_net_reference_is_unconstructable), so the q-network
  is a torch twin of the repo's BootstrappedQNet with transplanted
  weights — the REAL reference code under test is the update."""
  from torchrl.algo import BootstrappedDQN as RefBDQN

  n_act, K = 4, 3
  qf_mod = BootstrappedQNet(num_actions=n_act, num_heads=K,
                            hidden_shapes=(32, 32))
  qf_p = qf_mod.init(jax.random.PRNGKey(66), jnp.zeros((1, OFF_OBS)))

  class _TwinBootNet(torch.nn.Module):
    def __init__(self):
      super().__init__()
      self.l0 = torch.nn.Linear(OFF_OBS, 32)
      self.l1 = torch.nn.Linear(32, 32)
      self.heads = torch.nn.ModuleList(
          [torch.nn.Linear(32, n_act) for _ in range(K)])

    def forward(self, x, head_idxs):
      f = torch.relu(self.l1(torch.relu(self.l0(x))))
      return [self.heads[i](f) for i in head_idxs]

  def build_qf(p):
    net = _TwinBootNet()
    pp = p["params"]
    _lin(net.l0, pp["MLPBase_0"]["Dense_0"])
    _lin(net.l1, pp["MLPBase_0"]["Dense_1"])
    for i in range(K):
      _lin(net.heads[i], pp[f"Dense_{i}"])
    return net

  qf_t = build_qf(qf_p)

  class _EpsPf:
    epsilon = 0.05

    def sample_head(self):
      pass

  class _DiscEnv:
    action_space = gymnasium.spaces.Discrete(n_act)

  agent = RefBDQN(
      qf=qf_t, pf=_EpsPf(), head_num=K, qlr=_OFF_CFG.qlr,
      tau=_OFF_CFG.tau, use_soft_update=True, env=_DiscEnv(),
      replay_buffer=None, collector=_FakeCollector(OFF_B),
      logger=_NullLogger(), discount=_OFF_CFG.discount, batch_size=OFF_B,
      num_epochs=10, device="cpu", save_dir="/tmp/ref_golden")

  cfg = OffPolicyConfig(plr=1e-3, qlr=1e-3, discount=0.99,
                        batch_size=OFF_B, tau=0.01, num_heads=K)
  learner = DQNLearner(cfg, qf_mod.apply, mode="bootstrapped")
  state = learner.init_state(qf_p)
  update = jax.jit(learner.update)
  for i in range(3):
    batch = _off_batch(90 + i, act_dim=n_act, discrete=True)
    masks = (jax.random.uniform(jax.random.PRNGKey(700 + i),
                                (OFF_B, K)) < 0.5).astype(jnp.float32)
    batch = dict(batch, masks=masks)
    state, _ = update(state, batch, jax.random.PRNGKey(i))
    # bootstrapped_dqn.py:79 gathers with actions.unsqueeze(1) — flat (B,)
    agent.update(_np_batch(batch))

  _assert_nets_close(qf_t, state.params["qf"], build_qf, "qf")
  _assert_nets_close(agent.target_qf, state.target_params["qf"],
                     build_qf, "target_qf")


# ---------------------------------------------------------------------------
# PPOAux: the aux-loss PPO variant (ppo_aux.py) over ImpalaFuseResidual
# ---------------------------------------------------------------------------
def test_ppo_aux_reference_aux_net_is_uncallable():
  """The reference's own aux forward is dead code: ImpalaFuseResidualActor.
  forward_and_compute_aux_loss (nets.py:488-511) calls
  `self.encoder.forward_with_sub_vec`, a method NO reference encoder
  defines — so the shipped PPOAux can never produce an aux loss from the
  shipped networks.  The repo's aux definition (visual features regress
  the displacement-sensor history) follows the evident intent; the update
  RULE is goldened below with that aux grafted onto the real nets."""
  proprio = 33
  encoder = ref_networks.ImpalaFuseEncoder(
      in_channels=CH, state_input_dim=proprio, visual_dim=64,
      hidden_shapes=[32, 32])
  pf = ref_policies.GaussianContPolicyImpalaFuseResidualWithAux(
      encoder=encoder, state_input_shape=proprio,
      visual_input_shape=(CH, 64, 64), output_shape=ADIM,
      append_hidden_shapes=[32, 32])
  obs = torch.zeros(2, proprio + CH * 64 * 64)
  with pytest.raises(AttributeError, match="forward_with_sub_vec"):
    pf.forward_and_compute_aux_loss(obs)


@pytest.mark.parametrize("clipped_vf", [False, True],
                         ids=["mse_vf", "clipped_vf"])
def test_ppo_aux_update_matches_real_reference(clipped_vf):
  """One epoch of the REAL torchrl PPOAux (ppo_aux.py:30-160: target_pf
  snapshot at epoch start and ratio recomputed against it, critic first
  with optional clipped value loss, actor loss + aux_coeff * aux_loss,
  grad clip 0.5, Bessel advantage normalization) vs the repo's
  PPOAuxLearner over ImpalaFuseResidualActorCritic.  The policy forward
  under the reference update is the real GaussianContPolicyImpalaFuse-
  ResidualWithAux.forward; only forward_and_compute_aux_loss is grafted
  (the reference's own is uncallable — pinned above) to compute the
  repo's aux definition from the same real encoder tensors."""
  from torchrl.algo import PPOAux as RefPPOAux
  from vision4leg_tpu.algo.ppo_aux import PPOAuxConfig, PPOAuxLearner
  from vision4leg_tpu.models.actor_critic import ImpalaFuseResidualActorCritic

  proprio = 33
  obs_dim = proprio + CH * 64 * 64
  T, E = 4, 2
  # one minibatch = one Adam step per net: single-step parity is TIGHT
  # (grads match to ~1e-5 — probed during development), while multi-step
  # runs drift chaotically through discrete min/clamp branch selections
  # amplified by Adam's m/sqrt(v) sign normalization on this conv-heavy
  # net.  Multi-step optimizer dynamics are already goldened by
  # test_ppo_update_matches_real_reference (4 steps); what THIS test pins
  # is PPOAux's own mechanics: target_pf ratio, aux_coeff folding,
  # critic-then-actor on the shared encoder, optional clipped value loss.
  cfg = PPOAuxConfig(plr=1e-3, vlr=1e-3, clip_para=0.2, entropy_coeff=0.005,
                     discount=0.99, tau=0.95, batch_size=T * E,
                     epoch_frames=T * E, max_episode_frames=999,
                     opt_epochs=1, num_epochs=100, shuffle=False,
                     clipped_value_loss=clipped_vf, aux_coeff=0.7)

  module = ImpalaFuseResidualActorCritic(
      action_dim=ADIM, state_input_shape=proprio,
      visual_input_shape=(CH, 64, 64), encoder_hidden_shapes=(32, 32),
      visual_dim=64, append_hidden_shapes=(32, 32))
  params = module.init(jax.random.PRNGKey(20), jnp.zeros((1, obs_dim)))
  aux_dim = module.displacement_dim * module.history

  class _AuxRefPolicy(
      ref_policies.GaussianContPolicyImpalaFuseResidualWithAux):
    def __init__(self, aux_out_dim, **kw):
      super().__init__(**kw)
      self.aux_fc = torch.nn.Linear(64, aux_out_dim)

    def forward_and_compute_aux_loss(self, x):
      mean, std, logstd = self.forward(x)   # the REAL reference forward
      state_input = x[..., :self.state_input_shape]
      visual_input = x[..., self.state_input_shape:].view(
          torch.Size(state_input.shape[:-1]) + self.visual_input_shape)
      visual_out, _ = self.encoder(visual_input, state_input)
      aux_loss = torch.nn.functional.mse_loss(
          self.aux_fc(visual_out), state_input[..., :aux_dim])
      return mean, std, logstd, aux_loss

  class _RefFuseVf(torch.nn.Module):
    """The repo's v(x) = MLPHead(cat[visual_out, state_out]) over the
    SHARED encoder, as a torch twin (no reference fuse value net exists —
    no starter instantiates this family)."""

    def __init__(self, encoder):
      super().__init__()
      self.encoder = encoder
      self.seq = torch.nn.Sequential(
          torch.nn.Linear(64 + 32, 32), torch.nn.ReLU(),
          torch.nn.Linear(32, 32), torch.nn.ReLU(),
          torch.nn.Linear(32, 1))

    def forward(self, x):
      state_input = x[..., :proprio]
      visual_input = x[..., proprio:].view(
          torch.Size(state_input.shape[:-1]) + (CH, 64, 64))
      visual_out, state_out = self.encoder(visual_input, state_input)
      return self.seq(torch.cat([visual_out, state_out], dim=-1))

  p = params["params"]
  encoder = ref_networks.ImpalaFuseEncoder(
      in_channels=CH, state_input_dim=proprio, visual_dim=64,
      hidden_shapes=[32, 32])
  pf = _AuxRefPolicy(
      aux_out_dim=aux_dim, encoder=encoder, state_input_shape=proprio,
      visual_input_shape=(CH, 64, 64), output_shape=ADIM,
      append_hidden_shapes=[32, 32])
  vf = _RefFuseVf(encoder)

  def transplant(pf, vf, params):
    p = params["params"]
    _load_impala(encoder.visual_base, p["visual_base"])
    _lin(encoder.visual_projector.projection[0],
         p["visual_proj"]["Dense_0"])
    _lin(encoder.base.seq_fcs[0], p["state_mlp"]["Dense_0"])
    _lin(encoder.base.seq_fcs[2], p["state_mlp"]["Dense_1"])
    for i in range(3):
      _lin(pf.visual_seq_append_fcs[2 * i], p["pf_fused"][f"Dense_{i}"])
      _lin(pf.seq_append_fcs[2 * i], p["pf_state"][f"Dense_{i}"])
      _lin(vf.seq[2 * i], p["vf_fused"][f"Dense_{i}"])
    _lin(pf.aux_fc, p["aux_head"]["Dense_0"])
    with torch.no_grad():
      pf.logstd.copy_(_t(p["head"]["logstd"]))
    return pf, vf

  pf, vf = transplant(pf, vf, params)

  def apply_pi(p, x):
    return module.apply(p, x, method=module.pi)

  def apply_pi_aux(p, x):
    return module.apply(p, x, method=module.pi_with_aux)

  def apply_v(p, x):
    return module.apply(p, x, method=module.v)

  learner = PPOAuxLearner(cfg, apply_pi, apply_v, params,
                          apply_pi_aux=apply_pi_aux)
  ts = learner.init_state(params)

  ks = jax.random.split(jax.random.PRNGKey(21), 6)
  obs = _rand_obs(ks[0], (T, E, obs_dim))
  next_obs = _rand_obs(ks[1], (T, E, obs_dim))
  acts = jax.random.normal(ks[2], (T, E, ADIM))
  rewards = jax.random.normal(ks[3], (T, E, 1))
  terminals = (jax.random.uniform(ks[4], (T, E, 1)) < 0.2)
  time_limits = jnp.zeros((T, E, 1), bool)

  flat_obs = obs.reshape(-1, obs_dim)
  mean0, std0, _ = apply_pi(params, flat_obs)
  logp0 = jnp.sum(
      -0.5 * ((acts.reshape(-1, ADIM) - mean0) / std0) ** 2
      - jnp.log(std0) - 0.5 * jnp.log(2 * jnp.pi), -1, keepdims=True)
  values0 = apply_v(params, flat_obs)

  traj = Transition(
      obs=obs, acts=acts, log_probs=logp0.reshape(T, E, 1),
      values=values0.reshape(T, E, 1), rewards=rewards,
      terminals=terminals, time_limits=time_limits,
      means=mean0.reshape(T, E, ADIM), stds=std0.reshape(T, E, ADIM))
  last_value = (apply_v(params, next_obs[-1])[:, 0]
                * (1.0 - terminals[-1, :, 0].astype(jnp.float32)))

  new_ts, _ = jax.jit(learner.update_per_epoch)(ts, traj, last_value,
                                                jax.random.PRNGKey(0))

  buf = OnPolicyReplayBuffer(env_nums=E, max_replay_buffer_size=T * E,
                             time_limit_filter=True)
  for t in range(T):
    buf.add_sample({
        "obs": np.asarray(obs[t]), "next_obs": np.asarray(next_obs[t]),
        "acts": np.asarray(acts[t]),
        "values": np.asarray(values0.reshape(T, E, 1)[t]),
        "rewards": np.asarray(rewards[t]),
        "terminals": np.asarray(terminals[t]),
        "time_limits": np.asarray(time_limits[t])})

  agent = RefPPOAux(
      pf=pf, vf=vf, clip_para=cfg.clip_para, opt_epochs=cfg.opt_epochs,
      clipped_value_loss=clipped_vf, aux_coeff=cfg.aux_coeff,
      plr=cfg.plr, vlr=cfg.vlr, entropy_coeff=cfg.entropy_coeff,
      tau=cfg.tau, gae=True, shuffle=False, env=_FakeEnv(),
      replay_buffer=buf, collector=_FakeCollector(T * E),
      logger=_NullLogger(), discount=cfg.discount,
      batch_size=cfg.batch_size, num_epochs=cfg.num_epochs, device="cpu",
      save_dir="/tmp/ref_golden")
  agent.current_epoch = 0
  agent.update_per_epoch()

  pf2 = _AuxRefPolicy(
      aux_out_dim=aux_dim, encoder=ref_networks.ImpalaFuseEncoder(
          in_channels=CH, state_input_dim=proprio, visual_dim=64,
          hidden_shapes=[32, 32]),
      state_input_shape=proprio, visual_input_shape=(CH, 64, 64),
      output_shape=ADIM, append_hidden_shapes=[32, 32])
  vf2 = _RefFuseVf(pf2.encoder)
  # rebuilding shares pf2's encoder, so transplant once with new params
  globals()["encoder"] = pf2.encoder  # _load calls reference pf2.encoder
  enc2 = pf2.encoder

  def transplant2(params):
    p = params["params"]
    _load_impala(enc2.visual_base, p["visual_base"])
    _lin(enc2.visual_projector.projection[0], p["visual_proj"]["Dense_0"])
    _lin(enc2.base.seq_fcs[0], p["state_mlp"]["Dense_0"])
    _lin(enc2.base.seq_fcs[2], p["state_mlp"]["Dense_1"])
    for i in range(3):
      _lin(pf2.visual_seq_append_fcs[2 * i], p["pf_fused"][f"Dense_{i}"])
      _lin(pf2.seq_append_fcs[2 * i], p["pf_state"][f"Dense_{i}"])
      _lin(vf2.seq[2 * i], p["vf_fused"][f"Dense_{i}"])
    _lin(pf2.aux_fc, p["aux_head"]["Dense_0"])
    with torch.no_grad():
      pf2.logstd.copy_(_t(p["head"]["logstd"]))

  transplant2(new_ts.params)

  def assert_close(a, b, what):
    sa, sb = a.state_dict(), b.state_dict()
    assert sa.keys() == sb.keys()
    for k in sa:
      np.testing.assert_allclose(
          sb[k].numpy(), sa[k].numpy(), atol=2.5e-4,
          err_msg=f"{what}:{k} diverged from the real reference PPOAux "
                  "update")

  assert_close(pf, pf2, "pf")
  assert_close(vf, vf2, "vf")
