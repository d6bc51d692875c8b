"""Export a trained LocoTransformer policy for deployment.

Reference: a1_hardware/convert_tensor_rt/convert_locotransformer_trt.py
(:44-96): torch -> ONNX fp16 -> trtexec engine.  Here the trained flax
params are transplanted into an equivalent torch module (exact-math mirror,
verified by tests/test_export.py), which can then be exported to ONNX for
TensorRT on the robot's onboard computer.

Usage:
  from vision4leg_tpu.hardware.export import flax_to_torch_policy, export_onnx
  net = flax_to_torch_policy(module, params)
  export_onnx(net, obs_dim, "policy.onnx")
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn as nn


def _t(x):
  return torch.from_numpy(np.asarray(x).copy())


class TorchLocoTransformerPolicy(nn.Module):
  """Mean-action path of LocoTransformerActorCritic.pi, mirroring the flax
  modules in vision4leg_tpu/models/{base,actor_critic}.py."""

  def __init__(self, state_dim, visual_shape, hidden_shapes, token_dim,
               transformer_params, append_hidden_shapes, action_dim):
    super().__init__()
    self.state_dim = state_dim
    self.visual_shape = tuple(visual_shape)
    self.token_dim = token_dim
    c = visual_shape[0]
    # proprio MLP + projection
    layers = []
    d = state_dim
    for h in hidden_shapes:
      layers += [nn.Linear(d, h), nn.ReLU()]
      d = h
    self.state_mlp = nn.Sequential(*layers)
    self.state_proj = nn.Linear(d, token_dim)
    # depth Nature CNN + 1x1 token conv
    self.conv = nn.Sequential(
        nn.Conv2d(c, 32, 8, 4), nn.ReLU(),
        nn.Conv2d(32, 64, 4, 2), nn.ReLU(),
        nn.Conv2d(64, 64, 3, 1), nn.ReLU())
    self.up_conv = nn.Conv2d(64, token_dim, 1)
    # transformer layers (post-norm, torch semantics — matches flax mirror)
    self.att = nn.ModuleList()
    for n_head, ff in transformer_params:
      self.att.append(nn.ModuleDict({
          "q": nn.Linear(token_dim, token_dim),
          "k": nn.Linear(token_dim, token_dim),
          "v": nn.Linear(token_dim, token_dim),
          "o": nn.Linear(token_dim, token_dim),
          "ln1": nn.LayerNorm(token_dim),
          "ff1": nn.Linear(token_dim, ff),
          "ff2": nn.Linear(ff, token_dim),
          "ln2": nn.LayerNorm(token_dim),
      }))
      self._n_heads = n_head
    # head MLP
    layers = []
    d = token_dim * 2
    for h in append_hidden_shapes:
      layers += [nn.Linear(d, h), nn.ReLU()]
      d = h
    layers.append(nn.Linear(d, action_dim))
    self.head = nn.Sequential(*layers)

  def forward(self, x):
    state = x[..., : self.state_dim]
    img = x[..., self.state_dim:].reshape(
        x.shape[0], *self.visual_shape)
    # MLPBase applies ReLU after every Dense; RLProjection = Dense + ReLU
    s_tok = torch.relu(self.state_proj(self.state_mlp(state)))[:, None]
    h = self.conv(img)
    h = self.up_conv(h)                            # (B, D, 4, 4)
    v_tok = h.flatten(2).transpose(1, 2)           # (B, 16, D)
    t = torch.cat([s_tok, v_tok], dim=1)           # (B, 17, D)
    nh = self._n_heads
    for blk in self.att:
      B, T, D = t.shape
      hd = D // nh
      q = blk["q"](t).view(B, T, nh, hd).transpose(1, 2)
      k = blk["k"](t).view(B, T, nh, hd).transpose(1, 2)
      v = blk["v"](t).view(B, T, nh, hd).transpose(1, 2)
      a = torch.softmax(q @ k.transpose(-1, -2) / hd**0.5, dim=-1)
      o = blk["o"]((a @ v).transpose(1, 2).reshape(B, T, D))
      t = blk["ln1"](t + o)
      f = blk["ff2"](torch.relu(blk["ff1"](t)))
      t = blk["ln2"](t + f)
    pooled = torch.cat([t[:, 0], t[:, 1:].mean(dim=1)], dim=-1)
    return self.head(pooled)


def flax_to_torch_policy(module, params) -> TorchLocoTransformerPolicy:
  """Transplant flax LocoTransformerActorCritic params (pi path) into the
  torch mirror."""
  p = params["params"]
  net = TorchLocoTransformerPolicy(
      state_dim=module.state_input_shape,
      visual_shape=module.visual_input_shape,
      hidden_shapes=tuple(module.encoder_hidden_shapes),
      token_dim=module.token_dim,
      transformer_params=tuple(module.transformer_params),
      append_hidden_shapes=tuple(module.append_hidden_shapes),
      action_dim=module.action_dim)

  def set_linear(torch_mod, flax_p):
    torch_mod.weight.data = _t(flax_p["kernel"]).T.contiguous()
    torch_mod.bias.data = _t(flax_p["bias"])

  def set_conv(torch_mod, flax_p):
    # flax (H, W, inC, outC) -> torch (outC, inC, H, W)
    torch_mod.weight.data = _t(flax_p["kernel"]).permute(3, 2, 0, 1)\
        .contiguous()
    torch_mod.bias.data = _t(flax_p["bias"])

  enc = p["encoder"]
  mlp = enc["MLPBase_0"]
  for i in range(len(module.encoder_hidden_shapes)):
    set_linear(net.state_mlp[2 * i], mlp[f"Dense_{i}"])
  set_linear(net.state_proj, enc["RLProjection_0"]["Dense_0"])
  nature = enc["NatureEncoder_0"]
  for i in range(3):
    set_conv(net.conv[2 * i], nature[f"Conv_{i}"])
  set_conv(net.up_conv, enc["Conv_0"])

  for li in range(len(module.transformer_params)):
    fl = p[f"pf_layers_{li}"]
    att = fl["MultiHeadDotProductAttention_0"]
    blk = net.att[li]
    D = module.token_dim
    for name, key in (("q", "query"), ("k", "key"), ("v", "value")):
      kernel = np.asarray(att[key]["kernel"]).reshape(D, D)   # (in, h*hd)
      bias = np.asarray(att[key]["bias"]).reshape(D)
      blk[name].weight.data = _t(kernel).T.contiguous()
      blk[name].bias.data = _t(bias)
    out_k = np.asarray(att["out"]["kernel"]).reshape(D, D)    # (h*hd, out)
    blk["o"].weight.data = _t(out_k).T.contiguous()
    blk["o"].bias.data = _t(np.asarray(att["out"]["bias"]))
    for tname, fname in (("ln1", "LayerNorm_0"), ("ln2", "LayerNorm_1")):
      blk[tname].weight.data = _t(fl[fname]["scale"])
      blk[tname].bias.data = _t(fl[fname]["bias"])
    set_linear(blk["ff1"], fl["Dense_0"])
    set_linear(blk["ff2"], fl["Dense_1"])

  head = p["pf_mlp"]
  n_hidden = len(module.append_hidden_shapes)
  for i in range(n_hidden):
    set_linear(net.head[2 * i], head[f"Dense_{i}"])
  set_linear(net.head[2 * n_hidden], head[f"Dense_{n_hidden}"])
  net.eval()
  return net


def export_onnx(net: TorchLocoTransformerPolicy, obs_dim: int, path: str):
  dummy = torch.zeros(1, obs_dim)
  torch.onnx.export(net, dummy, path, input_names=["obs"],
                    output_names=["action_mean"], opset_version=17)
  return path
