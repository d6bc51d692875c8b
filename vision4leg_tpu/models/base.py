"""Encoder modules (Flax): MLPBase, NatureEncoder, ImpalaEncoder,
LocoTransformerEncoder — ref: torchrl/networks/base.py.

Conventions: inputs are batched (B, ...); images arrive channel-first
(B, C, 64, 64) exactly like the reference's flattened `raw_img` tail, and
are transposed to NHWC internally for TPU-friendly convolutions.
"""
from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.models import init as winit


class MLPBase(nn.Module):
  """MLP stack with fanin-uniform init (base.py:8-44)."""
  hidden_shapes: Sequence[int]
  activation: Callable = nn.relu

  @nn.compact
  def __call__(self, x):
    for h in self.hidden_shapes:
      x = nn.Dense(h, kernel_init=winit.fanin_uniform(),
                   bias_init=winit.constant_bias(0.1))(x)
      x = self.activation(x)
    return x


class NatureEncoder(nn.Module):
  """Atari Nature CNN (base.py:304-343): 32c8s4 - 64c4s2 - 64c3s1, ReLU,
  orthogonal(sqrt 2) init.  Input (B, C, 64, 64); output (B, 4, 4, 64*groups)
  when flatten=False, else (B, 1024*groups)."""
  groups: int = 1
  flatten: bool = True

  @nn.compact
  def __call__(self, x):
    x = jnp.transpose(x, (0, 2, 3, 1))  # NCHW -> NHWC
    conv = lambda feat, k, s: nn.Conv(
        feat, (k, k), strides=(s, s), padding="VALID",
        kernel_init=winit.orthogonal(), bias_init=nn.initializers.zeros)
    x = nn.relu(conv(32 * self.groups, 8, 4)(x))
    x = nn.relu(conv(64 * self.groups, 4, 2)(x))
    x = nn.relu(conv(64 * self.groups, 3, 1)(x))
    if self.flatten:
      # torch flattens (C, H, W) order; match it for weight-layout parity
      x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    return x


def _xavier_conv(feats):
  # the reference applies xavier_uniform_init to every Impala conv
  # (base.py:171 self.apply(xavier_uniform_init))
  return nn.Conv(feats, (3, 3), padding="SAME",
                 kernel_init=nn.initializers.xavier_uniform(),
                 bias_init=nn.initializers.zeros)


class ImpalaResBlock(nn.Module):
  feats: int

  @nn.compact
  def __call__(self, x):
    h = nn.relu(x)
    h = _xavier_conv(self.feats)(h)
    h = nn.relu(h)
    h = _xavier_conv(self.feats)(h)
    return x + h


class ImpalaEncoder(nn.Module):
  """Residual conv stack (base.py:158-207)."""
  flatten: bool = True

  @nn.compact
  def __call__(self, x):
    x = jnp.transpose(x, (0, 2, 3, 1))
    for feats in (16, 32, 32):
      x = _xavier_conv(feats)(x)
      # torch MaxPool2d(kernel 3, stride 2, padding=1) pads SYMMETRICALLY;
      # flax "SAME" pads (0, 1) on even inputs, shifting every pooling
      # window by one pixel — explicit (1, 1) padding matches torch
      x = nn.max_pool(x, (3, 3), strides=(2, 2),
                      padding=((1, 1), (1, 1)))
      x = ImpalaResBlock(feats)(x)
      x = ImpalaResBlock(feats)(x)
    x = nn.relu(x)
    if self.flatten:
      x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
    return x


class RLProjection(nn.Module):
  """Linear + ReLU projection (base.py:209-230)."""
  out_dim: int

  @nn.compact
  def __call__(self, x):
    x = nn.Dense(self.out_dim, kernel_init=winit.fanin_uniform(),
                 bias_init=winit.constant_bias(0.1))(x)
    return nn.relu(x)


class NatureFuseEncoder(nn.Module):
  """Visual Nature encoder + proprio MLP, concatenated (base.py:345-386):
  the `ppo_nature_cnn` baseline's backbone."""
  hidden_shapes: Sequence[int]
  visual_dim: int = 256

  @nn.compact
  def __call__(self, visual_x, state_x):
    v = NatureEncoder(flatten=True)(visual_x)
    v = RLProjection(self.visual_dim)(v)
    s = MLPBase(self.hidden_shapes)(state_x)
    return jnp.concatenate([v, s], axis=-1)


class LocoTransformerEncoder(nn.Module):
  """Tokenizer (base.py:497-627): per-modality NatureEncoder -> 1x1 (or 2x2
  stride-2) conv to token_dim -> 16 (or 4) spatial tokens per modality, plus
  one projected proprio token.  Output: (B, 1 + M*tokens, token_dim)."""
  in_channels: int
  hidden_shapes: Sequence[int]
  token_dim: int = 64
  two_by_two: bool = False
  visual_dim: int | None = None  # accepted for config parity; unused (the
  # reference's ctor swallows it into **kwargs, base.py:497-507)

  @property
  def per_modal_tokens(self) -> int:
    return 4 if self.two_by_two else 16

  @nn.compact
  def __call__(self, visual_x, state_x):
    tokens = []
    # proprio token first (token order: state, [rgb], depth — base.py:611-622)
    s = MLPBase(self.hidden_shapes)(state_x)
    s = RLProjection(self.token_dim)(s)
    tokens.append(s[:, None, :])

    def modality(img):
      h = NatureEncoder(flatten=False)(img)          # (B, 4, 4, 64)
      if self.two_by_two:
        h = nn.Conv(self.token_dim, (2, 2), strides=(2, 2), padding="VALID",
                    kernel_init=winit.orthogonal(),
                    bias_init=nn.initializers.zeros)(h)
      else:
        h = nn.Conv(self.token_dim, (1, 1), padding="VALID",
                    kernel_init=winit.orthogonal(),
                    bias_init=nn.initializers.zeros)(h)
      # torch reshape (B, C, P, P) -> (B, C, P*P) -> tokens (P*P, B, C);
      # batch-first here: (B, P*P, C) with the same token order
      h = jnp.transpose(h, (0, 3, 1, 2))
      return jnp.transpose(h.reshape(h.shape[0], h.shape[1], -1), (0, 2, 1))

    if self.in_channels in (12, 16):
      tokens.append(modality(visual_x[:, :12]))
    if self.in_channels in (4, 16):
      depth = visual_x[:, 12:] if self.in_channels == 16 else visual_x[:, :4]
      tokens.append(modality(depth))
    return jnp.concatenate(tokens, axis=1)


class VisionTokenEncoder(nn.Module):
  """Vision-only tokenizer (reference TransformerEncoder, base.py:388-496):
  per-modality NatureEncoder -> 1x1 (or 2x2 stride-2) conv to token_dim ->
  16 (or 4) spatial tokens per modality.  Unlike LocoTransformerEncoder
  there is NO proprio token — the reference's vision-only nets ignore
  proprio entirely (Transformer.forward reshapes the whole observation as
  the image, nets.py:870-873).  Token order for in_channels=16 is
  depth-then-rgb (base.py:488-493) — the OPPOSITE of
  LocoTransformerEncoder's state,rgb,depth ordering."""
  in_channels: int
  token_dim: int = 64
  two_by_two: bool = False

  @property
  def per_modal_tokens(self) -> int:
    return 4 if self.two_by_two else 16

  @nn.compact
  def __call__(self, visual_x):
    def modality(img):
      h = NatureEncoder(flatten=False)(img)          # (B, 4, 4, 64)
      if self.two_by_two:
        h = nn.Conv(self.token_dim, (2, 2), strides=(2, 2), padding="VALID",
                    kernel_init=winit.orthogonal(),
                    bias_init=nn.initializers.zeros)(h)
      else:
        h = nn.Conv(self.token_dim, (1, 1), padding="VALID",
                    kernel_init=winit.orthogonal(),
                    bias_init=nn.initializers.zeros)(h)
      h = jnp.transpose(h, (0, 3, 1, 2))
      return jnp.transpose(h.reshape(h.shape[0], h.shape[1], -1), (0, 2, 1))

    # submodule creation order matches the reference ctor (rgb base first,
    # base.py:402-418) so param names transplant cleanly; the OUTPUT order
    # for 16 channels is depth,rgb (base.py:488-493)
    rgb = (modality(visual_x[:, :12])
           if self.in_channels in (12, 16) else None)
    if self.in_channels == 12:
      return rgb
    depth_x = visual_x[:, 12:] if self.in_channels == 16 else visual_x[:, :4]
    depth = modality(depth_x)
    if self.in_channels == 4:
      return depth
    return jnp.concatenate([depth, rgb], axis=1)


class TransformerEncoderLayer(nn.Module):
  """PyTorch nn.TransformerEncoderLayer semantics (post-norm, dropout=0):
  x = LN(x + SelfAttn(x)); x = LN(x + FFN(x)).  Used by LocoTransformer
  (nets.py:948-955).

  `fused=True` routes the forward through the Pallas fused layer
  (ops/attention.py) using this layer's own bound params — measured 1.45x
  vs the flax path at rollout shapes (B=1024, T=17, D=64, v5e,
  runs/attention_bench.json).  Single-head.  Differentiable: the route
  goes through `fused_transformer_layer_ad` (custom_vjp with a fused
  Pallas backward kernel), so both the rollout forward and the PPO
  update may opt in.  Off-TPU or at non-tile-aligned batch sizes the
  kernel transparently falls back to identical XLA math."""
  d_model: int
  n_head: int
  dim_feedforward: int

  @nn.compact
  def __call__(self, x, fused: bool = False):  # (B, T, D)
    # Pallas path is f32-only: under bf16 collection this Mosaic version
    # rejects the kernel's 2D<->3D reshapes ("unsupported shape cast")
    # and bf16 stores from f32 accumulators; XLA handles bf16 natively
    # on the MXU, so the fallback loses nothing that matters
    if (fused and self.n_head == 1 and x.dtype == jnp.float32
        and not self.is_initializing()):
      from vision4leg_tpu.ops import attention as pallas_attn
      w = pallas_attn.weights_from_flax(self.variables["params"],
                                        self.d_model)
      return pallas_attn.fused_transformer_layer_ad(x, w)
    attn = nn.MultiHeadDotProductAttention(
        num_heads=self.n_head, qkv_features=self.d_model,
        out_features=self.d_model)(x, x)
    x = nn.LayerNorm()(x + attn)
    h = nn.Dense(self.dim_feedforward)(x)
    h = nn.relu(h)
    h = nn.Dense(self.d_model)(h)
    return nn.LayerNorm()(x + h)
