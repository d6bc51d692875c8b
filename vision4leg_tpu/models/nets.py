"""Network heads (Flax): Net, LocoTransformer, Transformer, VisualNet —
ref: torchrl/networks/nets.py."""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from vision4leg_tpu.models import init as winit
from vision4leg_tpu.models.base import (LocoTransformerEncoder, MLPBase,
                                        NatureFuseEncoder, RLProjection,
                                        TransformerEncoderLayer)


class Net(nn.Module):
  """MLPBase + append FCs + small-uniform last layer (nets.py:16-70).

  The `ppo_state` policy/value network.
  """
  output_shape: int
  hidden_shapes: Sequence[int]
  append_hidden_shapes: Sequence[int] = ()

  @nn.compact
  def __call__(self, x):
    x = MLPBase(self.hidden_shapes)(x)
    for h in self.append_hidden_shapes:
      x = nn.Dense(h, kernel_init=winit.fanin_uniform(),
                   bias_init=winit.constant_bias(0.1))(x)
      x = nn.relu(x)
    return nn.Dense(self.output_shape, kernel_init=winit.uniform_small(),
                    bias_init=winit.uniform_small())(x)


class LocoTransformer(nn.Module):
  """Cross-modal transformer head (nets.py:909-1038).

  Input: flat obs [proprio(state_input_shape) | image(C*64*64)].
  Pipeline: LocoTransformerEncoder tokens -> N x TransformerEncoderLayer ->
  [state token, mean/max-pooled per-modality tokens] -> MLP -> output.
  """
  output_shape: int
  state_input_shape: int
  visual_input_shape: tuple  # (C, 64, 64)
  encoder_hidden_shapes: Sequence[int]
  transformer_params: Sequence[tuple] = ((1, 256), (1, 256))
  append_hidden_shapes: Sequence[int] = (256, 256)
  token_dim: int = 64
  max_pool: bool = False
  token_norm: bool = False
  two_by_two: bool = False

  @nn.compact
  def __call__(self, x):
    state_x = x[..., : self.state_input_shape]
    visual_x = x[..., self.state_input_shape:].reshape(
        x.shape[:-1] + tuple(self.visual_input_shape))
    in_channels = self.visual_input_shape[0]
    encoder = LocoTransformerEncoder(
        in_channels=in_channels,
        hidden_shapes=self.encoder_hidden_shapes,
        token_dim=self.token_dim,
        two_by_two=self.two_by_two)
    tokens = encoder(visual_x, state_x)            # (B, T, D)
    if self.token_norm:
      tokens = nn.LayerNorm()(tokens)
    for n_head, dim_ff in self.transformer_params:
      tokens = TransformerEncoderLayer(self.token_dim, n_head, dim_ff)(tokens)

    per_modal = encoder.per_modal_tokens
    second = in_channels == 16                     # nets.py:966-971
    pool = ((lambda t: jnp.max(t, axis=1)) if self.max_pool
            else (lambda t: jnp.mean(t, axis=1)))
    outs = [tokens[:, 0], pool(tokens[:, 1: 1 + per_modal])]
    if second:
      outs.append(pool(tokens[:, 1 + per_modal: 1 + 2 * per_modal]))
    h = jnp.concatenate(outs, axis=-1)

    for hs in self.append_hidden_shapes:
      h = nn.Dense(hs, kernel_init=winit.fanin_uniform(),
                   bias_init=winit.constant_bias(0.1))(h)
      h = nn.relu(h)
    return nn.Dense(self.output_shape, kernel_init=winit.uniform_small(),
                    bias_init=winit.uniform_small())(h)


class Transformer(nn.Module):
  """Vision-only transformer (nets.py:784-907): same as LocoTransformer but
  pools only visual tokens (no proprio input used by the head)."""
  output_shape: int
  state_input_shape: int
  visual_input_shape: tuple
  encoder_hidden_shapes: Sequence[int]
  transformer_params: Sequence[tuple] = ((1, 256), (1, 256))
  append_hidden_shapes: Sequence[int] = (256, 256)
  token_dim: int = 64
  max_pool: bool = False

  @nn.compact
  def __call__(self, x):
    state_x = x[..., : self.state_input_shape]
    visual_x = x[..., self.state_input_shape:].reshape(
        x.shape[:-1] + tuple(self.visual_input_shape))
    encoder = LocoTransformerEncoder(
        in_channels=self.visual_input_shape[0],
        hidden_shapes=self.encoder_hidden_shapes,
        token_dim=self.token_dim)
    tokens = encoder(visual_x, state_x)
    for n_head, dim_ff in self.transformer_params:
      tokens = TransformerEncoderLayer(self.token_dim, n_head, dim_ff)(tokens)
    pool = ((lambda t: jnp.max(t, axis=1)) if self.max_pool
            else (lambda t: jnp.mean(t, axis=1)))
    h = pool(tokens[:, 1:])
    for hs in self.append_hidden_shapes:
      h = nn.Dense(hs, kernel_init=winit.fanin_uniform(),
                   bias_init=winit.constant_bias(0.1))(h)
      h = nn.relu(h)
    return nn.Dense(self.output_shape, kernel_init=winit.uniform_small(),
                    bias_init=winit.uniform_small())(h)


class NatureFuseNet(nn.Module):
  """Nature-CNN + proprio fuse net (the `ppo_nature_cnn` baseline's
  policy/value head; ref ImpalaEncoderProjNet/NatureEncoderProjNet
  nets.py:133-250 with NatureFuseEncoder base)."""
  output_shape: int
  state_input_shape: int
  visual_input_shape: tuple
  encoder_hidden_shapes: Sequence[int]
  visual_dim: int = 256
  append_hidden_shapes: Sequence[int] = (256, 256)

  @nn.compact
  def __call__(self, x):
    state_x = x[..., : self.state_input_shape]
    visual_x = x[..., self.state_input_shape:].reshape(
        x.shape[:-1] + tuple(self.visual_input_shape))
    h = NatureFuseEncoder(hidden_shapes=self.encoder_hidden_shapes,
                          visual_dim=self.visual_dim)(visual_x, state_x)
    for hs in self.append_hidden_shapes:
      h = nn.Dense(hs, kernel_init=winit.fanin_uniform(),
                   bias_init=winit.constant_bias(0.1))(h)
      h = nn.relu(h)
    return nn.Dense(self.output_shape, kernel_init=winit.uniform_small(),
                    bias_init=winit.uniform_small())(h)
