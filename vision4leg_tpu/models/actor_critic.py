"""Actor-critic modules with the reference's encoder sharing.

All three reference starters share the feature extractor between policy and
value function (`ppo_state.py:104` `vf.base = pf.base`;
`ppo_locotransformer.py:79-101` / `ppo_nature_cnn.py:81-100` pass one
`encoder` object to both).  Policies carry a state-independent learnable
logstd initialized to log(0.125), clamped to [-5, 2]
(continuous_policy.py:8-9, 239-254).

Each module exposes:
  pi(x)  -> (mean, std, logstd)
  v(x)   -> (B, 1) value
  __call__(x) -> (pi(x), v(x))   (used for parameter init)
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.models import init as winit
from vision4leg_tpu.models.base import (LocoTransformerEncoder, MLPBase,
                                        NatureFuseEncoder,
                                        TransformerEncoderLayer,
                                        VisionTokenEncoder)

LOG_SIG_MAX = 2.0
LOG_SIG_MIN = -5.0


class _GaussianHead(nn.Module):
  """Learnable state-independent logstd (GaussianContPolicyBasicBias)."""
  action_dim: int
  log_init: float = 0.125

  @nn.compact
  def __call__(self, mean):
    logstd = self.param(
        "logstd", lambda k, s: jnp.full(s, float(np.log(self.log_init))),
        (self.action_dim,))
    logstd = jnp.clip(logstd, LOG_SIG_MIN, LOG_SIG_MAX)
    std = jnp.broadcast_to(jnp.exp(logstd), mean.shape)
    return mean, std, logstd


class MLPHead(nn.Module):
  """Append-FC stack + small-uniform output layer (nets.py:16-70 tail)."""
  hidden_shapes: Sequence[int]
  out_dim: int

  @nn.compact
  def __call__(self, x):
    for h in self.hidden_shapes:
      x = nn.Dense(h, kernel_init=winit.fanin_uniform(),
                   bias_init=winit.constant_bias(0.1))(x)
      x = nn.relu(x)
    return nn.Dense(self.out_dim, kernel_init=winit.uniform_small(),
                    bias_init=winit.uniform_small())(x)


class StateActorCritic(nn.Module):
  """ppo_state: shared MLPBase + separate append-FC heads
  (starter/ppo_state.py:93-104)."""
  action_dim: int
  hidden_shapes: Sequence[int] = (256, 256)
  append_hidden_shapes: Sequence[int] = (256, 256)
  log_init: float = 0.125

  def setup(self):
    self.base = MLPBase(self.hidden_shapes)
    self.head = _GaussianHead(self.action_dim, self.log_init)
    self.pf_mlp = MLPHead(self.append_hidden_shapes, self.action_dim)
    self.vf_mlp = MLPHead(self.append_hidden_shapes, 1)

  def pi(self, x):
    return self.head(self.pf_mlp(self.base(x)))

  def v(self, x):
    return self.vf_mlp(self.base(x))

  def pi_v(self, x):
    """Policy and value in one pass over the shared base (the
    rollout calls both every step; sharing the trunk halves encoder
    cost)."""
    h = self.base(x)
    return self.head(self.pf_mlp(h)), self.vf_mlp(h)

  def __call__(self, x):
    return self.pi(x), self.v(x)


class LocoTransformerActorCritic(nn.Module):
  """ppo_locotransformer: shared LocoTransformerEncoder tokenizer; separate
  transformer stacks + MLP heads per pf/vf (the reference shares only the
  `encoder`; each LocoTransformer net owns its attention layers)."""
  action_dim: int
  state_input_shape: int
  visual_input_shape: Tuple[int, int, int]  # (C, 64, 64)
  encoder_hidden_shapes: Sequence[int] = (256, 256)
  transformer_params: Sequence[tuple] = ((1, 256), (1, 256))
  append_hidden_shapes: Sequence[int] = (256, 256)
  token_dim: int = 64
  max_pool: bool = False
  log_init: float = 0.125

  def setup(self):
    self.encoder = LocoTransformerEncoder(
        in_channels=self.visual_input_shape[0],
        hidden_shapes=self.encoder_hidden_shapes,
        token_dim=self.token_dim)
    self.head = _GaussianHead(self.action_dim, self.log_init)
    self.pf_layers = [
        TransformerEncoderLayer(self.token_dim, nh, ff)
        for nh, ff in self.transformer_params]
    self.vf_layers = [
        TransformerEncoderLayer(self.token_dim, nh, ff)
        for nh, ff in self.transformer_params]
    self.pf_mlp = MLPHead(self.append_hidden_shapes, self.action_dim)
    self.vf_mlp = MLPHead(self.append_hidden_shapes, 1)

  def _tokens(self, x):
    state_x = x[..., : self.state_input_shape]
    visual_x = x[..., self.state_input_shape:].reshape(
        x.shape[:-1] + tuple(self.visual_input_shape))
    return self.encoder(visual_x, state_x)

  def _pool(self, tokens):
    """State token + mean/max pooled per-modality tokens (nets.py:1014-1030)."""
    per_modal = self.encoder.per_modal_tokens
    second = self.visual_input_shape[0] == 16
    pool = ((lambda t: jnp.max(t, axis=1)) if self.max_pool
            else (lambda t: jnp.mean(t, axis=1)))
    outs = [tokens[:, 0], pool(tokens[:, 1: 1 + per_modal])]
    if second:
      outs.append(pool(tokens[:, 1 + per_modal: 1 + 2 * per_modal]))
    return jnp.concatenate(outs, axis=-1)

  def pi(self, x, fused: bool = False):
    t = self._tokens(x)
    for layer in self.pf_layers:
      t = layer(t, fused=fused)
    return self.head(self.pf_mlp(self._pool(t)))

  def v(self, x, fused: bool = False):
    t = self._tokens(x)
    for layer in self.vf_layers:
      t = layer(t, fused=fused)
    return self.vf_mlp(self._pool(t))

  def pi_v(self, x, fused: bool = False):
    """Tokenize once, run both transformer stacks (the conv
    tokenizer dominates; pi/v separately would run it twice).
    `fused=True` uses the Pallas fused layer (differentiable: custom_vjp
    with a recompute-based XLA backward) — OFF by default everywhere
    since the round-4 epoch-level A/B showed the flax path composes
    faster inside the rollout scan (agent.py fused_attention); opt in
    via PPOAgent(fused_attention=True) / V4L_FUSED_UPDATE=1."""
    t0 = self._tokens(x)
    t = t0
    for layer in self.pf_layers:
      t = layer(t, fused=fused)
    pi_out = self.head(self.pf_mlp(self._pool(t)))
    t = t0
    for layer in self.vf_layers:
      t = layer(t, fused=fused)
    return pi_out, self.vf_mlp(self._pool(t))

  def __call__(self, x):
    return self.pi(x), self.v(x)


class VisionOnlyTransformerActorCritic(nn.Module):
  """ppo_locotransformer_vision_only: TransformerEncoder over image tokens
  only (torchrl/networks/base.py:388 TransformerEncoder +
  nets.py:784 Transformer + GaussianContPolicyTransformer).  The proprio
  part of the observation is ignored COMPLETELY: the reference's
  vision-only encoder emits no proprio token at all (base.py:388-496), so
  attention runs over the 16 (or 32 for RGBD) visual tokens only.
  Pooling reproduces the reference exactly (nets.py:884-901): out_first
  pools out[0 : 1+per_modal_tokens] — on a single-modality 16-token
  stream the slice clamps to all 16; on the RGBD 32-token stream it spans
  all 16 depth tokens PLUS the first rgb token (the reference's own
  off-by-one, reproduced deliberately) — and out_second pools
  out[per_modal : 2*per_modal]."""
  action_dim: int
  state_input_shape: int
  visual_input_shape: Tuple[int, int, int]
  encoder_hidden_shapes: Sequence[int] = (256, 256)  # accepted for config
  # parity; the vision-only encoder has no proprio MLP to size with it
  transformer_params: Sequence[tuple] = ((1, 256), (1, 256))
  append_hidden_shapes: Sequence[int] = (256, 256)
  token_dim: int = 64
  max_pool: bool = False
  log_init: float = 0.125

  def setup(self):
    self.encoder = VisionTokenEncoder(
        in_channels=self.visual_input_shape[0],
        token_dim=self.token_dim)
    self.head = _GaussianHead(self.action_dim, self.log_init)
    self.pf_layers = [
        TransformerEncoderLayer(self.token_dim, nh, ff)
        for nh, ff in self.transformer_params]
    self.vf_layers = [
        TransformerEncoderLayer(self.token_dim, nh, ff)
        for nh, ff in self.transformer_params]
    self.pf_mlp = MLPHead(self.append_hidden_shapes, self.action_dim)
    self.vf_mlp = MLPHead(self.append_hidden_shapes, 1)

  def _tokens(self, x):
    visual_x = x[..., self.state_input_shape:].reshape(
        x.shape[:-1] + tuple(self.visual_input_shape))
    return self.encoder(visual_x)

  def _stack(self, t, layers, mlp, fused=False):
    for layer in layers:
      t = layer(t, fused=fused)
    pool = ((lambda z: jnp.max(z, axis=1)) if self.max_pool
            else (lambda z: jnp.mean(z, axis=1)))
    pm = self.encoder.per_modal_tokens
    # nets.py:884-901 — see class docstring for the slice semantics
    outs = [pool(t[:, : 1 + pm])]
    if self.visual_input_shape[0] == 16:
      outs.append(pool(t[:, pm: 2 * pm]))
    return mlp(jnp.concatenate(outs, axis=-1))

  def pi(self, x, fused: bool = False):
    return self.head(self._stack(self._tokens(x), self.pf_layers,
                                 self.pf_mlp, fused))

  def v(self, x, fused: bool = False):
    return self._stack(self._tokens(x), self.vf_layers, self.vf_mlp, fused)

  def pi_v(self, x, fused: bool = False):
    """Tokenize once, run both stacks (same contract as
    LocoTransformerActorCritic.pi_v; fused = differentiable Pallas
    layer)."""
    t = self._tokens(x)
    return (self.head(self._stack(t, self.pf_layers, self.pf_mlp, fused)),
            self._stack(t, self.vf_layers, self.vf_mlp, fused))

  def __call__(self, x):
    return self.pi(x), self.v(x)


class VisualNetActorCritic(nn.Module):
  """ppo_nature_cnn_vision_only: GaussianContPolicyNatureEncoderProj +
  NatureEncoderProjNet over ONE shared raw NatureEncoder
  (continuous_policy.py:257, nets.py:133-191, starter/
  ppo_nature_cnn_vision_only.py:79-97).  Despite the 'Proj' in the
  reference's names there is NO projection layer: the append MLPs consume
  the encoder's 1024-dim conv flatten directly (nets.py:158
  `append_input_shape = self.encoder.output_dim`), and the config's
  encoder.visual_dim/hidden_shapes are swallowed unused by
  NatureEncoder's **kwargs (base.py:304-310)."""
  action_dim: int
  state_input_shape: int
  visual_input_shape: Tuple[int, int, int]
  visual_dim: int = 256  # accepted for config parity; unused, as in the
  # reference (NatureEncoder swallows it, base.py:304-310)
  append_hidden_shapes: Sequence[int] = (256, 256)
  log_init: float = 0.125

  def setup(self):
    from vision4leg_tpu.models.base import NatureEncoder
    self.backbone = NatureEncoder(flatten=True)
    self.head = _GaussianHead(self.action_dim, self.log_init)
    self.pf_mlp = MLPHead(self.append_hidden_shapes, self.action_dim)
    self.vf_mlp = MLPHead(self.append_hidden_shapes, 1)

  def _features(self, x):
    visual_x = x[..., self.state_input_shape:].reshape(
        x.shape[:-1] + tuple(self.visual_input_shape))
    return self.backbone(visual_x)

  def pi(self, x):
    return self.head(self.pf_mlp(self._features(x)))

  def v(self, x):
    return self.vf_mlp(self._features(x))

  def __call__(self, x):
    return self.pi(x), self.v(x)


class NatureFuseActorCritic(nn.Module):
  """ppo_nature_cnn: shared NatureFuseEncoder + separate MLP heads
  (starter/ppo_nature_cnn.py:81-100)."""
  action_dim: int
  state_input_shape: int
  visual_input_shape: Tuple[int, int, int]
  encoder_hidden_shapes: Sequence[int] = (256, 256)
  visual_dim: int = 256
  append_hidden_shapes: Sequence[int] = (256, 256)
  log_init: float = 0.125

  def setup(self):
    self.encoder = NatureFuseEncoder(
        hidden_shapes=self.encoder_hidden_shapes, visual_dim=self.visual_dim)
    self.head = _GaussianHead(self.action_dim, self.log_init)
    self.pf_mlp = MLPHead(self.append_hidden_shapes, self.action_dim)
    self.vf_mlp = MLPHead(self.append_hidden_shapes, 1)

  def _features(self, x):
    state_x = x[..., : self.state_input_shape]
    visual_x = x[..., self.state_input_shape:].reshape(
        x.shape[:-1] + tuple(self.visual_input_shape))
    return self.encoder(visual_x, state_x)

  def pi(self, x):
    return self.head(self.pf_mlp(self._features(x)))

  def v(self, x):
    return self.vf_mlp(self._features(x))

  def __call__(self, x):
    return self.pi(x), self.v(x)


class ImpalaFuseResidualActorCritic(nn.Module):
  """ppo_aux backbone (nets.py:384-530 ImpalaFuseResidualActor): Impala
  visual encoder + proprio MLP; the actor output is the SUM of a fused
  (visual+state) head and a state-only residual head, and the visual
  features additionally regress the displacement-sensor history (the aux
  loss, :488-530)."""
  action_dim: int
  state_input_shape: int
  visual_input_shape: Tuple[int, int, int]
  encoder_hidden_shapes: Sequence[int] = (256, 256)
  visual_dim: int = 256
  append_hidden_shapes: Sequence[int] = (256, 256)
  displacement_dim: int = 7
  history: int = 3
  log_init: float = 0.125

  def setup(self):
    from vision4leg_tpu.models.base import ImpalaEncoder, MLPBase, RLProjection
    self.visual_base = ImpalaEncoder(flatten=True)
    self.visual_proj = RLProjection(self.visual_dim)
    self.state_mlp = MLPBase(self.encoder_hidden_shapes)
    self.head = _GaussianHead(self.action_dim, self.log_init)
    self.pf_fused = MLPHead(self.append_hidden_shapes, self.action_dim)
    self.pf_state = MLPHead(self.append_hidden_shapes, self.action_dim)
    self.vf_fused = MLPHead(self.append_hidden_shapes, 1)
    self.aux_head = MLPHead((), self.displacement_dim * self.history)

  def _features(self, x):
    state_x = x[..., : self.state_input_shape]
    visual_x = x[..., self.state_input_shape:].reshape(
        x.shape[:-1] + tuple(self.visual_input_shape))
    v = self.visual_proj(self.visual_base(visual_x))
    s = self.state_mlp(state_x)
    return v, s, state_x

  def pi_with_aux(self, x):
    v, s, state_x = self._features(x)
    mean = self.pf_fused(jnp.concatenate([v, s], axis=-1)) + self.pf_state(s)
    # aux: visual features predict the displacement history, the first
    # history*displacement_dim dims of the proprio obs (nets.py:495-499)
    disp_gt = state_x[..., : self.history * self.displacement_dim]
    aux_loss = jnp.mean((self.aux_head(v) - disp_gt) ** 2)
    return self.head(mean), aux_loss

  def pi(self, x):
    return self.pi_with_aux(x)[0]

  def v(self, x):
    v, s, _ = self._features(x)
    return self.vf_fused(jnp.concatenate([v, s], axis=-1))

  def __call__(self, x):
    return self.pi(x), self.v(x)
