"""Pallas kernel parity tests (run via the XLA-fallback path on CPU; the
same math executes inside the kernel on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.models.base import TransformerEncoderLayer
from vision4leg_tpu.ops.attention import (LayerWeights,
                                          fused_transformer_layer,
                                          weights_from_flax)


def test_fused_layer_matches_flax():
  D, T, B, F = 64, 17, 8, 256
  layer = TransformerEncoderLayer(d_model=D, n_head=1, dim_feedforward=F)
  key = jax.random.PRNGKey(0)
  x = jax.random.normal(jax.random.fold_in(key, 1), (B, T, D)) * 0.5
  params = layer.init(key, x)

  ref = layer.apply(params, x)
  w = weights_from_flax(params["params"], D)
  out = jax.jit(fused_transformer_layer)(x, w)
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                             atol=2e-5, rtol=1e-4)


def test_model_fused_pi_v_matches_unfused():
  """The wired path: LocoTransformerActorCritic.pi_v(fused=True) must
  produce the same actions/values as the flax path (the rollout passes
  fused=True on TPU; off-TPU the kernel falls back to identical XLA
  math, so this also pins the in-module weights_from_flax routing)."""
  from vision4leg_tpu.models.actor_critic import LocoTransformerActorCritic

  module = LocoTransformerActorCritic(
      action_dim=6, state_input_shape=40, visual_input_shape=(4, 64, 64),
      encoder_hidden_shapes=(32,), transformer_params=((1, 64), (1, 64)),
      append_hidden_shapes=(32,), token_dim=64)
  key = jax.random.PRNGKey(2)
  obs = jax.random.normal(key, (8, 40 + 4 * 64 * 64)) * 0.3
  params = module.init(key, obs[:1])

  import functools

  @functools.partial(jax.jit, static_argnums=0)
  def run(fused):
    return module.apply(params, obs, fused=fused, method=module.pi_v)

  (m0, s0, _), v0 = run(False)
  (m1, s1, _), v1 = run(True)
  np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                             atol=2e-5, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                             atol=2e-5, rtol=1e-4)
  np.testing.assert_allclose(np.asarray(s1), np.asarray(s0))


def test_vision_only_pi_v_matches_pi_and_v():
  """VisionOnlyTransformerActorCritic.pi_v (new single-tokenize inference
  path) must equal the separate pi/v calls, fused or not."""
  from vision4leg_tpu.models.actor_critic import (
      VisionOnlyTransformerActorCritic)

  module = VisionOnlyTransformerActorCritic(
      action_dim=6, state_input_shape=40, visual_input_shape=(4, 64, 64),
      encoder_hidden_shapes=(32,), transformer_params=((1, 64),),
      append_hidden_shapes=(32,), token_dim=64)
  key = jax.random.PRNGKey(3)
  obs = jax.random.normal(key, (4, 40 + 4 * 64 * 64)) * 0.3
  params = module.init(key, obs[:1])

  (m_ref, _, _) = module.apply(params, obs, method=module.pi)
  v_ref = module.apply(params, obs, method=module.v)
  for fused in (False, True):
    (m, _, _), v = module.apply(params, obs, fused=fused,
                                method=module.pi_v)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref),
                               atol=2e-5, rtol=1e-4)
