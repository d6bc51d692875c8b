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

def test_fused_layer_gradients_match_autodiff():
  """fused_transformer_layer_ad (custom_vjp: Pallas fwd on TPU + XLA
  bwd; identical XLA math everywhere off-TPU) must produce the same
  (dx, dw) as plain jax.grad through the flax layer math."""
  from vision4leg_tpu.ops.attention import (_layer_math,
                                            fused_transformer_layer_ad)

  D, T, B, F = 64, 17, 8, 256
  layer = TransformerEncoderLayer(d_model=D, n_head=1, dim_feedforward=F)
  key = jax.random.PRNGKey(4)
  x = jax.random.normal(jax.random.fold_in(key, 1), (B, T, D)) * 0.5
  params = layer.init(key, x)
  w = weights_from_flax(params["params"], D)
  g = jax.random.normal(jax.random.fold_in(key, 2), (B, T, D))

  def loss_ad(x, w):
    return jnp.sum(fused_transformer_layer_ad(x, w) * g)

  def loss_ref(x, w):
    return jnp.sum(_layer_math(x, w, T, D) * g)

  dx_ad, dw_ad = jax.jit(jax.grad(loss_ad, argnums=(0, 1)))(x, w)
  dx_ref, dw_ref = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, w)
  np.testing.assert_allclose(np.asarray(dx_ad), np.asarray(dx_ref),
                             atol=3e-5, rtol=1e-4)
  for name, a, b in zip(LayerWeights._fields, dw_ad, dw_ref):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=3e-5, rtol=1e-4, err_msg=name)


def test_model_fused_update_gradients_match():
  """jax.grad through pi(fused=True) must equal grad through the flax
  path — this is the exact closure shape the PPO update uses under
  V4L_FUSED_UPDATE=1 (agent.apply_pi with fused=True)."""
  from vision4leg_tpu.models.actor_critic import LocoTransformerActorCritic

  module = LocoTransformerActorCritic(
      action_dim=6, state_input_shape=40, visual_input_shape=(4, 64, 64),
      encoder_hidden_shapes=(32,), transformer_params=((1, 64), (1, 64)),
      append_hidden_shapes=(32,), token_dim=64)
  key = jax.random.PRNGKey(5)
  obs = jax.random.normal(key, (4, 40 + 4 * 64 * 64)) * 0.3
  params = module.init(key, obs[:1])

  def loss(p, fused):
    mean, _, logstd = module.apply(p, obs, fused=fused, method=module.pi)
    return jnp.sum(mean ** 2) + jnp.sum(logstd)

  g0 = jax.jit(jax.grad(loss), static_argnums=1)(params, False)
  g1 = jax.jit(jax.grad(loss), static_argnums=1)(params, True)
  flat0 = jax.tree_util.tree_leaves_with_path(g0)
  flat1 = {jax.tree_util.keystr(k): v
           for k, v in jax.tree_util.tree_leaves_with_path(g1)}
  for k, v in flat0:
    np.testing.assert_allclose(
        np.asarray(flat1[jax.tree_util.keystr(k)]), np.asarray(v),
        atol=3e-5, rtol=2e-4, err_msg=jax.tree_util.keystr(k))
