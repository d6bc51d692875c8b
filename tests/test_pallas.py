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
