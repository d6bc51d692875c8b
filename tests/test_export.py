"""Deployment export: the torch mirror must reproduce the flax policy's
mean action to float tolerance."""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.hardware.export import flax_to_torch_policy
from vision4leg_tpu.models.actor_critic import LocoTransformerActorCritic


def test_flax_torch_parity():
  import torch
  module = LocoTransformerActorCritic(
      action_dim=6, state_input_shape=84, visual_input_shape=(4, 64, 64),
      encoder_hidden_shapes=(64, 64), transformer_params=((1, 128), (1, 128)),
      append_hidden_shapes=(64,), token_dim=64)
  obs_dim = 84 + 4 * 64 * 64
  key = jax.random.PRNGKey(0)
  params = module.init(key, jnp.zeros((1, obs_dim)))

  obs = np.asarray(jax.random.normal(jax.random.PRNGKey(1),
                                     (3, obs_dim)) * 0.5)

  (mean_flax, _, _) = module.apply(params, jnp.asarray(obs),
                                   method=module.pi)
  net = flax_to_torch_policy(module, params)
  with torch.no_grad():
    mean_torch = net(torch.from_numpy(obs.astype(np.float32))).numpy()

  np.testing.assert_allclose(np.asarray(mean_flax), mean_torch,
                             atol=2e-4, rtol=1e-3)
