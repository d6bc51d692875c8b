"""Decide the Pallas fused transformer layer's fate with a measurement.

VERDICT r1 item 8c: ops/attention.py (fused QKV+attention+FFN+LN layer)
is tested but unwired; either integrate it into rollout inference or
document the measured reason it isn't needed.  This benchmark times, on
the real TPU at rollout shapes (LocoTransformer: T=17 tokens of width
d_model, batch = num_envs):

  (a) the flax TransformerEncoderLayer forward (what models/base.py runs),
  (b) the Pallas fused layer `fused_transformer_layer`,
  (c) a full LocoTransformerActorCritic pi_v forward (the whole per-step
      policy cost, for scale).

Writes runs/attention_bench.json and prints it.
"""
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_v4l"))

from vision4leg_tpu.models.base import TransformerEncoderLayer
from vision4leg_tpu.ops import attention as pat

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "runs", "attention_bench.json")


def _time(fn, *args, n=50, repeats=3):
  """Min-of-`repeats` timed loops: per-dispatch RPC latency over the
  axon tunnel is ~100 us-scale and bursty, which swamped single-loop
  measurements of these ~30-100 us kernels (adjacent runs disagreed
  3-4x on the same shape); the min over several loops is the stable
  uncontended estimate."""
  out = fn(*args)
  jax.block_until_ready(out)
  best = float("inf")
  for _ in range(repeats):
    t0 = time.time()
    for _ in range(n):
      out = fn(*args)
    jax.block_until_ready(out)
    best = min(best, (time.time() - t0) / n)
  return best


def main():
  results = {"backend": jax.default_backend()}
  key = jax.random.PRNGKey(0)
  for B in (512, 1024):
    for D in (64, 256):
      T, F = 17, 4 * D
      layer = TransformerEncoderLayer(d_model=D, n_head=1,
                                      dim_feedforward=F)
      x = jax.random.normal(key, (B, T, D), jnp.float32) * 0.5
      params = layer.init(key, x)
      w = pat.weights_from_flax(params["params"], D)

      flax_t = _time(jax.jit(lambda p, x: layer.apply(p, x)), params, x)
      pallas_t = _time(jax.jit(pat.fused_transformer_layer), x, w)
      results[f"B{B}_D{D}"] = {
          "flax_layer_us": round(flax_t * 1e6, 1),
          "pallas_layer_us": round(pallas_t * 1e6, 1),
          "speedup": round(flax_t / pallas_t, 2),
      }
      print(f"B={B} D={D}: flax {flax_t*1e6:.0f} us, "
            f"pallas {pallas_t*1e6:.0f} us, x{flax_t/pallas_t:.2f}")

  # whole-policy scale: one pi_v forward at thin-goal shapes
  from vision4leg_tpu.models.actor_critic import LocoTransformerActorCritic
  module = LocoTransformerActorCritic(
      action_dim=6, state_input_shape=84, visual_input_shape=(4, 64, 64),
      encoder_hidden_shapes=(256, 256),
      transformer_params=((1, 256), (1, 256)),
      append_hidden_shapes=(256, 256))
  obs = jnp.zeros((1024, 84 + 4 * 64 * 64), jnp.float32)
  p = module.init(jax.random.PRNGKey(1), obs[:1])

  def pi_v(p, o):
    return module.apply(p, o, method=module.pi_v)

  results["pi_v_1024_us"] = round(_time(jax.jit(pi_v), p, obs, n=20) * 1e6,
                                  1)
  print(f"full pi_v @1024: {results['pi_v_1024_us']:.0f} us")

  # --- update-path ceiling (VERDICT r2 #9): would a fused-attention VJP
  # help the PPO update?  A custom_vjp whose backward recomputes the XLA
  # forward ADDS work (the pallas fwd saves ~12 us/layer while the remat
  # costs a ~40 us XLA fwd), so the only honest win needs a Pallas
  # backward kernel — bounded above by the layer's total share of the
  # update.  Measure fwd and fwd+bwd of the flax layer at the update's
  # minibatch shape (thin-goal: batch_size=1024, opt_epochs=3, 16384
  # frames -> 48 policy + 48 value minibatch grads, 2 layers each
  # branch) and report the per-PPO-epoch attention-grad cost. ---
  D, F, T, B = 64, 256, 17, 1024
  layer = TransformerEncoderLayer(d_model=D, n_head=1, dim_feedforward=F)
  x = jax.random.normal(key, (B, T, D), jnp.float32) * 0.5
  params = layer.init(key, x)

  fwd_t = _time(jax.jit(lambda p, x: layer.apply(p, x)), params, x)

  def loss(p, x):
    return jnp.sum(layer.apply(p, x))

  grad_t = _time(jax.jit(jax.grad(loss, argnums=(0, 1))), params, x)
  minibatch_grads = 2 * 3 * (16384 // 1024)   # policy + value passes
  layers_per_pass = 2
  per_epoch_ms = grad_t * minibatch_grads * layers_per_pass * 1e3
  results["update_path"] = {
      "flax_fwd_us": round(fwd_t * 1e6, 1),
      "flax_fwd_bwd_us": round(grad_t * 1e6, 1),
      "attention_grad_cost_per_ppo_epoch_ms": round(per_epoch_ms, 2),
      "note": "ceiling for any fused-VJP win; compare against bench.py's "
              "update s/epoch phase timing",
  }
  print(f"update path: fwd {fwd_t*1e6:.0f} us, fwd+bwd {grad_t*1e6:.0f} us"
        f" -> {per_epoch_ms:.1f} ms attention-grad per PPO epoch")

  # --- the fused Pallas backward (ops/attention.py custom_vjp): time
  # fwd+bwd at the same update-minibatch shape and check gradient parity
  # against the flax autodiff on this backend. ---
  w = pat.weights_from_flax(params["params"], D)
  gcot = jax.random.normal(jax.random.fold_in(key, 9), (B, T, D))

  def loss_ad(p, xx):
    ww = pat.weights_from_flax(p["params"], D)
    return jnp.sum(pat.fused_transformer_layer_ad(xx, ww) * gcot)

  def loss_flax(p, xx):
    return jnp.sum(layer.apply(p, xx) * gcot)

  grad_ad = jax.jit(jax.grad(loss_ad, argnums=(0, 1)))
  grad_fl = jax.jit(jax.grad(loss_flax, argnums=(0, 1)))
  ga = grad_ad(params, x)
  gf = grad_fl(params, x)
  import numpy as _np
  err = max(float(_np.max(_np.abs(_np.asarray(a) - _np.asarray(b))))
            for a, b in zip(jax.tree_util.tree_leaves(ga),
                            jax.tree_util.tree_leaves(gf)))
  # absolute error alone is misleading at B=1024: weight grads sum over
  # B*T = 17408 samples on the MXU, whose DEFAULT precision on TPU is
  # bf16 inputs + f32 accumulation for BOTH paths, so O(1e-2) absolute
  # disagreement on O(1e2..1e3) gradients is bf16 rounding, not a wrong
  # VJP — report the relative error as the verdict
  rel = max(
      float(_np.max(_np.abs(_np.asarray(a) - _np.asarray(b))) /
            (_np.max(_np.abs(_np.asarray(b))) + 1e-12))
      for a, b in zip(jax.tree_util.tree_leaves(ga),
                      jax.tree_util.tree_leaves(gf)))
  pallas_grad_t = _time(grad_ad, params, x)
  results["update_path"]["pallas_fwd_bwd_us"] = round(pallas_grad_t * 1e6, 1)
  results["update_path"]["pallas_vs_flax_bwd_speedup"] = round(
      grad_t / pallas_grad_t, 2)
  results["update_path"]["grad_parity_max_abs_err"] = err
  results["update_path"]["grad_parity_max_rel_err"] = rel
  print(f"pallas custom_vjp fwd+bwd {pallas_grad_t*1e6:.0f} us "
        f"(x{grad_t/pallas_grad_t:.2f} vs flax), grad parity abs {err:.2e} "
        f"rel {rel:.2e}")

  with open(OUT, "w") as f:
    json.dump(results, f, indent=2)
  print(json.dumps(results))


if __name__ == "__main__":
  main()
