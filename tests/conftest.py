"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware by exposing 8 XLA CPU
devices.  Note: this host pins JAX_PLATFORMS=axon (remote TPU tunnel) and
re-asserts it during jax import, so the env-var route doesn't work — the
config API does.
"""
import jax

jax.config.update("jax_platforms", "cpu")
try:
  jax.config.update("jax_num_cpu_devices", 8)
except Exception:
  import os
  flags = os.environ.get("XLA_FLAGS", "")
  if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
