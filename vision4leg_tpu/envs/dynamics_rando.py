"""Per-episode dynamics randomization (MMDR's proprio-side randomization).

Reference: vision4leg/envs/utilities/controllable_env_randomizer_from_config
.py + controllable_env_randomizer_config.py:9-26 (`all_params`):

  mass             [0.8, 1.2]   x2 draws: base ratio, leg ratio
  inertia          [0.5, 1.5]   x2 draws: base ratio, leg ratio
  motor strength   [0.8, 1.2]   per-motor ratios
  motor friction   [0, 0.05]    viscous damping (Nm s/rad)
  latency          [0, 0.04]    control observation latency (s); the
                                fixed-delay-observation mode pins it to the
                                max (from_config.py:360-382)
  lateral friction [0.5, 1.25]  ground friction coefficient
  battery          [14, 16.8]   no-op for A1 (LaikagoMotorModel has no
                                voltage model)
  joint friction   [0, 0.05]    Coulomb torque (Nm)
  pd control       [[50,0.4],[70,0.8]]  kp in [50,70], kd in [0.4,0.8]
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vision4leg_tpu.physics.model import Model
from vision4leg_tpu.robots.a1 import DynamicsParams, default_dynamics


def sample_dynamics(model: Model, key: jax.Array,
                    fixed_delay_observation: bool = False) -> DynamicsParams:
  ks = jax.random.split(key, 8)
  nb = model.nbody
  base_mass, leg_mass = jax.random.uniform(ks[0], (2,), minval=0.8,
                                           maxval=1.2)
  base_inertia, leg_inertia = jax.random.uniform(ks[1], (2,), minval=0.5,
                                                 maxval=1.5)
  mass_scale = jnp.concatenate(
      [base_mass[None], jnp.full(nb - 1, leg_mass)])
  inertia_scale = jnp.concatenate(
      [base_inertia[None], jnp.full(nb - 1, leg_inertia)])
  strength = jax.random.uniform(ks[2], (12,), minval=0.8, maxval=1.2)
  motor_friction = jax.random.uniform(ks[3], (), minval=0.0, maxval=0.05)
  joint_friction = jax.random.uniform(ks[4], (), minval=0.0, maxval=0.05)
  if fixed_delay_observation:
    latency = jnp.asarray(0.04)
  else:
    latency = jax.random.uniform(ks[5], (), minval=0.0, maxval=0.04)
  lateral_friction = jax.random.uniform(ks[6], (), minval=0.5, maxval=1.25)
  kp = jax.random.uniform(ks[7], (), minval=50.0, maxval=70.0)
  kd = jax.random.uniform(jax.random.fold_in(ks[7], 1), (),
                          minval=0.4, maxval=0.8)
  return DynamicsParams(
      kp=jnp.full(12, kp),
      kd=jnp.full(12, kd),
      strength_ratios=strength,
      motor_friction=motor_friction,
      joint_friction=joint_friction,
      control_latency=latency,
      lateral_friction=lateral_friction,
      mass_scale=mass_scale,
      inertia_scale=inertia_scale,
  )


def maybe_sample(model: Model, key: jax.Array, enabled: bool,
                 fixed_delay_observation: bool = False) -> DynamicsParams:
  if enabled:
    return sample_dynamics(model, key, fixed_delay_observation)
  return default_dynamics(model)
