"""vision4leg_tpu — a TPU-native rebuild of the vision4leg framework.

Capability parity target: Mehooz/vision4leg (LocoTransformer, ICLR'22 + MMDR,
IROS'22).  The reference is a PyTorch + PyBullet monorepo; this framework is a
ground-up JAX/XLA/Pallas redesign:

  * physics/   — JAX rigid-body engine (replaces host-side PyBullet): the A1
                 quadruped is simulated *on the TPU*, vmapped over thousands
                 of parallel environments inside one jitted program.
  * robots/    — A1 robot model: PD motor model, latency ring buffers,
                 action interpolation/filtering (ref: vision4leg/robots/).
  * envs/      — locomotion gym environments, sensors, tasks, terrain and
                 dynamics randomizers, device-side depth raycasting camera
                 (ref: vision4leg/envs/).
  * models/    — Flax networks: MLP/Nature/Impala encoders, LocoTransformer,
                 Gaussian policies (ref: torchrl/networks, torchrl/policies).
  * ops/       — Pallas TPU kernels for hot paths.
  * algo/      — RL algorithms: PPO/A2C/TRPO/VMPO + off-policy family
                 (ref: torchrl/algo/).
  * collector/ — fully-jitted on-device rollout (replaces SubProcVecEnv +
                 per-step host<->device ping-pong).
  * data/      — on-policy buffer with GAE as lax.scan; replay buffers.
  * parallel/  — device-mesh sharding utilities (data-parallel PPO over ICI).
  * utils/     — config/args (reference JSON schema compatible), logger,
                 checkpointing (orbax).
"""

__version__ = "0.1.0"
