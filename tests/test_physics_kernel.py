"""Parity test for the Pallas physics window kernel (CPU: exercises the
identical vmapped-XLA math through the same entry point; the TPU kernel
path is validated by scripts/bench and the same function)."""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.ops.physics_kernel import robot_window_pallas
from vision4leg_tpu.physics import contact, engine
from vision4leg_tpu.envs import terrain as terr
from vision4leg_tpu.robots import a1, a1_model, a1_params as P


def test_window_matches_stepwise():
  """robot_window_pallas must equal a1.robot_step with the CG solver."""
  model = a1_model.build(dt=0.0025)
  E = 4
  key = jax.random.PRNGKey(0)
  phys = engine.zero_state(model).replace(
      pos=jnp.array([0.0, 0.0, 0.27]),
      joint_q=jnp.asarray(np.array([0, 0.9, -1.8] * 4, np.float32)))
  rs1 = a1.init_robot_state(model, phys)
  rs = jax.tree.map(lambda x: jnp.tile(x[None], (E,) + (1,) * x.ndim), rs1)
  dyn1 = a1.default_dynamics(model)
  dyn = jax.tree.map(lambda x: jnp.tile(x[None], (E,) + (1,) * x.ndim), dyn1)
  cmd = jnp.tile(jnp.asarray(P.INIT_MOTOR_ANGLES, jnp.float32), (E, 1))
  boxes = jnp.zeros((E, 8, 8))
  fric = jnp.ones(E)

  new_rs, pen = robot_window_pallas(model, rs, cmd, dyn, boxes, fric, 16)

  # reference: stepwise with the same flat-ground contact + CG solver
  ts = terr.gen_plane(key)
  h, n = terr.flat_height_fn(ts)
  cfn = contact.make_terrain_contact_fn(h, n, boxes=jnp.zeros((8, 8)),
                                        friction=1.0, box_friction=1.0)
  model_d = a1.apply_dynamics(model, dyn1)

  @jax.jit
  def stepwise(rs):
    def body(rs, _):
      tau = a1.motor_torques(rs.phys.joint_q, rs.phys.joint_qd, cmd[0],
                             dyn1)
      phys, pen, _ = engine.step(model_d, rs.phys, tau, cfn, solver="cg")
      hist = jnp.concatenate(
          [a1._true_record(phys)[None], rs.obs_hist[:-1]], axis=0)
      return rs.replace(phys=phys, obs_hist=hist, observed_torques=tau,
                        step_counter=rs.step_counter + 1), pen
    rs, pens = jax.lax.scan(body, rs, None, length=16)
    return rs, pens[-1]

  ref_rs, ref_pen = stepwise(rs1)
  np.testing.assert_allclose(np.asarray(new_rs.phys.pos[0]),
                             np.asarray(ref_rs.phys.pos), atol=1e-5)
  np.testing.assert_allclose(np.asarray(new_rs.phys.joint_q[0]),
                             np.asarray(ref_rs.phys.joint_q), atol=1e-5)
  np.testing.assert_allclose(np.asarray(pen[0]), np.asarray(ref_pen),
                             atol=1e-5)
  # all tiled envs identical
  np.testing.assert_allclose(np.asarray(new_rs.phys.pos[1]),
                             np.asarray(new_rs.phys.pos[0]), atol=1e-6)
