"""Parity tests for the Pallas physics window kernel.

On CPU these exercise (a) the env-first vmapped-XLA fallback through the
public entry point and (b) the env-last math module (the exact code the
TPU kernel runs) — both against a stepwise a1.robot_step-equivalent
reference.  The TPU pallas_call path itself is timed/validated by
scripts and bench on real hardware (same math, same module).
"""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.ops import physics_envlast as pe
from vision4leg_tpu.ops.physics_kernel import (
    _dyn_to_envlast, _rs_to_envlast, robot_window_pallas)
from vision4leg_tpu.physics import contact, engine
from vision4leg_tpu.envs import terrain as terr
from vision4leg_tpu.robots import a1, a1_model, a1_params as P


def _setup(E):
  model = a1_model.build(dt=0.0025)
  phys = engine.zero_state(model).replace(
      pos=jnp.array([0.0, 0.0, 0.27]),
      joint_q=jnp.asarray(np.array([0, 0.9, -1.8] * 4, np.float32)))
  rs1 = a1.init_robot_state(model, phys)
  rs = jax.tree.map(lambda x: jnp.tile(x[None], (E,) + (1,) * x.ndim), rs1)
  dyn1 = a1.default_dynamics(model)
  dyn = jax.tree.map(lambda x: jnp.tile(x[None], (E,) + (1,) * x.ndim), dyn1)
  cmd = jnp.tile(jnp.asarray(P.INIT_MOTOR_ANGLES, jnp.float32), (E, 1))
  boxes = jnp.zeros((E, 8, 8))
  # one real box near the front toes to exercise the box-contact path
  boxes = boxes.at[:, 0].set(
      jnp.array([0.15, 0.0, 0.05, 0.1, 0.1, 0.05, 0.3, 1.0]))
  # one sphere obstacle clipping a rear toe (sphere-contact path)
  spheres = jnp.zeros((E, 2, 5))
  spheres = spheres.at[:, 0].set(jnp.array([-0.18, 0.13, 0.0, 0.12, 1.0]))
  fric = jnp.ones(E)
  return model, rs1, rs, dyn1, dyn, cmd, boxes, spheres, fric


def _stepwise_reference(model, rs1, dyn1, cmd, boxes1, spheres1):
  """a1.robot_step-equivalent: flat ground + boxes + spheres, CG solver."""
  ts = terr.gen_plane(jax.random.PRNGKey(0))
  h, n = terr.flat_height_fn(ts)
  cfn = contact.make_terrain_contact_fn(h, n, boxes=boxes1, spheres=spheres1,
                                        friction=1.0, box_friction=1.0)
  model_d = a1.apply_dynamics(model, dyn1)

  @jax.jit
  def run(rs):
    def body(rs, _):
      tau = a1.motor_torques(rs.phys.joint_q, rs.phys.joint_qd, cmd, dyn1)
      phys, pen, _ = engine.step(model_d, rs.phys, tau, cfn, solver="cg")
      hist = jnp.concatenate(
          [a1._true_record(phys)[None], rs.obs_hist[:-1]], axis=0)
      return rs.replace(phys=phys, obs_hist=hist, observed_torques=tau,
                        step_counter=rs.step_counter + 1), pen
    rs, _ = jax.lax.scan(body, rs, None, length=16)
    # post-window contact read (what env.step / the kernel report)
    kin = engine.fwd_kinematics(model_d, rs.phys)
    cpos, cvel, _ = engine.contact_points_world(model_d, rs.phys, kin)
    _, pen_end = cfn(cpos, cvel, model.cp_radius)
    return rs, pen_end

  return run(rs1)


def test_window_matches_stepwise():
  """The public entry (vmapped-XLA fallback on CPU) must equal the
  stepwise robot_step semantics, including window-wide contact flags."""
  model, rs1, rs, dyn1, dyn, cmd, boxes, spheres, fric = _setup(4)
  new_rs, pen_end = robot_window_pallas(model, rs, cmd[0][None].repeat(
      4, 0), dyn, boxes, spheres, fric, fric, 16)
  ref_rs, ref_pen = _stepwise_reference(model, rs1, dyn1, cmd[0],
                                        boxes[0], spheres[0])
  np.testing.assert_allclose(np.asarray(new_rs.phys.pos[0]),
                             np.asarray(ref_rs.phys.pos), atol=1e-5)
  np.testing.assert_allclose(np.asarray(new_rs.phys.joint_q[0]),
                             np.asarray(ref_rs.phys.joint_q), atol=1e-5)
  np.testing.assert_allclose(np.asarray(pen_end[0]), np.asarray(ref_pen),
                             atol=1e-5)
  # all tiled envs identical
  np.testing.assert_allclose(np.asarray(new_rs.phys.pos[1]),
                             np.asarray(new_rs.phys.pos[0]), atol=1e-6)


def test_envlast_window_matches_stepwise():
  """The env-last math (what actually runs inside the TPU kernel) must
  match the same stepwise reference."""
  model, rs1, rs, dyn1, dyn, cmd, boxes, spheres, fric = _setup(4)
  rs_el = _rs_to_envlast(rs)
  dyn_el = _dyn_to_envlast(dyn)
  t = lambda x: jnp.moveaxis(x, 0, -1)

  new_el, pen_el = jax.jit(
      lambda r, c, d, b, sp, f: pe.window(model, r, c, d, b, sp, f, f, 16))(
          rs_el, t(cmd), dyn_el, t(boxes), t(spheres), fric)
  ref_rs, ref_pen = _stepwise_reference(model, rs1, dyn1, cmd[0],
                                        boxes[0], spheres[0])
  np.testing.assert_allclose(np.asarray(new_el["pos"][:, 0]),
                             np.asarray(ref_rs.phys.pos), atol=1e-5)
  np.testing.assert_allclose(np.asarray(new_el["q"][:, 0]),
                             np.asarray(ref_rs.phys.joint_q), atol=1e-5)
  # velocities through the stiff sphere/box contact are chaotic in f32:
  # op-order noise amplifies; positions above pin the math to 1e-5
  np.testing.assert_allclose(np.asarray(new_el["qd"][:, 0]),
                             np.asarray(ref_rs.phys.joint_qd), atol=6e-3)
  np.testing.assert_allclose(np.asarray(new_el["hist"][..., 0]),
                             np.asarray(ref_rs.obs_hist), atol=6e-3)
  np.testing.assert_allclose(np.asarray(pen_el[..., 0]),
                             np.asarray(ref_pen), atol=1e-4)


def test_envlast_interpolation():
  """Action interpolation must match a1.robot_step(interpolate=True)."""
  model, rs1, rs, dyn1, dyn, cmd, boxes, spheres, fric = _setup(4)
  target = cmd[0] + 0.1
  ts = terr.gen_plane(jax.random.PRNGKey(0))
  h, n = terr.flat_height_fn(ts)
  cfn = contact.make_terrain_contact_fn(h, n, boxes=boxes[0],
                                        friction=1.0, box_friction=1.0)

  # engine path (engine.step inside robot_step uses the cholesky solver;
  # rebuild stepwise with CG to isolate layout parity from solver choice)
  model_d = a1.apply_dynamics(model, dyn1)
  prev = rs1.last_robot_action

  @jax.jit
  def ref(rs):
    def body(rs, i):
      lerp = (i.astype(jnp.float32) + 1.0) / 16
      c = prev + lerp * (target - prev)
      tau = a1.motor_torques(rs.phys.joint_q, rs.phys.joint_qd, c, dyn1)
      phys, pen, _ = engine.step(model_d, rs.phys, tau, cfn, solver="cg")
      hist = jnp.concatenate(
          [a1._true_record(phys)[None], rs.obs_hist[:-1]], axis=0)
      return rs.replace(phys=phys, obs_hist=hist, observed_torques=tau,
                        step_counter=rs.step_counter + 1), None
    return jax.lax.scan(body, rs, jnp.arange(16))[0]

  ref_rs = ref(rs1)
  rs_el = _rs_to_envlast(rs)
  dyn_el = _dyn_to_envlast(dyn)
  t = lambda x: jnp.moveaxis(x, 0, -1)
  new_el, _ = jax.jit(
      lambda r, c, d, b, f: pe.window(model, r, c, d, b, None, f, f, 16,
                                      interpolate=True))(
          rs_el, t(jnp.tile(target, (4, 1))), dyn_el, t(boxes), fric)
  np.testing.assert_allclose(np.asarray(new_el["pos"][:, 0]),
                             np.asarray(ref_rs.phys.pos), atol=1e-5)
  np.testing.assert_allclose(np.asarray(new_el["q"][:, 0]),
                             np.asarray(ref_rs.phys.joint_q), atol=1e-5)
