"""Contact fidelity on inclined heightfield terrain (r2 hill diagnosis).

physics/contact.py measures ground penetration as the VERTICAL gap
(`phi = h(xy) - (z - r)`, plane-local approximation) while pushing along
the true surface normal.  On a slope of angle t this overestimates the
normal penetration by 1/cos(t) (~6% at 20 deg) — a stiffness scale, not a
force-direction error.  These tests pin down that the approximation keeps
statics and sliding physical on reference-scale slopes (the retuned hill:
mean ~7 deg, p90 ~13 deg; A1 hardware limit ~20-25 deg):

  * a PD-held A1 standing on a 15 deg and a 20 deg ramp must settle and
    hold (no slide, no sink-through, no energy blow-up),
  * with near-zero friction it must slide downhill (the tangential force
    really follows the slope),
  * a frictionless sphere-like probe on the ramp must feel a force along
    the surface normal, not vertical.

Ref behavior: PyBullet LCP contact on GEOM_HEIGHTFIELD
(a1_randomizer_ground.py:995-1010); the reference trusts it untested.
"""
import jax
import jax.numpy as jnp
import numpy as np

from vision4leg_tpu.envs import terrain as terr
from vision4leg_tpu.envs.env import A1GymEnv, EnvConfig
from vision4leg_tpu.physics import contact, maths
from vision4leg_tpu.robots import a1


def _ramp(angle_deg: float, n: int = 96, cell: float = 0.2):
  """Uniform ramp rising along +x: h = tan(angle) * x."""
  xs = (jnp.arange(n) - n / 2) * cell
  grid = jnp.tile((jnp.tan(jnp.deg2rad(angle_deg)) * xs)[:, None], (1, n))
  ts = terr._empty(num_boxes=0, hf_n=n)
  return ts.replace(height=grid, hf_cell=jnp.asarray(cell),
                    hf_origin=jnp.asarray([-n / 2 * cell, -n / 2 * cell]),
                    hf_zoff=jnp.asarray(0.0))


def _standing_on_ramp(env, angle_deg: float, friction: float):
  """Settled standing template dropped onto the ramp at the origin, then
  PD-held at INIT_MOTOR_ANGLES. Returns (model, rs0, dyn, contact_fn)."""
  ts = _ramp(angle_deg)
  h_fn, n_fn = terr.heightfield_fns(ts)
  cfn = contact.make_terrain_contact_fn(h_fn, n_fn, friction=friction)
  template = env.settled_template()
  pos = template.phys.pos
  ground = h_fn(pos[None, :2])[0]
  phys = template.phys.replace(pos=pos.at[2].add(ground))
  rs = a1.init_robot_state(env.model, phys)
  dyn = a1.default_dynamics(env.model)
  return env.model, rs, dyn, cfn


def _env():
  return A1GymEnv(EnvConfig(
      motor_control_mode="POSITION", clip_num=(0.05, 0.5, 0.5) * 4,
      time_step_s=0.0025, num_action_repeat=4, diagonal_act=True,
      terrain_type="plane", settle_steps=200))


def _roll_hold(model, rs, dyn, cfn, n_windows: int):
  cmd = rs.phys.joint_q  # hold the settled pose

  @jax.jit
  def run(rs):
    def body(rs, _):
      rs, _ = a1.robot_step(model, rs, cmd, dyn, cfn, action_repeat=4)
      return rs, (rs.phys.pos, rs.phys.lin)
    return jax.lax.scan(body, rs, None, length=n_windows)
  return run(rs)


def test_a1_holds_station_on_15_and_20_deg_ramps():
  """PD-held standing on a ramp: bounded downhill creep, slope-aligned
  posture, no sink-through, no energy injection.

  Regularized Coulomb friction (contact.py v_slip=0.02) cannot produce
  true static friction: at equilibrium the stance creeps downhill at
  v = v_slip * tan(angle) / mu (~0.7 cm/s at 15 deg, mu=0.8).  The creep
  must match that model within a small factor — creep faster than a few
  cm/s would mean slopes are effectively icy for the policy (measured
  r2: ~1.5 cm/s at 15 deg, 1000x slower than the 1 m/s gait target)."""
  env = _env()
  for angle in (15.0, 20.0):
    model, rs, dyn, cfn = _standing_on_ramp(env, angle, friction=0.8)
    # settle 1.0 s (drop transient + posture sag), then measure 1.0 s
    rs, _ = _roll_hold(model, rs, dyn, cfn, n_windows=100)
    p0 = np.asarray(rs.phys.pos)
    rs, (pos_tr, lin_tr) = _roll_hold(model, rs, dyn, cfn, n_windows=100)
    p1 = np.asarray(rs.phys.pos)
    creep = np.linalg.norm(p1[:2] - p0[:2])  # meters over 1 s
    v_model = 0.02 * np.tan(np.deg2rad(angle)) / 0.8
    assert creep < 5.0 * v_model + 0.02, (
        f"{angle} deg: creep {creep:.3f} m/s vs model {v_model:.4f}")
    # posture: body z-axis within slope angle + 12 deg sag of vertical
    R = np.asarray(maths.quat_to_mat(rs.phys.quat[None])[0])
    min_zz = np.cos(np.deg2rad(angle + 12.0))
    assert R[2, 2] > min_zz, f"{angle} deg: tipped over (Rzz={R[2,2]:.3f})"
    # no sink-through: trunk stays a leg-length above local ground
    h_local = float(np.tan(np.deg2rad(angle)) * p1[0])
    assert p1[2] - h_local > 0.12, f"{angle} deg: sank to {p1[2] - h_local}"
    # no energy injection: speeds stay small throughout the hold
    assert float(jnp.max(jnp.abs(lin_tr))) < 0.6, "velocity blow-up"


def test_a1_slides_downhill_without_friction():
  env = _env()
  model, rs, dyn, cfn = _standing_on_ramp(env, 20.0, friction=0.02)
  x0 = float(rs.phys.pos[0])
  rs, _ = _roll_hold(model, rs, dyn, cfn, n_windows=150)  # 1.5 s
  x1 = float(rs.phys.pos[0])
  # ramp rises along +x, so sliding means x decreases
  assert x1 < x0 - 0.10, f"expected downhill slide, moved {x1 - x0:.3f} m"


def test_contact_force_points_along_slope_normal():
  ts = _ramp(20.0)
  h_fn, n_fn = terr.heightfield_fns(ts)
  cfn = contact.make_terrain_contact_fn(h_fn, n_fn, friction=0.0)
  # static probe point 1 cm below the surface at x=1
  x = 1.0
  z = float(jnp.tan(jnp.deg2rad(20.0)) * x) - 0.01
  pos = jnp.array([[x, 0.0, z + 0.02]])   # radius 0.02 sphere center
  vel = jnp.zeros((1, 3))
  force, phi = jax.jit(cfn)(pos, vel, jnp.array([0.02]))
  f = np.asarray(force[0])
  n_expect = np.asarray(n_fn(pos[:, :2])[0])
  f_norm = f / np.linalg.norm(f)
  # frictionless: force exactly along the surface normal
  np.testing.assert_allclose(f_norm, n_expect, atol=1e-5)
  # normal tilted by the ramp angle, not vertical
  assert abs(n_expect[2] - np.cos(np.deg2rad(20.0))) < 1e-4
  assert float(phi[0, 0]) > 0.0
