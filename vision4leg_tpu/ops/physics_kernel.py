"""Pallas TPU mega-kernel: the full action-repeat physics window.

The measured rollout bottleneck is per-op overhead: one substep of the
rigid-body engine is ~300 small XLA ops (FK levels, Jacobians, mass
matrix, contacts, CG solve), each touching tiny (B, 3..18) tensors — at
batch 1024 a substep costs ~2.7 ms while doing only ~50 MFLOP.  This
kernel runs the ENTIRE `robot_step` window (action_repeat substeps, PD
motor model included) for a tile of environments inside one Pallas
program: all intermediates stay in VMEM and the ~300-op chain compiles
to straight-line VPU code instead of dispatched XLA kernels.

Inside the kernel the math is the env-LAST formulation from
`ops/physics_envlast.py`: the environment axis is the TPU lane axis, so
every scalar operation of the physics is a full-width vector op over
TILE_E environments (see that module's docstring for why env-first
layouts are both slow and un-lowerable here).  Numerical parity with the
vmapped engine is tested in tests/test_physics_kernel.py; non-TPU
backends fall back to the identical-math XLA path.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from vision4leg_tpu.ops import physics_envlast as pe
from vision4leg_tpu.physics import contact as contact_lib
from vision4leg_tpu.physics import engine
from vision4leg_tpu.physics.model import Model
from vision4leg_tpu.robots import a1

try:
  from jax.experimental import pallas as pl
  from jax.experimental.pallas import tpu as pltpu
  HAS_PALLAS = True
except ImportError:  # pragma: no cover
  HAS_PALLAS = False

TILE_E = 128

# fixed leaf order for the env-last dicts crossing the kernel boundary
RS_KEYS = ("pos", "quat", "q", "ang", "lin", "qd", "hist", "obs_tau",
           "last_action", "counter")
DYN_KEYS = ("kp", "kd", "strength", "motor_friction", "joint_friction",
            "mass_scale", "inertia_scale")


def _rs_to_envlast(rs: a1.RobotState) -> dict:
  t = lambda x: jnp.moveaxis(x, 0, -1)
  return dict(
      pos=t(rs.phys.pos), quat=t(rs.phys.quat), q=t(rs.phys.joint_q),
      ang=t(rs.phys.ang), lin=t(rs.phys.lin), qd=t(rs.phys.joint_qd),
      hist=t(rs.obs_hist), obs_tau=t(rs.observed_torques),
      last_action=t(rs.last_robot_action), counter=rs.step_counter)


def _rs_from_envlast(d: dict) -> a1.RobotState:
  t = lambda x: jnp.moveaxis(x, -1, 0)
  return a1.RobotState(
      phys=engine.PhysState(pos=t(d["pos"]), quat=t(d["quat"]),
                            joint_q=t(d["q"]), ang=t(d["ang"]),
                            lin=t(d["lin"]), joint_qd=t(d["qd"])),
      obs_hist=t(d["hist"]), observed_torques=t(d["obs_tau"]),
      last_robot_action=t(d["last_action"]), step_counter=d["counter"])


def _dyn_to_envlast(dyn: a1.DynamicsParams) -> dict:
  t = lambda x: jnp.moveaxis(x, 0, -1)
  return dict(
      kp=t(dyn.kp), kd=t(dyn.kd), strength=t(dyn.strength_ratios),
      motor_friction=dyn.motor_friction, joint_friction=dyn.joint_friction,
      mass_scale=t(dyn.mass_scale), inertia_scale=t(dyn.inertia_scale))


def _window_math(model: Model, rs: a1.RobotState, command, dyn,
                 boxes, spheres, fric_ground, fric_box, n_substeps: int,
                 interpolate: bool, tau_ff=None, tau_mask=None):
  """One env's full action-repeat window — env-first XLA fallback with
  semantics identical to a1.robot_step followed by the env's post-window
  contact read (flat ground + pruned boxes, CG solver)."""
  h_fn = lambda xy: jnp.zeros(xy.shape[:-1])

  def n_fn(xy):
    shape = xy.shape[:-1] + (3,)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return (col == 2).astype(xy.dtype)

  cfn = contact_lib.make_terrain_contact_fn(
      h_fn, n_fn, boxes=boxes,
      spheres=spheres if spheres.shape[0] > 0 else None,
      friction=fric_ground, box_friction=fric_box)
  model_d = a1.apply_dynamics(model, dyn)
  prev = rs.last_robot_action

  def body(i, rs):
    if interpolate:
      lerp = (i.astype(jnp.float32) + 1.0) / n_substeps
      cmd = prev + lerp * (command - prev)
    else:
      cmd = command
    tau = a1.motor_torques(rs.phys.joint_q, rs.phys.joint_qd, cmd, dyn)
    if tau_ff is not None:
      tau = (1.0 - tau_mask) * tau + tau_mask * tau_ff
    phys, _, _ = engine.step(model_d, rs.phys, tau, cfn, solver="cg")
    hist = jnp.concatenate([a1._true_record(phys)[None], rs.obs_hist[:-1]],
                           axis=0)
    return rs.replace(phys=phys, obs_hist=hist, observed_torques=tau,
                      step_counter=rs.step_counter + 1)

  rs = jax.lax.fori_loop(0, n_substeps, body, rs)
  rs = rs.replace(last_robot_action=command)
  # post-window contact state (pybullet getContactPoints semantics)
  kin = engine.fwd_kinematics(model_d, rs.phys)
  cpos, cvel, _ = engine.contact_points_world(model_d, rs.phys, kin)
  _, pen_end = cfn(cpos, cvel, model.cp_radius)
  return rs, pen_end


@functools.partial(jax.jit, static_argnums=(8, 9, 10))
def robot_window_pallas(model: Model, rs: a1.RobotState, command, dyn,
                        boxes, spheres, fric_ground, fric_box,
                        n_substeps: int, interpolate: bool = False,
                        force_kernel: bool = False, tau_ff=None,
                        tau_mask=None
                        ) -> Tuple[a1.RobotState, jnp.ndarray]:
  """Batched a1.robot_step window + post-window contact read (flat
  ground + per-env pruned boxes).

  rs/command/dyn/boxes/fric_* carry a leading env axis; returns
  (new RobotState, pen_end (E, P, 2) — [ground, obstacle] penetration of
  the post-window state, the contact input of tasks.done).

  tau_ff/tau_mask (E, 12), optional: hybrid control (MPC env) — torque =
  (1-mask)*PD(command) + mask*tau_ff, both fixed across the window.

  Uses the env-last Pallas mega-kernel on TPU when the env count divides
  TILE_E; otherwise the identical math runs as vmapped XLA.
  """
  E = command.shape[0]
  hybrid = tau_ff is not None

  # multi-chip: GSPMD cannot partition a pallas_call over a sharded env
  # axis.  env.step_batch wraps this call in shard_map (one kernel per
  # shard, force_kernel=True); a bare multi-device call takes the
  # vmapped-XLA window, which GSPMD shards cleanly.
  if (not HAS_PALLAS or jax.default_backend() not in ("tpu",)
      or (jax.device_count() > 1 and not force_kernel)
      or E % TILE_E != 0):
    if hybrid:
      new_rs, pen_end = jax.vmap(
          lambda r, c, d, b, sp, fg, fb, tf, tm: _window_math(
              model, r, c, d, b, sp, fg, fb, n_substeps, interpolate,
              tf, tm))(
              rs, command, dyn, boxes, spheres, fric_ground, fric_box,
              tau_ff, tau_mask)
    else:
      new_rs, pen_end = jax.vmap(
          lambda r, c, d, b, sp, fg, fb: _window_math(
              model, r, c, d, b, sp, fg, fb, n_substeps, interpolate))(
              rs, command, dyn, boxes, spheres, fric_ground, fric_box)
    return new_rs, pen_end

  rs_el = _rs_to_envlast(rs)
  dyn_el = _dyn_to_envlast(dyn)
  T = E // TILE_E

  def to_tiles(x):
    """(..., E) -> (T, ..., TILE_E): the tile index becomes a LEADING grid
    dim — blocking the lane (minormost) axis itself crashes Mosaic.  1D
    (E,) leaves gain a singleton axis so the tile dim stays out of the
    last-two window (whose block dims must equal the array dims)."""
    x = x.reshape(x.shape[:-1] + (T, TILE_E))
    x = jnp.moveaxis(x, -2, 0)
    if x.ndim == 2:
      x = x[:, None, :]
    return x

  def from_tiles(x, was_1d=False):
    if was_1d:
      x = x[:, 0, :]
    x = jnp.moveaxis(x, 0, -2)
    return x.reshape(x.shape[:-2] + (E,))

  rs_1d = tuple(rs_el[k].ndim == 1 for k in RS_KEYS)
  dyn_1d = tuple(dyn_el[k].ndim == 1 for k in DYN_KEYS)
  rs_leaves = [to_tiles(rs_el[k]) for k in RS_KEYS]
  dyn_leaves = [to_tiles(dyn_el[k]) for k in DYN_KEYS]
  mdl_leaves, mdl_def = jax.tree_util.tree_flatten(model)
  n_rs, n_dyn, n_mdl = len(rs_leaves), len(dyn_leaves), len(mdl_leaves)
  n_in = n_rs + 1 + n_dyn + n_mdl + 4 + (2 if hybrid else 0)
  cmd_el = to_tiles(jnp.moveaxis(command, 0, -1))
  boxes_el = to_tiles(jnp.moveaxis(boxes, 0, -1))
  # zero-width sphere arrays still need a nonzero minor dim for tiling
  if spheres.shape[1] == 0:
    spheres = jnp.zeros((E, 1, 5), spheres.dtype)
    sph_valid = False
  else:
    sph_valid = True
  sph_el = to_tiles(jnp.moveaxis(spheres, 0, -1))
  fg_el = to_tiles(jnp.asarray(fric_ground))
  fb_el = to_tiles(jnp.asarray(fric_box))
  hyb_el = ([to_tiles(jnp.moveaxis(tau_ff, 0, -1)),
             to_tiles(jnp.moveaxis(tau_mask, 0, -1))] if hybrid else [])

  def kernel(*refs):
    ins = refs[:n_in]
    outs = refs[n_in:]
    pos = 0
    rs_t = {k: (ins[pos + i][0, 0] if rs_1d[i] else ins[pos + i][0])
            for i, k in enumerate(RS_KEYS)}
    pos += n_rs
    cmd = ins[pos][0]
    pos += 1
    dyn_t = {k: (ins[pos + i][0, 0] if dyn_1d[i] else ins[pos + i][0])
             for i, k in enumerate(DYN_KEYS)}
    pos += n_dyn
    # model arrays must enter as kernel inputs: Pallas kernels may not
    # capture non-scalar constants
    mdl = jax.tree_util.tree_unflatten(
        mdl_def, [r[:] for r in ins[pos: pos + n_mdl]])
    pos += n_mdl
    bxs = ins[pos][0]
    sph = ins[pos + 1][0] if sph_valid else None
    fg = ins[pos + 2][0, 0]
    fb = ins[pos + 3][0, 0]
    tff = ins[pos + 4][0] if hybrid else None
    tmk = ins[pos + 5][0] if hybrid else None
    new_rs, pen_end = pe.window(mdl, rs_t, cmd, dyn_t, bxs, sph, fg, fb,
                                n_substeps, interpolate, tff, tmk)
    for o, k, one_d in zip(outs[:-1], RS_KEYS, rs_1d):
      v = new_rs[k].astype(o.dtype)
      o[:] = v[None, None] if one_d else v[None]
    outs[-1][:] = pen_end[None]

  grid = (T,)

  def tspec(x):
    """One tile per grid step along the leading tile axis."""
    nd = x.ndim
    blk = (1,) + x.shape[1:]
    return pl.BlockSpec(blk, lambda i, nd=nd: (i,) + (0,) * (nd - 1),
                        memory_space=pltpu.VMEM)

  def fspec(x):
    nd = x.ndim
    return pl.BlockSpec(x.shape, lambda i, nd=nd: (0,) * nd,
                        memory_space=pltpu.VMEM)

  in_arrays = (rs_leaves + [cmd_el] + dyn_leaves + mdl_leaves
               + [boxes_el, sph_el, fg_el, fb_el] + hyb_el)
  in_specs = ([tspec(x) for x in rs_leaves] + [tspec(cmd_el)]
              + [tspec(x) for x in dyn_leaves]
              + [fspec(x) for x in mdl_leaves]
              + [tspec(boxes_el), tspec(sph_el), tspec(fg_el),
                 tspec(fb_el)] + [tspec(x) for x in hyb_el])
  out_arrays = rs_leaves + [jnp.zeros((T, model.ncp, 2, TILE_E),
                                      jnp.float32)]
  out_shapes = tuple(jax.ShapeDtypeStruct(x.shape, x.dtype)
                     for x in out_arrays)
  out_specs = tuple(tspec(x) for x in out_arrays)

  outs = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_specs,
      out_shape=out_shapes,
  )(*in_arrays)
  new_el = dict(zip(RS_KEYS, [from_tiles(o, one_d)
                              for o, one_d in zip(outs[:-1], rs_1d)]))
  new_rs = _rs_from_envlast(new_el)
  pen_end = jnp.moveaxis(from_tiles(outs[-1]), -1, 0)        # (E, P, 2)
  return new_rs, pen_end
