"""Pallas TPU mega-kernel: the full action-repeat physics window.

The measured rollout bottleneck is per-op overhead: one substep of the
rigid-body engine is ~300 small XLA ops (FK levels, Jacobians, mass
matrix, contacts, CG solve), each touching tiny (B, 3..18) tensors — at
batch 1024 a substep costs ~2.7 ms while doing only ~50 MFLOP.  This
kernel runs the ENTIRE `robot_step` window (action_repeat x substeps,
PD motor model included) for a tile of environments inside one Pallas
program: all intermediates stay in VMEM/registers and the ~300-op chain
compiles to straight-line VPU code instead of dispatched XLA kernels.

The kernel body reuses the engine's math verbatim (vmapped over the env
tile) with the CG dynamics solver (engine.solve_spd_cg) — LAPACK-style
cho_factor does not lower in Mosaic.  Parity with the XLA path is tested
in tests/test_physics_kernel.py; non-TPU backends fall back to XLA.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

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


def _window_math(model: Model, rs: a1.RobotState, command, dyn,
                 boxes, friction, n_substeps: int):
  """One env's full action-repeat window (a1.robot_step equivalent for the
  flat-ground fast path with pruned obstacle boxes)."""
  h_fn = lambda xy: jnp.zeros(xy.shape[:-1])

  def n_fn(xy):
    # up-vector built from a 2D iota: array literals become captured
    # constants (rejected by pallas_call) and scatters/gathers don't lower
    shape = xy.shape[:-1] + (3,)
    col = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    return (col == 2).astype(xy.dtype)

  cfn = contact_lib.make_terrain_contact_fn(
      h_fn, n_fn, boxes=boxes, friction=friction, box_friction=friction)
  model_d = a1.apply_dynamics(model, dyn)

  def body(_, carry):
    rs, _last_pen = carry
    tau = a1.motor_torques(rs.phys.joint_q, rs.phys.joint_qd, command, dyn)
    phys, pen, _ = engine.step(model_d, rs.phys, tau, cfn, solver="cg")
    hist = jnp.concatenate([a1._true_record(phys)[None], rs.obs_hist[:-1]],
                           axis=0)
    return rs.replace(phys=phys, obs_hist=hist, observed_torques=tau,
                      step_counter=rs.step_counter + 1), pen

  # fori_loop carrying only the last penetration: Mosaic rejects scans
  # with stacked outputs, and only pen[-1] is consumed downstream
  pen0 = jnp.zeros((model.ncp, 2))
  rs, pen = jax.lax.fori_loop(0, n_substeps, body, (rs, pen0))
  return rs, pen


def _flatten_rs(rs: a1.RobotState):
  leaves, treedef = jax.tree_util.tree_flatten(rs)
  return leaves, treedef


@functools.partial(jax.jit, static_argnums=(6,))
def robot_window_pallas(model: Model, rs: a1.RobotState, command, dyn,
                        boxes, friction, n_substeps: int
                        ) -> Tuple[a1.RobotState, jnp.ndarray]:
  """Batched robot_step window. rs/command/dyn/boxes/friction carry a
  leading env axis; returns (new RobotState, last-substep penetration).

  Uses the Pallas mega-kernel on TPU when the env count divides TILE_E;
  otherwise the identical math runs as vmapped XLA.
  """
  E = command.shape[0]

  def vmapped(rs, command, dyn, boxes, friction):
    return jax.vmap(
        lambda r, c, d, b, f: _window_math(model, r, c, d, b, f,
                                           n_substeps))(
            rs, command, dyn, boxes, friction)

  if (not HAS_PALLAS or jax.default_backend() not in ("tpu",)
      or E % TILE_E != 0):
    return vmapped(rs, command, dyn, boxes, friction)

  rs_leaves, rs_def = jax.tree_util.tree_flatten(rs)
  dyn_leaves, dyn_def = jax.tree_util.tree_flatten(dyn)
  mdl_leaves, mdl_def = jax.tree_util.tree_flatten(model)
  n_rs = len(rs_leaves)
  n_dyn = len(dyn_leaves)
  n_mdl = len(mdl_leaves)
  pen_shape = (E, model.ncp, 2)
  n_in = n_rs + n_dyn + n_mdl + 3

  def kernel(*refs):
    ins = refs[:n_in]
    outs = refs[n_in:]
    pos = 0
    rs_t = jax.tree_util.tree_unflatten(
        rs_def, [r[:] for r in ins[pos: pos + n_rs]])
    pos += n_rs
    cmd = ins[pos][:]
    pos += 1
    dyn_t = jax.tree_util.tree_unflatten(
        dyn_def, [r[:] for r in ins[pos: pos + n_dyn]])
    pos += n_dyn
    # the model must enter as kernel inputs: Pallas kernels may not
    # capture array constants
    mdl = jax.tree_util.tree_unflatten(
        mdl_def, [r[:] for r in ins[pos: pos + n_mdl]])
    pos += n_mdl
    bxs = ins[pos][:]
    fric = ins[pos + 1][:]
    new_rs, pen = jax.vmap(
        lambda r, c, d, b, f: _window_math(mdl, r, c, d, b, f,
                                           n_substeps))(
            rs_t, cmd, dyn_t, bxs, fric)
    new_leaves = jax.tree_util.tree_leaves(new_rs)
    for o, v in zip(outs[:-1], new_leaves):
      o[:] = v.astype(o.dtype)
    outs[-1][:] = pen

  grid = (E // TILE_E,)

  def spec(x):
    blk = (TILE_E,) + x.shape[1:]
    nd = x.ndim
    return pl.BlockSpec(blk, lambda i, nd=nd: (i,) + (0,) * (nd - 1),
                        memory_space=pltpu.VMEM)

  def full_spec(x):
    nd = x.ndim
    return pl.BlockSpec(x.shape, lambda i, nd=nd: (0,) * nd,
                        memory_space=pltpu.VMEM)

  in_arrays = (rs_leaves + [command] + dyn_leaves + mdl_leaves
               + [boxes, friction])
  in_specs = ([spec(x) for x in rs_leaves] + [spec(command)]
              + [spec(x) for x in dyn_leaves]
              + [full_spec(x) for x in mdl_leaves]
              + [spec(boxes), spec(friction)])
  out_shapes = ([jax.ShapeDtypeStruct(x.shape, x.dtype)
                 for x in rs_leaves]
                + [jax.ShapeDtypeStruct(pen_shape, jnp.float32)])
  out_specs = ([spec(x) for x in rs_leaves]
               + [spec(jnp.zeros(pen_shape))])

  outs = pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=tuple(out_specs),
      out_shape=tuple(out_shapes),
  )(*in_arrays)
  new_rs = jax.tree_util.tree_unflatten(rs_def, list(outs[:-1]))
  return new_rs, outs[-1]
