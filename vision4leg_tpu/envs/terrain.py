"""Terrain generation + queries, fully on-device.

TPU-native rewrite of the reference's `TerrainRandomizer`
(vision4leg/envs/utilities/a1_randomizer_ground.py): instead of spawning
PyBullet bodies, each episode owns a `TerrainState` pytree — a heightfield
grid plus a fixed-size array of oriented boxes and subgoal spheres — that
the contact model, the depth raycaster and the tasks all query with pure
functions.  Regeneration on reset is a jittable function of the RNG key, so
terrain randomization lives inside the compiled rollout.

Reference geometry reproduced (file:line into a1_randomizer_ground.py):
  * random_blocks_sparse (+_with_subgoal/_thin_wide): 50 square pillars,
    half-extent 0.3/(2*sqrt2)*1.7+0.05 ~ 0.23 m, half-height 0.7, in the
    corridor x in [2.5, 28.5], y in [-3, 3] (Poisson-disc on reset,
    `_move_block_pos` :546-560), plus two fence walls at y = +-3.1
    (:614-652); `random_shape` perturbs sizes (:570-596).
  * moving obstacles: per-step displacement DIRECTION[d] * 3 with direction
    flips every 150 steps (:411-443, DIRECTION table :45-66).
  * random_heightfield: 256x256 grid, 2x2 cells sharing U(0, 0.1) heights,
    0.12 m cells, flat 10x10 (doubled) center patch, vertically centered
    (`_generate_field` :753-807 + PyBullet heightfield centering).
  * stairs: 7 overlapping slabs (half 2 x 25 x 0.2) at x = 2.75 + 0.44k,
    rising 0.1 m per step then descending (`_generate_stairs` :656-700).
  * subgoals: 50 spheres r=0.2 at U([2,-2.2],[30,2.2]) (:1076-1140).
  * mount: the reference's REAL wm_height_out.png geometry (:1011-1024),
    decoded once into the committed asset vision4leg_tpu/assets/
    mount_hf.npz (256x256 crop, 0.1 m cells, PyBullet vertical centering;
    see gen_mount / tools/gen_mount_asset.py).
  * hill: the reference's ground0.txt lives inside pybullet_data (not
    shipped with the reference, unavailable offline), so the hill is a
    procedurally generated gaussian landscape recalibrated to the
    reference's 0.2 z-scale (see gen_hill's amplitude-calibration note).

Poisson-disc sampling (PoissonDisc2D :69-242): the reference's pairwise
minimum-distance guarantee is reproduced with fixed-shape random
sequential adsorption inside jit (`_min_dist_points`); plain stratified
jittered-grid sampling remains only as the overflow fallback.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# --- static geometry constants (reference values) ---
NUM_SPARSE_BLOCKS = 50
SPARSE_HALF_LEN = 0.3 / (2 * math.sqrt(2)) * 1.7 + 0.05   # collision half-ext
SPARSE_HALF_HEIGHT = 0.7
FENCE_Y = 3.1
FENCE_HALF = (30.0 + 0.05, 0.3 / (2 * math.sqrt(2)) + 0.05,
              SPARSE_HALF_HEIGHT * 3)
NUM_SUBGOALS = 50
SUBGOAL_RADIUS = 0.2
HEIGHTFIELD_N = 256
HEIGHTFIELD_CELL = 0.12
HEIGHTFIELD_RANGE = 0.1  # env_builder passes height_range=0.1

# moving-obstacle direction table (a1_randomizer_ground.py:45-66), times the
# per-step scale 3 (:601 `_randomize_random_blocks_sparse`)
_DIRECTION = np.array([
    [0.005, 0], [-0.005, 0], [0, 0.005], [0, -0.005],
    [0.004, 0.004], [-0.004, 0.004], [0.004, -0.004], [-0.004, -0.004],
    [0.002, 0.006], [-0.002, 0.006], [0.002, -0.006], [-0.002, -0.006],
    [0.006, 0.002], [-0.006, 0.002], [0.006, -0.002], [-0.006, -0.002],
    [0, 0], [0, 0], [0, 0], [0, 0],
], np.float32) * 3.0
# direction flip map applied every 150 steps (:425-443): 0<->1, 2<->3,
# d>=4 -> re-randomized (here: uniform re-draw)
_FLIP = np.array([1, 0, 3, 2] + list(range(4, 20)), np.int32)


@struct.dataclass
class TerrainState:
  """Per-episode world geometry (all arrays fixed-size per config)."""
  height: jnp.ndarray        # (H, W) heightfield samples (meters)
  hf_cell: jnp.ndarray       # () cell size (m)
  hf_origin: jnp.ndarray     # (2,) world xy of grid index (0, 0)
  hf_zoff: jnp.ndarray       # () additive world z offset
  boxes: jnp.ndarray         # (K, 8): cx cy cz hx hy hz yaw valid
  box_dirs: jnp.ndarray      # (K,) int32 moving-direction indices
  subgoals: jnp.ndarray      # (S, 2) subgoal xy centers
  goal_pos: jnp.ndarray      # (3,) goal position (zeros if unused)
  # collision spheres [x, y, z, r, valid] (random_sphere_with_subgoal)
  obstacle_spheres: jnp.ndarray = None  # (Q, 5)


# test hook: force the MXU hat-weight bulk path (None = by backend)
FORCE_MXU_BULK = None


def flat_height_fn(terrain: TerrainState):
  del terrain
  def h(xy):
    return jnp.zeros(xy.shape[:-1])
  def n(xy):
    out = jnp.zeros(xy.shape[:-1] + (3,))
    return out.at[..., 2].set(1.0)
  return h, n


def heightfield_fns(terrain: TerrainState):
  """Bilinear height lookup + finite-difference normals.

  Lowering strategies, chosen by backend and STATIC query count — on this
  TPU backend a batched (vmapped per-env-grid) gather compiles to a
  per-element kLoop fusion at ~24 ns/element, which made one hill env
  step take ~12 s at 512 envs (4 corner gathers x 7 march chunks x 16.7M
  indices, each profiled at ~400 ms).  So:
    * small queries (the ~20 contact points per physics substep) use an
      exact one-hot bilinear einsum at highest precision — contact
      penetrations are millimeters, and the cost is negligible;
    * bulk TPU queries (the camera ray march) use the same hat-weight
      lookup FACTORED as a bf16 matmul on the MXU:
      rows = wx @ grid (interp along x for every y column), then a
      row-wise dot with wy — ~2 TFLOP per 512-env render instead of
      hours of serial gather DMAs (bf16 grid rounding costs ~1 cm of
      terrain height, refined no further by the bisection; the depth
      pipeline's sqrt-log quantization swamps it);
    * bulk CPU/GPU queries keep the exact 4-corner gather.
  """
  grid = terrain.height
  H, W = grid.shape
  cell = terrain.hf_cell
  SMALL_QUERY = 512
  mxu_bulk = (FORCE_MXU_BULK if FORCE_MXU_BULK is not None
              else jax.default_backend() == "tpu")

  def _coords(xy):
    gx = (xy[..., 0] - terrain.hf_origin[0]) / cell
    gy = (xy[..., 1] - terrain.hf_origin[1]) / cell
    # non-finite query coords (a diverged env's FK positions) must not
    # reach the gather: jnp.clip keeps NaN, floor(NaN)->int32 is garbage,
    # and a garbage-index gather DMA faults the TPU (observed as
    # UNAVAILABLE device errors on the hill terrains)
    gx = jnp.where(jnp.isfinite(gx), gx, 0.0)
    gy = jnp.where(jnp.isfinite(gy), gy, 0.0)
    gx = jnp.clip(gx, 0.0, H - 1.001)
    gy = jnp.clip(gy, 0.0, W - 1.001)
    return gx, gy

  def h(xy):
    gx, gy = _coords(xy)
    if math.prod(xy.shape[:-1]) <= SMALL_QUERY:
      # one-hot bilinear: hat weights max(0, 1-|g-i|) reproduce the
      # (1-f)/f corner weights exactly; contraction runs on the MXU
      wx = jnp.clip(1.0 - jnp.abs(gx[..., None] - jnp.arange(H)), 0.0, 1.0)
      wy = jnp.clip(1.0 - jnp.abs(gy[..., None] - jnp.arange(W)), 0.0, 1.0)
      return jnp.einsum("...i,ij,...j->...", wx, grid, wy,
                        precision="highest") + terrain.hf_zoff
    if mxu_bulk:
      # hat weights + rows stay bf16 (the big transients: P x 128 per
      # env; f32 weights OOM'd 512-env hill rollouts); the final
      # multiply-reduce upcasts inside the fusion and accumulates in f32
      wx = jnp.clip(1.0 - jnp.abs(gx[..., None] - jnp.arange(H)),
                    0.0, 1.0).astype(jnp.bfloat16)
      wy = jnp.clip(1.0 - jnp.abs(gy[..., None] - jnp.arange(W)),
                    0.0, 1.0).astype(jnp.bfloat16)
      rows = jnp.einsum("...i,ij->...j", wx, grid.astype(jnp.bfloat16),
                        preferred_element_type=jnp.bfloat16)
      return (jnp.sum(rows.astype(jnp.float32) * wy.astype(jnp.float32),
                      axis=-1) + terrain.hf_zoff)
    x0 = jnp.floor(gx).astype(jnp.int32)
    y0 = jnp.floor(gy).astype(jnp.int32)
    fx = gx - x0
    fy = gy - y0
    h00 = grid[x0, y0]
    h10 = grid[x0 + 1, y0]
    h01 = grid[x0, y0 + 1]
    h11 = grid[x0 + 1, y0 + 1]
    return ((h00 * (1 - fx) + h10 * fx) * (1 - fy)
            + (h01 * (1 - fx) + h11 * fx) * fy) + terrain.hf_zoff

  def n(xy):
    eps = cell
    dx = (h(xy + jnp.array([eps, 0.0])) - h(xy - jnp.array([eps, 0.0])))
    dy = (h(xy + jnp.array([0.0, eps])) - h(xy - jnp.array([0.0, eps])))
    nrm = jnp.stack([-dx, -dy, 2 * eps * jnp.ones_like(dx)], axis=-1)
    return nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)

  return h, n


def height_fns(terrain: TerrainState, flat: bool):
  return flat_height_fn(terrain) if flat else heightfield_fns(terrain)


# ---------------------------------------------------------------------------
# Generators (jittable, keyed)
# ---------------------------------------------------------------------------

def _empty(num_boxes: int, hf_n: int = 2, num_spheres: int = 0
           ) -> TerrainState:
  return TerrainState(
      height=jnp.zeros((hf_n, hf_n)),
      hf_cell=jnp.asarray(HEIGHTFIELD_CELL),
      hf_origin=jnp.asarray([-0.5 * hf_n * HEIGHTFIELD_CELL] * 2),
      hf_zoff=jnp.asarray(0.0),
      boxes=jnp.zeros((num_boxes, 8)),
      box_dirs=jnp.zeros((num_boxes,), jnp.int32),
      subgoals=jnp.zeros((NUM_SUBGOALS, 2)),
      goal_pos=jnp.zeros(3),
      obstacle_spheres=jnp.zeros((num_spheres, 5)),
  )


def gen_plane(key: jax.Array) -> TerrainState:
  del key
  return _empty(num_boxes=0)


def _jittered_corridor_points(key, n, lo, hi):
  """Stratified jittered sampling of n points in the box [lo, hi].

  lo/hi must be Python tuples (grid layout is static).
  """
  nx = int(math.ceil(math.sqrt(n * (hi[0] - lo[0]) / (hi[1] - lo[1]))))
  ny = int(math.ceil(n / nx))
  lo = jnp.asarray(lo)
  hi = jnp.asarray(hi)
  xs = jnp.linspace(lo[0], hi[0], nx + 1)[:-1]
  ys = jnp.linspace(lo[1], hi[1], ny + 1)[:-1]
  cw = jnp.array([(hi[0] - lo[0]) / nx, (hi[1] - lo[1]) / ny])
  gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
  cells = jnp.stack([gx.ravel(), gy.ravel()], axis=-1)[: n]
  k1, k2 = jax.random.split(key)
  jitter = jax.random.uniform(k1, (n, 2)) * cw
  pts = cells + jitter
  perm = jax.random.permutation(k2, n)
  return pts[perm]


def _min_dist_points(key, n, lo, hi, r, m):
  """n points in [lo, hi] with pairwise distance >= r, jittably.

  The reference spaces its corridor obstacles with Bridson Poisson-disc
  sampling (PoissonDisc2D, a1_randomizer_ground.py:69-242): every pair of
  obstacle centers is at least `min_radius` apart, which GUARANTEES
  walkable gaps between the boxes (used with r=1.0 for the sparse-block
  family via `_move_block_pos` :521 and r=1.1 for chair_desk :1868).
  Stratified jitter alone does not — adjacent samples can land arbitrarily
  close and fuse obstacles into impassable walls (measured: global min
  pairwise distance 0.08-0.25 m, ~20 % of obstacles with a neighbour
  closer than 0.6 m), which is what stalled chair_desk learning in r2/r3a.

  Bridson's dart-throwing is data-dependent, so here the same guarantee
  comes from fixed-shape random sequential adsorption: scan m uniform
  candidates in order, accepting each iff it is >= r from every previously
  accepted point.  m is sized so >= n acceptances are (empirically)
  certain — e.g. at r=1.1 over 26x6 m the RSA saturation is ~90 points and
  m=2048 accepts >= 87 across seeds.  Accepted points inherit the
  candidates' random order (the reference shuffles its Bridson output the
  same way).  Any unfilled tail falls back to stratified-jitter points.
  """
  k1, k2 = jax.random.split(key)
  lo_a = jnp.asarray(lo, jnp.float32)
  hi_a = jnp.asarray(hi, jnp.float32)
  cand = jax.random.uniform(k1, (m, 2), minval=lo_a, maxval=hi_a)
  sentinel = hi_a + 1e6  # farther than r from any candidate

  def body(carry, p):
    pts, cnt = carry
    ok = jnp.all(jnp.sum((pts - p) ** 2, axis=-1) >= r * r) & (cnt < n)
    upd = jax.lax.dynamic_update_slice(pts, p[None], (cnt, 0))
    return (jnp.where(ok, upd, pts), cnt + ok.astype(jnp.int32)), None

  init = (jnp.zeros((n, 2)) + sentinel, jnp.asarray(0, jnp.int32))
  (pts, cnt), _ = jax.lax.scan(body, init, cand, unroll=8)
  fallback = _jittered_corridor_points(k2, n, lo, hi)
  filled = (jnp.arange(n) < cnt)[:, None]
  return jnp.where(filled, pts, fallback)


def gen_blocks_sparse(key: jax.Array, random_shape: bool = False,
                      subgoal: bool = False, thin_wide: bool = False,
                      heightfield: bool = False) -> TerrainState:
  """random_blocks_sparse family: 50 pillars in a fenced corridor."""
  kb, ks, kh, kshape = jax.random.split(key, 4)
  n = NUM_SPARSE_BLOCKS
  # reference per-reset placement: PoissonDisc2D(26, 6, 1.0)
  # (`_move_block_pos` a1_randomizer_ground.py:521)
  centers = _min_dist_points(kb, n, (2.5, -3.0), (28.5, 3.0), r=1.0, m=512)
  half = jnp.tile(jnp.array([SPARSE_HALF_LEN, SPARSE_HALF_LEN,
                             SPARSE_HALF_HEIGHT]), (n, 1))
  cz = jnp.full((n,), SPARSE_HALF_HEIGHT)
  if random_shape:
    base_hl = 0.3 / (2 * math.sqrt(2))
    d_len = jax.random.uniform(kshape, (n, 2), minval=-0.01, maxval=0.2)
    d_h = jax.random.uniform(jax.random.fold_in(kshape, 1), (n,),
                             minval=-0.25, maxval=0.25)
    hl = (base_hl + d_len) * 1.7 + 0.05
    hh = SPARSE_HALF_HEIGHT + d_h
    half = jnp.concatenate([hl, hh[:, None]], axis=-1)
    cz = hh * 0.5  # reference buries random-shape blocks (:596)
  if thin_wide:
    # thin & wide obstacle mix: stretch half the blocks laterally
    wide = (jnp.arange(n) % 2 == 0)[:, None]
    half = jnp.where(wide, half * jnp.array([1.0, 3.0, 1.0]), half)
  blocks = jnp.concatenate(
      [centers, cz[:, None], half,
       jnp.zeros((n, 1)), jnp.ones((n, 1))], axis=-1)
  # fences at y = +-3.1
  fy = jnp.array(FENCE_HALF)
  fence = jnp.stack([
      jnp.concatenate([jnp.array([15.0, FENCE_Y, fy[2]]), fy,
                       jnp.zeros(1), jnp.ones(1)]),
      jnp.concatenate([jnp.array([15.0, -FENCE_Y, fy[2]]), fy,
                       jnp.zeros(1), jnp.ones(1)]),
  ])
  ts = _empty(num_boxes=0)
  hf = jnp.zeros((2, 2))
  zoff = jnp.asarray(0.0)
  origin = jnp.asarray([-0.12, -0.12])
  ncell = 2
  if heightfield:
    hf, origin, zoff, ncell = _random_heightfield_arrays(kh)
  subgoals = jax.random.uniform(
      ks, (NUM_SUBGOALS, 2), minval=jnp.array([2.0, -2.2]),
      maxval=jnp.array([30.0, 2.2]))
  return TerrainState(
      height=hf, hf_cell=jnp.asarray(HEIGHTFIELD_CELL),
      hf_origin=origin, hf_zoff=zoff,
      boxes=jnp.concatenate([blocks, fence], axis=0),
      box_dirs=jax.random.randint(jax.random.fold_in(kb, 7),
                                  (n + 2,), 0, 20).at[n:].set(16),
      subgoals=subgoals,
      goal_pos=jnp.zeros(3),
      obstacle_spheres=jnp.zeros((0, 5)),
  )


def _random_heightfield_arrays(key):
  """PyBullet-style random heightfield (`_generate_field`)."""
  n = HEIGHTFIELD_N
  half = n // 2
  h = jax.random.uniform(key, (half, half), minval=0.0,
                         maxval=HEIGHTFIELD_RANGE)
  # flat 10x10 block of 2x2-cells around the center (indices n/4 +- 5)
  c = half // 2
  ii = jnp.arange(half)
  mask = ((ii[:, None] >= c - 5) & (ii[:, None] < c + 5)
          & (ii[None] >= c - 5) & (ii[None] < c + 5))
  h = jnp.where(mask, 0.0, h)
  grid = jnp.repeat(jnp.repeat(h, 2, axis=0), 2, axis=1)
  # PyBullet centers the heightfield on its AABB midpoint at the body origin
  zoff = -(jnp.max(grid) + jnp.min(grid)) / 2.0
  origin = jnp.asarray([-0.5 * n * HEIGHTFIELD_CELL] * 2)
  return grid, origin, zoff, n


def gen_random_heightfield(key: jax.Array) -> TerrainState:
  grid, origin, zoff, _ = _random_heightfield_arrays(key)
  ts = _empty(num_boxes=0, hf_n=HEIGHTFIELD_N)
  return ts.replace(height=grid, hf_origin=origin, hf_zoff=zoff)


def gen_stairs(key: jax.Array) -> TerrainState:
  """7 overlapping slabs forming an up-then-down staircase; goal at x=10."""
  del key
  xs = 2.75 + 0.44 * np.array([0, 1, 2, 3, 4, 5, 6])
  lvl = np.array([1, 2, 3, 4, 3, 2, 1], np.float32)
  boxes = np.zeros((7, 8), np.float32)
  boxes[:, 0] = xs
  boxes[:, 2] = -0.2 + lvl * 0.10
  boxes[:, 3:6] = [2.0, 25.0, 0.2]
  boxes[:, 7] = 1.0
  ts = _empty(num_boxes=0)
  return ts.replace(boxes=jnp.asarray(boxes),
                    box_dirs=jnp.full((7,), 16, jnp.int32),
                    goal_pos=jnp.asarray([10.0, 0.0, 0.0]))


def _gaussian_landscape(key, n, cell, num_bumps, height_scale,
                        flat_radius, extent,
                        sigma_min=0.8, sigma_max=3.0):
  ks = jax.random.split(key, 3)
  centers = jax.random.uniform(ks[0], (num_bumps, 2), minval=-extent,
                               maxval=extent)
  sigmas = jax.random.uniform(ks[1], (num_bumps,), minval=sigma_min,
                              maxval=sigma_max)
  amps = jax.random.uniform(ks[2], (num_bumps,), minval=0.3,
                            maxval=1.0) * height_scale
  xs = (jnp.arange(n) - n / 2) * cell
  gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
  pts = jnp.stack([gx, gy], axis=-1)
  d2 = jnp.sum((pts[:, :, None, :] - centers[None, None]) ** 2, axis=-1)
  grid = jnp.sum(amps * jnp.exp(-d2 / (2 * sigmas**2)), axis=-1)
  # flatten the start area; the blend ramps over `ramp` meters with a
  # cosine profile so the ring around the start stays walkable (a linear
  # ramp over flat_radius added slope = h/flat_radius ~ 45 deg at 1.5 m
  # relief — the r1 hill's steepest feature).  NOTE this helper is shared
  # by gen_hill AND gen_mount, so the r2 recalibration also flattens the
  # mount's approach ring (full bump amplitude from r = flat_radius+4 m
  # instead of ~2 m) — intended for both: the reference's init-pose
  # tables place the robot on gentle ground for hill and mount alike.
  r = jnp.sqrt(gx**2 + gy**2)
  ramp = 4.0
  frac = jnp.clip((r - flat_radius) / ramp, 0.0, 1.0)
  grid = grid * 0.5 * (1.0 - jnp.cos(jnp.pi * frac))
  return grid


def gen_hill(key: jax.Array) -> TerrainState:
  """Procedural stand-in for heightmaps/ground0.txt (0.2 z-scale hills).

  Amplitude calibration (r2 hill-failure diagnosis): the reference loads
  pybullet_data's ground0.txt at meshScale [.2,.2,.2]
  (a1_randomizer_ground.py:995-1010) — the SAME file pybullet's own
  heightfield demo renders at z-scale 2.5, i.e. the reference's hills
  are ~12x gentler than the demo's.  Round 1 used height_scale=2.0
  (measured: mean slope 27 deg, p90 50 deg, max 68 deg) which no A1 can
  walk (hardware limit ~20-25 deg) — the policy never locomoted over
  10M steps.  Retuned to rolling hills: mean slope ~5 deg, p90 ~12 deg,
  max < 20 deg, total relief ~1 m over the 25.6 m grid, matching the
  0.2-z-scale reference scale."""
  n = 128
  cell = 0.2
  grid = _gaussian_landscape(key, n, cell, num_bumps=40, height_scale=0.35,
                             flat_radius=1.5, extent=11.0,
                             sigma_min=1.6, sigma_max=4.0)
  ts = _empty(num_boxes=0, hf_n=n)
  return ts.replace(height=grid, hf_cell=jnp.asarray(cell),
                    hf_origin=jnp.asarray([-n / 2 * cell, -n / 2 * cell]),
                    hf_zoff=jnp.asarray(0.0))


# --- the reference's real mount geometry ---------------------------------
# The reference builds the mount from a shipped 512x512 grayscale PNG
# (a1_randomizer_ground.py:1011-1024): heightmaps/wm_height_out.png at
# meshScale [0.1, 0.1, 15*MOUNT_LEVEL], body origin [2, 2, 2*MOUNT_LEVEL],
# mount_level pinned to 0 (:338) and MOUNT_LEVEL[0] = 1 (:310), goal sphere
# at GOAL_POS['mounts'][0] = [4, 11.5, 3.5] (:26-31).  PyBullet semantics
# reproduced: height = pixel * meshScale_z / 256, heightfield vertically
# centered on (min+max)/2, grid spanning (N-1)*cell centered on the body
# origin.  Orientation (image row = world y, no flip) was disambiguated by
# the reference's own placement constraints: robot init [1,1,1.56] stands
# 0.29 m above the decoded terrain (A1 stance height) and the goal sphere
# rests on the decoded slope; the 3 other flip conventions put the start
# 4 m underground or the goal floating.
_MOUNT_PNG = "/root/reference/vision4leg/assets/heightmaps/wm_height_out.png"
_MOUNT_CELL = 0.1
_MOUNT_CROP_I0 = 185      # crop start index: world x=y= 2+(185-255.5)*0.1
_MOUNT_N = 256            # 256 points -> x,y in [-5.05, 20.45] — covers the
                          # init pose (1,1), both goal candidates (max
                          # (4, 11.5)) and the camera horizon past them
MOUNT_GOAL_POS = (4.0, 11.5, 3.5)
_mount_grid_cache = None


def decode_mount_png(png_path: str = _MOUNT_PNG) -> np.ndarray:
  """Decode the reference's wm_height_out.png into the repo's mount grid
  (the generator behind assets/mount_hf.npz — tools/gen_mount_asset.py
  re-runs this against a reference checkout to regenerate the asset)."""
  from PIL import Image
  a = np.asarray(Image.open(png_path), dtype=np.float32)
  scale = 15.0 / 256.0
  z_center = (float(a.min()) + float(a.max())) * 0.5 * scale
  # a[row, col] = a[y_idx, x_idx]; repo grids index [x_idx, y_idx]
  full = a.T * scale - z_center + 2.0
  i0 = _MOUNT_CROP_I0
  return np.ascontiguousarray(full[i0:i0 + _MOUNT_N, i0:i0 + _MOUNT_N])


def _load_mount_grid():
  """The decoded reference mount grid, loaded once.

  Order: (1) the committed asset vision4leg_tpu/assets/mount_hf.npz —
  present in a standalone checkout, so this is the path that runs
  everywhere; (2) decoding the reference PNG directly (a checkout that
  predates the asset but sits next to /root/reference); (3) False — the
  caller falls back to the procedural stand-in, LOUDLY, because every
  mount result in README/PARITY was earned on the real geometry."""
  global _mount_grid_cache
  if _mount_grid_cache is None:
    import os.path as osp
    npz = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                   "assets", "mount_hf.npz")
    try:
      _mount_grid_cache = np.ascontiguousarray(
          np.load(npz)["height"].astype(np.float32))
    except Exception:
      try:
        _mount_grid_cache = decode_mount_png()
      except Exception:
        import warnings
        warnings.warn(
            "mount heightmap asset missing (vision4leg_tpu/assets/"
            "mount_hf.npz) and the reference PNG is unreachable — "
            "falling back to the PROCEDURAL mount stand-in, which is NOT "
            "the geometry the committed mount results were trained on. "
            "Regenerate the asset with tools/gen_mount_asset.py.",
            stacklevel=2)
        _mount_grid_cache = False
  return _mount_grid_cache


def gen_mount(key: jax.Array, goal: bool = True) -> TerrainState:
  """The reference's mount: real wm_height_out.png geometry when the asset
  is available (fixed world, like the reference — resets do not re-roll
  it), else a procedural single-peak stand-in with matching scale."""
  grid_np = _load_mount_grid()
  if grid_np is not False:
    n = _MOUNT_N
    origin = 2.0 + (_MOUNT_CROP_I0 - 255.5) * _MOUNT_CELL
    ts = _empty(num_boxes=0, hf_n=n)
    return ts.replace(
        height=jnp.asarray(grid_np), hf_cell=jnp.asarray(_MOUNT_CELL),
        hf_origin=jnp.asarray([origin, origin]),
        hf_zoff=jnp.asarray(0.0),
        goal_pos=jnp.asarray(MOUNT_GOAL_POS) if goal else jnp.zeros(3))
  n = 128
  cell = 0.2
  xs = (jnp.arange(n) - n / 2) * cell
  gx, gy = jnp.meshgrid(xs, xs, indexing="ij")
  peak = jnp.array([4.0, 11.5])
  d2 = (gx - peak[0]) ** 2 + (gy - peak[1]) ** 2
  grid = 3.0 * jnp.exp(-d2 / (2 * 4.0**2))
  bumps = _gaussian_landscape(key, n, cell, num_bumps=20, height_scale=0.4,
                              flat_radius=1.0, extent=10.0)
  grid = grid + bumps
  ts = _empty(num_boxes=0, hf_n=n)
  return ts.replace(
      height=grid, hf_cell=jnp.asarray(cell),
      hf_origin=jnp.asarray([-n / 2 * cell, -n / 2 * cell]),
      hf_zoff=jnp.asarray(0.0),
      goal_pos=jnp.asarray(MOUNT_GOAL_POS) if goal else jnp.zeros(3))




def gen_random_blocks(key: jax.Array) -> TerrainState:
  """random_blocks: 20 small blocks near the start
  (`_generate_convex_blocks` :469-520): centers U([0,-0.5],[5,0.5]),
  blocks near the origin dropped, side U(0.1, 0.2)/(2*sqrt2),
  height U(0.0375, 0.075)."""
  k1, k2, k3 = jax.random.split(key, 3)
  n = 20
  centers = jax.random.uniform(k1, (n, 2), minval=jnp.array([0.0, -0.5]),
                               maxval=jnp.array([5.0, 0.5]))
  half_len = jax.random.uniform(k2, (n,), minval=0.1,
                                maxval=0.2) / (2 * math.sqrt(2))
  half_h = jax.random.uniform(k3, (n,), minval=0.0375, maxval=0.075) / 2
  near_origin = (jnp.abs(centers[:, 0]) < 0.3) & (jnp.abs(centers[:, 1])
                                                  < 0.3)
  boxes = jnp.concatenate([
      centers, half_h[:, None],
      half_len[:, None], half_len[:, None], half_h[:, None],
      jnp.zeros((n, 1)), (~near_origin)[:, None].astype(jnp.float32),
  ], axis=-1)
  ts = _empty(num_boxes=0)
  return ts.replace(boxes=boxes, box_dirs=jnp.full((n,), 16, jnp.int32))


def gen_multi_stairs(key: jax.Array) -> TerrainState:
  """multi_stairs (`_generate_multi_stairs` :703-760): 1-5 staircases of 7
  slabs each, with per-staircase x noise (+-4 m) and step-height noise
  (0.05 +- 0.01); goal at x=20."""
  k1, k2, k3 = jax.random.split(key, 3)
  max_stairs = 5
  num = jax.random.randint(k1, (), 1, 6)
  noise = jax.random.uniform(k2, (max_stairs,), minval=-4.0, maxval=4.0)
  noise = noise.at[0].set(0.0)
  h_noise = jax.random.uniform(k3, (max_stairs,), minval=-0.01,
                               maxval=0.01)
  lvl = jnp.array([1, 2, 3, 4, 3, 2, 1], jnp.float32)
  offs = 0.44 * jnp.arange(7, dtype=jnp.float32)
  stair_i = jnp.repeat(jnp.arange(max_stairs), 7)        # (35,)
  slab_j = jnp.tile(jnp.arange(7), max_stairs)
  xs = noise[stair_i] + 6.75 * stair_i + 2.75 + offs[slab_j]
  zs = -0.2 + lvl[slab_j] * (0.05 + h_noise[stair_i])
  valid = (stair_i < num).astype(jnp.float32)
  boxes = jnp.stack([
      xs, jnp.zeros_like(xs), zs,
      jnp.full_like(xs, 2.0), jnp.full_like(xs, 25.0),
      jnp.full_like(xs, 0.2),
      jnp.zeros_like(xs), valid], axis=-1)
  ts = _empty(num_boxes=0)
  return ts.replace(boxes=boxes,
                    box_dirs=jnp.full((35,), 16, jnp.int32),
                    goal_pos=jnp.asarray([20.0, 0.0, 0.0]))


def gen_thin_wide(key: jax.Array) -> TerrainState:
  """random_blocks_sparse_thin_wide (`_generate_convex_blocks_thin_wide`
  :1652-1930): fixed wide slabs — (2, +-0.75) half (0.3, 0.45, 0.5) and a
  7-row pattern at (5+7i, 0) / (8+7i, +-1.8) half (0.3, 0.85, 0.5) — plus
  50 thin pillars and the corridor fences."""
  kb, ks = jax.random.split(key)
  wide = []
  for cy_ in (0.75, -0.75):
    wide.append([2.0, cy_, 0.5, 0.3, 0.45, 0.5, 0.0, 1.0])
  for i in range(7):
    wide.append([5.0 + 7 * i, 0.0, 0.5, 0.3, 0.85, 0.5, 0.0, 1.0])
    wide.append([8.0 + 7 * i, -1.8, 0.5, 0.3, 0.85, 0.5, 0.0, 1.0])
    wide.append([8.0 + 7 * i, 1.8, 0.3, 0.85, 0.5, 0.5, 0.0, 1.0])
  wide = jnp.asarray(wide, jnp.float32)
  # fix the row built with swapped fields above
  wide = wide.at[:, 2].set(0.5)
  wide = wide.at[:, 3].set(0.3)
  wide = wide.at[:, 4].set(jnp.where(jnp.arange(wide.shape[0]) < 2, 0.45,
                                     0.85))
  wide = wide.at[:, 5].set(0.5)
  n = NUM_SPARSE_BLOCKS
  # thin pillars share the sparse family's per-reset Poisson placement
  # (`_move_block_pos` a1_randomizer_ground.py:521, r=1.0)
  centers = _min_dist_points(kb, n, (2.5, -3.0), (28.5, 3.0), r=1.0, m=512)
  thin = jnp.concatenate([
      centers, jnp.full((n, 1), SPARSE_HALF_HEIGHT),
      jnp.full((n, 2), SPARSE_HALF_LEN),
      jnp.full((n, 1), SPARSE_HALF_HEIGHT),
      jnp.zeros((n, 1)), jnp.ones((n, 1))], axis=-1)
  fy = jnp.array(FENCE_HALF)
  fence = jnp.stack([
      jnp.concatenate([jnp.array([15.0, FENCE_Y, fy[2]]), fy,
                       jnp.zeros(1), jnp.ones(1)]),
      jnp.concatenate([jnp.array([15.0, -FENCE_Y, fy[2]]), fy,
                       jnp.zeros(1), jnp.ones(1)]),
  ])
  boxes = jnp.concatenate([wide, thin, fence], axis=0)
  k_dirs = jax.random.fold_in(kb, 7)
  ts = _empty(num_boxes=0)
  subgoals = jax.random.uniform(
      ks, (NUM_SUBGOALS, 2), minval=jnp.array([2.0, -2.2]),
      maxval=jnp.array([30.0, 2.2]))
  return ts.replace(
      boxes=boxes,
      box_dirs=jax.random.randint(
          k_dirs, (boxes.shape[0],), 0, 20).at[:wide.shape[0]].set(16)
      .at[-2:].set(16),
      subgoals=subgoals)


def gen_spheres_with_subgoal(key: jax.Array) -> TerrainState:
  """random_sphere_with_subgoal (`_generate_spheres_and_subgoal`
  :1249-1310): 50 r=0.2 sphere obstacles in [2,-3]..[16,3] + subgoals."""
  kq, ks = jax.random.split(key)
  n = 50
  centers = jax.random.uniform(kq, (n, 2), minval=jnp.array([2.0, -3.0]),
                               maxval=jnp.array([16.0, 3.0]))
  spheres = jnp.concatenate([
      centers, jnp.full((n, 1), SUBGOAL_RADIUS),
      jnp.full((n, 1), SUBGOAL_RADIUS), jnp.ones((n, 1))], axis=-1)
  subgoals = jax.random.uniform(
      ks, (NUM_SUBGOALS, 2), minval=jnp.array([2.0, -2.2]),
      maxval=jnp.array([30.0, 2.2]))
  ts = _empty(num_boxes=0, num_spheres=n)
  return ts.replace(obstacle_spheres=spheres, subgoals=subgoals)


# chair_desk geometry, decoded from the reference assets (r3 chair_desk
# diagnosis — the r2 approximation used 50 oversized chairs + 50
# pass-under desk compounds independently sampled, i.e. a denser and
# differently-shaped world than the reference, and the policy never
# learned on it; eval max 70):
#   * obstacles are URDF meshes placed with ornObj=[1, 0, 0, 1]
#     (`_move_chair_desk_and_subgoal_pos` :1886-1906) — an UNNORMALIZED
#     quaternion = 90 deg about x: the furniture is TIPPED OVER;
#   * chair (model.obj bounds x globalScaling 8 x urdf scale .1):
#     local half (0.183, 0.324, 0.147) -> world half (0.183, 0.147, 0.324)
#     at z 0.34 — a solid block resting on the ground;
#   * desk (globalScaling 17): local half (0.300, 0.289, 0.741) -> world
#     half (0.300, 0.741, 0.289) at z 0.24 — a solid low slab, slightly
#     embedded; NOT a pass-under table;
#   * 50 chairs + 30 desks (`_generate_chair_desk` :1976-2006), one JOINT
#     Poisson-disc sampling (min spacing 1.1 m, PoissonDisc2D(26, 6, 1.1)
#     :1868) shifted to x in [2.5, 28.5], y in [-3, 3] — chairs take the
#     first 50 centers, desks the next 30, so they never overlap;
#   * two fence walls, half (30.05, 0.156, 0.5) at (15, +-3, z 0.5)
#     (:2013-2058); no subgoals (self.subgoal excludes chair_desk, :365).
_CHAIR_HALF = (0.183, 0.147, 0.324)
_CHAIR_Z = 0.34
_DESK_HALF = (0.300, 0.741, 0.289)
_DESK_Z = 0.24
_CD_FENCE_HALF = (30.0 + 0.05, 0.3 / (2 * math.sqrt(2)) + 0.05, 0.5)


def gen_chair_desk(key: jax.Array) -> TerrainState:
  """random_chair_desk: 50 tipped-over chairs + 30 tipped-over desks in a
  fenced corridor (geometry decoded from the reference assets, above)."""
  nc, nd = 50, 30
  # reference per-reset placement: PoissonDisc2D(26, 6, 1.1)
  # (`_move_chair_desk_and_subgoal_pos` a1_randomizer_ground.py:1868)
  centers = _min_dist_points(key, nc + nd, (2.5, -3.0), (28.5, 3.0),
                             r=1.1, m=2048)
  chairs_xy, desks_xy = centers[:nc], centers[nc:]
  chairs = jnp.concatenate([
      chairs_xy, jnp.full((nc, 1), _CHAIR_Z),
      jnp.tile(jnp.asarray(_CHAIR_HALF), (nc, 1)),
      jnp.zeros((nc, 1)), jnp.ones((nc, 1))], axis=-1)
  desks = jnp.concatenate([
      desks_xy, jnp.full((nd, 1), _DESK_Z),
      jnp.tile(jnp.asarray(_DESK_HALF), (nd, 1)),
      jnp.zeros((nd, 1)), jnp.ones((nd, 1))], axis=-1)
  fences = jnp.asarray([
      [15.0, y, _CD_FENCE_HALF[2], *_CD_FENCE_HALF, 0.0, 1.0]
      for y in (3.0, -3.0)])
  boxes = jnp.concatenate([chairs, desks, fences], axis=0)
  ts = _empty(num_boxes=0)
  return ts.replace(boxes=boxes,
                    box_dirs=jnp.full((boxes.shape[0],), 16, jnp.int32))


def moving_blocks_step(terrain: TerrainState, step_counter: jnp.ndarray,
                       key: jax.Array, num_moving: int) -> TerrainState:
  """Per-step obstacle displacement + 150-step direction flips
  (a1_randomizer_ground.py:411-443)."""
  dirs = terrain.box_dirs
  disp = jnp.asarray(_DIRECTION)[dirs]          # (K, 2)
  moving_mask = (jnp.arange(dirs.shape[0]) < num_moving)[:, None]
  boxes = terrain.boxes.at[:, 0:2].add(disp * moving_mask)
  flip = (step_counter % 150) == 0
  flipped = jnp.asarray(_FLIP)[dirs]
  rand = jax.random.randint(key, dirs.shape, 0, 20)
  new_dirs = jnp.where(dirs >= 4, rand, flipped)
  dirs = jnp.where(flip, jnp.where(moving_mask[:, 0], new_dirs, dirs), dirs)
  return terrain.replace(boxes=boxes, box_dirs=dirs)


TERRAIN_GENERATORS = {
    "plane": gen_plane,
    "random_blocks": gen_random_blocks,
    "random_blocks_sparse": lambda k: gen_blocks_sparse(k),
    "random_blocks_sparse_with_subgoal":
        lambda k: gen_blocks_sparse(k, subgoal=True),
    "random_blocks_sparse_thin_wide": gen_thin_wide,
    "random_blocks_sparse_and_heightfield":
        lambda k: gen_blocks_sparse(k, heightfield=True),
    "random_blocks_sparse_with_subgoal_heightfield":
        lambda k: gen_blocks_sparse(k, subgoal=True, heightfield=True),
    "random_heightfield": gen_random_heightfield,
    "stairs": gen_stairs,
    "multi_stairs": gen_multi_stairs,
    "random_sphere_with_subgoal": gen_spheres_with_subgoal,
    "random_chair_desk": gen_chair_desk,
    "random_hill": gen_hill,
    "random_mount": lambda k: gen_mount(k, goal=False),
    "mount": lambda k: gen_mount(k, goal=True),
}

# Per-terrain cap on boxes kept by the camera's frustum prune.  The prune
# keeps the CAP nearest (by view depth) boxes intersecting the frustum
# truncated at the 10 m depth clip, so rendering is exact as long as no
# camera pose ever sees more than CAP boxes.  Measured over random
# poses/seeds (tools/ablate_rollout.py methodology): the sparse corridor
# terrains peak at 5-6 in-frustum boxes (thin obstacles on a 30 m strip),
# chair_desk at 10; multi_stairs legitimately shows all 35 steps.  The
# (rays x boxes) slab test is the single hottest rollout op, so the cap
# directly scales the camera cost.
RENDER_BOX_CAPS = {
    "random_blocks_sparse": 16,
    "random_blocks_sparse_with_subgoal": 16,
    "random_blocks_sparse_thin_wide": 16,
    "random_blocks_sparse_and_heightfield": 16,
    "random_blocks_sparse_with_subgoal_heightfield": 16,
    "random_chair_desk": 24,
}

# terrains whose ground is the flat z=0 plane (fast path for contact/camera)
FLAT_TERRAINS = frozenset([
    "plane", "random_blocks", "random_blocks_sparse",
    "random_blocks_sparse_with_subgoal", "random_blocks_sparse_thin_wide",
    "stairs", "multi_stairs", "random_sphere_with_subgoal",
    "random_chair_desk",
])

# per-type init pose (QUADRUPED_INIT_POSITION, a1_randomizer_ground.py:286)
INIT_POSITION = {
    "plane": (0, 0, 0.32),
    "random_blocks": (0, 0, 0.32),
    "random_blocks_sparse": (0, 0, 0.32),
    "random_heightfield": (0, 0, 0.32),
    "stairs": (-0.15, 0, 0.32),
    "random_blocks_sparse_and_heightfield": (0, 0, 0.32),
    "random_blocks_sparse_with_subgoal_heightfield": (0, 0, 0.32),
    "random_blocks_sparse_with_subgoal": (0, 0, 0.32),
    "random_blocks_sparse_thin_wide": (0, 0, 0.32),
    "random_hill": (0, 0, 2.25),
    "multi_stairs": (1.0, 0, 0.42),
    "random_sphere_with_subgoal": (0, 0, 0.32),
    "random_chair_desk": (0, 0, 0.32),
    "mount": (1, 1, 1.56),
    "random_mount": (1, 1, 1.56),
}


def gen_triangle_mesh(key: jax.Array) -> TerrainState:
  """triangle_mesh terrain: the reference loads terrain9735.obj with
  mesh_scale [0.6, 0.3, 0.2] (`_load_triangle_mesh` :444, env_builder
  :300-307); here the mesh is pre-rasterized into a heightfield asset
  (vision4leg_tpu/assets/terrain9735_hf.npz, derived from the obj)."""
  del key
  import os.path as osp
  path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                  "assets", "terrain9735_hf.npz")
  data = np.load(path)
  grid = jnp.asarray(data["height"])
  origin = jnp.asarray(data["origin"])
  cell = float(data["cell"][0])
  ts = _empty(num_boxes=0, hf_n=grid.shape[0])
  return ts.replace(height=grid, hf_cell=jnp.asarray(cell),
                    hf_origin=origin, hf_zoff=jnp.asarray(0.0))


TERRAIN_GENERATORS["triangle_mesh"] = gen_triangle_mesh
INIT_POSITION["triangle_mesh"] = (0, 0, 0.45)
