"""Device-side depth camera: analytic raycasting on TPU.

Replaces PyBullet's EGL `getCameraImage` 64x64 depth render
(locomotion_gym_env_with_rich_information.py:569-632) with an exact
ray-intersection renderer against the TerrainState geometry (ground
plane / heightfield, obstacle boxes, subgoal spheres).  The output matches
the reference's *linearized* depth (view-axis z-distance), so the entire
calibrated preprocessing chain — blind spots, clip [0.3, 10],
sqrt(log(d+1)), (x - 1.25)/0.425 normalization — carries over unchanged.

Camera model (reference :572-607):
  * eye at trunk position + 0.2309 m along the trunk x-axis,
  * view direction (x_axis - z_axis)/2 and up (x_axis + z_axis)/2 — i.e. a
    45-degree downward pitch relative to the body,
  * hardcoded projection with P00=1.0825318, P11=1.7320509 (vertical FOV
    60 deg, aspect 1.6), near=0.01, far=1000.

Rays are parameterized as d = f + (u/P00) r + (v/P11) u_hat so that the hit
parameter t *is* the view-axis depth the reference computes via
far*near/(far-(far-near)*zbuf).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from vision4leg_tpu.envs.terrain import TerrainState, SUBGOAL_RADIUS

IMG_SIZE = 64
P00 = 1.0825318098068237   # proj[0,0] (ref :585)
P11 = 1.732050895690918    # proj[1,1]
T_MISS = 1000.0 * 0.01 / (1000.0 - 999.99)  # ~ depth of zbuf=1 (background)


def camera_rays(trunk_pos: jnp.ndarray, trunk_rot: jnp.ndarray):
  """Eye position + (H*W, 3) ray directions with unit forward component."""
  x_axis = trunk_rot[:, 0]
  z_axis = trunk_rot[:, 2]
  eye = trunk_pos + 0.2309 * x_axis
  fwd = 0.5 * (x_axis - z_axis)
  up = 0.5 * (x_axis + z_axis)
  f = fwd / jnp.linalg.norm(fwd)
  r = jnp.cross(f, up)
  r = r / jnp.linalg.norm(r)
  u = jnp.cross(r, f)
  px = (jnp.arange(IMG_SIZE) + 0.5) / IMG_SIZE * 2.0 - 1.0   # ndc x
  py = 1.0 - (jnp.arange(IMG_SIZE) + 0.5) / IMG_SIZE * 2.0   # ndc y (row 0 top)
  gx, gy = jnp.meshgrid(px, py, indexing="xy")               # (H, W)
  # OpenGL: ndc_x = P00 * x_cam / (-z_cam) => x_cam/depth = ndc_x / P00
  dirs = (f[None, None]
          + (gx / P00)[..., None] * r[None, None]
          + (gy / P11)[..., None] * u[None, None])           # (H, W, 3)
  return eye, dirs.reshape(-1, 3)


# depth preprocessing clips at 10 m (preprocess_depth), and every ray has
# UNIT forward component, so the hit parameter t is view-axis depth: an
# object whose minimum view depth exceeds the clip produces pixels
# identical to background (both clip to 10).  Culling such objects before
# the per-ray tests is therefore EXACT, and on the 30 m corridor terrains
# it roughly halves the (rays x objects) work.
DEPTH_CLIP = 10.0
MAX_RENDER_BOXES = 40
MAX_RENDER_SPHERES = 32


def _prune_rows(rows, eye, f, r_ax, u_ax, centers, bound_r, valid, k: int):
  """Keep the K rows nearest in view depth; mask culled rows invalid.

  Sphere-vs-frustum culling with the frustum truncated at the depth clip:
  a culled object lies entirely outside the view cone or entirely past
  the clip plane, so it cannot change any post-clip pixel (conservative —
  extras may be kept, visibles are never dropped as long as fewer than K
  objects intersect the truncated frustum, which the cone geometry bounds
  on every shipped terrain)."""
  if rows.shape[0] <= k:
    return rows, valid
  d = centers - eye[None]                                    # (K0, 3)
  ax = jnp.sum(d * f[None], axis=-1)
  lr = jnp.sum(d * r_ax[None], axis=-1)
  lu = jnp.sum(d * u_ax[None], axis=-1)
  a_max, b_max = 1.0 / P00, 1.0 / P11
  na = jnp.sqrt(1.0 + a_max ** 2)
  nb = jnp.sqrt(1.0 + b_max ** 2)
  cull = ((ax - bound_r > DEPTH_CLIP + 0.2)                  # past the clip
          | (ax + bound_r < -0.01)                           # behind
          | ((lr - a_max * ax) / na > bound_r + 0.01)        # right of cone
          | ((-lr - a_max * ax) / na > bound_r + 0.01)       # left
          | ((lu - b_max * ax) / nb > bound_r + 0.01)        # above
          | ((-lu - b_max * ax) / nb > bound_r + 0.01)       # below
          | (valid < 0.5))
  key = jnp.where(cull, jnp.inf, ax)
  _, idx = jax.lax.top_k(-key, k)
  return rows[idx], jnp.where(jnp.isinf(key[idx]), 0.0, 1.0)


def _ray_plane_t(eye, dirs, height: jnp.ndarray):
  """t of intersection with horizontal plane z=height (inf if none)."""
  dz = dirs[:, 2]
  t = (height - eye[2]) / jnp.where(jnp.abs(dz) < 1e-9, -1e-9, dz)
  return jnp.where(t > 0, t, jnp.inf)


def _ray_boxes_t(eye, dirs, boxes):
  """Min positive t over K yaw-oriented boxes. boxes: (K, 8).

  Slab test carried out per axis on (N, K) arrays (never materializing a
  trailing component axis): the largest live intermediate is N x K, which
  keeps the vmapped (env-batched) version HBM-friendly on TPU.
  """
  c, half, yaw, valid = (boxes[:, 0:3], boxes[:, 3:6], boxes[:, 6],
                         boxes[:, 7])
  cy, sy = jnp.cos(yaw), jnp.sin(yaw)
  # eye in each box frame (yaw about z): (K,)
  eo = eye[None] - c
  e0 = cy * eo[:, 0] + sy * eo[:, 1]
  e1 = -sy * eo[:, 0] + cy * eo[:, 1]
  e2 = eo[:, 2]
  # ray directions in each box frame: (N, K)
  d0 = cy[None] * dirs[:, 0:1] + sy[None] * dirs[:, 1:2]
  d1 = -sy[None] * dirs[:, 0:1] + cy[None] * dirs[:, 1:2]
  d2 = jnp.broadcast_to(dirs[:, 2:3], d0.shape)

  tmin = jnp.full(d0.shape, -jnp.inf)
  tmax = jnp.full(d0.shape, jnp.inf)
  for e, d, h in ((e0, d0, half[:, 0]), (e1, d1, half[:, 1]),
                  (e2, d2, half[:, 2])):
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t1 = (-h[None] - e[None]) * inv
    t2 = (h[None] - e[None]) * inv
    tmin = jnp.maximum(tmin, jnp.minimum(t1, t2))
    tmax = jnp.minimum(tmax, jnp.maximum(t1, t2))
  hit = (tmax >= jnp.maximum(tmin, 0.0)) & (valid[None] > 0.5)
  t = jnp.where(hit, jnp.maximum(tmin, 1e-4), jnp.inf)
  return jnp.min(t, axis=-1)                             # (N,)


def _ray_spheres_t(eye, dirs, centers, radius, active):
  """Min positive t over S spheres. centers: (S, 3), active: (S,)."""
  oc = eye[None] - centers                               # (S, 3)
  d2 = jnp.sum(dirs * dirs, axis=-1)                     # (N,)
  b = jnp.einsum("ni,si->ns", dirs, oc)                  # (N, S)
  cterm = jnp.sum(oc * oc, axis=-1)[None] - radius**2    # (1->N, S)
  disc = b * b - d2[:, None] * cterm
  sq = jnp.sqrt(jnp.maximum(disc, 0.0))
  t = (-b - sq) / d2[:, None]
  hit = (disc > 0) & (t > 0) & (active[None] > 0.5)
  return jnp.min(jnp.where(hit, t, jnp.inf), axis=-1)


def _ray_heightfield_t(eye, dirs, height_fn, n_steps: int = 56,
                       chunk: int = 2, far_t: float = 10.5):
  """Fixed-step ray march against a height function, then 8 bisections.

  The march scans over step-chunks so the live intermediate is
  (rays, chunk) instead of (rays, n_steps): the bilinear height lookup
  gathers four grid corners per sample, and materializing those for the
  full march volume across a 1024-env vmap is several GB of HBM (it
  OOM'd the v5e on the random_hill config); chunked, the peak transient
  shrinks by n_steps/chunk while total work is unchanged.

  far_t: depth preprocessing clips at 10 m and every ray has unit
  forward component, so a hit with t > 10 renders identically to a miss
  after the clip — marching past ~10.5 m is pure waste (the reference
  marches its zbuffer to the far plane but the clip erases it too)."""
  ts = jnp.linspace(0.05, far_t, n_steps)                # (S,)
  prev = jnp.concatenate([jnp.zeros((1,)), ts[:-1]])     # step s-1 (0 at s=0)
  n_chunks = n_steps // chunk
  ts_c = ts[:n_chunks * chunk].reshape(n_chunks, chunk)
  prev_c = prev[:n_chunks * chunk].reshape(n_chunks, chunk)
  n_rays = dirs.shape[0]

  def march(carry, tc):
    found, t_lo, t_hi = carry
    ts_k, prev_k = tc                                    # (C,), (C,)
    pts = eye[None, None, :] + ts_k[None, :, None] * dirs[:, None, :]
    below = pts[..., 2] <= height_fn(pts[..., :2])       # (N, C)
    hit = jnp.any(below, axis=-1)
    first = jnp.argmax(below, axis=-1)                   # first True in chunk
    new = hit & ~found
    t_lo = jnp.where(new, prev_k[first], t_lo)
    t_hi = jnp.where(new, ts_k[first], t_hi)
    return (found | hit, t_lo, t_hi), None

  # unrolled: a lax.scan here (nested inside the rollout's reset-cond
  # inside the epoch scan) reproducibly faults the v5e — the sequential
  # carry still bounds live memory to one chunk's intermediates
  carry = (jnp.zeros(n_rays, bool), jnp.zeros(n_rays), jnp.zeros(n_rays))
  for i in range(n_chunks):
    carry, _ = march(carry, (ts_c[i], prev_c[i]))
  any_hit, t_lo, t_hi = carry

  for _ in range(8):
    mid = 0.5 * (t_lo + t_hi)
    p = eye[None] + mid[:, None] * dirs
    under = p[:, 2] <= height_fn(p[:, :2])
    t_lo, t_hi = jnp.where(under, t_lo, mid), jnp.where(under, mid, t_hi)
  return jnp.where(any_hit, 0.5 * (t_lo + t_hi), jnp.inf)


def render_depth(trunk_pos: jnp.ndarray, trunk_rot: jnp.ndarray,
                 terrain: TerrainState, height_fn, flat: bool,
                 show_subgoals: bool,
                 max_boxes: int | None = None,
                 far_t: float = 10.5) -> jnp.ndarray:
  """(64, 64) linearized depth (view-axis meters), background ~inf->far.

  max_boxes: frustum-prune cap; None means the module-level
  MAX_RENDER_BOXES read at CALL time (late-bound so tests can override
  the global, like the sphere cap below).
  far_t: heightfield march range.  10.5 is post-clip exact only when the
  depth passes preprocess_depth's 10 m clip (cfg.depth_image=True); the
  env passes 20.0 (the raw far plane) when it doesn't."""
  if max_boxes is None:
    max_boxes = MAX_RENDER_BOXES
  eye, dirs = camera_rays(trunk_pos, trunk_rot)
  # exact view frame (rays are f + offsets in the image plane, so the hit
  # parameter t of any ray equals dot(hit - eye, f): true view depth)
  fwd = 0.5 * (trunk_rot[:, 0] - trunk_rot[:, 2])
  up0 = 0.5 * (trunk_rot[:, 0] + trunk_rot[:, 2])
  f_axis = fwd / jnp.linalg.norm(fwd)
  r_axis = jnp.cross(f_axis, up0)
  r_axis = r_axis / jnp.linalg.norm(r_axis)
  u_axis = jnp.cross(r_axis, f_axis)
  if flat:
    t = _ray_plane_t(eye, dirs, jnp.asarray(0.0))
  else:
    t = _ray_heightfield_t(eye, dirs, height_fn, far_t=far_t)
  if terrain.boxes.shape[0] > 0:
    boxes = terrain.boxes
    if boxes.shape[0] > max_boxes:
      br = jnp.linalg.norm(boxes[:, 3:6], axis=-1)
      boxes, v = _prune_rows(boxes, eye, f_axis, r_axis, u_axis,
                             boxes[:, 0:3], br, boxes[:, 7],
                             max_boxes)
      boxes = boxes.at[:, 7].set(jnp.minimum(boxes[:, 7], v))
    t = jnp.minimum(t, _ray_boxes_t(eye, dirs, boxes))
  if (terrain.obstacle_spheres is not None
      and terrain.obstacle_spheres.shape[0] > 0):
    q = terrain.obstacle_spheres
    if q.shape[0] > MAX_RENDER_SPHERES:
      q, v = _prune_rows(q, eye, f_axis, r_axis, u_axis, q[:, 0:3],
                         q[:, 3], q[:, 4], MAX_RENDER_SPHERES)
      q = q.at[:, 4].set(jnp.minimum(q[:, 4], v))
    t = jnp.minimum(
        t, _ray_spheres_t(eye, dirs, q[:, 0:3], q[:, 3], q[:, 4]))
  if show_subgoals:
    centers = jnp.concatenate(
        [terrain.subgoals,
         jnp.full((terrain.subgoals.shape[0], 1), SUBGOAL_RADIUS)], axis=-1)
    # subgoal spheres sit at z = radius; hidden ones were made transparent
    # (move_forward_task.py:180-184) but remain in the depth buffer; the
    # reference's getCameraImage still *depth*-renders transparent bodies,
    # so all spheres stay visible here.
    active = jnp.ones(centers.shape[0])
    if centers.shape[0] > MAX_RENDER_SPHERES:
      centers, active = _prune_rows(
          centers, eye, f_axis, r_axis, u_axis, centers,
          jnp.asarray(SUBGOAL_RADIUS), active, MAX_RENDER_SPHERES)
    t = jnp.minimum(
        t, _ray_spheres_t(eye, dirs, centers, SUBGOAL_RADIUS, active))
  depth = jnp.where(jnp.isfinite(t), t, 1000.0)
  return depth.reshape(IMG_SIZE, IMG_SIZE)


def preprocess_depth(depth: jnp.ndarray, key: jax.Array,
                     blind_spots: bool = True) -> jnp.ndarray:
  """RealSense blind spots + clip + sqrt(log) (reference :623-632).

  Blind spots are painted with a broadcast comparison mask rather than a
  scatter: random-index scatters serialize terribly on TPU (measured
  >100x slower than the whole raycaster)."""
  if blind_spots:
    k1, k2 = jax.random.split(key)
    num = jax.random.randint(k1, (), 3, 30)
    idx = jax.random.randint(k2, (30, 2), 0, IMG_SIZE)
    # flatten to one comparison per (spot, pixel) — same distribution as
    # the reference's independent (row, col) draws, half the compare work
    flat = idx[:, 0] * IMG_SIZE + idx[:, 1]
    flat = jnp.where(jnp.arange(30) < num, flat, -1)
    pix = jax.lax.broadcasted_iota(jnp.int32, (IMG_SIZE * IMG_SIZE,), 0)
    hit = jnp.any(pix[None] == flat[:, None], axis=0)
    depth = jnp.where(hit.reshape(IMG_SIZE, IMG_SIZE), 10.0, depth)
  depth = jnp.clip(depth, 0.3, 10.0)
  return jnp.sqrt(jnp.log(depth + 1.0))
