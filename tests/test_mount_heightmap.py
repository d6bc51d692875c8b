"""The mount terrain must reproduce the reference's real heightmap asset.

Reference: a1_randomizer_ground.py:1011-1037 — wm_height_out.png at
meshScale [0.1, 0.1, 15*MOUNT_LEVEL[0]], body origin [2, 2, 2], PyBullet
vertical centering, goal sphere at GOAL_POS['mounts'][0] = [4, 11.5, 3.5],
robot init QUADRUPED_INIT_POSITION['mount'] = [1, 1, 1.56].

This test decodes the PNG independently of terrain.py's loader and pins
the TerrainState heights (exact at grid nodes, bilinear between) to the
decoded values, plus the placement invariants that disambiguate the
orientation convention.
"""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision4leg_tpu.envs import terrain

PNG = "/root/reference/vision4leg/assets/heightmaps/wm_height_out.png"

pytestmark = pytest.mark.skipif(
    not os.path.exists(PNG), reason="reference heightmap asset unavailable")


def _decode():
  from PIL import Image
  a = np.asarray(Image.open(PNG), dtype=np.float64)
  scale = 15.0 / 256.0
  z_center = (a.min() + a.max()) * 0.5 * scale

  def world_h(x, y):
    # image col = x index, row = y index; grid node k at 2+(k-255.5)*0.1
    i = (x - 2.0) / 0.1 + 255.5
    j = (y - 2.0) / 0.1 + 255.5
    i0, j0 = int(np.floor(i)), int(np.floor(j))
    fi, fj = i - i0, j - j0
    px = (a[j0, i0] * (1 - fi) * (1 - fj) + a[j0, i0 + 1] * fi * (1 - fj)
          + a[j0 + 1, i0] * (1 - fi) * fj + a[j0 + 1, i0 + 1] * fi * fj)
    return px * scale - z_center + 2.0

  return world_h


def test_mount_heights_match_decoded_png():
  ts = terrain.gen_mount(jax.random.PRNGKey(0), goal=True)
  h, _ = terrain.heightfield_fns(ts)
  world_h = _decode()

  # grid nodes (x = 1.95 etc. are exact sample points) and off-node
  # bilinear queries across the course, including init and goal
  pts = [(1.95, 1.95), (1.0, 1.0), (4.0, 11.5), (2.5, 8.0),
         (-3.0, -3.0), (10.15, 5.25), (0.0, 14.0), (17.3, 17.3)]
  xy = jnp.asarray(pts)
  got = np.asarray(h(xy))
  want = np.array([world_h(x, y) for x, y in pts])
  np.testing.assert_allclose(got, want, atol=1e-4)


def test_mount_placement_invariants():
  ts = terrain.gen_mount(jax.random.PRNGKey(1), goal=True)
  h, _ = terrain.heightfield_fns(ts)
  # goal position is the reference's GOAL_POS['mounts'][0]
  np.testing.assert_allclose(np.asarray(ts.goal_pos), [4.0, 11.5, 3.5])
  # the robot init pose [1,1,1.56] stands ~stance-height above terrain
  h_init = float(h(jnp.asarray([[1.0, 1.0]]))[0])
  assert 0.15 < 1.56 - h_init < 0.45, h_init
  # the goal sphere (r=0.8) rests on the slope, not inside or far above it
  h_goal = float(h(jnp.asarray([[4.0, 11.5]]))[0])
  assert abs(3.5 - h_goal) < 1.0, h_goal
  # the climb is real: goal terrain well above start terrain
  assert h_goal - h_init > 1.0


def test_mount_is_fixed_world():
  """The reference's mount is a fixed asset — resets must not re-roll it."""
  a = terrain.gen_mount(jax.random.PRNGKey(0)).height
  b = terrain.gen_mount(jax.random.PRNGKey(123)).height
  np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_committed_asset_matches_png_decode():
  """The in-repo mount_hf.npz (what a standalone checkout loads) must be
  bit-identical to decoding the reference PNG — regenerate with
  tools/gen_mount_asset.py if the decode convention changes."""
  import os.path as osp
  npz = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                 "vision4leg_tpu", "assets", "mount_hf.npz")
  d = np.load(npz)
  want = terrain.decode_mount_png(PNG).astype(np.float32)
  np.testing.assert_array_equal(d["height"], want)
  np.testing.assert_allclose(float(d["cell"]), terrain._MOUNT_CELL)
  np.testing.assert_allclose(
      float(d["origin"]),
      2.0 + (terrain._MOUNT_CROP_I0 - 255.5) * terrain._MOUNT_CELL,
      rtol=1e-6)
