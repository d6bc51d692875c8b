"""Pin gen_chair_desk to the geometry decoded from the reference assets.

Reference: vision4leg/envs/utilities/a1_randomizer_ground.py
`_generate_chair_desk` (:1976-2006) + `_move_chair_desk_and_subgoal_pos`
(:1886-1906): 50 chairs + 30 desks placed with ornObj=[1,0,0,1] (an
unnormalized quaternion = 90 deg about x — the furniture is tipped over
into solid blocks), one joint Poisson-disc sampling over x in [2.5,
28.5], y in [-3, 3], two fence walls, and NO subgoals (self.subgoal
excludes chair_desk, :365).  World-frame half-extents derive from the
shipped model.obj bounds x URDF scale x globalScaling (chair 8, desk
17).  The r2 reconstruction got all of this wrong (pass-under desk
compounds, 50+50 independent samplings, no fences, 50 subgoals) and the
policy never learned on it — these pins keep the decoded geometry from
regressing.
"""
import jax
import numpy as np

from vision4leg_tpu.envs import terrain as terr


def _boxes():
  ts = terr.gen_chair_desk(jax.random.PRNGKey(7))
  return np.asarray(ts.boxes), ts


def test_counts_and_no_subgoals():
  boxes, ts = _boxes()
  assert boxes.shape[0] == 50 + 30 + 2          # chairs + desks + fences
  assert ts.subgoals.size == 0 or not np.any(np.asarray(ts.subgoals))


def test_chair_and_desk_blocks():
  boxes, _ = _boxes()
  chairs, desks = boxes[:50], boxes[50:80]
  # tipped-over solid blocks: local (x, z, y) half-extents after the
  # 90-degree x-rotation, resting on / embedded in the ground
  np.testing.assert_allclose(chairs[:, 3:6], [[0.183, 0.147, 0.324]] * 50,
                             atol=1e-6)
  np.testing.assert_allclose(chairs[:, 2], 0.34, atol=1e-6)
  np.testing.assert_allclose(desks[:, 3:6], [[0.300, 0.741, 0.289]] * 30,
                             atol=1e-6)
  np.testing.assert_allclose(desks[:, 2], 0.24, atol=1e-6)


def test_joint_sampling_inside_corridor():
  boxes, _ = _boxes()
  xy = boxes[:80, :2]
  assert xy[:, 0].min() >= 2.5 and xy[:, 0].max() <= 28.5
  assert xy[:, 1].min() >= -3.0 and xy[:, 1].max() <= 3.0
  # one JOINT stratified sampling: no two obstacle centers coincide
  d = np.linalg.norm(xy[:, None] - xy[None], axis=-1)
  np.fill_diagonal(d, np.inf)
  assert d.min() > 0.05


def test_poisson_disc_min_spacing():
  """The reference's PoissonDisc2D(26, 6, 1.1) guarantees every pair of
  furniture centers is >= 1.1 m apart (a1_randomizer_ground.py:1868) —
  walkable gaps exist by construction.  Pin that guarantee across seeds."""
  for seed in range(6):
    ts = terr.gen_chair_desk(jax.random.PRNGKey(seed))
    xy = np.asarray(ts.boxes)[:80, :2]
    d = np.linalg.norm(xy[:, None] - xy[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 1.1 - 1e-5, f"seed {seed}: min spacing {d.min():.3f}"


def test_sparse_blocks_min_spacing():
  """Sparse-pillar family: reference per-reset placement is
  PoissonDisc2D(26, 6, 1.0) (`_move_block_pos` :521)."""
  for gen in (lambda k: terr.gen_blocks_sparse(k),
              terr.gen_thin_wide):
    ts = gen(jax.random.PRNGKey(3))
    boxes = np.asarray(ts.boxes)
    # select the Poisson-placed pillars: square blocks with the sparse
    # half-extents (excludes fences and thin_wide's fixed wide walls)
    n = terr.NUM_SPARSE_BLOCKS
    sq = np.isclose(boxes[:, 3], terr.SPARSE_HALF_LEN)
    xy = boxes[sq][:n, :2]
    assert xy.shape[0] == n
    d = np.linalg.norm(xy[:, None] - xy[None], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 1.0 - 1e-5, f"min spacing {d.min():.3f}"


def test_fences_bound_the_corridor():
  boxes, _ = _boxes()
  fences = boxes[80:]
  np.testing.assert_allclose(sorted(fences[:, 1]), [-3.0, 3.0], atol=1e-6)
  np.testing.assert_allclose(fences[:, 0], 15.0, atol=1e-6)
  assert (fences[:, 3] > 25).all()              # span the whole corridor


def test_different_keys_resample_positions():
  a = np.asarray(terr.gen_chair_desk(jax.random.PRNGKey(0)).boxes)
  b = np.asarray(terr.gen_chair_desk(jax.random.PRNGKey(1)).boxes)
  assert not np.allclose(a[:80, :2], b[:80, :2])
