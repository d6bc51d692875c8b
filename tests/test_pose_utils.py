"""Pose containers / per-robot MPC parameter sets (reference:
laikago_pose_utils.py, robot_pose_utils.py, mpc_controller/*_sim.py)."""
import numpy as np

from vision4leg_tpu.mpc import robot_params
from vision4leg_tpu.robots import pose_utils as pu


def test_default_poses():
  a1 = pu.default_pose("a1").to_motor_angles()
  np.testing.assert_allclose(a1, np.array([0.0, 0.9, -1.8] * 4, np.float32))
  lk = pu.default_pose("laikago").to_motor_angles()
  np.testing.assert_allclose(lk, np.array([0.0, 0.67, -1.25] * 4,
                                          np.float32))


def test_laikago_offset_roundtrip():
  pose = pu.default_pose("laikago")
  ja = pu.laikago_pose_to_joint_angles(pose)
  # laikago.py:250-267: raw angle = pose + (0, -0.6, 0.66) per leg
  np.testing.assert_allclose(ja[:3], [0.0, 0.07, -0.59], atol=1e-6)
  back = pu.laikago_joint_angles_to_pose(ja)
  np.testing.assert_allclose(back.to_motor_angles(),
                             pose.to_motor_angles(), atol=1e-6)


def test_robot_param_sets():
  # the three reference sims' SRB constants (a1_sim/laikago_sim/spirit40_sim)
  assert set(robot_params.ROBOTS) == {"a1", "laikago", "spirit40"}
  a1 = robot_params.A1
  np.testing.assert_allclose(a1.body_mass, 108.0 / 9.8)
  np.testing.assert_allclose(a1.body_inertia[0], 0.0017)
  assert a1.body_height == 0.24 and a1.velocity_multiplier == 0.5
  lk = robot_params.LAIKAGO
  np.testing.assert_allclose(lk.body_mass, 215.0 / 9.8)
  assert lk.body_height == 0.42 and lk.start_height == 0.48
  assert lk.upper_leg_joint_offset == -0.6
  sp = robot_params.SPIRIT40
  assert sp.body_mass == 12.0 and sp.velocity_multiplier == 0.7
  np.testing.assert_allclose(sp.init_angles[:3], [0.0, -0.7, 1.4])
