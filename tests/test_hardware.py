"""Hardware deployment stack tests (no robot: loopback/fake paths)."""
import numpy as np

from vision4leg_tpu.hardware.policy_wrapper import PolicyWrapper
from vision4leg_tpu.hardware.sensor_histories import (NormedStateHistory,
                                                      VisualHistory,
                                                      depth_process)
from vision4leg_tpu.robots import a1_params as P


def test_depth_process_matches_sim_pipeline():
  d = np.array([[0.1, 5.0], [20.0, 1.25]])
  out = depth_process(d)
  expect = np.sqrt(np.log(np.clip(d, 0.3, 10.0) + 1.0))
  np.testing.assert_allclose(out, expect)


def test_normed_state_history():
  mean = np.arange(12, dtype=np.float64)
  var = np.ones(12)
  h = NormedStateHistory(4, 3, mean, var)
  out = h.record_and_normalize(np.ones(4))
  assert out.shape == (12,)
  # newest reading occupies slot 0, normalized with slot-0 stats
  np.testing.assert_allclose(out[:4], (1 - mean[:4]) / (1 + 1e-4), rtol=1e-6)


def test_policy_wrapper_roundtrip():
  obs_dim = 84 + 4 * 64 * 64
  calls = []

  def policy(obs):
    calls.append(obs.shape)
    assert obs.shape == (obs_dim,)
    return np.zeros(6)

  pw = PolicyWrapper(policy, np.zeros(84), np.ones(84))
  q_cmd = pw.get_action(np.zeros(3), np.zeros(3),
                        np.asarray(P.INIT_MOTOR_ANGLES),
                        np.full((64, 64), 5.0))
  assert q_cmd.shape == (12,)
  # tanh(0) = 0 -> middle of the clip range = INIT_MOTOR_ANGLES
  np.testing.assert_allclose(q_cmd, P.INIT_MOTOR_ANGLES, atol=1e-6)


def test_visual_history_frame_extract():
  vh = VisualHistory((64, 64), num_frames=4)
  for i in range(4):
    out = vh.record_and_normalize(np.full((64, 64), float(i + 1)),
                                  np.arange(4))
  assert out.shape == (4 * 64 * 64,)


def test_robot_interface_loopback():
  """Native UDP link: send a command to a local socket and decode it."""
  import socket
  import struct
  from vision4leg_tpu.hardware.robot_interface import RobotInterface

  recv_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
  recv_sock.bind(("127.0.0.1", 19007))
  recv_sock.settimeout(2.0)

  ri = RobotInterface(robot_ip="127.0.0.1", robot_port=19007,
                      local_port=19080)
  cmd = np.zeros(60, np.float32)
  cmd[0::5] = np.asarray(P.INIT_MOTOR_ANGLES)  # q
  cmd[1::5] = 80.0                             # Kp
  ri.SendCommand(cmd)
  data, _ = recv_sock.recvfrom(4096)
  assert data[0] == 0xFF  # low-level flag
  # first MotorCmd: mode byte at offset 10, then packed floats q, dq, tau,
  # Kp, Kd
  assert data[10] == 0x0A
  q0 = struct.unpack_from("<f", data, 11)[0]
  assert abs(q0 - P.INIT_MOTOR_ANGLES[0]) < 1e-6
  recv_sock.close()
