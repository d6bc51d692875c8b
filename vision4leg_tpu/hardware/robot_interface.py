"""Python binding for the native A1 UDP robot interface.

Presents the reference's `robot_interface.RobotInterface` API surface
(third_party/unitree_legged_sdk/python_interface.cpp:17-80):
  ReceiveObservation() -> LowState-like object
  SendCommand(60 floats: 12 x [q, Kp, dq, Kd, tau])
backed by the C++ UDP implementation in native/robot_interface.cpp,
compiled on demand and loaded through ctypes (pybind11 is not available
in this environment).
"""
from __future__ import annotations

import ctypes
import dataclasses
import os
import os.path as osp
import subprocess

import numpy as np

_NATIVE_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "native")
_LIB_PATH = osp.join(_NATIVE_DIR, "librobot_interface.so")

ROBOT_IP = "192.168.123.10"
ROBOT_PORT = 8007
LOCAL_PORT = 8080


def _build_lib():
  subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                 capture_output=True)


def _load_lib():
  if not osp.exists(_LIB_PATH):
    _build_lib()
  lib = ctypes.CDLL(_LIB_PATH)
  lib.ri_create.restype = ctypes.c_void_p
  lib.ri_create.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
  lib.ri_destroy.argtypes = [ctypes.c_void_p]
  lib.ri_recv.restype = ctypes.c_int
  lib.ri_recv.argtypes = [ctypes.c_void_p,
                          ctypes.POINTER(ctypes.c_float)]
  lib.ri_send.restype = ctypes.c_int
  lib.ri_send.argtypes = [ctypes.c_void_p,
                          ctypes.POINTER(ctypes.c_float)]
  lib.ri_state_size.restype = ctypes.c_int
  return lib


@dataclasses.dataclass
class IMUState:
  quaternion: np.ndarray    # (4,) wxyz
  gyroscope: np.ndarray     # (3,)
  accelerometer: np.ndarray  # (3,)
  rpy: np.ndarray           # (3,)


@dataclasses.dataclass
class MotorStateArray:
  q: np.ndarray       # (12,)
  dq: np.ndarray      # (12,)
  tauEst: np.ndarray  # (12,)


@dataclasses.dataclass
class LowState:
  motorState: MotorStateArray
  imu: IMUState
  footForce: np.ndarray  # (4,)
  tick: float


class RobotInterface:
  """Low-level UDP link (LOWLEVEL mode of the reference wrapper)."""

  def __init__(self, robot_ip: str = ROBOT_IP, robot_port: int = ROBOT_PORT,
               local_port: int = LOCAL_PORT):
    self._lib = _load_lib()
    self._handle = self._lib.ri_create(robot_ip.encode(), robot_port,
                                       local_port)
    if not self._handle:
      raise RuntimeError("failed to open UDP link to the robot")
    self._state_buf = np.zeros(self._lib.ri_state_size(), np.float32)

  def ReceiveObservation(self) -> LowState:
    buf = self._state_buf
    self._lib.ri_recv(
        self._handle, buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return LowState(
        motorState=MotorStateArray(q=buf[0:12].copy(), dq=buf[12:24].copy(),
                                   tauEst=buf[24:36].copy()),
        imu=IMUState(quaternion=buf[36:40].copy(), gyroscope=buf[40:43].copy(),
                     accelerometer=buf[43:46].copy(), rpy=buf[46:49].copy()),
        footForce=buf[49:53].copy(),
        tick=float(buf[53]),
    )

  def SendCommand(self, motorcmd) -> None:
    cmd = np.ascontiguousarray(motorcmd, np.float32)
    assert cmd.shape == (60,), "expect 12 x [q, Kp, dq, Kd, tau]"
    self._lib.ri_send(
        self._handle, cmd.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))

  def __del__(self):
    try:
      if getattr(self, "_handle", None):
        self._lib.ri_destroy(self._handle)
    except Exception:
      pass
