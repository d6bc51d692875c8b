"""Python surface matching the reference's pybind module `mpc_osqp`
(mpc_osqp.cc PYBIND11_MODULE :893-916): `ConvexMpc(mass, inertia,
num_legs, horizon, timestep, qp_weights, alpha, solver)` with
`compute_contact_forces(...)` — backed by the native C++ core in
convex_mpc.cpp (self-contained ADMM instead of vendored OSQP/qpOASES).
"""
from __future__ import annotations

import ctypes
import os.path as osp
import subprocess

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB = osp.join(_DIR, "libconvex_mpc.so")

# solver enum for ctor parity (the native core always uses its ADMM)
OSQP = 0
QPOASES = 1


def _load():
  if not osp.exists(_LIB):
    subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
  lib = ctypes.CDLL(_LIB)
  D = ctypes.POINTER(ctypes.c_double)
  I = ctypes.POINTER(ctypes.c_int)
  lib.mpc_create.restype = ctypes.c_void_p
  lib.mpc_create.argtypes = [ctypes.c_double, D, ctypes.c_int, ctypes.c_int,
                             ctypes.c_double, D, ctypes.c_double]
  lib.mpc_destroy.argtypes = [ctypes.c_void_p]
  lib.mpc_compute_contact_forces.restype = ctypes.c_int
  lib.mpc_compute_contact_forces.argtypes = [
      ctypes.c_void_p, D, ctypes.c_int, D, D, D, I, D, D, D, D, D, D, D]
  return lib


def _d(x):
  return np.ascontiguousarray(x, np.float64)


def _dp(x):
  return x.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class ConvexMpc:
  def __init__(self, mass, inertia, num_legs, planning_horizon,
               timestep, qp_weights, alpha=1e-5, qp_solver=QPOASES):
    del qp_solver  # ctor parity; the native ADMM core handles all cases
    self._lib = _load()
    self.num_legs = num_legs
    self.horizon = planning_horizon
    inertia = _d(inertia)
    weights = _d(qp_weights)
    self._h = self._lib.mpc_create(
        float(mass), _dp(inertia), int(num_legs), int(planning_horizon),
        float(timestep), _dp(weights), float(alpha))

  def compute_contact_forces(self, com_position, com_velocity,
                             com_roll_pitch_yaw, com_angular_velocity,
                             foot_contact_states,
                             foot_positions_body_frame,
                             foot_friction_coeffs, desired_com_position,
                             desired_com_velocity,
                             desired_com_roll_pitch_yaw,
                             desired_com_angular_velocity):
    com_position = _d(com_position)
    out = np.zeros(self.num_legs * 3 * self.horizon, np.float64)
    contacts = np.ascontiguousarray(foot_contact_states, np.int32)
    args = [_d(com_velocity), _d(com_roll_pitch_yaw),
            _d(com_angular_velocity)]
    rc = self._lib.mpc_compute_contact_forces(
        self._h, _dp(com_position), len(com_position),
        _dp(args[0]), _dp(args[1]), _dp(args[2]),
        contacts.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _dp(_d(foot_positions_body_frame)), _dp(_d(foot_friction_coeffs)),
        _dp(_d(desired_com_position)), _dp(_d(desired_com_velocity)),
        _dp(_d(desired_com_roll_pitch_yaw)),
        _dp(_d(desired_com_angular_velocity)), _dp(out))
    if rc != 0:
      return []
    return list(out)

  def reset_solver(self):
    pass

  def __del__(self):
    try:
      if getattr(self, "_h", None):
        self._lib.mpc_destroy(self._h)
    except Exception:
      pass
