"""Tracing / profiling utilities.

The reference's only observability is coarse wall-clock accounting
(rl_algo.py:111-156 Explore/Train/Eval times).  SURVEY.md section 5 names
`jax.profiler` traces + per-phase timing as the TPU-native equivalent —
this module provides both:

  * `phase_timer`: the Explore_Time / Train___Time accounting.
  * `trace(logdir)`: wrap any region in a jax.profiler trace viewable in
    TensorBoard (or xprof) — the device-level replacement for the
    reference's unused `profiling_path` config.
  * `device_memory_summary()`: live HBM usage per buffer kind.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class PhaseTimer:
  """Accumulates wall-clock per named phase (blocks on device results)."""

  def __init__(self):
    self.totals = defaultdict(float)
    self.counts = defaultdict(int)

  @contextlib.contextmanager
  def phase(self, name: str, block_on=None):
    t0 = time.time()
    yield
    if block_on is not None:
      jax.block_until_ready(block_on)
    self.totals[name] += time.time() - t0
    self.counts[name] += 1

  def summary(self) -> dict:
    return {f"{k}_Time": v for k, v in self.totals.items()}

  def reset(self):
    self.totals.clear()
    self.counts.clear()


@contextlib.contextmanager
def trace(logdir: str):
  """Capture a jax.profiler trace of the enclosed region."""
  jax.profiler.start_trace(logdir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def device_memory_summary() -> dict:
  """Per-device live-buffer byte totals."""
  out = {}
  for d in jax.devices():
    try:
      stats = d.memory_stats()
      out[str(d)] = {
          "bytes_in_use": stats.get("bytes_in_use"),
          "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
          "bytes_limit": stats.get("bytes_limit"),
      }
    except Exception:
      out[str(d)] = {}
  return out
